"""Non-vacuity pins for the geo predicates.

Round 6's ``geo_point_in_polygon`` shipped a CW-wound hexagon with a
CCW-only edge test: ``inside`` was 0 for EVERY possible point, and
cross-engine parity stayed green because both engines shared the
predicate. These tests assert the fixture data actually exercises both
branches, so a degenerate predicate can never ride a green gate again.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhousebackup_spark.functions.geo import _HEX, _pip_pred
from clickhousebackup_spark.registry import all_specs


def _pip_py(lat: int, lon: int) -> bool:
    """Pure-python mirror of the unrolled SQL predicate."""
    for i in range(len(_HEX)):
        (y0, x0), (y1, x1) = _HEX[i], _HEX[(i + 1) % len(_HEX)]
        if (x1 - x0) * (lat - y0) - (y1 - y0) * (lon - x0) < 0:
            return False
    return True


def test_predicate_is_satisfiable():
    # the centroid and every vertex of a CCW convex ring are inside
    clat = sum(y for y, _ in _HEX) // len(_HEX)
    clon = sum(x for _, x in _HEX) // len(_HEX)
    assert _pip_py(clat, clon), "polygon centroid must test inside"
    for y, x in _HEX:
        assert _pip_py(y, x), f"vertex ({y},{x}) must test inside"
    # and a point far outside the bounding box is outside
    assert not _pip_py(0, 0)


def test_sql_predicate_matches_python():
    # the SQL text and the python mirror must agree on probe points
    import duckdb

    probes = [
        (90_000_000, 180_000_000),
        (0, 0),
        (40_000_000, 180_000_000),
        (140_000_001, 180_000_000),
        (115_000_000, 137_000_000),
        (179_999_999, 359_999_999),
    ]
    con = duckdb.connect()
    for lat, lon in probes:
        # literals must be BIGINT like the real oracle's CAST columns,
        # else DuckDB multiplies in INT32 and overflows
        got = con.execute(
            "SELECT CASE WHEN "
            + _pip_pred(f"CAST({lat} AS BIGINT)", f"CAST({lon} AS BIGINT)")
            + " THEN 1 ELSE 0 END"
        ).fetchone()[0]
        assert bool(got) == _pip_py(lat, lon), (lat, lon)
    con.close()


def test_fixture_points_hit_both_branches(spark, sf_dir):
    df = all_specs()["geo_point_in_polygon"].fn(spark, sf_dir)
    counts = {
        r["inside"]: r["n"]
        for r in df.groupBy("inside").agg(F.count("*").alias("n")).collect()
    }
    assert counts.get(1, 0) > 0, "no fixture point lands inside — vacuous key"
    assert counts.get(0, 0) > 0, "no fixture point lands outside — vacuous key"
