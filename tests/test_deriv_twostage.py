"""Exactness proofs for ts_nonneg_derivative_twostage
(operators/analytics18.py) — the series-lag decomposition (family
three) transplanted onto the structural event_type key.

Claim: hash-identical pair set and rates vs the flat key for ANY
input — within-bucket lag + previous-NON-EMPTY-bucket seam pairs
(summaries only exist for non-empty buckets, so the lagged summary
row is exactly the previous non-empty bucket), the rate replaying
the flat IEEE expression. Crafted fixtures pin the seam mechanics:
pairs straddling midnight, an EMPTY day between two points (the
seam must skip it), single-point buckets chained across days,
same-timestamp ties at a boundary, and a zero/negative-rate clamp
across the seam.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clickhousebackup_spark.registry import all_specs

DAY0 = datetime(2024, 1, 1)

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _mk(rows, tmp_path, spark):
    """rows: list of (event_id, event_type, minutes_from_day0, value)."""
    data = [
        (eid, DAY0 + timedelta(minutes=m), eid % 3, et, float(v), "{}")
        for eid, et, m, v in rows
    ]
    d = str(tmp_path)
    spark.createDataFrame(data, EVENTS_SCHEMA).write.mode(
        "overwrite"
    ).parquet(f"{d}/events.parquet")
    return d


def _brute(rows):
    """{event_id: (dt_us, rate)} replaying the flat key exactly."""
    by_type: dict = {}
    for eid, et, m, v in rows:
        t_us = int(
            (DAY0 + timedelta(minutes=m) - datetime(1970, 1, 1))
            .total_seconds() * 1_000_000
        )
        by_type.setdefault(et, []).append((t_us, eid, float(v)))
    out = {}
    for pts in by_type.values():
        pts.sort()
        for (pt, _, pv), (t, eid, v) in zip(pts, pts[1:]):
            dt = t - pt
            rate = 0.0 if dt <= 0 else max(0.0, (v - pv) * 1_000_000.0 / dt)
            out[eid] = (dt, rate)
    return out


def _engine(spark, d, key):
    return {
        r["event_id"]: (r["dt_us"], r["rate_per_sec"])
        for r in all_specs()[key].fn(spark, d).collect()
    }


DAY = 24 * 60  # minutes


def test_crafted_seams_and_empty_days(spark, tmp_path):
    rows = [
        # type A: a midnight-straddling pair, then an EMPTY day 2 —
        # day 3's first point must pair with day 1's last point.
        (0, "A", DAY - 10, 5.0),
        (1, "A", DAY + 10, 8.0),          # seam pair with eid 0
        (2, "A", 3 * DAY + 5, 2.0),       # seam pair SKIPS empty day 2
        # type B: single-point buckets chained across three days —
        # every pair is a seam pair; the middle one clamps negative.
        (10, "B", 30, 9.0),
        (11, "B", DAY + 30, 4.0),         # falling counter -> 0.0
        (12, "B", 2 * DAY + 30, 6.0),
        # type C: one point only — no output rows at all.
        (20, "C", 100, 1.0),
    ]
    d = _mk(rows, tmp_path, spark)
    want = _brute(rows)
    assert _engine(spark, d, "ts_nonneg_derivative_twostage") == want
    assert _engine(spark, d, "ts_nonneg_derivative") == want


def test_oracle_is_shared_object():
    specs = all_specs()
    assert (
        specs["ts_nonneg_derivative"].oracle
        is specs["ts_nonneg_derivative_twostage"].oracle
    )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    raw=st.lists(
        st.tuples(
            st.sampled_from(["A", "B"]),
            # minutes across ±2 days around a midnight: boundary
            # pairs and multi-empty-day gaps are common; duplicates
            # create same-timestamp ties (dt = 0 -> rate 0.0)
            st.integers(min_value=-2 * DAY, max_value=2 * DAY),
            st.integers(min_value=0, max_value=40),  # quarter-units
        ),
        min_size=1,
        max_size=30,
    )
)
def test_property_matches_flat_and_brute(spark, tmp_path_factory, raw):
    rows = [
        (i, et, m, q / 4.0) for i, (et, m, q) in enumerate(raw)
    ]
    d = _mk(rows, tmp_path_factory.mktemp("derivtwo"), spark)
    got = _engine(spark, d, "ts_nonneg_derivative_twostage")
    assert got == _brute(rows)
    assert got == _engine(spark, d, "ts_nonneg_derivative")
