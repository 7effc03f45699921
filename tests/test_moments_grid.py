"""Crafted-fixture proofs for ``stats_moments_grid``
(operators/quantiles.py) — the moment family's exactness-at-ANY-scale
anchor on the q1_pricing_summary_grid convention.

The key's claim: floor(value^k * 1e6) is deterministic per row (one
IEEE multiply chain on identical parquet doubles + exact floor), the
DECIMAL(38,0) sums are order-free and emitted as VARCHAR (never
through double — where the flat moment family's sf1 frontier lives),
and the five columns are complete sufficient statistics for the
moment battery.
"""

from __future__ import annotations

import math
from datetime import datetime, timedelta
from decimal import Decimal

from clickhousebackup_spark.registry import all_specs

DAY0 = datetime(2024, 1, 1)

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _mk(rows, tmp_path, spark):
    data = [
        (i, DAY0 + timedelta(minutes=i), i % 5, et, float(v), "{}")
        for i, (et, v) in enumerate(rows)
    ]
    d = str(tmp_path)
    spark.createDataFrame(data, EVENTS_SCHEMA).write.mode(
        "overwrite"
    ).parquet(f"{d}/events.parquet")
    return d


def _hand_grid(values, k):
    """Σ floor(v^k · 1e6) replaying the engines' double arithmetic:
    v^k as a left-to-right multiply chain, then one multiply by 1e6,
    then floor — each step in IEEE doubles, the sum in exact ints."""
    total = 0
    for v in values:
        p = float(v)
        for _ in range(k - 1):
            p = p * float(v)
        total += math.floor(p * 1000000.0)
    return str(total)


def test_grid_moments_match_hand_computation(spark, tmp_path):
    rows = [
        # 0.1 * 0.3-flavoured unrepresentable doubles: the grid's
        # whole point is that BOTH engines floor the same product
        ("A", 0.1),
        ("A", 0.3),
        ("A", 2.675),   # classic round-half case at the 1e-6 edge
        ("A", 490.02),  # fixture domain max — s4 headroom row
        # a negative value pins floor-toward-minus-infinity on odd
        # powers in both engines
        ("B", -1.5),
        ("B", 3.0),
    ]
    d = _mk(rows, tmp_path, spark)
    got = {
        r["event_type"]: (r["n"], r["s1_grid"], r["s2_grid"],
                          r["s3_grid"], r["s4_grid"])
        for r in all_specs()["stats_moments_grid"].fn(spark, d).collect()
    }
    for et in ("A", "B"):
        vals = [v for t, v in rows if t == et]
        assert got[et] == (
            len(vals),
            _hand_grid(vals, 1),
            _hand_grid(vals, 2),
            _hand_grid(vals, 3),
            _hand_grid(vals, 4),
        ), et


def test_grid_is_sufficient_for_variance(spark, sf_dir):
    """Deriving variance from the grid sums reproduces agg_stats'
    variance to within the grid's truncation envelope (≤ 1e-6 per
    row per moment) — the 'derivable downstream' claim."""
    grid = {
        r["event_type"]: r
        for r in all_specs()["stats_moments_grid"].fn(spark, sf_dir).collect()
    }
    flat = {
        r["event_type"]: r["var_value"]
        for r in all_specs()["agg_stats"].fn(spark, sf_dir).collect()
    }
    for et, g in grid.items():
        n = g["n"]
        s1 = int(g["s1_grid"]) / 1e6
        s2 = int(g["s2_grid"]) / 1e6
        var = (s2 - s1 * s1 / n) / (n - 1)
        assert math.isclose(var, flat[et], rel_tol=1e-6), et


def test_rerun_stable_and_nonvacuous(spark, sf_dir):
    fn = all_specs()["stats_moments_grid"].fn
    a = sorted(map(tuple, fn(spark, sf_dir).collect()))
    b = sorted(map(tuple, fn(spark, sf_dir).collect()))
    assert a == b and len(a) > 0


def test_grid_survives_int64_floor_overflow(spark, tmp_path):
    """Values whose 4th-power grid exceeds int64 (|v^4·1e6| > 9.2e18,
    i.e. |v| ≳ 1742) must NOT wrap: Spark's floor(DOUBLE)->LONG is
    non-ANSI and wraps silently, so the accumulator splits on 2^53 —
    long-floor below (exact, fits), direct DECIMAL(38,0) cast at or
    above (a double there is already integral). The hand model uses
    Python's unbounded floor, so any wrap shows up as a mismatch.
    Cross-engine parity for the same rows is pinned by DuckDB, whose
    floor stays in double."""
    import duckdb

    rows = [
        ("A", 5000.0),      # 5000^4·1e6 = 6.25e20 — wraps a bare long
        ("A", -4321.75),    # negative branch past the long ceiling
        ("A", 0.7),         # below-2^53 path in the same group
        ("B", 1742.0),      # right at the advice's wrap frontier
        ("B", 9.9e7),       # ~9.6e37·1e6 overflows... no: 9.9e7^4=9.6e31,
                            # ·1e6=9.6e37 — the last safe decade of DECIMAL(38,0)
    ]
    d = _mk(rows, tmp_path, spark)
    got = {
        r["event_type"]: (r["s1_grid"], r["s2_grid"], r["s3_grid"], r["s4_grid"])
        for r in all_specs()["stats_moments_grid"].fn(spark, d).collect()
    }
    for et in ("A", "B"):
        vals = [v for t, v in rows if t == et]
        assert got[et] == tuple(_hand_grid(vals, k) for k in (1, 2, 3, 4)), et

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{d}/events.parquet/*.parquet')"
    )
    spec = all_specs()["stats_moments_grid"]
    oracle = {
        r[0]: tuple(r[2:6])
        for r in con.execute(spec.oracle).fetchall()
    }
    assert oracle == got
