"""Behavior-operator edge cases beyond the oracle parity sweep —
notably the bounded-state guarantee of agg_ema under key skew
(VERDICT r2 item #2: no collect of a whole user history).
"""

from __future__ import annotations

import datetime as dt

EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _python_ema(vals, horizon):
    vals = vals[-horizon:]
    acc = vals[0]
    for x in vals[1:]:
        acc = acc * 0.5 + x * 0.5
    return acc


def test_agg_ema_bounded_state_on_skewed_user(spark, tmp_path):
    """A power user with 5000 events vs normal users with a handful:
    the trailing-horizon EMA must (a) agree bit-exactly with a Python
    reference fold over the last K values, and (b) never require the
    full 5000-element sequence in one aggregation buffer — the plan
    filters to rn <= K BEFORE the collect."""
    from clickhousebackup_spark.operators.behavior import EMA_HORIZON, agg_ema

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(seconds=i), 1, "e", float(i % 97), "{}")
        for i in range(5000)
    ]
    rows += [
        (10_000 + i, base + dt.timedelta(seconds=i), 2, "e", float(3 * i + 1), "{}")
        for i in range(5)
    ]
    sf = str(tmp_path)
    spark.createDataFrame(rows, EVENTS_DDL).write.parquet(f"{sf}/events.parquet")

    df = agg_ema(spark, sf)
    out = {r["user_id"]: r["ema_value"] for r in df.collect()}
    assert out[1] == _python_ema([float(i % 97) for i in range(5000)], EMA_HORIZON)
    assert out[2] == _python_ema([float(3 * i + 1) for i in range(5)], EMA_HORIZON)

    # the horizon filter must sit below the collect in the plan: the
    # optimized plan carries the rn <= K predicate, so the aggregate
    # only ever sees <= K rows per user regardless of skew.
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert f"<= {EMA_HORIZON}" in plan


def test_agg_ema_horizon_equals_full_fold_in_double_precision(spark, tmp_path):
    """Terms older than the horizon carry weight <= 2^-100 — the
    trailing-K EMA and the full-history EMA are the same double for
    well-scaled values (why the truncation is semantics-preserving)."""
    from clickhousebackup_spark.operators.behavior import EMA_HORIZON

    vals = [float((i * 37) % 1009) / 7.0 for i in range(5000)]
    full = vals[0]
    for x in vals[1:]:
        full = full * 0.5 + x * 0.5
    assert _python_ema(vals, EMA_HORIZON) == full


def test_fuzzy_blocked_overlapping_buckets_catch_straddling_pair(spark):
    """Round-5 recall upgrade (VERDICT r4 item #8): a true pair whose
    name lengths straddle a width-4 bucket boundary (7 -> bucket 1,
    8 -> bucket 2) must be found by the overlapping {b-1,b,b+1}
    probes, exactly once, while the brand block still holds."""
    from pyspark.sql import functions as F

    from clickhousebackup_spark.operators.analytics2 import (
        _fuzzy_blocked_pairs,
    )

    rows = [
        (1, "abcdefg", "BrandX"),  # len 7 -> bucket 1
        (2, "abcdefgh", "BrandX"),  # len 8 -> bucket 2, dist 1 to #1
        (3, "qqqqqqqqqq", "BrandX"),  # same brand, far away
        (4, "abcdefgx", "BrandY"),  # dist 1 to #1 but other brand
    ]
    df = spark.createDataFrame(
        rows, "p_partkey long, p_name string, p_brand string"
    )
    blocked = df.withColumn(
        "len_bucket", F.expr("length(p_name) div 4")
    )
    pairs = _fuzzy_blocked_pairs(blocked).collect()
    keyed = [(r["a_key"], r["b_key"]) for r in pairs]
    assert keyed.count((1, 2)) == 1  # straddling pair, exactly once
    assert (1, 4) not in keyed and (2, 4) not in keyed  # brand block
    assert all(r["dist"] <= 3 for r in pairs)
