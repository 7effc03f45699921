"""Focused tests for the round-17 optimization internals.

Round 17 closes the two driver-reproducible round-16 regressions
(agg_basic low-card fan-out, dedup_minhash checkpoint skip) and
hardens the fan-out API so the agg_basic-class shape cannot be
reintroduced silently (VERDICT r16 items 2-4). Each test pins the
MECHANISM; outputs are covered by the oracle-parity suites.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhousebackup_spark.plans import inspect as ins
from clickhousebackup_spark.registry import get_spec
from clickhousebackup_spark.tables import (
    LOW_CARDINALITY_COLUMNS,
    load_table,
    parallelize,
)


# --- parallelize(by=) cardinality guard (VERDICT r16 item 4) -----------


def test_parallelize_rejects_all_lowcard_keys(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    with pytest.raises(ValueError, match="low-cardinality"):
        parallelize(li, by=("l_returnflag", "l_linestatus"))


def test_parallelize_accepts_mixed_and_highcard_keys(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    # pure high-card key: fine
    fanned = parallelize(li, by=("l_orderkey",))
    assert "hashpartitioning(l_orderkey" in ins.physical_plan(fanned)
    # a low-card key salted WITH a high-card key: fine (bucketing is
    # the documented fix for low-card partitioning)
    mixed = parallelize(li, by=("l_returnflag", "l_orderkey"))
    assert "hashpartitioning(l_returnflag" in ins.physical_plan(mixed)


def test_lowcard_set_contains_the_r16_regression_keys():
    assert {"l_returnflag", "l_linestatus"} <= LOW_CARDINALITY_COLUMNS


# --- canary helper: user-injected low-card repartition exchanges -------


def test_lowcard_repartition_detector_flags_the_bad_shape(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    bad = li.repartition(32, "l_returnflag", "l_linestatus")
    hits = ins.lowcard_repartition_exchanges(bad, LOW_CARDINALITY_COLUMNS)
    assert len(hits) == 1 and "REPARTITION_BY_NUM" in hits[0]


def test_lowcard_repartition_detector_exempts_planner_exchanges(spark, sf_dir):
    # groupBy on the same low-card keys inserts an ENSURE_REQUIREMENTS
    # exchange that carries only partial-agg rows — the scalable shape;
    # it must NOT be flagged.
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag", "l_linestatus").count()
    assert ins.lowcard_repartition_exchanges(agg, LOW_CARDINALITY_COLUMNS) == []


def test_lowcard_repartition_detector_exempts_highcard_keys(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    ok = li.repartition(32, "l_orderkey")
    assert ins.lowcard_repartition_exchanges(ok, LOW_CARDINALITY_COLUMNS) == []


# --- agg_basic revert (VERDICT r16 item 2) ------------------------------


def test_agg_basic_has_no_user_repartition_and_one_shuffle(spark, sf_dir):
    df = get_spec("agg_basic").fn(spark, sf_dir)
    plan = ins.physical_plan(df)
    assert "REPARTITION_BY" not in plan, plan[:800]
    assert ins.count_shuffles(df) == 1
    # partial aggregation must sit below the exchange (map-side reduce)
    assert "partial" in plan.lower()


def test_emb_kmeans_nlj_is_pinned():
    from tests.test_plan_canary import NLJ_ALLOWED

    assert NLJ_ALLOWED.get("emb_kmeans") == 1
