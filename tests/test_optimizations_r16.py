"""Focused tests for the round-16 optimization internals.

Each test pins the MECHANISM an optimization relies on (cache identity,
shared exchange, adaptive checkpoint dispatch), not just the output —
outputs are already covered by the oracle-parity suites.
"""

from __future__ import annotations

from unittest.mock import patch

import pytest
from pyspark.sql import functions as F

from clickhousebackup_spark.plans import inspect as ins
from clickhousebackup_spark.registry import get_spec
from clickhousebackup_spark.tables import (
    invalidate_table_cache,
    load_table,
    parallelize,
)


# --- session-scoped table-plan cache (tables.load_table) ---------------


def test_load_table_returns_cached_plan(spark, sf_dir):
    a = load_table(spark, sf_dir, "orders")
    b = load_table(spark, sf_dir, "orders")
    assert a is b, "second load must hit the session-scoped plan cache"


def test_load_table_cache_is_per_sfdir(spark, sf_dir):
    a = load_table(spark, sf_dir, "region")
    b = load_table(spark, "/root/testdata/sf0.01", "region")
    assert a is not b, "different sf_dir must not share a cache entry"


def test_invalidate_table_cache_forces_reload(spark, sf_dir):
    a = load_table(spark, sf_dir, "nation")
    invalidate_table_cache(spark)
    b = load_table(spark, sf_dir, "nation")
    assert a is not b, "invalidate must drop the session's entries"
    # and the reloaded plan is re-cached
    assert load_table(spark, sf_dir, "nation") is b


def test_cached_plan_still_scans_files(spark, sf_dir):
    # the cache stores a PLAN: every action recomputes from parquet
    df = load_table(spark, sf_dir, "region")
    assert df.count() == load_table(spark, sf_dir, "region").count() == 5


# --- keyed fan-out (tables.parallelize by=...) -------------------------


def test_keyed_fanout_shares_the_aggregation_exchange(spark, sf_dir):
    # win_keep_newest fans the scan out ON user_id (a subset of the
    # window's partition keys); the window reuses that exchange, so
    # the plan keeps exactly one shuffle — the same count as the
    # un-fanned shape. (Round 17 moved this pin off agg_basic: its
    # low-card group-key fan-out was reverted per VERDICT r16 item 2,
    # and parallelize(by=) now rejects bounded-domain keys outright.)
    df = get_spec("win_keep_newest").fn(spark, sf_dir)
    assert ins.count_shuffles(df) == 1


def test_keyed_fanout_is_hash_partitioned_on_the_keys(spark, sf_dir):
    fanned = parallelize(
        load_table(spark, sf_dir, "orders"), by=("o_custkey",)
    )
    plan = ins.physical_plan(fanned)
    assert "hashpartitioning(o_custkey" in plan, plan[:500]


def test_fanout_noop_when_enough_input_files(spark, sf_dir):
    # min_parallelism=1: a single input file already satisfies the
    # target, so no repartition is added — the production no-op branch.
    base = load_table(spark, sf_dir, "orders")
    assert parallelize(base, min_parallelism=1) is base


# --- dedup_minhash adaptive checkpoint dispatch ------------------------


def test_dedup_minhash_skips_checkpoint_below_cap(spark, sf_dir):
    # fixture scales sit far below MINHASH_CKPT_DOCS_MIN: the plan must
    # be checkpoint-free (no ExistingRDD/LogicalRDD scan node) so the
    # identical band subplans can share one exchange at runtime.
    df = get_spec("dedup_minhash").fn(spark, sf_dir)
    assert "Scan ExistingRDD" not in ins.physical_plan(df)


def test_dedup_minhash_checkpoints_above_cap(spark, sf_dir):
    with patch(
        "clickhousebackup_spark.extensions.dedup.table_rows_metadata",
        return_value=10_000_000,
    ):
        df = get_spec("dedup_minhash").fn(spark, sf_dir)
    assert "Scan ExistingRDD" in ins.physical_plan(df), (
        "above the corpus cap the signature sketch must be pinned "
        "(localCheckpoint) so the band self-join never recomputes it"
    )


def test_dedup_minhash_unknown_size_takes_checkpoint_branch(spark, sf_dir):
    # metadata probe failure → conservative, scale-safe branch
    with patch(
        "clickhousebackup_spark.extensions.dedup.table_rows_metadata",
        return_value=None,
    ):
        df = get_spec("dedup_minhash").fn(spark, sf_dir)
    assert "Scan ExistingRDD" in ins.physical_plan(df)


# --- join_asof single-exchange rewrite ---------------------------------


def test_join_asof_single_shuffle(spark, sf_dir):
    # the (user_id, ts) click-dedup window was folded into the main
    # user_id window's ordering: one exchange total
    df = get_spec("join_asof").fn(spark, sf_dir)
    assert ins.count_shuffles(df) == 1


def test_join_asof_equal_ts_tie_resolves_to_max_event_id(spark):
    # two clicks at the same (user, ts): the as-of match must pick the
    # max event_id — the oracle's ROW_NUMBER ... ORDER BY event_id DESC
    # dedup, now expressed through the window ordering alone.
    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 10, "click"),
            (1, "2024-01-01 00:00:00", 11, "click"),
            (1, "2024-01-01 00:05:00", 20, "purchase"),
        ],
        "user_id long, ts string, event_id long, event_type string",
    ).select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"),
        "event_id", "event_type",
    )
    with patch(
        "clickhousebackup_spark.operators.joins.load_table",
        return_value=ev,
    ):
        rows = get_spec("join_asof").fn(spark, "ignored").collect()
    assert len(rows) == 1
    assert rows[0]["p_id"] == 20 and rows[0]["c_id"] == 11
