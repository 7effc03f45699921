"""MergeTree-engine-family semantics as Spark plans.

The reference image IS a ClickHouse server (`/root/reference/
Dockerfile:2` — clickhouse-server:24.8.4.13-alpine); its users store
tables in the MergeTree engine family and rely on merge-time
semantics: CollapsingMergeTree sign-cancelling, AggregatingMergeTree
partial-state merges, and incrementally-maintained materialized
views. The reference's one SQL statement (`backup.sh:38-45`) backs
those tables up wholesale, so a user switching to this engine needs
the same table semantics re-expressed as explicit, deterministic
Spark transforms — which is what this module provides.

Scale notes:

- ``merge_collapsing_final`` is one window over the collapse key —
  a single shuffle on (user_id, event_type), identical in shape to
  ``win_keep_newest``; ClickHouse does the same work lazily at merge
  time, we do it eagerly at read time (the Spark-native trade).
- ``merge_aggregating_shards`` demonstrates the mergeable-state
  contract explicitly: per-shard partial states (count, decimal sum,
  min, max) re-aggregate to the exact global answer. This is the
  two-level aggregation every 100 TB plan relies on — Catalyst's
  partial/final hash-agg does it implicitly; here it is surfaced as
  data so shard-restricted backups can be combined without a rescan.
- ``mv_incremental_refresh`` maintains an aggregate materialized
  view across a snapshot boundary: old state + delta-only scan →
  merged state, never re-reading the base. At 100 TB the delta scan
  is the only O(new data) cost, which is the entire point of an
  incremental MV (and of incremental backups, `engine.py`).
- ``agg_combinators`` is the ClickHouse ``-If`` combinator family
  (sumIf/countIf/maxIf/uniqIf) as conditional aggregates — one
  two-phase hash agg, no joins.

All checked columns follow the exprs.py determinism conventions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhousebackup_spark.exprs import DEC
from clickhousebackup_spark.registry import register
from clickhousebackup_spark.tables import load_table


@register(
    "merge_collapsing_final",
    oracle="""
        SELECT user_id, event_type, ts, event_id, value
        FROM (
            SELECT user_id, event_type, ts, event_id, value,
                   CASE WHEN event_id % 4 = 0 THEN -1 ELSE 1 END AS sign,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        )
        WHERE rn = 1 AND sign = 1
    """,
    doc="CollapsingMergeTree SELECT ... FINAL: a state-change stream "
    "(sign=+1 upsert, -1 delete; here sign is a deterministic "
    "event_id%4 derivation) collapses to the latest row per key iff "
    "that row is an upsert. ClickHouse cancels (+1,-1) pairs at merge "
    "time; the eager-read equivalent is one row_number window over "
    "the collapse key — a single shuffle, same as win_keep_newest.",
)
def merge_collapsing_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id", "value"
    )
    signed = ev.withColumn(
        "sign",
        F.when(F.pmod(F.col("event_id"), F.lit(4)) == 0, -1).otherwise(1),
    )
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        signed.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("sign") == 1))
        .select("user_id", "event_type", "ts", "event_id", "value")
    )


@register(
    "merge_aggregating_shards",
    oracle="""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
                   AS total_value,
               MIN(value) AS min_value,
               MAX(value) AS max_value
        FROM events
        GROUP BY event_type
    """,
    doc="AggregatingMergeTree partial-state merge: shard the table "
    "(pmod(user_id,8) stands in for the distributed-table shard key), "
    "compute per-shard partial states (count, exact decimal sum, "
    "min, max), then MERGE the states — never rescanning rows. The "
    "oracle is the direct one-pass aggregate, proving state-merge "
    "exactness. Decimal sums keep both levels order-independent; "
    "this is the contract that lets per-shard backup snapshots be "
    "combined into global rollups at 100 TB without a full rescan.",
)
def merge_aggregating_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "value")
    partial = (
        ev.withColumn("shard", F.pmod(F.col("user_id"), F.lit(8)))
        .groupBy("shard", "event_type")
        .agg(
            F.count(F.lit(1)).alias("p_n"),
            F.sum(F.col("value").cast(DEC)).alias("p_sum"),  # stays decimal
            F.min("value").alias("p_min"),
            F.max("value").alias("p_max"),
        )
    )
    return partial.groupBy("event_type").agg(
        F.sum("p_n").cast("long").alias("n_rows"),
        F.sum("p_sum").cast("double").alias("total_value"),
        F.min("p_min").alias("min_value"),
        F.max("p_max").alias("max_value"),
    )


@register(
    "mv_incremental_refresh",
    oracle="""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
                   AS total_value
        FROM events
        GROUP BY event_type
    """,
    doc="Incremental materialized-view maintenance (ClickHouse MV "
    "analog): the view state as of the last day boundary (base "
    "aggregate) is merged with a delta aggregate over only the final "
    "day's rows — base-state + delta union, one re-aggregation, no "
    "base rescan. The oracle is the from-scratch aggregate, proving "
    "refresh(state, delta) == full(table). The day cut is a "
    "broadcast 1-row scalar (no driver round-trip); counts merge by "
    "sum, decimal sums merge exactly. This is the same "
    "old-state-plus-delta algebra run_incremental uses for backups "
    "(engine.py), applied to aggregate views.",
)
def mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    cut = ev.agg(F.date_trunc("day", F.max("ts")).alias("cut_ts"))
    ev2 = ev.crossJoin(F.broadcast(cut))

    def state(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("s_n"),
            F.sum(F.col("value").cast(DEC)).alias("s_sum"),
        )

    base = state(ev2.filter(F.col("ts") < F.col("cut_ts")))
    delta = state(ev2.filter(F.col("ts") >= F.col("cut_ts")))
    return (
        base.unionByName(delta)
        .groupBy("event_type")
        .agg(
            F.sum("s_n").cast("long").alias("n_events"),
            F.sum("s_sum").cast("double").alias("total_value"),
        )
    )


@register(
    "agg_combinators",
    oracle="""
        SELECT CAST(user_id % 10 AS BIGINT) AS user_bucket,
               CAST(COUNT(*) FILTER (WHERE event_type = 'click')
                   AS BIGINT) AS n_clicks,
               CAST(SUM(CAST(value AS DECIMAL(38,6)))
                        FILTER (WHERE event_type = 'click')
                   AS DOUBLE) AS click_value,
               MAX(value) FILTER (WHERE event_type = 'purchase')
                   AS max_purchase_value,
               CAST(COUNT(DISTINCT CASE WHEN event_type = 'click'
                                        THEN user_id END)
                   AS BIGINT) AS uniq_click_users
        FROM events
        GROUP BY 1
    """,
    doc="ClickHouse -If combinator family (sumIf/countIf/maxIf/"
    "uniqIf) as conditional aggregates in one two-phase hash agg: "
    "count/sum/max over CASE-guarded inputs plus a conditional "
    "count-distinct. No joins, no extra shuffle beyond the group-by; "
    "empty guards yield NULL (sum/max) or 0 (count) identically in "
    "both engines.",
)
def agg_combinators(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "value")
    is_click = F.col("event_type") == "click"
    return ev.groupBy(
        F.pmod(F.col("user_id"), F.lit(10)).cast("long").alias("user_bucket")
    ).agg(
        F.count(F.when(is_click, 1)).alias("n_clicks"),
        F.sum(F.when(is_click, F.col("value")).cast(DEC))
        .cast("double")
        .alias("click_value"),
        F.max(F.when(F.col("event_type") == "purchase", F.col("value"))).alias(
            "max_purchase_value"
        ),
        F.countDistinct(F.when(is_click, F.col("user_id"))).alias(
            "uniq_click_users"
        ),
    )
