"""ClickHouse SELECT-dialect surfaces that have no one-keyword ANSI
equivalent: ``LIMIT n BY col``, ``GROUP BY ... WITH TOTALS``, and the
``argMin``/``argMax`` aggregate pair.

The reference image is a ClickHouse server (`/root/reference/
Dockerfile:2`); every table it backs up is queried through this
dialect, so an engine replacing it must re-express these SELECT
modifiers as Spark plans:

- ``LIMIT n BY`` is a per-group offset+limit — one row_number window
  over the group key (single shuffle). ClickHouse streams it with a
  bounded per-key heap; Spark's window with a rank filter is the same
  bounded state after WindowGroupLimit pushdown.
- ``WITH TOTALS`` is GROUPING SETS ((keys), ()) — Catalyst expands it
  to a single 2× Expand + one hash agg, not two scans of the fact
  table. At 100 TB that matters: the naive union-of-two-aggs plan
  reads the input twice.
- ``argMin/argMax`` are ``min_by/max_by`` with a composite struct key
  so ties break on a total order (ClickHouse's tie choice is
  arbitrary; a hash-checked engine must pin it).

All checked columns follow the exprs.py determinism conventions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhousebackup_spark.exprs import osum
from clickhousebackup_spark.registry import register
from clickhousebackup_spark.tables import load_table


@register(
    "limit_by",
    oracle="""
        SELECT user_id, ts, event_id, event_type
        FROM (
            SELECT user_id, ts, event_id, event_type,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id
                       ORDER BY ts, event_id) AS rn
            FROM events
        )
        WHERE rn > 1 AND rn <= 3
    """,
    doc="ClickHouse `ORDER BY ts LIMIT 1, 2 BY user_id`: skip the "
    "first row per user, keep the next two — per-group OFFSET+LIMIT, "
    "which ANSI SQL cannot say without a window. (ts, event_id) is a "
    "total order so the kept rows are deterministic. One shuffle on "
    "user_id; Spark's WindowGroupLimit pushes the rank<=3 bound into "
    "the sort so per-key state stays O(3), the same bounded-heap "
    "shape ClickHouse streams with.",
)
def limit_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") > 1) & (F.col("rn") <= 3))
        .drop("rn")
    )


@register(
    "with_totals",
    oracle=f"""
        SELECT COALESCE(o_orderstatus, 'TOTALS') AS status,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               {osum('o_totalprice')} AS total_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), ())
    """,
    doc="GROUP BY o_orderstatus WITH TOTALS: the per-status rows plus "
    "one all-rows totals row, exactly GROUPING SETS ((k), ()). "
    "Catalyst compiles this to ONE scan + Expand(2) + a single "
    "two-phase hash agg — not a union of two aggregations, so the "
    "100 TB fact table is read once. Decimal-exact sums per exprs.py.",
)
def with_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "orders_wt"
    )
    return spark.sql(
        f"""
        SELECT COALESCE(o_orderstatus, 'TOTALS') AS status,
               COUNT(*) AS n_orders,
               {osum('o_totalprice')} AS total_price
        FROM orders_wt
        GROUP BY GROUPING SETS ((o_orderstatus), ())
        """
    )


@register(
    "agg_argminmax",
    oracle="""
        WITH mx AS (
            SELECT l_returnflag, l_orderkey AS argmax_orderkey
            FROM (
                SELECT l_returnflag, l_orderkey,
                       ROW_NUMBER() OVER (
                           PARTITION BY l_returnflag
                           ORDER BY l_extendedprice DESC,
                                    l_orderkey DESC,
                                    l_linenumber DESC) AS rn
                FROM lineitem
            ) WHERE rn = 1
        ), mn AS (
            SELECT l_returnflag, l_orderkey AS argmin_orderkey
            FROM (
                SELECT l_returnflag, l_orderkey,
                       ROW_NUMBER() OVER (
                           PARTITION BY l_returnflag
                           ORDER BY l_extendedprice ASC,
                                    l_orderkey ASC,
                                    l_linenumber ASC) AS rn
                FROM lineitem
            ) WHERE rn = 1
        )
        SELECT mx.l_returnflag, argmax_orderkey, argmin_orderkey
        FROM mx JOIN mn ON mx.l_returnflag = mn.l_returnflag
    """,
    doc="argMax(l_orderkey, l_extendedprice) / argMin(...) per return "
    "flag: which order carries the most/least expensive line item. "
    "max_by/min_by with a composite struct key (price, orderkey, "
    "linenumber) — a total order, so duplicated prices cannot flip "
    "the answer between runs or engines (ClickHouse leaves the tie "
    "arbitrary; the hash contract cannot). Struct min/max compares "
    "lexicographically, so one two-phase hash agg computes both — no "
    "window over the fact table, no join.",
)
def agg_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    kmax = F.struct(
        F.col("l_extendedprice"), F.col("l_orderkey"), F.col("l_linenumber")
    )
    return li.groupBy("l_returnflag").agg(
        F.max_by("l_orderkey", kmax).alias("argmax_orderkey"),
        F.min_by("l_orderkey", kmax).alias("argmin_orderkey"),
    )


@register(
    "intervals_max_concurrent",
    oracle="""
        WITH iv AS (
            SELECT o_orderpriority AS pri,
                   o_orderdate AS s,
                   o_orderdate + INTERVAL (o_orderkey % 30 + 1) DAY AS e
            FROM orders
        ), pts AS (
            SELECT pri, s AS t, 1 AS delta FROM iv
            UNION ALL
            SELECT pri, e AS t, -1 AS delta FROM iv
        ), run AS (
            SELECT pri,
                   SUM(delta) OVER (
                       PARTITION BY pri ORDER BY t, delta
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS conc
            FROM pts
        )
        SELECT pri, CAST(MAX(conc) AS BIGINT) AS max_concurrent
        FROM run GROUP BY pri
    """,
    doc="ClickHouse maxIntersections: the maximum number of "
    "simultaneously-open intervals per priority class (each order "
    "stays open o_orderkey%30+1 days — deterministic synthetic "
    "durations). The classic sweep-line, distributed: explode each "
    "interval to (+1 at start, -1 at end) points, ONE window running "
    "sum per group, then max. Half-open [s, e) semantics come from "
    "the (t, delta) sort — at equal t the -1 rows precede the +1 "
    "rows, so an interval ending exactly when another starts never "
    "double-counts. The per-row prefix sums under ties are "
    "order-dependent, but the per-group MAX is not (equal-delta tie "
    "runs contribute the same prefix multiset in any order), which "
    "is why the checked output is the group max, not the trace. One "
    "shuffle on the group key; 2 rows per interval.",
)
def intervals_max_concurrent(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    iv = o.select(
        F.col("o_orderpriority").alias("pri"),
        F.col("o_orderdate").alias("s"),
        F.expr(
            "o_orderdate + make_interval(0, 0, 0,"
            " cast(o_orderkey % 30 + 1 as int), 0, 0, 0)"
        ).alias("e"),
    )
    pts = iv.select(
        "pri", F.col("s").alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        iv.select("pri", F.col("e").alias("t"), F.lit(-1).alias("delta"))
    )
    w = (
        Window.partitionBy("pri")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        pts.withColumn("conc", F.sum("delta").over(w))
        .groupBy("pri")
        .agg(F.max("conc").cast("long").alias("max_concurrent"))
    )


@register(
    "agg_group_concat",
    oracle="""
        SELECT o_orderstatus,
               string_agg(DISTINCT o_orderpriority, ','
                          ORDER BY o_orderpriority) AS priorities
        FROM orders GROUP BY o_orderstatus
    """,
    doc="groupArray → arrayStringConcat (ANSI LISTAGG / string_agg): "
    "the distinct priorities seen per order status, joined "
    "comma-separated in SORTED order — the sort is the determinism "
    "contract (an unsorted LISTAGG is partition-order-dependent and "
    "would never hash-match). Spark plans collect_set as a two-phase "
    "aggregate (partial sets merge map-side), then array_sort + "
    "array_join run driver-free on the final rows; safe whenever the "
    "per-group distinct set is bounded (here: 5 values) — the same "
    "vocabulary-bound argument as dict_encode_lowcard.",
)
def agg_group_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.array_join(
            F.array_sort(F.collect_set("o_orderpriority")), ","
        ).alias("priorities")
    )


@register(
    "intervals_peak_position",
    oracle="""
        WITH iv AS (
            SELECT o_orderpriority AS pri,
                   o_orderdate AS s,
                   o_orderdate + INTERVAL (o_orderkey % 30 + 1) DAY AS e
            FROM orders
        ), pts AS (
            SELECT pri, s AS t, 1 AS delta FROM iv
            UNION ALL
            SELECT pri, e AS t, -1 AS delta FROM iv
        ), net AS (
            SELECT pri, t, CAST(SUM(delta) AS BIGINT) AS net
            FROM pts GROUP BY pri, t
        ), run AS (
            SELECT pri, t,
                   CAST(SUM(net) OVER (PARTITION BY pri ORDER BY t
                        ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS conc
            FROM net
        ), ranked AS (
            SELECT pri, t, conc,
                   ROW_NUMBER() OVER (PARTITION BY pri
                       ORDER BY conc DESC, t) AS rn
            FROM run
        )
        SELECT pri, conc AS max_concurrent,
               strftime(t, '%Y-%m-%d') AS first_peak_day
        FROM ranked WHERE rn = 1
    """,
    doc="ClickHouse maxIntersectionsPosition — the WHERE of "
    "intervals_max_concurrent's WHAT: the earliest timestamp at "
    "which peak concurrency is reached, per priority class. Unlike "
    "the raw sweep trace (whose per-row prefix values under "
    "same-instant ties are order-dependent, as the sibling key's doc "
    "notes), the deltas are pre-aggregated to NET change per "
    "DISTINCT timestamp first, so conc(t) is a function of t alone "
    "and argmax under the (conc DESC, t) total order is fully "
    "deterministic. Plan: interval explode (2 rows each) -> "
    "(pri, t) hash agg -> one window over the distinct-timestamp "
    "table (bounded by the date domain, not the row count).",
)
def intervals_peak_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    iv = o.select(
        F.col("o_orderpriority").alias("pri"),
        F.col("o_orderdate").alias("s"),
        F.expr(
            "o_orderdate + make_interval(0, 0, 0,"
            " cast(o_orderkey % 30 + 1 as int), 0, 0, 0)"
        ).alias("e"),
    )
    pts = iv.select(
        "pri", F.col("s").alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        iv.select("pri", F.col("e").alias("t"), F.lit(-1).alias("delta"))
    )
    net = pts.groupBy("pri", "t").agg(F.sum("delta").cast("long").alias("net"))
    w_run = (
        Window.partitionBy("pri")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = net.withColumn("conc", F.sum("net").over(w_run).cast("long"))
    w_rank = Window.partitionBy("pri").orderBy(F.col("conc").desc(), "t")
    return (
        run.withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") == 1)
        .select(
            "pri",
            F.col("conc").alias("max_concurrent"),
            F.date_format("t", "yyyy-MM-dd").alias("first_peak_day"),
        )
    )


@register(
    "str_has_subsequence",
    oracle="""
        WITH probe AS (
            SELECT p_partkey, p_name,
                   strpos(p_name, 'e') AS p1
            FROM part
        ), step2 AS (
            SELECT p_partkey, p_name, p1,
                   CASE WHEN p1 > 0
                        THEN strpos(substr(p_name, p1 + 1), 't') ELSE 0
                   END AS p2
            FROM probe
        )
        SELECT p_partkey,
               CASE WHEN p1 > 0 AND p2 > 0 AND
                    strpos(substr(p_name, p1 + p2 + 1), 'l') > 0
                    THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT)
               END AS has_etl
        FROM step2
    """,
    doc="ClickHouse hasSubsequence: do the characters 'e','t','l' "
    "appear in p_name IN ORDER (not necessarily adjacent)? The "
    "greedy leftmost-match chain is optimal for subsequence "
    "existence, so a fixed 3-char needle unrolls to three "
    "position-anchored instr/strpos probes — pure shared string "
    "algebra, identical 1-based semantics in both engines, map-only "
    "plan (0 shuffles). Fixture reality check: 'little egret' style "
    "two-word names give all four outcomes (match, fail at each "
    "stage) across the part vocabulary.",
)
def str_has_subsequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    p1 = F.instr("p_name", "e")
    probe = p.select("p_partkey", "p_name", p1.alias("p1"))
    p2 = F.when(
        F.col("p1") > 0,
        F.instr(F.expr("substr(p_name, p1 + 1)"), "t"),
    ).otherwise(F.lit(0))
    step2 = probe.withColumn("p2", p2)
    p3_hit = (
        (F.col("p1") > 0)
        & (F.col("p2") > 0)
        & (F.instr(F.expr("substr(p_name, p1 + p2 + 1)"), "l") > 0)
    )
    return step2.select(
        "p_partkey",
        F.when(p3_hit, F.lit(1)).otherwise(F.lit(0)).cast("long").alias(
            "has_etl"
        ),
    )
