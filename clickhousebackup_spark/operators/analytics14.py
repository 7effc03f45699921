"""Round-11 additions, batch 2: seasonal index, parquet min/max
pruning, cross-table reconciliation, revenue waterfall, a
hash-deterministic permutation test, and transition lift.

Reference anchor: the reference (backup.sh:38-45) delegates every
query to ClickHouse; these map the reporting ring a restored
warehouse serves — the toMonth seasonal profile, the storage-layout
pruning that makes a 100 TB date-band scan read one file in a
thousand, the orders↔lineitem consistency audit a backup VERIFY
implies, the pricing-column decomposition, the randomization test
beside welch/mannwhitney (ClickHouse's *Test family), and the
Markov-lift view over path_transitions.

House conventions throughout: exact integer cents grids, md5-prefix
portable hashing for anything randomized, permille grids via one
identical double division + floor, NULL guards mirrored in both
engines, total-order tiebreaks.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhousebackup_spark.exprs import DEC
from clickhousebackup_spark.registry import register
from clickhousebackup_spark.tables import load_table


@register(
    "orders_seasonal_index",
    oracle="""
        WITH m AS (
            SELECT CAST(strftime(o_orderdate, '%m') AS BIGINT) AS month,
                   CAST(SUM(CAST(FLOOR(100.0 * o_totalprice) AS BIGINT))
                        AS BIGINT) AS month_cents,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders GROUP BY strftime(o_orderdate, '%m')
        ), t AS (
            SELECT CAST(SUM(month_cents) AS BIGINT) AS total_cents FROM m
        )
        SELECT month, month_cents, n_orders,
               CAST(FLOOR(1000.0 * 12.0 * month_cents / total_cents)
                    AS BIGINT) AS seasonal_index_permille
        FROM m CROSS JOIN t
    """,
    doc="Monthly seasonal index (ClickHouse toMonth reporting "
    "staple): month revenue vs the flat 1/12 share, on the permille "
    "grid — index 1000 = exactly average month. Exact integer cents "
    "per month, one grand-total frame crossed back (1-row broadcast, "
    "pinned NLJ), the index as ONE identical double division then "
    "floor. Plan: one map-side-combined month agg (<=12 groups) + a "
    "1-row total; nothing row-scaled leaves the first agg.",
)
def orders_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.lit(100.0) * F.col("o_totalprice")).cast("long")
    m = o.groupBy(
        F.date_format("o_orderdate", "MM").cast("long").alias("month")
    ).agg(
        F.sum(cents).cast("long").alias("month_cents"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
    )
    t = m.agg(F.sum("month_cents").cast("long").alias("total_cents"))
    return m.crossJoin(F.broadcast(t)).select(
        "month",
        "month_cents",
        "n_orders",
        F.floor(
            F.lit(1000.0)
            * F.lit(12.0)
            * F.col("month_cents")
            / F.col("total_cents")
        )
        .cast("long")
        .alias("seasonal_index_permille"),
    )


@register(
    "scan_minmax_pruned",
    oracle="""
        SELECT o_orderkey, o_custkey,
               strftime(o_orderdate, '%Y-%m-%d') AS order_day
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1996-02-01'
    """,
    doc="Parquet min/max statistics pruning — the file/row-group-"
    "grain sibling of scan_partition_pruned (which prunes DIRECTORY "
    "partitions): orders is rewritten range-partitioned AND sorted "
    "on o_orderdate (repartitionByRange + sortWithinPartitions — the "
    "zorder_layout recipe for one dimension), so each parquet file "
    "covers a disjoint date band and a one-month filter reads ~1 of "
    "8 files via footer min/max stats, never touching the rest. At "
    "100 TB this is the difference between a 30 s and an 8 h "
    "date-band scan when the table is NOT directory-partitioned on "
    "the filter column. tests/test_determinism_r13.py asserts the "
    "filter is PUSHED (PushedFilters in the scan node) and that the "
    "pruned scan reads fewer rows than the table "
    "(numOutputRows metric). Rewrite goes through the shared-scratch "
    "path (cluster-safe); deterministic layout -> safe reuse.",
)
def scan_minmax_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhousebackup_spark.scratch import input_fingerprint, scratch_path

    fp = input_fingerprint(os.path.join(sf_dir, "orders.parquet"))
    path = scratch_path(spark, f"minmax_layout_{fp}", sf_dir)
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        (
            load_table(spark, sf_dir, "orders")
            .select("o_orderkey", "o_custkey", "o_orderdate")
            .repartitionByRange(8, "o_orderdate")
            .sortWithinPartitions("o_orderdate")
            .write.mode("overwrite")
            .parquet(path)
        )
    return (
        spark.read.parquet(path)
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-02-01").cast("timestamp"))
        )
        .select(
            "o_orderkey",
            "o_custkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
        )
    )


@register(
    "dq_orders_lineitem_reconcile",
    oracle="""
        WITH l AS (
            SELECT l_orderkey,
                   CAST(SUM(CAST(FLOOR(100.0 * (l_extendedprice
                        * (1.0 - l_discount))) AS BIGINT)) AS BIGINT)
                       AS line_cents
            FROM lineitem GROUP BY l_orderkey
        ), j AS (
            SELECT o.o_orderkey,
                   CAST(FLOOR(100.0 * o.o_totalprice) AS BIGINT)
                       AS order_cents,
                   l.line_cents
            FROM orders o LEFT JOIN l ON o.o_orderkey = l.l_orderkey
        ), orphan AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_orphan_lines
            FROM l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderkey IS NULL
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(COUNT(*) FILTER (WHERE line_cents IS NULL) AS BIGINT)
                   AS n_orders_no_lines,
               CAST(COUNT(*) FILTER (WHERE line_cents = order_cents)
                    AS BIGINT) AS n_exact,
               CAST(COUNT(*) FILTER (WHERE line_cents IS NOT NULL
                    AND line_cents <> order_cents
                    AND CAST(abs(line_cents - order_cents) AS HUGEINT)
                        * 100 <= CAST(order_cents AS HUGEINT)) AS BIGINT)
                   AS n_within_1pct,
               CAST(COUNT(*) FILTER (WHERE line_cents IS NOT NULL
                    AND CAST(abs(line_cents - order_cents) AS HUGEINT)
                        * 100 > CAST(order_cents AS HUGEINT)) AS BIGINT)
                   AS n_beyond_1pct,
               (SELECT n_orphan_lines FROM orphan) AS n_orphan_lines
        FROM j
    """,
    doc="Cross-table reconciliation audit (the consistency check a "
    "backup VERIFY implies, one ring beyond dq_referential_"
    "integrity's key containment): per order, the lineitem-derived "
    "discounted total vs the stored o_totalprice, both on the exact "
    "cents grid, banded into exact match / within 1% / beyond, plus "
    "the two structural defects (orders with no lines, orphan "
    "lines). The 1% band cross-multiplies in HUGEINT/DECIMAL(38,0) — "
    "no division, closed on the left. One lineitem agg + one "
    "broadcast-eligible join + counting: the shape survives any "
    "scale because nothing after the first agg is row-scaled in "
    "lineitem.",
)
def dq_orders_lineitem_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    line_cents = F.floor(
        F.lit(100.0)
        * (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
    ).cast("long")
    l_agg = li.groupBy("l_orderkey").agg(
        F.sum(line_cents).cast("long").alias("line_cents")
    )
    j = o.select(
        "o_orderkey",
        F.floor(F.lit(100.0) * F.col("o_totalprice"))
        .cast("long")
        .alias("order_cents"),
    ).join(l_agg, F.col("o_orderkey") == F.col("l_orderkey"), "left")
    diff = F.abs(F.col("line_cents") - F.col("order_cents")).cast(
        "decimal(38,0)"
    ) * F.lit(100)
    oc_h = F.col("order_cents").cast("decimal(38,0)")
    have = F.col("line_cents").isNotNull()
    stats = j.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.count(F.when(~have, 1)).cast("long").alias("n_orders_no_lines"),
        F.count(F.when(F.col("line_cents") == F.col("order_cents"), 1))
        .cast("long")
        .alias("n_exact"),
        F.count(
            F.when(
                have
                & (F.col("line_cents") != F.col("order_cents"))
                & (diff <= oc_h),
                1,
            )
        )
        .cast("long")
        .alias("n_within_1pct"),
        F.count(F.when(have & (diff > oc_h), 1))
        .cast("long")
        .alias("n_beyond_1pct"),
    )
    orphan = l_agg.join(
        o.select("o_orderkey"),
        F.col("l_orderkey") == F.col("o_orderkey"),
        "left_anti",
    ).agg(F.count(F.lit(1)).cast("long").alias("n_orphan_lines"))
    return stats.crossJoin(F.broadcast(orphan))


@register(
    "lineitem_revenue_waterfall",
    oracle="""
        SELECT
            CAST(SUM(CAST(FLOOR(100.0 * l_extendedprice) AS BIGINT))
                 AS BIGINT) AS gross_cents,
            CAST(SUM(CAST(FLOOR(100.0 * (l_extendedprice * l_discount))
                 AS BIGINT)) AS BIGINT) AS discount_cents,
            CAST(SUM(CAST(FLOOR(100.0 * l_extendedprice) AS BIGINT))
                 - SUM(CAST(FLOOR(100.0 * (l_extendedprice * l_discount))
                 AS BIGINT)) AS BIGINT) AS net_cents,
            CAST(SUM(CAST(FLOOR(100.0 * ((l_extendedprice
                 * (1.0 - l_discount)) * l_tax)) AS BIGINT)) AS BIGINT)
                AS tax_cents,
            CAST(SUM(CAST(FLOOR(100.0 * l_extendedprice) AS BIGINT))
                 - SUM(CAST(FLOOR(100.0 * (l_extendedprice * l_discount))
                 AS BIGINT))
                 + SUM(CAST(FLOOR(100.0 * ((l_extendedprice
                 * (1.0 - l_discount)) * l_tax)) AS BIGINT)) AS BIGINT)
                AS charged_cents
        FROM lineitem
    """,
    doc="Pricing waterfall over lineitem (the Q1 pricing-summary "
    "decomposition as a single global report): gross -> discount -> "
    "net -> tax -> charged, every term floored to cents BEFORE "
    "summation so each stage is an exact BIGINT and the stages "
    "reconcile by integer arithmetic (net = gross - discount, "
    "charged = net + tax, by construction). The inner double chains "
    "(price*disc, (price*(1-disc))*tax) are 1-2 IEEE multiplies of "
    "raw stored doubles with matching parenthesization — correctly "
    "rounded identically in both engines, per the registry "
    "convention. Plan: ONE map-side-combined global agg, zero "
    "joins, zero windows.",
)
def lineitem_revenue_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p, d, t = F.col("l_extendedprice"), F.col("l_discount"), F.col("l_tax")
    gross = F.sum(F.floor(F.lit(100.0) * p).cast("long")).cast("long")
    disc = F.sum(F.floor(F.lit(100.0) * (p * d)).cast("long")).cast("long")
    tax = F.sum(
        F.floor(F.lit(100.0) * ((p * (F.lit(1.0) - d)) * t)).cast("long")
    ).cast("long")
    return li.agg(
        gross.alias("gross_cents"),
        disc.alias("discount_cents"),
        (gross - disc).cast("long").alias("net_cents"),
        tax.alias("tax_cents"),
        (gross - disc + tax).cast("long").alias("charged_cents"),
    )


@register(
    "stats_permutation_test_hash",
    oracle="""
        WITH ev AS (
            SELECT event_id, event_type, value FROM events
            WHERE event_type IN ('click', 'view')
        ), obs AS (
            SELECT
                CAST(COUNT(*) FILTER (WHERE event_type = 'click')
                     AS BIGINT) AS n_click,
                CAST(COUNT(*) FILTER (WHERE event_type = 'view')
                     AS BIGINT) AS n_view,
                CAST(SUM(CAST(value AS DECIMAL(38,6)))
                     FILTER (WHERE event_type = 'click') AS DOUBLE)
                    / CAST(COUNT(*) FILTER (WHERE event_type = 'click')
                           AS DOUBLE)
                - CAST(SUM(CAST(value AS DECIMAL(38,6)))
                     FILTER (WHERE event_type = 'view') AS DOUBLE)
                    / CAST(COUNT(*) FILTER (WHERE event_type = 'view')
                           AS DOUBLE) AS obs_diff
            FROM ev
        ), perm AS (
            SELECT b.b,
                   CAST(CONCAT('0x', substr(md5(CAST(ev.event_id AS
                        VARCHAR) || '_' || CAST(b.b AS VARCHAR)), 1, 15))
                        AS BIGINT) % 2 AS side,
                   ev.value
            FROM ev CROSS JOIN (SELECT unnest(range(0, 64)) AS b) b
        ), pstat AS (
            SELECT b,
                   CAST(COUNT(*) FILTER (WHERE side = 0) AS BIGINT) AS n0,
                   CAST(COUNT(*) FILTER (WHERE side = 1) AS BIGINT) AS n1,
                   CAST(SUM(CAST(value AS DECIMAL(38,6)))
                        FILTER (WHERE side = 0) AS DOUBLE) AS s0,
                   CAST(SUM(CAST(value AS DECIMAL(38,6)))
                        FILTER (WHERE side = 1) AS DOUBLE) AS s1
            FROM perm GROUP BY b
        )
        SELECT obs.n_click, obs.n_view, obs.obs_diff,
               CAST(64 AS BIGINT) AS b_total,
               CAST(COUNT(*) FILTER (WHERE n0 > 0 AND n1 > 0
                    AND abs(s0 / n0 - s1 / n1) >= abs(obs.obs_diff))
                    AS BIGINT) AS n_exceed,
               (1.0 + COUNT(*) FILTER (WHERE n0 > 0 AND n1 > 0
                    AND abs(s0 / n0 - s1 / n1) >= abs(obs.obs_diff)))
                   / 65.0 AS p_value
        FROM pstat CROSS JOIN obs
        GROUP BY obs.n_click, obs.n_view, obs.obs_diff
    """,
    doc="Hash-deterministic two-sample permutation test (the "
    "randomization sibling of stats_welch_ttest / "
    "stats_mannwhitney_u): 64 Monte-Carlo relabelings of click-vs-"
    "view, each row's side drawn from the PORTABLE md5-prefix grid "
    "(conv(substr(md5(event_id||'_'||b),1,15),16,10) % 2 — the "
    "text_minhash_export convention), statistic |mean0 - mean1| "
    "from decimal-exact sums, p = (1 + #exceed)/(B + 1) with the "
    "add-one estimator. Both engines draw IDENTICAL permutations, "
    "so the p-value is exact-checkable — the property no "
    "rand()-based test has. Plan: the 64x explode is map-side "
    "(constant fan-out, no shuffle growth beyond the one pstat agg "
    "over 64 groups), observed stats ride a 1-row broadcast frame.",
)
def stats_permutation_test_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Fan out the single-row-group fixture scan BEFORE the 64× explode:
    # each surviving event row pays 64 md5+conv evaluations, and on the
    # one-task scan that whole Monte-Carlo grid ran on 1 of 32 cores
    # (measured 4.7 s → 1.0 s at sf0.1). Round-robin is right here —
    # the permutation buckets (b) don't exist before the explode, and
    # the pstat aggregate is map-side-combinable either way. No-op at
    # production file counts (tables.parallelize).
    from clickhousebackup_spark.tables import parallelize

    ev = parallelize(
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "view"))
        .select("event_id", "event_type", "value")
    )
    v_dec = F.col("value").cast(DEC)
    is_c = F.col("event_type") == "click"
    obs = ev.agg(
        F.count(F.when(is_c, 1)).cast("long").alias("n_click"),
        F.count(F.when(~is_c, 1)).cast("long").alias("n_view"),
        (
            F.sum(F.when(is_c, v_dec)).cast("double")
            / F.count(F.when(is_c, 1)).cast("double")
            - F.sum(F.when(~is_c, v_dec)).cast("double")
            / F.count(F.when(~is_c, 1)).cast("double")
        ).alias("obs_diff"),
    )
    perm = ev.withColumn(
        "b", F.explode(F.sequence(F.lit(0), F.lit(63)))
    ).select(
        "b",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "_",
                            F.col("event_id").cast("string"),
                            F.col("b").cast("string"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % 2
        ).alias("side"),
        "value",
    )
    side0 = F.col("side") == 0
    pstat = perm.groupBy("b").agg(
        F.count(F.when(side0, 1)).cast("long").alias("n0"),
        F.count(F.when(~side0, 1)).cast("long").alias("n1"),
        F.sum(F.when(side0, v_dec)).cast("double").alias("s0"),
        F.sum(F.when(~side0, v_dec)).cast("double").alias("s1"),
    )
    joined = pstat.crossJoin(F.broadcast(obs))
    exceed = (
        (F.col("n0") > 0)
        & (F.col("n1") > 0)
        & (
            F.abs(F.col("s0") / F.col("n0") - F.col("s1") / F.col("n1"))
            >= F.abs(F.col("obs_diff"))
        )
    )
    return joined.groupBy("n_click", "n_view", "obs_diff").agg(
        F.lit(64).cast("long").alias("b_total"),
        F.count(F.when(exceed, 1)).cast("long").alias("n_exceed"),
        (
            (F.lit(1.0) + F.count(F.when(exceed, 1)).cast("double"))
            / F.lit(65.0)
        ).alias("p_value"),
    ).select(
        "n_click", "n_view", "obs_diff", "b_total", "n_exceed", "p_value"
    )


@register(
    "path_transition_lift",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   LAG(event_type) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS prev_type
            FROM events
        ), tr AS (
            SELECT prev_type AS src, event_type AS dst,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM seq WHERE prev_type IS NOT NULL
            GROUP BY prev_type, event_type
        ), marg AS (
            SELECT src, dst, cnt,
                   CAST(SUM(cnt) OVER (PARTITION BY src) AS BIGINT)
                       AS src_total,
                   CAST(SUM(cnt) OVER (PARTITION BY dst) AS BIGINT)
                       AS dst_total,
                   CAST(SUM(cnt) OVER () AS BIGINT) AS grand_total
            FROM tr
        )
        SELECT src, dst, cnt, src_total, dst_total,
               CAST(FLOOR(1000.0 * cnt * grand_total
                    / (CAST(src_total AS DOUBLE) * dst_total))
                    AS BIGINT) AS lift_permille
        FROM marg
    """,
    doc="Transition lift — the statistical layer over "
    "path_transitions: observed A->B transition count vs the "
    "independence expectation src_total*dst_total/grand_total, on "
    "the permille grid (1000 = independent, >1000 = attraction). "
    "All counts are exact BIGINTs; the lift is ONE identical double "
    "expression (1000*cnt*T with exact <2^53 integer products, "
    "divided by src*dst) then floor. The marginals come from windows "
    "over the |types|^2-bounded transition MATRIX, never the event "
    "stream — the only row-scaled stage is the lag+count, one "
    "user_id exchange + one hash agg.",
)
def path_transition_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    tr = seq.groupBy(
        F.col("prev_type").alias("src"), F.col("event_type").alias("dst")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    ws = Window.partitionBy("src")
    wd = Window.partitionBy("dst")
    wg = Window.partitionBy()
    marg = tr.select(
        "src",
        "dst",
        "cnt",
        F.sum("cnt").over(ws).cast("long").alias("src_total"),
        F.sum("cnt").over(wd).cast("long").alias("dst_total"),
        F.sum("cnt").over(wg).cast("long").alias("grand_total"),
    )
    return marg.select(
        "src",
        "dst",
        "cnt",
        "src_total",
        "dst_total",
        F.floor(
            F.lit(1000.0)
            * F.col("cnt")
            * F.col("grand_total")
            / (F.col("src_total").cast("double") * F.col("dst_total"))
        )
        .cast("long")
        .alias("lift_permille"),
    )


@register(
    "scan_bloom_filter_lookup",
    oracle="""
        SELECT o_orderkey, o_custkey,
               CAST(FLOOR(100.0 * o_totalprice) AS BIGINT) AS price_cents
        FROM orders WHERE o_custkey IN (7, 11, 13)
    """,
    doc="Parquet BLOOM-FILTER point lookup — the third pruning "
    "mechanism beside directory partitions (scan_partition_pruned) "
    "and min/max footer stats (scan_minmax_pruned), and the only one "
    "that works on a HIGH-CARDINALITY column the file is NOT sorted "
    "or partitioned by: orders is rewritten with "
    "parquet.bloom.filter.enabled#o_custkey (sized by expected NDV), "
    "and a customer point-IN lookup reads back through the bloom-"
    "aware reader — parquet-mr consults the per-row-group bloom "
    "before decoding pages, so at 100 TB a needle query skips the "
    "row groups min/max can never exclude (custkey is uniform across "
    "every file). The bloom's existence is footer-ASSERTED in "
    "tests/test_determinism_r14.py (bloom offset present for "
    "o_custkey, absent for unindexed columns) — the option cannot "
    "silently rot. Rewrite goes through fingerprint-keyed shared "
    "scratch like scan_minmax_pruned.",
)
def scan_bloom_filter_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhousebackup_spark.scratch import input_fingerprint, scratch_path

    fp = input_fingerprint(os.path.join(sf_dir, "orders.parquet"))
    path = scratch_path(spark, f"bloom_layout_{fp}", sf_dir)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (
            load_table(spark, sf_dir, "orders")
            .select("o_orderkey", "o_custkey", "o_totalprice")
            .write.mode("overwrite")
            .option("parquet.bloom.filter.enabled#o_custkey", "true")
            .option("parquet.bloom.filter.expected.ndv#o_custkey", "200000")
            # parquet-mr DROPS the bloom for fully dictionary-encoded
            # chunks (the dictionary already is an exact filter); the
            # small fixture custkey domain dictionary-encodes, so
            # disable dictionary to reproduce the high-NDV regime —
            # which is precisely the regime where blooms matter at
            # 100 TB (the domain no longer fits a dictionary page)
            .option("parquet.enable.dictionary", "false")
            .parquet(path)
        )
    return (
        spark.read.parquet(path)
        .filter(F.col("o_custkey").isin(7, 11, 13))
        .select(
            "o_orderkey",
            "o_custkey",
            F.floor(F.lit(100.0) * F.col("o_totalprice"))
            .cast("long")
            .alias("price_cents"),
        )
    )
