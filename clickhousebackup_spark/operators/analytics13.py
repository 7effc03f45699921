"""Round-11 additions: Kruskal-Wallis rank test, ABC revenue
classification, TF-IDF term extraction, rolling regression slope,
GROUPS-frame window emulation, and peak-hour selection.

Reference anchor: the reference (backup.sh:38-45) delegates every
query to ClickHouse; these map the next analytics ring — the
``kruskalWallisTest`` family neighbor of the shipped rank tests, the
Pareto/ABC report every revenue dashboard runs over a restored orders
table, keyword extraction over the documents corpus, the rolling
trend estimator next to ``ts_holt_linear``, ClickHouse/ANSI GROUPS
window frames (Spark has no GROUPS mode — emulated, and the oracle
cross-checks the emulation against DuckDB's NATIVE GROUPS frame), and
argMax-by-count-with-tiebreak hour profiling.

House conventions throughout: exact integer/decimal state wherever a
sum crosses rows, ordered folds for the one order-sensitive double
reduction (stats_anova_oneway precedent), global ranks via the
two-pass distrank scan (never an unpartitioned window over row-scaled
input), >int64 exact quantities emitted DECIMAL(38,0)->VARCHAR
(stats_mean_ci precedent), selection-only tiebreaks as total orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhousebackup_spark.exprs import DEC
from clickhousebackup_spark.operators.distrank import global_order_scan
from clickhousebackup_spark.registry import register
from clickhousebackup_spark.tables import load_table, parallelize


@register(
    "stats_kruskal_wallis",
    oracle="""
        WITH vt AS (
            SELECT value, CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY value
        ), vr AS (
            SELECT value, c,
                   CAST(SUM(c) OVER (ORDER BY value) AS BIGINT) AS cle
            FROM vt
        ), gt AS (
            SELECT value, event_type, CAST(COUNT(*) AS BIGINT) AS cg
            FROM events GROUP BY value, event_type
        ), g AS (
            SELECT event_type,
                   CAST(SUM(cg) AS BIGINT) AS n_g,
                   CAST(SUM(cg * (2 * vr.cle - vr.c + 1)) AS BIGINT) AS s2
            FROM gt JOIN vr USING (value) GROUP BY event_type
        ), t AS (
            SELECT CAST(SUM(n_g) AS BIGINT) AS n,
                   CAST(COUNT(*) AS BIGINT) AS k,
                   list_reduce(
                       list_prepend(CAST(0 AS DOUBLE),
                           list(CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
                                / 4.0 / CAST(n_g AS DOUBLE)
                                ORDER BY event_type)),
                       (a, b) -> a + b) AS ssq
            FROM g
        ), tie AS (
            SELECT SUM(CAST(c AS HUGEINT) * c * c - c) AS tie_h FROM vt
        )
        SELECT n, k,
               CAST(tie.tie_h AS VARCHAR) AS tie_sum,
               12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)) * ssq
                   - 3.0 * (CAST(n AS DOUBLE) + 1.0) AS h_stat,
               CASE WHEN 1.0 - CAST(tie.tie_h AS DOUBLE)
                        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                           * CAST(n AS DOUBLE) - CAST(n AS DOUBLE))
                        > 0.0
                    THEN (12.0 / (CAST(n AS DOUBLE)
                              * (CAST(n AS DOUBLE) + 1.0)) * ssq
                          - 3.0 * (CAST(n AS DOUBLE) + 1.0))
                         / (1.0 - CAST(tie.tie_h AS DOUBLE)
                            / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                               * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)))
               END AS h_adjusted
        FROM t CROSS JOIN tie
    """,
    doc="Kruskal-Wallis one-way rank test of events.value across "
    "event types (ClickHouse kruskalWallisTest): H with the tie "
    "correction C = 1 - SUM(t^3-t)/(N^3-N). Midranks are kept exact "
    "as DOUBLE-RANKS d = 2*cnt_lt + c + 1 (always integer, no .5 "
    "cells): the distinct-value table gets its global cumulative "
    "count from the two-pass distrank scan (a ~|distinct values| "
    "range exchange — never an unpartitioned window over row-scaled "
    "input, which the DuckDB oracle, single-node by nature, is free "
    "to use), per-group double-rank sums S2_j are exact BIGINTs, the "
    "one order-sensitive reduction (sum over groups of S2^2/4/n) is "
    "an explicit event_type-ordered fold (stats_anova_oneway "
    "precedent), and SUM(t^3-t) crosses int64 near 2M-row tie groups "
    "so it is emitted DECIMAL(38,0)->VARCHAR. Plan: two hash aggs "
    "over the value domain + range scan + one join — all mergeable "
    "states, no row-grain window.",
)
def stats_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    vt = e.groupBy("value").agg(F.count(F.lit(1)).cast("long").alias("c"))
    vr = global_order_scan(
        vt, [F.col("value")], cumsum={"cle": F.col("c")}
    ).select("value", "c", "cle")
    gt = e.groupBy("value", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("cg")
    )
    g = (
        gt.join(vr, "value")
        .groupBy("event_type")
        .agg(
            F.sum("cg").cast("long").alias("n_g"),
            F.sum(
                F.col("cg")
                * (F.lit(2) * F.col("cle") - F.col("c") + F.lit(1))
            )
            .cast("long")
            .alias("s2"),
        )
    )
    t = g.agg(
        F.sum("n_g").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("event_type"),
                        (
                            F.col("s2").cast("double")
                            * F.col("s2").cast("double")
                            / F.lit(4.0)
                            / F.col("n_g").cast("double")
                        ).alias("term"),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["term"],
        ).alias("ssq"),
    )
    c_dec = F.col("c").cast("decimal(38,0)")
    tie = vt.agg((F.sum(c_dec * c_dec * c_dec - c_dec)).alias("tie_h"))
    n_d = F.col("n").cast("double")
    h_raw = (
        F.lit(12.0) / (n_d * (n_d + F.lit(1.0))) * F.col("ssq")
        - F.lit(3.0) * (n_d + F.lit(1.0))
    )
    c_corr = F.lit(1.0) - F.col("tie_h").cast("double") / (
        n_d * n_d * n_d - n_d
    )
    return t.crossJoin(F.broadcast(tie)).select(
        "n",
        "k",
        F.col("tie_h").cast("string").alias("tie_sum"),
        h_raw.alias("h_stat"),
        F.when(c_corr > F.lit(0.0), h_raw / c_corr).alias("h_adjusted"),
    )


@register(
    "orders_abc_analysis",
    oracle="""
        WITH cust AS (
            SELECT o_custkey,
                   CAST(SUM(CAST(FLOOR(100.0 * o_totalprice) AS BIGINT))
                        AS BIGINT) AS rev_cents
            FROM orders GROUP BY o_custkey
        ), r AS (
            SELECT o_custkey, rev_cents,
                   CAST(SUM(rev_cents) OVER (
                        ORDER BY rev_cents DESC, o_custkey) AS BIGINT)
                       AS cum_cents,
                   CAST(SUM(rev_cents) OVER () AS BIGINT) AS total_cents
            FROM cust
        )
        SELECT o_custkey, rev_cents, cum_cents,
               CASE WHEN CAST(cum_cents AS HUGEINT) * 1000
                         <= CAST(total_cents AS HUGEINT) * 700 THEN 'A'
                    WHEN CAST(cum_cents AS HUGEINT) * 1000
                         <= CAST(total_cents AS HUGEINT) * 900 THEN 'B'
                    ELSE 'C' END AS abc_class
        FROM r
    """,
    doc="ABC (Pareto-band) customer classification: customers sorted "
    "by revenue desc, class A while cumulative revenue <= 70% of "
    "total, B to 90%, C after — the inventory-analysis sibling of "
    "orders_pareto_8020. Revenue is exact integer cents "
    "(floor(100*price) per order, BIGINT sums), the global running "
    "total comes from the two-pass distrank scan over the "
    "(rev DESC, custkey) total order (the DuckDB oracle states the "
    "same thing as its single-node cumulative window), and the band "
    "predicates cross-multiply in DECIMAL(38,0)/HUGEINT so no "
    "division or float share ever enters the comparison (1000*cum "
    "would pass int64 at ~1e16 total cents). Plan: one customer agg "
    "+ one range exchange; class boundaries are closed on the left "
    "band (<=), pinned by the crafted boundary fixture.",
)
def orders_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.sum(F.floor(F.lit(100.0) * F.col("o_totalprice")).cast("long"))
        .cast("long")
        .alias("rev_cents")
    )
    r = global_order_scan(
        cust,
        [F.col("rev_cents").desc(), F.col("o_custkey")],
        cumsum={"cum_cents": F.col("rev_cents")},
        totals={"total_cents": F.col("rev_cents")},
    )
    cum_h = F.col("cum_cents").cast("decimal(38,0)") * F.lit(1000)
    tot_h = F.col("total_cents").cast("decimal(38,0)")
    return r.select(
        "o_custkey",
        "rev_cents",
        F.col("cum_cents").cast("long").alias("cum_cents"),
        F.when(cum_h <= tot_h * F.lit(700), F.lit("A"))
        .when(cum_h <= tot_h * F.lit(900), F.lit("B"))
        .otherwise(F.lit("C"))
        .alias("abc_class"),
    )


@register(
    "text_tfidf_topk",
    oracle="""
        WITH toks AS (
            SELECT doc_id, unnest(list_filter(
                       string_split_regex(lower(text), '\\s+'),
                       x -> x <> '')) AS term
            FROM documents
        ), tf AS (
            SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
            FROM toks GROUP BY doc_id, term
        ), df AS (
            SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf
            GROUP BY term
        ), scored AS (
            SELECT tf.doc_id, tf.term, tf.tf, df.df,
                   CAST(tf.tf * (1000000 // df.df) AS BIGINT) AS score,
                   ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                       ORDER BY tf.tf * (1000000 // df.df) DESC, tf.term)
                       AS rk
            FROM tf JOIN df USING (term)
        )
        SELECT doc_id, term, tf, df, score, CAST(rk AS BIGINT) AS rk
        FROM scored WHERE rk <= 3
    """,
    doc="TF-IDF keyword extraction: per document, the top-3 terms by "
    "tf * idf on the integer grid idf = 1000000 // df (the "
    "text_rarity_score convention — integer scores are order-free "
    "and tie-comparable exactly; a log-idf would hit cross-engine "
    "libm differences). Deterministic under the (score DESC, term) "
    "total order. Plan: tokenize-explode (map-side), two hash aggs "
    "(term frequency per doc, document frequency per term), one "
    "equi-join on term, one doc_id-partitioned row_number — every "
    "stage mergeable or key-partitioned; df skew (stopwords) is "
    "absorbed by the two-phase agg, and the join's term key is the "
    "post-agg DISTINCT term domain, not the token stream.",
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = parallelize(load_table(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "")
        ).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    score = (
        F.col("tf") * F.floor(F.lit(1000000) / F.col("df")).cast("long")
    ).cast("long")
    w = Window.partitionBy("doc_id").orderBy(
        score.desc(), F.col("term")
    )
    return (
        tf.join(df, "term")
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            score.alias("score"),
            F.row_number().over(w).cast("long").alias("rk"),
        )
        .filter(F.col("rk") <= 3)
    )


@register(
    "ts_rolling_slope",
    oracle="""
        WITH p AS (
            SELECT user_id, event_id, value,
                   CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS BIGINT) AS pos
            FROM events
        ), s AS (
            SELECT user_id, event_id, pos,
                   CAST(COUNT(*) OVER w AS BIGINT) AS cnt,
                   CAST(SUM(pos) OVER w AS BIGINT) AS sx,
                   CAST(SUM(pos * pos) OVER w AS BIGINT) AS sxx,
                   CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w
                        AS DOUBLE) AS sy,
                   CAST(SUM(CAST(value AS DECIMAL(38,6)) * pos) OVER w
                        AS DOUBLE) AS sxy
            FROM p
            WINDOW w AS (PARTITION BY user_id ORDER BY pos
                         ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
        )
        SELECT user_id, event_id, pos,
               (8.0 * sxy - CAST(sx AS DOUBLE) * sy)
                   / (8.0 * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope
        FROM s WHERE cnt = 8
    """,
    doc="Rolling 8-point OLS slope of value against sequence position "
    "per user (the trend estimator beside ts_holt_linear/"
    "ts_theil_sen_slope): emitted only for full windows, so the "
    "denominator 8*Sxx - Sx^2 is the constant positive k^2(k^2-1)/12 "
    "and needs no guard. Exactness: positions are integers, value "
    "sums and position-weighted sums accumulate in DECIMAL(38,6) "
    "(decimal * integer stays in the decimal domain — never a "
    "computed-double->decimal cast, the round-trip trap), and the "
    "slope is one shared IEEE tree over those exact moments. Plan: "
    "ONE user_id exchange feeding both the row_number and the "
    "four frame sums (same window spec); frame sums are O(1) per row "
    "via the sliding frame, no self-join.",
)
def ts_rolling_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    wp = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = e.select(
        "user_id",
        "event_id",
        "value",
        F.row_number().over(wp).cast("long").alias("pos"),
    )
    w8 = (
        Window.partitionBy("user_id")
        .orderBy("pos")
        .rowsBetween(-7, Window.currentRow)
    )
    v_dec = F.col("value").cast(DEC)
    s = p.select(
        "user_id",
        "event_id",
        "pos",
        F.count(F.lit(1)).over(w8).alias("cnt"),
        F.sum("pos").over(w8).cast("long").alias("sx"),
        F.sum(F.col("pos") * F.col("pos")).over(w8).cast("long").alias("sxx"),
        F.sum(v_dec).over(w8).cast("double").alias("sy"),
        F.sum(v_dec * F.col("pos")).over(w8).cast("double").alias("sxy"),
    )
    sx_d = F.col("sx").cast("double")
    slope = (F.lit(8.0) * F.col("sxy") - sx_d * F.col("sy")) / (
        F.lit(8.0) * F.col("sxx").cast("double") - sx_d * sx_d
    )
    return s.filter(F.col("cnt") == 8).select(
        "user_id", "event_id", "pos", slope.alias("slope")
    )


@register(
    "win_groups_frame_emulated",
    oracle="""
        WITH d AS (
            SELECT event_id, event_type,
                   strftime(ts, '%Y%m%d') AS day,
                   CAST(FLOOR(100.0 * value) AS BIGINT) AS cents
            FROM events
        ), i AS (
            SELECT event_id, event_type, day, cents,
                   CAST(DENSE_RANK() OVER (PARTITION BY event_type
                        ORDER BY day) AS BIGINT) AS di
            FROM d
        )
        SELECT event_id, event_type, day,
               CAST(SUM(cents) OVER (PARTITION BY event_type
                    ORDER BY di RANGE BETWEEN 1 PRECEDING
                    AND 1 FOLLOWING) AS BIGINT) AS grp_cents
        FROM i
    """,
    doc="GROUPS window frame (ANSI / ClickHouse WINDOW ... GROUPS "
    "BETWEEN 1 PRECEDING AND 1 FOLLOWING): every event row carries "
    "the value-cents total of its own DAY plus the adjacent days in "
    "its event_type partition. Spark has no GROUPS frame mode — the "
    "emulation aggregates to (event_type, day) grain, takes a plain "
    "ROWS -1..+1 frame over the day-level table (peer groups "
    "collapse to single rows, making ROWS and GROUPS coincide), and "
    "joins the 3-day total back to the row grain. The ORACLE is an "
    "INDEPENDENT row-grain formulation — dense_rank peer-group index "
    "+ integer RANGE frame, the textbook definition of GROUPS (DuckDB "
    "in this image rejects GROUPS mode too) — so the driver hash "
    "checks two different derivations of the same semantics against "
    "each other. Integer cents (floor(100*value)) keep every sum "
    "exact. Plan: one (event_type, day) agg (map-side combined), a "
    "day-grain window over ~|days| rows, one broadcast-sized join "
    "back — no row-grain window at all on the Spark side.",
)
def win_groups_frame_emulated(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyyMMdd")
    )
    cents = F.floor(F.lit(100.0) * F.col("value")).cast("long")
    daylvl = e.groupBy("event_type", "day").agg(
        F.sum(cents).cast("long").alias("day_cents")
    )
    wd = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-1, 1)
    )
    grp = daylvl.select(
        "event_type",
        "day",
        F.sum("day_cents").over(wd).cast("long").alias("grp_cents"),
    )
    return e.select("event_id", "event_type", "day").join(
        F.broadcast(grp), ["event_type", "day"]
    ).select("event_id", "event_type", "day", "grp_cents")


@register(
    "events_peak_hour",
    oracle="""
        WITH c AS (
            SELECT event_type,
                   CAST(strftime(ts, '%H') AS BIGINT) AS hr,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM events GROUP BY event_type, strftime(ts, '%H')
        ), ranked AS (
            SELECT event_type, hr, cnt,
                   CAST(SUM(cnt) OVER (PARTITION BY event_type)
                        AS BIGINT) AS total,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                       ORDER BY cnt DESC, hr) AS rn
            FROM c
        )
        SELECT event_type, hr AS peak_hour, cnt AS peak_count, total,
               CAST(FLOOR(1000.0 * cnt / total) AS BIGINT)
                   AS share_permille
        FROM ranked WHERE rn = 1
    """,
    doc="Peak-activity hour per event type: the argMax-by-count hour "
    "with the SMALLEST-hour tiebreak (total order (cnt DESC, hr)), "
    "plus its traffic share on the permille grid "
    "(floor(1000*cnt/total) — one identical double division then "
    "floor, both engines). Spark side is two hash aggs and a max_by "
    "over the struct key (cnt, 23-hr) — the descending-count/"
    "ascending-hour order encoded as one lexicographic struct max, "
    "no window over row-scaled data (the 24-row-per-type hour table "
    "is vocabulary-bounded). The hour string is zero-padded in both "
    "engines (date_format 'HH' / strftime '%H') before the int cast.",
)
def events_peak_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    c = e.groupBy(
        "event_type",
        F.date_format("ts", "HH").cast("long").alias("hr"),
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    okey = F.struct(F.col("cnt"), (F.lit(23) - F.col("hr")).alias("inv"))
    g = c.groupBy("event_type").agg(
        F.max_by("hr", okey).alias("peak_hour"),
        F.max_by("cnt", okey).alias("peak_count"),
        F.sum("cnt").cast("long").alias("total"),
    )
    return g.select(
        "event_type",
        "peak_hour",
        "peak_count",
        "total",
        F.floor(
            F.lit(1000.0) * F.col("peak_count") / F.col("total")
        )
        .cast("long")
        .alias("share_permille"),
    )
