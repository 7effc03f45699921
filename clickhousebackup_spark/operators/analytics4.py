"""Round-5 operator additions, batch 2: rank statistics (ROC AUC,
Kolmogorov-Smirnov), robust dispersion (MAD), time-series rate
(boundingRatio), interval-union length, moving-window array folds,
min/max map aggregation, regexp group extraction, and the
sequence-next-node behavioral lookup.

ClickHouse parity targets: arrayAUC, kolmogorovSmirnovTest,
medianExact-based MAD (mad() in most OLAP dialects),
boundingRatio, intervalLengthSum, groupArrayMovingSum,
minMap/maxMap, extractAll, and sequenceNextNode. The reference
(backup.sh:38-45) delegates every one of these to the ClickHouse
server behind one `clickhouse-client --query`; here each is a
first-class distributed DataFrame plan.

Hash-safety notes for this family (registry.py conventions):

- AUC and KS are computed with INTEGER numerators (2·rank-sums and
  count cross-products), so every checked value except the final
  single division is exact — the division itself is one IEEE op on
  identical operands in both engines.
- MAD floor-grids the double column to a 1e-6 integer grid first;
  continuous-quantile interpolation over integer-valued doubles is
  exact (the midpoint of two integers is a dyadic rational).
- Moving sums serialize to CSV over grid integers (the
  agg_sum_map / emb_normalize_quantize driver convention —
  the canonicalizer cannot factorize list cells).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clickhousebackup_spark.operators.distrank import global_order_scan
from clickhousebackup_spark.registry import register
from clickhousebackup_spark.tables import load_table


@register(
    "stats_roc_auc",
    oracle="""
        WITH d AS (
            SELECT value,
                   COUNT(*) FILTER (WHERE event_type = 'click') AS p_at,
                   COUNT(*) FILTER (WHERE event_type = 'view') AS n_at
            FROM events
            WHERE event_type IN ('click', 'view')
            GROUP BY value
        ), c AS (
            SELECT p_at, n_at,
                   COALESCE(SUM(n_at) OVER (
                       ORDER BY value
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS neg_below
            FROM d
        )
        SELECT CAST(SUM(p_at) AS BIGINT) AS n_pos,
               CAST(SUM(n_at) AS BIGINT) AS n_neg,
               CAST(SUM(p_at * (2 * neg_below + n_at)) AS BIGINT)
                   AS auc_num2,
               CAST(SUM(p_at * (2 * neg_below + n_at)) AS DOUBLE)
                   / (2.0 * SUM(p_at) * SUM(n_at)) AS auc
        FROM c
    """,
    doc="ClickHouse arrayAUC: area under the ROC curve of `value` as "
    "a score separating click (positive) from view (negative) rows, "
    "with the standard tie treatment (ties count 1/2). Computed via "
    "the rank identity AUC = P(score_pos > score_neg) + "
    "P(equal)/2: group to the distinct-score histogram, one window "
    "cumsum of negatives below each score, then "
    "sum(p·(2·neg_below + n_at)) — an INTEGER numerator; the only "
    "float op is the final division, identical in both engines. The "
    "cumulative negatives-below-score prefix comes from the two-pass "
    "distributed prefix sum (distrank.global_order_scan — range-"
    "partition on score, local running sum, broadcast partition "
    "offsets), because a continuous score column makes the 'distinct "
    "values' histogram effectively row-scale (66% distinct in the "
    "fixture) — no single-partition window anywhere in the plan.",
)
def stats_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "view"))
        .select("event_type", "value")
    )
    d = ev.groupBy("value").agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("p_at"),
        F.count(F.when(F.col("event_type") == "view", 1)).alias("n_at"),
    )
    c = global_order_scan(
        d, (F.col("value"),), cumsum={"cum_n": F.col("n_at")}
    ).select(
        "p_at",
        "n_at",
        (F.col("cum_n") - F.col("n_at")).alias("neg_below"),
    )
    num2 = F.sum(
        F.col("p_at") * (F.lit(2) * F.col("neg_below") + F.col("n_at"))
    )
    return c.agg(
        F.sum("p_at").cast("long").alias("n_pos"),
        F.sum("n_at").cast("long").alias("n_neg"),
        num2.cast("long").alias("auc_num2"),
        (
            num2.cast("double")
            / (F.lit(2.0) * F.sum("p_at") * F.sum("n_at"))
        ).alias("auc"),
    )


@register(
    "stats_ks_test",
    oracle="""
        WITH d AS (
            SELECT value,
                   COUNT(*) FILTER (WHERE event_type = 'click') AS c1,
                   COUNT(*) FILTER (WHERE event_type = 'view') AS c2
            FROM events
            WHERE event_type IN ('click', 'view')
            GROUP BY value
        ), c AS (
            SELECT SUM(c1) OVER (ORDER BY value
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum1,
                   SUM(c2) OVER (ORDER BY value
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum2,
                   SUM(c1) OVER () AS n1,
                   SUM(c2) OVER () AS n2
            FROM d
        )
        SELECT CAST(MAX(n1) AS BIGINT) AS n_click,
               CAST(MAX(n2) AS BIGINT) AS n_view,
               CAST(MAX(ABS(cum1 * n2 - cum2 * n1)) AS BIGINT) AS ks_num,
               CAST(MAX(ABS(cum1 * n2 - cum2 * n1)) AS DOUBLE)
                   / (1.0 * MAX(n1) * MAX(n2)) AS ks_d
        FROM c
    """,
    doc="ClickHouse kolmogorovSmirnovTest: the two-sample KS "
    "D-statistic between the click and view value distributions. "
    "D = max |ECDF1 - ECDF2| evaluated at the pooled distinct "
    "values; clearing denominators gives the INTEGER numerator "
    "max|cum1·n2 - cum2·n1| — every checked value except the final "
    "division is exact integer arithmetic. Same distributed shape as "
    "stats_roc_auc: one histogram shuffle, then BOTH running ECDFs "
    "and both sample totals come from one two-pass distributed "
    "prefix scan (distrank.global_order_scan — the totals ride the "
    "tiny per-partition summary table, no Window.partitionBy() "
    "global-sum and no single-partition window over the score "
    "histogram, which is row-scale for continuous scores).",
)
def stats_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "view"))
        .select("event_type", "value")
    )
    d = ev.groupBy("value").agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("c1"),
        F.count(F.when(F.col("event_type") == "view", 1)).alias("c2"),
    )
    c = global_order_scan(
        d,
        (F.col("value"),),
        cumsum={"cum1": F.col("c1"), "cum2": F.col("c2")},
        totals={"n1": F.col("c1"), "n2": F.col("c2")},
    ).select("cum1", "cum2", "n1", "n2")
    gap = F.abs(F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1"))
    return c.agg(
        F.max("n1").cast("long").alias("n_click"),
        F.max("n2").cast("long").alias("n_view"),
        F.max(gap).cast("long").alias("ks_num"),
        (
            F.max(gap).cast("double")
            / (F.lit(1.0) * F.max("n1") * F.max("n2"))
        ).alias("ks_d"),
    )


@register(
    "stats_mad",
    oracle="""
        WITH g AS (
            SELECT event_type,
                   CAST(FLOOR(value * 1e6) AS BIGINT) AS v6
            FROM events
        ), m AS (
            SELECT event_type,
                   CAST(quantile_cont(v6, 0.5) AS DOUBLE) AS med6
            FROM g GROUP BY event_type
        )
        SELECT g.event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               MAX(m.med6) AS med6,
               CAST(quantile_cont(ABS(g.v6 - m.med6), 0.5) AS DOUBLE)
                   AS mad6
        FROM g JOIN m ON g.event_type = m.event_type
        GROUP BY g.event_type
    """,
    doc="Median absolute deviation per event type — the robust "
    "dispersion statistic (DuckDB mad(); ClickHouse expresses it as "
    "medianExact over |x - medianExact(x)|). Two exact continuous "
    "quantiles: the per-group median, broadcast-joined back (the "
    "group table is dimension-sized), then the median of absolute "
    "deviations. Values are floor-gridded to the 1e-6 integer grid "
    "first, so the interpolated midpoint of two grid points is a "
    "dyadic rational — bit-identical across engines; raw-double "
    "interpolation would not be (a+(b-a)/2 vs (a+b)/2 differ in the "
    "last ulp). Two shuffles + one broadcast join; exact medians at "
    "100 TB come from the same two-pass distributed selection "
    "agg_percentile_exact uses.",
)
def stats_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * F.lit(1e6)).cast("long").alias("v6"),
    )
    m = g.groupBy("event_type").agg(
        F.percentile("v6", F.lit(0.5)).alias("med6")
    )
    return (
        g.join(F.broadcast(m), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.max("med6").alias("med6"),
            F.percentile(
                F.abs(F.col("v6") - F.col("med6")), F.lit(0.5)
            ).alias("mad6"),
        )
    )


@register(
    "ts_bounding_ratio",
    oracle="""
        WITH r AS (
            SELECT event_type, ts, event_id, value,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY ts, event_id) AS rf,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY ts DESC, event_id DESC)
                       AS rl
            FROM events
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               MAX(CASE WHEN rf = 1 THEN value END) AS v_first,
               MAX(CASE WHEN rl = 1 THEN value END) AS v_last,
               CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT)
                   AS dt_us,
               -- dt_us = 0 (single-instant series) must be NULL in
               -- BOTH engines: ANSI Spark throws DIVIDE_BY_ZERO where
               -- DuckDB would emit NULL, so guard explicitly.
               CASE WHEN epoch_us(MAX(ts)) - epoch_us(MIN(ts)) > 0
                    THEN (MAX(CASE WHEN rl = 1 THEN value END)
                          - MAX(CASE WHEN rf = 1 THEN value END))
                         * 1000000.0
                         / CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts))
                                AS DOUBLE)
                    END AS rate_per_sec
        FROM r GROUP BY event_type
    """,
    doc="ClickHouse boundingRatio: (last value - first value) / "
    "(last ts - first ts) per series — the average rate of change "
    "every counter/gauge dashboard computes. Spark side is ONE "
    "two-phase hash agg: first/last via min_by/max_by on the "
    "(ts, event_id) total order (the ts_m4_downsample shape — no "
    "window sort), the time span in integer microseconds. The only "
    "float ops are one subtraction of raw stored doubles, one "
    "multiply, one divide — identical IEEE ops both engines. One "
    "shuffle bounded by the series count.",
)
def ts_bounding_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", "value"
    )
    order = F.struct("ts", "event_id")
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min_by("value", order).alias("v_first"),
        F.max_by("value", order).alias("v_last"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
        .cast("long")
        .alias("dt_us"),
    )
    return agg.select(
        "event_type",
        "n",
        "v_first",
        "v_last",
        "dt_us",
        F.when(
            F.col("dt_us") > 0,
            (F.col("v_last") - F.col("v_first"))
            * F.lit(1000000.0)
            / F.col("dt_us").cast("double"),
        ).alias("rate_per_sec"),
    )


@register(
    "intervals_union_length",
    oracle="""
        WITH iv AS (
            SELECT o_orderpriority AS pri,
                   o_orderkey AS okey,
                   o_orderdate AS s,
                   o_orderdate + INTERVAL (o_orderkey % 30 + 1) DAY AS e
            FROM orders
        ), m AS (
            SELECT pri, okey, s, e,
                   MAX(e) OVER (PARTITION BY pri ORDER BY s, e, okey
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) AS max_prev_e
            FROM iv
        ), fl AS (
            SELECT pri, s, e,
                   CASE WHEN max_prev_e IS NULL OR s > max_prev_e
                        THEN 1 ELSE 0 END AS new_island,
                   okey
            FROM m
        ), isl AS (
            SELECT pri, s, e,
                   SUM(new_island) OVER (PARTITION BY pri
                       ORDER BY s, e, okey
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS island
            FROM fl
        ), per AS (
            SELECT pri, island,
                   date_diff('day', MIN(s), MAX(e)) AS len_days
            FROM isl GROUP BY pri, island
        )
        SELECT pri,
               CAST(COUNT(*) AS BIGINT) AS n_islands,
               CAST(SUM(len_days) AS BIGINT) AS union_days
        FROM per GROUP BY pri
    """,
    doc="ClickHouse intervalLengthSum: total length of the UNION of "
    "(possibly overlapping) intervals per group — each order stays "
    "open o_orderkey%30+1 days, the same deterministic synthetic "
    "spans intervals_max_concurrent sweeps. Classic gaps-and-islands "
    "as two windows over one partition-sorted pass: running max of "
    "prior interval ends marks island starts (s > max_prev_e), a "
    "running sum numbers the islands, then island length = "
    "max(e) - min(s) in whole days (half-open [s,e), all integer "
    "date arithmetic). One shuffle on the group key, two windows "
    "and two aggs reusing the same partitioning; per-group sort is "
    "the scale cost, exactly the MergeTree range-read order "
    "ClickHouse exploits.",
)
def intervals_union_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    iv = o.select(
        F.col("o_orderpriority").alias("pri"),
        F.col("o_orderkey").alias("okey"),
        F.col("o_orderdate").alias("s"),
        F.expr(
            "o_orderdate + make_interval(0, 0, 0,"
            " cast(o_orderkey % 30 + 1 as int), 0, 0, 0)"
        ).alias("e"),
    )
    w_ord = Window.partitionBy("pri").orderBy("s", "e", "okey")
    m = iv.withColumn(
        "max_prev_e",
        F.max("e").over(w_ord.rowsBetween(Window.unboundedPreceding, -1)),
    )
    fl = m.withColumn(
        "new_island",
        F.when(
            F.col("max_prev_e").isNull() | (F.col("s") > F.col("max_prev_e")),
            1,
        ).otherwise(0),
    )
    isl = fl.withColumn(
        "island",
        F.sum("new_island").over(
            w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    per = isl.groupBy("pri", "island").agg(
        F.datediff(F.max("e"), F.min("s")).alias("len_days")
    )
    return per.groupBy("pri").agg(
        F.count(F.lit(1)).cast("long").alias("n_islands"),
        F.sum("len_days").cast("long").alias("union_days"),
    )


@register(
    "array_moving_agg",
    oracle="""
        WITH g AS (
            SELECT user_id,
                   list(CAST(FLOOR(value * 1e6) AS BIGINT)
                        ORDER BY ts, event_id) AS vals
            FROM events GROUP BY user_id
        )
        SELECT user_id,
               CAST(len(vals) AS BIGINT) AS n,
               array_to_string(list_transform(range(1, len(vals) + 1),
                   i -> CAST(list_aggregate(
                            list_slice(vals, greatest(1, i - 2), i),
                            'sum') AS VARCHAR)), ',') AS mov3_csv
        FROM g
    """,
    doc="ClickHouse groupArrayMovingSum(3): per user, the trailing-3 "
    "moving sum over the value series in (ts, event_id) order, "
    "emitted as one array per group. Spark side: collect the "
    "per-user series as sorted structs (array_sort on the total "
    "order fixes collect_list's partition nondeterminism), project "
    "the grid-integer values, then a transform-with-index lambda "
    "folds each trailing slice — all JVM-side higher-order "
    "functions, no Python. Values floor-grid to 1e-6 integers so "
    "the sums are exact and the CSV serialization (driver "
    "scalar-cell convention) is digit-stable. Per-user arrays are "
    "session-sized — the same per-key state groupArrayMovingSum "
    "holds; one shuffle.",
)
def array_moving_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("value") * F.lit(1e6)).cast("long").alias("v6"),
    )
    g = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "v6"))
        ).alias("pairs")
    )
    g = g.withColumn("vals", F.expr("transform(pairs, p -> p.v6)"))
    mov = F.expr(
        "transform(vals, (v, i) -> aggregate("
        " slice(vals, greatest(1, i - 1), i + 2 - greatest(1, i - 1)),"
        " cast(0 as bigint), (a, x) -> a + x))"
    )
    return g.select(
        "user_id",
        F.size("vals").cast("long").alias("n"),
        F.array_join(
            F.transform(mov, lambda x: x.cast("string")), ","
        ).alias("mov3_csv"),
    )


@register(
    "agg_minmax_map",
    oracle="""
        WITH kv AS (
            SELECT event_type,
                   unnest(json_keys(props)) AS pkey,
                   CAST(json_extract_string(props,
                        concat('$.', unnest(json_keys(props)))) AS BIGINT)
                       AS pval
            FROM events
        ), g AS (
            SELECT event_type, pkey,
                   CAST(MIN(pval) AS BIGINT) AS pmin,
                   CAST(MAX(pval) AS BIGINT) AS pmax
            FROM kv GROUP BY event_type, pkey
        )
        SELECT event_type,
               array_to_string(list(pkey ORDER BY pkey), ',') AS keys_csv,
               array_to_string(list_transform(list(pmin ORDER BY pkey),
                   x -> CAST(x AS VARCHAR)), ',') AS mins_csv,
               array_to_string(list_transform(list(pmax ORDER BY pkey),
                   x -> CAST(x AS VARCHAR)), ',') AS maxs_csv
        FROM g GROUP BY event_type
    """,
    doc="ClickHouse minMap / maxMap: per group, element-wise min and "
    "max of a map column's values by key, emitted as parallel "
    "key-ordered vectors — agg_sum_map's siblings completing the "
    "sumMap/minMap/maxMap family. Same two-phase shape: explode the "
    "parsed map, integer min/max per (group, key) with map-side "
    "combine, reassemble per group bounded by the property "
    "VOCABULARY, serialize to CSV (driver scalar-cell convention). "
    "One shuffle; collect is vocabulary-bounded, never row-bounded.",
)
def agg_minmax_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "props")
    kv = ev.select(
        "event_type",
        F.explode(F.from_json("props", "map<string,long>")).alias(
            "pkey", "pval"
        ),
    )
    g = kv.groupBy("event_type", "pkey").agg(
        F.min("pval").cast("long").alias("pmin"),
        F.max("pval").cast("long").alias("pmax"),
    )
    pairs = F.sort_array(F.collect_list(F.struct("pkey", "pmin", "pmax")))
    return g.groupBy("event_type").agg(
        F.array_join(F.transform(pairs, lambda x: x["pkey"]), ",").alias(
            "keys_csv"
        ),
        F.array_join(
            F.transform(pairs, lambda x: x["pmin"].cast("string")), ","
        ).alias("mins_csv"),
        F.array_join(
            F.transform(pairs, lambda x: x["pmax"].cast("string")), ","
        ).alias("maxs_csv"),
    )


@register(
    "str_extract_groups",
    oracle="""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '[a-z]{7,}')) AS BIGINT)
                   AS n_matches,
               COALESCE(array_to_string(list_slice(
                   regexp_extract_all(text, '[a-z]{7,}'), 1, 8), ','), '')
                   AS first8_csv
        FROM documents
    """,
    doc="ClickHouse extractAll: every regexp match per document (all "
    "words of ≥7 lowercase letters), with the match count and the "
    "first 8 matches CSV-serialized (driver scalar-cell "
    "convention). Pattern is dialect-neutral (a pure character "
    "class + bounded quantifier — identical semantics in Java "
    "regex and RE2); matches are non-overlapping left-to-right in "
    "both engines. Pure map-side projection: no shuffle, no UDF — "
    "the regexp runs inside whole-stage codegen per partition, the "
    "shape that saturates scan bandwidth at 100 TB.",
)
def str_extract_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    arr = F.expr("regexp_extract_all(text, '[a-z]{7,}', 0)")
    return docs.select(
        "doc_id",
        F.size(arr).cast("long").alias("n_matches"),
        F.array_join(F.slice(arr, 1, 8), ",").alias("first8_csv"),
    )


@register(
    "ts_lttb_downsample",
    oracle="""
        WITH b0 AS (
            SELECT event_type, ts, event_id,
                   date_trunc('hour', ts) AS bucket_ts,
                   CAST(FLOOR(value * 1e6) AS BIGINT) AS y6
            FROM events
        ), t0 AS (
            SELECT event_type, MIN(ts) AS ts0 FROM b0 GROUP BY event_type
        ), base AS (
            SELECT b0.event_type, b0.bucket_ts, b0.event_id,
                   CAST(epoch_us(b0.ts) - epoch_us(t0.ts0) AS BIGINT)
                       AS t_rel,
                   b0.y6
            FROM b0 JOIN t0 ON b0.event_type = t0.event_type
        ), bs AS (
            SELECT event_type, bucket_ts,
                   COUNT(*) AS n, SUM(t_rel) AS sx, SUM(y6) AS sy
            FROM base GROUP BY event_type, bucket_ts
        ), nb AS (
            SELECT event_type, bucket_ts, n,
                   LAG(n)  OVER w AS np, LAG(sx) OVER w AS sxp,
                   LAG(sy) OVER w AS syp,
                   LEAD(n) OVER w AS nn, LEAD(sx) OVER w AS sxn,
                   LEAD(sy) OVER w AS syn
            FROM bs
            WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts)
        ), pts AS (
            SELECT base.event_type, base.bucket_ts, base.t_rel, base.y6,
                   base.event_id, nb.n AS n_in_bucket,
                   CASE WHEN nb.np IS NULL THEN 'first'
                        WHEN nb.nn IS NULL THEN 'last'
                        ELSE 'area' END AS mode,
                   CASE WHEN nb.np IS NULL OR nb.nn IS NULL THEN 0.0
                        ELSE ABS(
          (CAST(nb.sxp AS DOUBLE) * CAST(nb.nn AS DOUBLE)
           - CAST(nb.sxn AS DOUBLE) * CAST(nb.np AS DOUBLE))
          * (CAST(base.y6 AS DOUBLE) * CAST(nb.np AS DOUBLE)
             - CAST(nb.syp AS DOUBLE))
          - (CAST(nb.sxp AS DOUBLE)
             - CAST(base.t_rel AS DOUBLE) * CAST(nb.np AS DOUBLE))
          * (CAST(nb.syn AS DOUBLE) * CAST(nb.np AS DOUBLE)
             - CAST(nb.syp AS DOUBLE) * CAST(nb.nn AS DOUBLE)))
                   END AS area
            FROM base JOIN nb ON base.event_type = nb.event_type
                             AND base.bucket_ts = nb.bucket_ts
        ), sel AS (
            SELECT *,
                   ROW_NUMBER() OVER (
                       PARTITION BY event_type, bucket_ts
                       ORDER BY
                         CASE WHEN mode = 'area' THEN -area ELSE 0.0 END,
                         CASE WHEN mode = 'last' THEN -t_rel
                              ELSE t_rel END,
                         CASE WHEN mode = 'last' THEN -event_id
                              ELSE event_id END) AS rn
            FROM pts
        )
        SELECT event_type, bucket_ts, mode,
               CAST(t_rel AS BIGINT) AS sel_t_rel,
               CAST(y6 AS BIGINT) AS sel_y6,
               CAST(n_in_bucket AS BIGINT) AS n_in_bucket
        FROM sel WHERE rn = 1
    """,
    doc="ClickHouse largestTriangleThreeBuckets, the parallel "
    "bucket-average variant: one representative point per "
    "(series, hour) chosen to maximize the triangle area against "
    "the NEIGHBOR BUCKET CENTROIDS (classic LTTB anchors on the "
    "previously-selected point, which is inherently sequential; "
    "anchoring on the prev/next bucket averages is the standard "
    "parallelization and keeps the same visual guarantee). First/"
    "last buckets keep their first/last point, matching LTTB's "
    "endpoint pinning. Exactness design: times are integer µs "
    "offsets from the series start, values integer 1e-6 grid, so "
    "bucket sums are exact int64; the area is evaluated with "
    "denominators cleared — |(sxp·nn − sxn·np)(y·np − syp) − "
    "(sxp − x·np)(syn·np − syp·nn)| — as ONE identical IEEE "
    "double expression in both engines, so the argmax (tiebreak "
    "(t, event_id)) picks the same point even where the double "
    "rounds; only exact integers are checked. Plan: dimension-sized "
    "t0 broadcast, one bucket agg, one bucket-spine lag/lead "
    "window, one co-partitioned equi-join back, one per-bucket "
    "row_number — shuffles bounded by series x buckets, the "
    "monitoring-UI shape at 100 TB.",
)
def ts_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    b0 = ev.select(
        "event_type",
        "ts",
        "event_id",
        F.date_trunc("hour", "ts").alias("bucket_ts"),
        F.floor(F.col("value") * F.lit(1e6)).cast("long").alias("y6"),
    )
    t0 = b0.groupBy("event_type").agg(F.min("ts").alias("ts0"))
    base = b0.join(F.broadcast(t0), "event_type").select(
        "event_type",
        "bucket_ts",
        "event_id",
        (F.unix_micros("ts") - F.unix_micros("ts0")).cast("long").alias(
            "t_rel"
        ),
        "y6",
    )
    bs = base.groupBy("event_type", "bucket_ts").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("t_rel").alias("sx"),
        F.sum("y6").alias("sy"),
    )
    w = Window.partitionBy("event_type").orderBy("bucket_ts")
    nb = bs.select(
        "event_type",
        "bucket_ts",
        "n",
        F.lag("n").over(w).alias("np"),
        F.lag("sx").over(w).alias("sxp"),
        F.lag("sy").over(w).alias("syp"),
        F.lead("n").over(w).alias("nn"),
        F.lead("sx").over(w).alias("sxn"),
        F.lead("sy").over(w).alias("syn"),
    )
    j = base.join(nb, ["event_type", "bucket_ts"])
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    area_expr = F.abs(
        (d("sxp") * d("nn") - d("sxn") * d("np"))
        * (d("y6") * d("np") - d("syp"))
        - (d("sxp") - d("t_rel") * d("np"))
        * (d("syn") * d("np") - d("syp") * d("nn"))
    )
    pts = j.select(
        "event_type",
        "bucket_ts",
        "t_rel",
        "y6",
        "event_id",
        F.col("n").alias("n_in_bucket"),
        F.when(F.col("np").isNull(), "first")
        .when(F.col("nn").isNull(), "last")
        .otherwise("area")
        .alias("mode"),
        F.when(
            F.col("np").isNull() | F.col("nn").isNull(), F.lit(0.0)
        )
        .otherwise(area_expr)
        .alias("area"),
    )
    w_sel = Window.partitionBy("event_type", "bucket_ts").orderBy(
        F.when(F.col("mode") == "area", -F.col("area")).otherwise(F.lit(0.0)),
        F.when(F.col("mode") == "last", -F.col("t_rel")).otherwise(
            F.col("t_rel")
        ),
        F.when(F.col("mode") == "last", -F.col("event_id")).otherwise(
            F.col("event_id")
        ),
    )
    return (
        pts.withColumn("rn", F.row_number().over(w_sel))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            "bucket_ts",
            "mode",
            F.col("t_rel").cast("long").alias("sel_t_rel"),
            F.col("y6").cast("long").alias("sel_y6"),
            F.col("n_in_bucket").cast("long").alias("n_in_bucket"),
        )
    )


@register(
    "agg_array_intersect",
    oracle="""
        WITH ut AS (
            SELECT DISTINCT user_id % 10 AS bucket, user_id, event_type
            FROM events
        ), g AS (
            SELECT bucket, event_type, COUNT(*) AS nu
            FROM ut GROUP BY bucket, event_type
        ), tot AS (
            SELECT bucket, COUNT(DISTINCT user_id) AS n_users
            FROM ut GROUP BY bucket
        )
        SELECT g.bucket,
               CAST(MAX(tot.n_users) AS BIGINT) AS n_users,
               CAST(COUNT(*) FILTER (WHERE g.nu = tot.n_users) AS BIGINT)
                   AS n_common,
               COALESCE(array_to_string(list(g.event_type ORDER BY
                   g.event_type) FILTER (WHERE g.nu = tot.n_users), ','),
                   '') AS common_csv
        FROM g JOIN tot ON g.bucket = tot.bucket
        GROUP BY g.bucket
    """,
    doc="ClickHouse groupArrayIntersect: per group, the set of "
    "elements present in EVERY member's array — here, the event "
    "types every user in a user-bucket has performed. Relational "
    "reformulation (the scalable one): distinct (bucket, user, "
    "type) observations, per-(bucket, type) user counts, and a "
    "type is universal iff its count equals the bucket's user "
    "count — set intersection as counting, no per-group set state "
    "at all. Output is the vocabulary-bounded sorted CSV (driver "
    "scalar-cell convention). Three hash aggs sharing the bucket "
    "key; the group-size intersection state ClickHouse holds "
    "per-group becomes two bounded count tables.",
)
def agg_array_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.pmod(F.col("user_id"), F.lit(10)).cast("long").alias("bucket"),
        "user_id",
        "event_type",
    )
    ut = ev.distinct()
    g = ut.groupBy("bucket", "event_type").agg(F.count(F.lit(1)).alias("nu"))
    tot = ut.groupBy("bucket").agg(
        F.countDistinct("user_id").alias("n_users")
    )
    j = g.join(tot, "bucket")
    is_common = F.col("nu") == F.col("n_users")
    return j.groupBy("bucket").agg(
        F.max("n_users").cast("long").alias("n_users"),
        F.count(F.when(is_common, 1)).cast("long").alias("n_common"),
        F.array_join(
            F.array_sort(F.collect_list(F.when(is_common, F.col("event_type")))),
            ",",
        ).alias("common_csv"),
    )


@register(
    "sequence_next_node",
    oracle="""
        WITH r AS (
            SELECT user_id, event_id, event_type,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events
        ), f AS (
            SELECT user_id, MIN(rn) AS rn0
            FROM r WHERE event_type = 'click' GROUP BY user_id
        )
        SELECT r.user_id,
               CAST(r.event_id AS BIGINT) AS next_event_id,
               r.event_type AS next_type
        FROM r JOIN f ON r.user_id = f.user_id AND r.rn = f.rn0 + 1
    """,
    doc="ClickHouse sequenceNextNode: for each user, the event that "
    "immediately follows their FIRST 'click' — the "
    "what-happens-after-X behavioral lookup. One row_number window "
    "on the (ts, event_id) total order per user, a conditional min "
    "for the anchor position, then an equi-join on (user, rn0+1). "
    "Users whose first click is their last event drop out (inner "
    "join), matching sequenceNextNode's NULL elision. Both the "
    "window and the join share the user_id partitioning, so the "
    "whole plan is one shuffle plus a co-partitioned self-join — "
    "no fact-table rescan per step.",
)
def sequence_next_node(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    r = ev.withColumn("rn", F.row_number().over(w))
    f = (
        r.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("rn").alias("rn0"))
    )
    return (
        r.join(f, "user_id")
        .filter(F.col("rn") == F.col("rn0") + 1)
        .select(
            "user_id",
            F.col("event_id").cast("long").alias("next_event_id"),
            F.col("event_type").alias("next_type"),
        )
    )


@register(
    "agg_uniq_array",
    oracle="""
        WITH b AS (
            SELECT event_type, user_id % 100 AS ub FROM events
        )
        SELECT event_type,
               CAST(COUNT(DISTINCT ub) AS BIGINT) AS n_uniq,
               array_to_string(list_transform(
                   list(DISTINCT ub ORDER BY ub),
                   x -> CAST(x AS VARCHAR)), ',') AS uniq_csv
        FROM b GROUP BY event_type
    """,
    doc="ClickHouse groupUniqArray: the distinct elements per group "
    "as one sorted array — the set-valued aggregate behind "
    "'which user cohorts touched this event type'. Spark's "
    "collect_set + array_sort gives the same set with a total "
    "order; state is bounded by the value domain (user buckets, "
    "100), not rows — map-side partial sets absorb repeats before "
    "the single shuffle. CSV-serialized (driver scalar-cell "
    "convention).",
)
def agg_uniq_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.pmod(F.col("user_id"), F.lit(100)).cast("long").alias("ub"),
    )
    u = F.array_sort(F.collect_set("ub"))
    return ev.groupBy("event_type").agg(
        F.countDistinct("ub").cast("long").alias("n_uniq"),
        F.array_join(F.transform(u, lambda x: x.cast("string")), ",").alias(
            "uniq_csv"
        ),
    )


@register(
    "str_ngram_similarity",
    oracle="""
        WITH g AS (
            SELECT p_partkey, p_name,
                   CASE WHEN length(p_name) < 3 THEN []
                        ELSE list_distinct(list_transform(
                            range(1, length(p_name) - 2 + 1),
                            i -> substring(p_name, CAST(i AS INTEGER), 3)))
                   END AS grams
            FROM part
        )
        SELECT a.p_partkey,
               a.p_name AS name_a, b.p_name AS name_b,
               CAST(len(list_intersect(a.grams, b.grams)) AS BIGINT)
                   AS n_shared,
               CAST(len(a.grams) AS BIGINT) AS n_a,
               CAST(len(b.grams) AS BIGINT) AS n_b,
               CASE WHEN len(a.grams) + len(b.grams) = 0 THEN 0.0
                    ELSE 2.0 * len(list_intersect(a.grams, b.grams))
                         / (len(a.grams) + len(b.grams)) END AS dice_sim
        FROM g a JOIN g b ON b.p_partkey = a.p_partkey + 1
    """,
    doc="ClickHouse ngramDistance (reported as Dice similarity "
    "2|A∩B|/(|A|+|B|) over distinct character trigrams): fuzzy "
    "string similarity between each part name and its successor's "
    "— the per-row-pair shape of typo/variant detection. Trigram "
    "sets are built with JVM transform/substring lambdas (no UDF); "
    "counts are exact integers and the similarity is one final "
    "division. The successor join is unhinted (part scales with SF; "
    "size-based broadcast at fixture scale); at corpus scale this becomes "
    "dedup_fuzzy_blocked's blocked self-join — this key is the "
    "per-pair primitive.",
)
def str_ngram_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    grams = F.when(
        F.length("p_name") < 3, F.array().cast("array<string>")
    ).otherwise(
        F.array_distinct(
            F.expr(
                "transform(sequence(1, length(p_name) - 2),"
                " i -> substring(p_name, i, 3))"
            )
        )
    )
    g = p.select("p_partkey", "p_name", grams.alias("grams"))
    a = g.alias("a")
    b = g.select(
        (F.col("p_partkey") - 1).alias("join_key"),
        F.col("p_name").alias("name_b"),
        F.col("grams").alias("grams_b"),
    ).alias("b")
    j = a.join(b, F.col("a.p_partkey") == F.col("b.join_key"))
    inter = F.size(F.array_intersect(F.col("a.grams"), F.col("grams_b")))
    na = F.size(F.col("a.grams"))
    nb = F.size(F.col("grams_b"))
    return j.select(
        F.col("a.p_partkey").alias("p_partkey"),
        F.col("a.p_name").alias("name_a"),
        F.col("name_b"),
        inter.cast("long").alias("n_shared"),
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        F.when((na + nb) == 0, F.lit(0.0))
        .otherwise(F.lit(2.0) * inter / (na + nb))
        .alias("dice_sim"),
    )


#: ONE oracle object shared by the flat key and its two-stage sibling
#: (operators/analytics18.py) — the skew-playbook convention.
NONNEG_DERIVATIVE_ORACLE = """
        WITH r AS (
            SELECT event_type, event_id, value,
                   epoch_us(ts) AS t_us,
                   LAG(value) OVER w AS pv,
                   LAG(epoch_us(ts)) OVER w AS pt
            FROM events
            WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
        )
        SELECT event_type,
               CAST(event_id AS BIGINT) AS event_id,
               CAST(t_us - pt AS BIGINT) AS dt_us,
               CASE WHEN t_us - pt <= 0 THEN 0.0
                    ELSE greatest(0.0,
                         (value - pv) * 1000000.0
                         / CAST(t_us - pt AS DOUBLE)) END AS rate_per_sec
        FROM r WHERE pt IS NOT NULL
"""


@register(
    "ts_nonneg_derivative",
    oracle=NONNEG_DERIVATIVE_ORACLE,
    doc="ClickHouse nonNegativeDerivative: the per-second rate of "
    "change between consecutive points of each series, clamped at "
    "zero (the counter-reset guard every monitoring stack applies "
    "to cumulative counters). One lag window on the (ts, event_id) "
    "total order per series; the rate is subtraction + multiply + "
    "divide on identical operands — identical IEEE both engines — "
    "and zero-dt ties deterministically emit 0.0. One shuffle on "
    "the series key; per-series sort is the MergeTree read order.",
)
def ts_nonneg_derivative(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", "value", "ts",
        F.unix_micros("ts").alias("t_us"),
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    r = ev.select(
        "event_type",
        "event_id",
        "value",
        "t_us",
        F.lag("value").over(w).alias("pv"),
        F.lag("t_us").over(w).alias("pt"),
    )
    dt = F.col("t_us") - F.col("pt")
    return r.filter(F.col("pt").isNotNull()).select(
        "event_type",
        F.col("event_id").cast("long").alias("event_id"),
        dt.cast("long").alias("dt_us"),
        F.when(dt <= 0, F.lit(0.0))
        .otherwise(
            F.greatest(
                F.lit(0.0),
                (F.col("value") - F.col("pv"))
                * F.lit(1000000.0)
                / dt.cast("double"),
            )
        )
        .alias("rate_per_sec"),
    )


#: The 8 sparkline glyph levels (ClickHouse sparkbar's palette).
SPARK_GLYPHS = "▁▂▃▄▅▆▇█"


@register(
    "agg_sparkbar",
    oracle=f"""
        WITH h AS (
            SELECT event_type, CAST(hour(ts) AS BIGINT) AS hh,
                   COUNT(*) AS c
            FROM events GROUP BY event_type, hour(ts)
        ), m AS (
            SELECT event_type, MAX(c) AS mx FROM h GROUP BY event_type
        ), grid AS (
            SELECT m.event_type, g.hh, COALESCE(h.c, 0) AS c, m.mx
            FROM m CROSS JOIN (SELECT unnest(range(0, 24)) AS hh) g
            LEFT JOIN h ON h.event_type = m.event_type AND h.hh = g.hh
        )
        SELECT event_type,
               CAST(MAX(mx) AS BIGINT) AS max_per_hour,
               string_agg(substring('{SPARK_GLYPHS}',
                   CAST(c * 7 // mx AS INTEGER) + 1, 1), ''
                   ORDER BY hh) AS sparkbar
        FROM grid GROUP BY event_type
    """,
    doc="ClickHouse sparkbar: the 24-cell hour-of-day activity "
    "sparkline per series, rendered with the standard 8 block "
    "glyphs. Levels are pure integer arithmetic — cell·7 // max "
    "(floor division, non-negative operands, identical in both "
    "engines) — so the emitted string is byte-exact. Spark side "
    "builds the dense 24-cell grid with map_from_entries + a "
    "transform over sequence(0,23) (JVM lambdas, no UDF, no "
    "explode); one histogram shuffle + one vocabulary-bounded "
    "reassembly. The entire render state is 24 integers per series "
    "— sparkbar's own fixed-width state.",
)
def agg_sparkbar(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.hour("ts").cast("long").alias("hh")
    )
    h = ev.groupBy("event_type", "hh").agg(F.count(F.lit(1)).alias("c"))
    s = h.groupBy("event_type").agg(
        F.map_from_entries(F.collect_list(F.struct("hh", "c"))).alias("m")
    )
    cells = F.expr(
        "transform(sequence(0, 23), h -> coalesce(element_at(m,"
        " cast(h as bigint)), cast(0 as bigint)))"
    )
    s = s.select(
        "event_type",
        cells.alias("cells"),
        F.array_max(cells).alias("mx"),
    )
    glyph = F.expr(
        f"array_join(transform(cells, c -> substring('{SPARK_GLYPHS}',"
        " cast(c * 7 div mx as int) + 1, 1)), '')"
    )
    return s.select(
        "event_type",
        F.col("mx").cast("long").alias("max_per_hour"),
        glyph.alias("sparkbar"),
    )


@register(
    "topk_with_ties",
    oracle="""
        SELECT pri, okey, o_totalprice, rnk FROM (
            SELECT o_orderpriority AS pri,
                   CAST(o_orderkey AS BIGINT) AS okey,
                   o_totalprice,
                   CAST(RANK() OVER (PARTITION BY o_orderpriority
                        ORDER BY o_totalprice DESC) AS BIGINT) AS rnk
            FROM orders
        ) WHERE rnk <= 5
    """,
    doc="ANSI FETCH FIRST 5 ROWS WITH TIES (ClickHouse LIMIT 5 WITH "
    "TIES): the top-5 orders by price per priority, KEEPING every "
    "row tied with the 5th — the semantics rank() gives for free "
    "and row_number() silently breaks. One rank window per "
    "partition; Catalyst prunes it with WindowGroupLimit, so each "
    "partition streams a bounded top-k heap rather than sorting "
    "everything. The checked rank column makes the tie contract "
    "driver-visible: tied rows carry the same rnk.",
)
def topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc()
    )
    return (
        o.select(
            F.col("o_orderpriority").alias("pri"),
            F.col("o_orderkey").cast("long").alias("okey"),
            "o_totalprice",
            F.rank().over(w).cast("long").alias("rnk"),
        )
        .filter(F.col("rnk") <= 5)
    )


@register(
    "agg_group_array_last",
    oracle="""
        WITH g AS (
            SELECT user_id,
                   list(CAST(FLOOR(value * 1e6) AS BIGINT)
                        ORDER BY ts, event_id) AS vals
            FROM events GROUP BY user_id
        )
        SELECT user_id,
               CAST(len(vals) AS BIGINT) AS n,
               array_to_string(list_transform(
                   list_slice(vals, greatest(1, len(vals) - 2),
                              len(vals)),
                   x -> CAST(x AS VARCHAR)), ',') AS last3_csv
        FROM g
    """,
    doc="ClickHouse groupArrayLast(3): the most recent 3 values per "
    "user in (ts, event_id) order. Spark: sorted-struct collect + a "
    "tail slice — the same bounded-suffix state groupArrayLast "
    "holds (CH keeps a 3-slot ring buffer; the relational form "
    "keeps the session array and slices, with the window-based "
    "keep-newest (win_keep_newest) as the at-scale alternative "
    "when sessions outgrow memory). Grid-integer CSV output; one "
    "shuffle.",
)
def agg_group_array_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("value") * F.lit(1e6)).cast("long").alias("v6"),
    )
    g = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "v6"))
        ).alias("pairs")
    )
    g = g.withColumn("vals", F.expr("transform(pairs, p -> p.v6)"))
    n = F.size("vals")
    tail = F.slice(
        F.col("vals"),
        F.greatest(F.lit(1), n - 2),
        F.least(F.lit(3), n),
    )
    return g.select(
        "user_id",
        n.cast("long").alias("n"),
        F.array_join(
            F.transform(tail, lambda x: x.cast("string")), ","
        ).alias("last3_csv"),
    )


@register(
    "stats_proportions_ztest",
    oracle="""
        WITH u AS (
            SELECT user_id % 2 AS variant,
                   user_id,
                   MAX(CASE WHEN event_type = 'purchase'
                             AND event_id % 7 = 0 THEN 1 ELSE 0
                       END) AS converted
            FROM events GROUP BY user_id % 2, user_id
        ), v AS (
            SELECT CAST(SUM(CASE WHEN variant = 0 THEN converted ELSE 0
                       END) AS BIGINT) AS x0,
                   CAST(COUNT(*) FILTER (WHERE variant = 0) AS BIGINT)
                       AS n0,
                   CAST(SUM(CASE WHEN variant = 1 THEN converted ELSE 0
                       END) AS BIGINT) AS x1,
                   CAST(COUNT(*) FILTER (WHERE variant = 1) AS BIGINT)
                       AS n1
            FROM u
        )
        SELECT x0, n0, x1, n1,
               CAST(x0 AS DOUBLE) / n0 AS p0,
               CAST(x1 AS DOUBLE) / n1 AS p1,
               CASE WHEN (CAST(x0 + x1 AS DOUBLE) / (n0 + n1))
                         * (1.0 - CAST(x0 + x1 AS DOUBLE) / (n0 + n1))
                         * (1.0 / n0 + 1.0 / n1) > 0.0
                    THEN (CAST(x0 AS DOUBLE) / n0
                          - CAST(x1 AS DOUBLE) / n1)
                         / sqrt((CAST(x0 + x1 AS DOUBLE) / (n0 + n1))
                            * (1.0 - CAST(x0 + x1 AS DOUBLE) / (n0 + n1))
                            * (1.0 / n0 + 1.0 / n1))
                    ELSE 0.0 END AS z
        FROM v
    """,
    doc="ClickHouse proportionsZTest: the two-proportion z-score "
    "between A/B variants (user_id parity) on user-level QUALIFYING "
    "purchase conversion (the deterministic event_id%7 subset — on "
    "the raw fixture every user converts in both arms, so the pooled "
    "variance was 0 and the z expression never exercised; round-7 "
    "degeneracy audit) — the experiment-readout query. Per-user conversion "
    "flags (one agg), variant totals (one conditional agg to a "
    "single row), then the pooled-variance z expression — divisions "
    "and one sqrt on identical integer-derived operands, the "
    "IEEE-identical subset (registry float rules); a degenerate pool "
    "(everyone or no-one converts → zero variance) deterministically "
    "emits z = 0. Counts are the checked integers; z is reproducible "
    "because both engines evaluate the SAME expression tree. Two "
    "shuffles, constant output.",
)
def stats_proportions_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id"
    )
    u = ev.groupBy(
        F.pmod(F.col("user_id"), F.lit(2)).alias("variant"), "user_id"
    ).agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("event_id") % 7 == 0),
                1,
            ).otherwise(0)
        ).alias("converted")
    )
    v = u.agg(
        F.sum(F.when(F.col("variant") == 0, F.col("converted")).otherwise(0))
        .cast("long")
        .alias("x0"),
        F.count(F.when(F.col("variant") == 0, 1)).cast("long").alias("n0"),
        F.sum(F.when(F.col("variant") == 1, F.col("converted")).otherwise(0))
        .cast("long")
        .alias("x1"),
        F.count(F.when(F.col("variant") == 1, 1)).cast("long").alias("n1"),
    )
    p0 = F.col("x0").cast("double") / F.col("n0")
    p1 = F.col("x1").cast("double") / F.col("n1")
    pp = (F.col("x0") + F.col("x1")).cast("double") / (
        F.col("n0") + F.col("n1")
    )
    var = pp * (F.lit(1.0) - pp) * (
        F.lit(1.0) / F.col("n0") + F.lit(1.0) / F.col("n1")
    )
    z = F.when(var > 0.0, (p0 - p1) / F.sqrt(var)).otherwise(F.lit(0.0))
    return v.select(
        "x0", "n0", "x1", "n1",
        p0.alias("p0"), p1.alias("p1"), z.alias("z"),
    )


@register(
    "funnel_time_to_convert",
    oracle="""
        WITH r AS (
            SELECT user_id, ts, event_id, event_type,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events
        ), f AS (
            SELECT user_id, MIN(rn) AS rn0
            FROM r WHERE event_type = 'click' GROUP BY user_id
        ), conv AS (
            SELECT r.user_id,
                   MIN(epoch_us(r.ts)) AS t_purchase,
                   MIN(t0.t_click) AS t_click
            FROM r
            JOIN (SELECT r2.user_id, epoch_us(r2.ts) AS t_click, f.rn0
                  FROM r r2 JOIN f ON r2.user_id = f.user_id
                                  AND r2.rn = f.rn0) t0
              ON r.user_id = t0.user_id
            WHERE r.event_type = 'purchase' AND r.rn > t0.rn0
            GROUP BY r.user_id
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
               CAST(quantile_cont(t_purchase - t_click, 0.5) AS DOUBLE)
                   AS p50_us,
               CAST(quantile_cont(t_purchase - t_click, 0.9) AS DOUBLE)
                   AS p90_us
        FROM conv
    """,
    doc="Funnel time-to-convert: for each user, the delay from their "
    "FIRST click to the first purchase AFTER it, summarized as "
    "exact p50/p90 — the latency readout behind every conversion "
    "funnel (windowFunnel tells you IF, this tells you HOW LONG). "
    "Anchor = sequence_next_node's rn0 pattern; deltas are integer "
    "microseconds, and exact continuous quantiles over integers "
    "interpolate to dyadic rationals — cross-engine exact (the "
    "stats_mad argument). Shuffles: one user window + one "
    "co-partitioned join + one scalar agg.",
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    r = ev.withColumn("rn", F.row_number().over(w))
    f = (
        r.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("rn").alias("rn0"))
    )
    t0 = (
        r.join(f, "user_id")
        .filter(F.col("rn") == F.col("rn0"))
        .select(
            "user_id",
            F.unix_micros("ts").alias("t_click"),
            "rn0",
        )
    )
    conv = (
        r.filter(F.col("event_type") == "purchase")
        .join(t0, "user_id")
        .filter(F.col("rn") > F.col("rn0"))
        .groupBy("user_id")
        .agg(
            F.min(F.unix_micros("ts")).alias("t_purchase"),
            F.min("t_click").alias("t_click"),
        )
    )
    delta = F.col("t_purchase") - F.col("t_click")
    return conv.agg(
        F.count(F.lit(1)).cast("long").alias("n_converted"),
        F.percentile(delta, F.lit(0.5)).alias("p50_us"),
        F.percentile(delta, F.lit(0.9)).alias("p90_us"),
    )


@register(
    "win_cumulative_uniques",
    oracle="""
        WITH fu AS (
            SELECT event_type, user_id,
                   MIN(date_trunc('day', ts)) AS first_day
            FROM events GROUP BY event_type, user_id
        ), nd AS (
            SELECT event_type, first_day AS d, COUNT(*) AS n_new
            FROM fu GROUP BY event_type, first_day
        )
        SELECT event_type, d,
               CAST(n_new AS BIGINT) AS n_new,
               CAST(SUM(n_new) OVER (PARTITION BY event_type ORDER BY d
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum_uniques
        FROM nd
    """,
    doc="Cumulative distinct users over time ('users to date' per "
    "series) — the growth curve every product dashboard draws, and "
    "the shape ClickHouse serves with uniqExactState merges over "
    "partitions. The scalable reformulation: distinct-to-date equals "
    "the running SUM of first-appearance counts, so the unbounded "
    "distinct state collapses to one (type,user) min-agg, one "
    "(type,day) count, and a cumsum window over the DAY SPINE "
    "(report rows exist for days with ≥1 new user — between them "
    "the curve is constant by construction). Two shuffles + one "
    "spine-sized window; no distinct state ever exceeds the user "
    "dimension.",
)
def win_cumulative_uniques(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        F.date_trunc("day", "ts").alias("d"),
    )
    fu = ev.groupBy("event_type", "user_id").agg(
        F.min("d").alias("first_day")
    )
    nd = fu.groupBy("event_type", F.col("first_day").alias("d")).agg(
        F.count(F.lit(1)).alias("n_new")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return nd.select(
        "event_type",
        "d",
        F.col("n_new").cast("long").alias("n_new"),
        F.sum("n_new").over(w).cast("long").alias("cum_uniques"),
    )


@register(
    "intervals_open_per_day",
    oracle="""
        WITH iv AS (
            SELECT o_orderpriority AS pri,
                   o_orderdate AS s,
                   o_orderdate + INTERVAL (o_orderkey % 30 + 1) DAY AS e
            FROM orders
        ), pts AS (
            SELECT pri, s AS d, 1 AS delta FROM iv
            UNION ALL
            SELECT pri, e AS d, -1 AS delta FROM iv
        ), net AS (
            SELECT pri, d, SUM(delta) AS net FROM pts GROUP BY pri, d
        )
        SELECT pri, d,
               CAST(net AS BIGINT) AS net_change,
               CAST(SUM(net) OVER (PARTITION BY pri ORDER BY d
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS open_orders
        FROM net
    """,
    doc="Order backlog over time: how many intervals are open on each "
    "day, per priority — the daily-backlog series behind SLA and "
    "capacity dashboards (intervals_max_concurrent reports only the "
    "peak; this is the whole curve). Sweep-line with DAY-AGGREGATED "
    "deltas: +1/-1 points collapse to one net per (pri, day) BEFORE "
    "the window, so the cumsum runs over the changed-day spine, not "
    "raw rows (backlog is constant between change days — half-open "
    "[s,e): an order leaves the backlog on its end day). One "
    "point-agg shuffle + one spine-sized window; the per-row "
    "sweep that intervals_max_concurrent needs for tie-exact "
    "maxima is unnecessary here because day-net sums are "
    "order-free integers.",
)
def intervals_open_per_day(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        "pri", F.col("s").alias("d"), F.lit(1).alias("delta")
    ).unionAll(
        iv.select("pri", F.col("e").alias("d"), F.lit(-1).alias("delta"))
    )
    net = pts.groupBy("pri", "d").agg(F.sum("delta").alias("net"))
    w = (
        Window.partitionBy("pri")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return net.select(
        "pri",
        "d",
        F.col("net").cast("long").alias("net_change"),
        F.sum("net").over(w).cast("long").alias("open_orders"),
    )


#: Bounded-slice compare spec for the sf1 clone arms (driver_sim
#: BOUNDED_SLICE): the clone arm duplicates orders into the SAME time
#: span, so pairwise overlaps grow ~x100 and the exact row-by-row
#: compare of the full output reached ~55 GB RSS (the round-13
#: exclusion). The bounded form tightens the deterministic PROBE
#: predicate from 1-in-97 to 1-in-9700 — restricting probes a keeps
#: every build-side candidate b, so the sliced rows are exactly the
#: full result's rows for those probes; the engine side applies the
#: same predicate to its full output AFTER computation.
JOIN_INTERVAL_OVERLAP_BOUNDED = {
    "engine_filter": "probe_okey % 9700 = 0",
    "oracle_sql": """
        WITH iv AS (
            SELECT o_orderpriority AS pri, o_orderkey AS okey,
                   o_orderdate AS s,
                   o_orderdate + INTERVAL (o_orderkey % 30 + 1) DAY AS e
            FROM orders
        )
        SELECT a.pri,
               CAST(a.okey AS BIGINT) AS probe_okey,
               CAST(b.okey AS BIGINT) AS build_okey
        FROM iv a JOIN iv b
          ON a.pri = b.pri
         AND a.okey <> b.okey
         AND a.s < b.e AND b.s < a.e
        WHERE a.okey % 9700 = 0
    """,
    "why": "~x100 pair OUTPUT on the clone arm (55 GB compare RSS); "
           "probe slice tightened 97 -> 9700, every candidate kept",
}


@register(
    "join_interval_overlap",
    oracle="""
        WITH iv AS (
            SELECT o_orderpriority AS pri, o_orderkey AS okey,
                   o_orderdate AS s,
                   o_orderdate + INTERVAL (o_orderkey % 30 + 1) DAY AS e
            FROM orders
        )
        SELECT a.pri,
               CAST(a.okey AS BIGINT) AS probe_okey,
               CAST(b.okey AS BIGINT) AS build_okey
        FROM iv a JOIN iv b
          ON a.pri = b.pri
         AND a.okey <> b.okey
         AND a.s < b.e AND b.s < a.e
        WHERE a.okey % 97 = 0
    """,
    doc="Interval-overlap join: which orders' open spans overlap each "
    "probe order's span, within a priority class — the "
    "concurrent-with-X query (conflict detection, co-occurrence "
    "attribution). The oracle states the raw overlap theta-join; "
    "the Spark plan makes it an EQUI join via time-grid bucketing: "
    "both sides explode to the MONTH buckets their interval "
    "touches (a ≤2-cell fan-out for ≤31-day spans), join on "
    "(pri, month) with the overlap predicate as a residual, and "
    "distinct away double-counted pairs that straddle a month "
    "boundary — the geo_cell_radius_join trick rotated into time. "
    "No BroadcastNestedLoopJoin, no all-pairs: candidate pairs are "
    "bounded by per-(pri, month) co-residency, exactly the "
    "partition pruning a MergeTree range read gives ClickHouse.",
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    iv = o.select(
        F.col("o_orderpriority").alias("pri"),
        F.col("o_orderkey").alias("okey"),
        F.col("o_orderdate").alias("s"),
        F.expr(
            "o_orderdate + make_interval(0, 0, 0,"
            " cast(o_orderkey % 30 + 1 as int), 0, 0, 0)"
        ).alias("e"),
    )
    # half-open [s, e): the last covered day is e - 1 day
    buckets = F.expr(
        "sequence(date_trunc('month', s),"
        " date_trunc('month', e - make_interval(0,0,0,1,0,0,0)),"
        " interval 1 month)"
    )
    a = (
        iv.filter(F.col("okey") % 97 == 0)
        .select(
            "pri",
            F.col("okey").alias("probe_okey"),
            F.col("s").alias("s_a"),
            F.col("e").alias("e_a"),
            F.explode(buckets).alias("m"),
        )
    )
    b = iv.select(
        "pri",
        F.col("okey").alias("build_okey"),
        F.col("s").alias("s_b"),
        F.col("e").alias("e_b"),
        F.explode(buckets).alias("m"),
    )
    pairs = (
        a.join(b, ["pri", "m"])
        .filter(
            (F.col("probe_okey") != F.col("build_okey"))
            & (F.col("s_a") < F.col("e_b"))
            & (F.col("s_b") < F.col("e_a"))
        )
        .select(
            "pri",
            F.col("probe_okey").cast("long").alias("probe_okey"),
            F.col("build_okey").cast("long").alias("build_okey"),
        )
        .distinct()
    )
    return pairs


#: Change-point window half-width (points on each side).
CP_K = 20
#: Mean-shift threshold on the 1e-6 value grid (30 whole units).
CP_THRESHOLD6 = 30_000_000


@register(
    "ts_change_point_flags",
    oracle=f"""
        WITH g AS (
            SELECT event_type, event_id, ts,
                   CAST(FLOOR(value * 1e6) AS BIGINT) AS v6
            FROM events
        ), w AS (
            SELECT event_type, event_id,
                   SUM(v6) OVER (PARTITION BY event_type
                       ORDER BY ts, event_id
                       ROWS BETWEEN {CP_K} PRECEDING AND 1 PRECEDING)
                       AS ls,
                   COUNT(*) OVER (PARTITION BY event_type
                       ORDER BY ts, event_id
                       ROWS BETWEEN {CP_K} PRECEDING AND 1 PRECEDING)
                       AS nl,
                   SUM(v6) OVER (PARTITION BY event_type
                       ORDER BY ts, event_id
                       ROWS BETWEEN CURRENT ROW
                            AND {CP_K - 1} FOLLOWING) AS rs,
                   COUNT(*) OVER (PARTITION BY event_type
                       ORDER BY ts, event_id
                       ROWS BETWEEN CURRENT ROW
                            AND {CP_K - 1} FOLLOWING) AS nr
            FROM g
        )
        SELECT event_type,
               CAST(event_id AS BIGINT) AS event_id,
               CAST(ABS(ls * nr - rs * nl) AS BIGINT) AS gap_num
        FROM w
        WHERE nl = {CP_K} AND nr = {CP_K}
          AND ABS(ls * nr - rs * nl) > {CP_THRESHOLD6}::BIGINT * nl * nr
    """,
    doc=f"Mean-shift change-point flags: points where the trailing-"
    f"{CP_K} and leading-{CP_K} window means differ by more than 30 "
    "value units — the CUSUM-style level-shift detector behind "
    "alerting on metric regressions. Exactness: values on the 1e-6 "
    "integer grid, and the mean comparison is cleared of divisions "
    "— |ls·nr − rs·nl| > T·nl·nr — so every compared quantity is "
    "an exact int64 (max ≈ 20·3.3e8·20 ≈ 1.3e11). Two sum + two "
    "count frames over ONE (series, ts) sort — Spark evaluates all "
    "four in a single Window operator; one shuffle total. "
    "Partial-edge rows (incomplete windows) are excluded, so the "
    "flag set is well-defined at any scale.",
)
def ts_change_point_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        "ts",
        F.floor(F.col("value") * F.lit(1e6)).cast("long").alias("v6"),
    )
    base = Window.partitionBy("event_type").orderBy("ts", "event_id")
    w_l = base.rowsBetween(-CP_K, -1)
    w_r = base.rowsBetween(Window.currentRow, CP_K - 1)
    w = ev.select(
        "event_type",
        "event_id",
        F.sum("v6").over(w_l).alias("ls"),
        F.count(F.lit(1)).over(w_l).alias("nl"),
        F.sum("v6").over(w_r).alias("rs"),
        F.count(F.lit(1)).over(w_r).alias("nr"),
    )
    gap = F.abs(F.col("ls") * F.col("nr") - F.col("rs") * F.col("nl"))
    thresh = F.lit(CP_THRESHOLD6).cast("long") * F.col("nl") * F.col("nr")
    return (
        w.filter(
            (F.col("nl") == CP_K)
            & (F.col("nr") == CP_K)
            & (gap > thresh)
        )
        .select(
            "event_type",
            F.col("event_id").cast("long").alias("event_id"),
            gap.cast("long").alias("gap_num"),
        )
    )


@register(
    "date_timeslots",
    oracle="""
        WITH iv AS (
            SELECT event_type,
                   epoch_us(ts) AS t_us,
                   (event_id % 45 + 5) * 60000000 AS dur_us
            FROM events
        ), slots AS (
            SELECT event_type,
                   unnest(range(t_us // 1800000000 * 1800,
                                (t_us + dur_us - 1) // 1800000000 * 1800
                                    + 1800,
                                1800)) AS slot_sec
            FROM iv
        )
        SELECT event_type,
               CAST(slot_sec AS BIGINT) AS slot_sec,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM slots GROUP BY event_type, slot_sec
    """,
    doc="ClickHouse timeSlots(StartTime, Duration, 1800): explode "
    "each event's active span (synthetic deterministic duration "
    "event_id%45+5 minutes) into the 30-minute wall-clock slots it "
    "touches, then count activity per (series, slot) — the "
    "concurrent-session-per-slot shape behind load heatmaps. All "
    "slot arithmetic is integer epoch math (floor-division to the "
    "1800 s grid, half-open [t, t+dur)); the fan-out is bounded by "
    "duration/slot_size (≤ 2 here). One explode + one two-phase "
    "agg keyed by the slot grid — the win_sliding_distinct fan-out "
    "pattern with a data-dependent span.",
)
def date_timeslots(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.unix_micros("ts").alias("t_us"),
        ((F.col("event_id") % 45 + 5) * F.lit(60000000)).alias("dur_us"),
    )
    slots = ev.select(
        "event_type",
        F.explode(
            F.expr(
                "sequence(t_us div 1800000000 * 1800,"
                " (t_us + dur_us - 1) div 1800000000 * 1800,"
                " 1800)"
            )
        ).alias("slot_sec"),
    )
    return slots.groupBy("event_type", "slot_sec").agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    ).select(
        "event_type",
        F.col("slot_sec").cast("long").alias("slot_sec"),
        "n_events",
    )


@register(
    "str_normalized_query_hash",
    oracle="""
        WITH n AS (
            SELECT regexp_replace(props, '[0-9]+', '?', 'g') AS shape
            FROM events
        )
        SELECT shape,
               md5(shape) AS shape_hash,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM n GROUP BY shape
    """,
    doc="ClickHouse normalizeQuery / normalizedQueryHash: replace "
    "numeric literals with placeholders and group by the resulting "
    "SHAPE — the query-log clustering trick, applied to the props "
    "payloads ('{\"k\": 87}' and '{\"k\": 12}' are the same shape "
    "'{\"k\": ?}'). The digit-class regexp is dialect-neutral; md5 "
    "of the normalized string is the portable shape id "
    "(bit-identical hex both engines). Map-side normalize + one "
    "vocabulary-bounded agg — shape cardinality, not row "
    "cardinality, reaches the reducer.",
)
def str_normalized_query_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.regexp_replace("props", "[0-9]+", "?").alias("shape")
    )
    return ev.groupBy("shape").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    ).select("shape", F.md5("shape").alias("shape_hash"), "n")


@register(
    "stats_mean_ci",
    oracle="""
        WITH g AS (
            SELECT event_type,
                   CAST(FLOOR(value * 1e4) AS BIGINT) AS v4
            FROM events
        ), a AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(v4) AS BIGINT) AS s,
                   SUM(CAST(v4 AS DECIMAL(38,0))
                       * CAST(v4 AS DECIMAL(38,0))) AS ssq
            FROM g GROUP BY event_type
        )
        -- var_num grows as n²·σ² and exceeds int64 already at sf0.1
        -- (≈1e20); serialize the exact DECIMAL(38,0) as a string so
        -- the pinned value survives any row count with no overflow
        -- cast in either engine (ANSI Spark would throw on BIGINT).
        SELECT event_type, n, s,
               CAST(CAST(CAST(n AS DECIMAL(38,0)) * ssq
                    - CAST(s AS DECIMAL(38,0))
                      * CAST(s AS DECIMAL(38,0)) AS DECIMAL(38,0))
                    AS VARCHAR) AS var_num,
               (CAST(s AS DOUBLE) / n) / 10000.0 AS mean,
               1.96 * sqrt(CAST(CAST(n AS DECIMAL(38,0)) * ssq
                    - CAST(s AS DECIMAL(38,0))
                      * CAST(s AS DECIMAL(38,0)) AS DOUBLE)
                    / (1.0 * n * (n - 1)) / n) / 10000.0 AS ci_half
        FROM a
    """,
    doc="Mean with a 95% confidence half-width per series (the "
    "studentTTest/meanZTest building block): n, Σx, and the "
    "variance NUMERATOR n·Σx² − (Σx)² are computed exactly — "
    "values on the 1e-4 integer grid, squares summed in "
    "DECIMAL(38,0) so the order-free exactness survives any row "
    "count (int64 would overflow near 10^5 rows per group — it "
    "already does at sf0.1 — so var_num is emitted as the exact "
    "decimal's string form, never cast down; 16-byte decimal is "
    "still a plain two-phase hash agg). The only doubles are "
    "the final mean and 1.96·sqrt(var/n) — identical IEEE "
    "expression trees. One shuffle; the checked var_num pins the "
    "entire second moment.",
)
def stats_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    d0 = "decimal(38,0)"
    g = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * F.lit(1e4)).cast("long").alias("v4"),
    )
    a = g.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v4").cast("long").alias("s"),
        F.sum(F.col("v4").cast(d0) * F.col("v4").cast(d0)).alias("ssq"),
    )
    var_num_dec = (
        F.col("n").cast(d0) * F.col("ssq")
        - F.col("s").cast(d0) * F.col("s").cast(d0)
    )
    var = var_num_dec.cast("double") / (
        F.lit(1.0) * F.col("n") * (F.col("n") - 1)
    )
    return a.select(
        "event_type",
        "n",
        "s",
        var_num_dec.cast("decimal(38,0)").cast("string").alias("var_num"),
        ((F.col("s").cast("double") / F.col("n")) / F.lit(10000.0)).alias(
            "mean"
        ),
        (
            F.lit(1.96) * F.sqrt(var / F.col("n")) / F.lit(10000.0)
        ).alias("ci_half"),
    )


@register(
    "text_word_cooccurrence",
    oracle="""
        WITH t AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '\\s+'),
                       x -> x <> '') AS toks
            FROM documents
        ), pairs AS (
            SELECT unnest(list_slice(toks, 1, len(toks) - 1)) AS w1,
                   unnest(list_slice(toks, 2, len(toks))) AS w2
            FROM t WHERE len(toks) >= 2
        ), c AS (
            SELECT w1, w2, COUNT(*) AS n FROM pairs GROUP BY w1, w2
        )
        SELECT w1, w2, CAST(n AS BIGINT) AS n FROM c
        ORDER BY n DESC, w1, w2 LIMIT 20
    """,
    doc="Adjacent word co-occurrence, global top-20 — the skip-gram "
    "window-1 pair counting that seeds word-embedding training and "
    "collocation mining. The pair stream comes from zipping each "
    "token list with its own tail (DuckDB: lockstep dual unnest of "
    "the two slices; Spark: arrays_zip + explode — identical pair "
    "sequences), then one word-pair-keyed two-phase agg and a "
    "total-ordered (count DESC, w1, w2) top-k that Spark executes "
    "as TakeOrderedAndProject. Pair vocabulary bounds the shuffle; "
    "the token stream never leaves the mappers unaggregated.",
)
def text_word_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhousebackup_spark.tables import parallelize as _par

    d = _par(load_table(spark, sf_dir, "documents"))
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "")
    t = d.select(toks.alias("toks")).filter(F.size("toks") >= 2)
    pairs = t.select(
        F.explode(
            F.arrays_zip(
                F.slice(F.col("toks"), 1, F.size("toks") - 1),
                F.expr("slice(toks, 2, size(toks) - 1)"),
            )
        ).alias("p")
    ).select(
        F.col("p").getField("0").alias("w1"),
        F.col("p").getField("1").alias("w2"),
    )
    c = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n"))
    return (
        c.orderBy(F.col("n").desc(), "w1", "w2")
        .limit(20)
        .select("w1", "w2", F.col("n").cast("long").alias("n"))
    )
