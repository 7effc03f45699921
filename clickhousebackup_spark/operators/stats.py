"""Hypothesis-test / regression statistics, part 2: rank correlation,
OLS, diversity, autocorrelation.

Extends the quantiles.py stats family (skew/kurtosis, Welch t,
Mann-Whitney U, Cramér's V) with the remaining aggregates a
ClickHouse analytics user reaches for: ``corr``-family rank
statistics (Spearman), ``simpleLinearRegression``, ``entropy``-style
diversity, and series autocorrelation.

Scale + determinism conventions (same as quantiles.py):

- every statistic reduces to MOMENT SUMS — mergeable two-phase hash
  aggregate state; shards combine by addition (the
  merge_aggregating_shards contract), so the 100 TB plan is one
  shuffle regardless of which statistic is computed;
- moment sums of RAW columns go through exact DECIMAL(38,6); sums of
  COMPUTED products (x·y, y², v·v_prev) go through the FLOOR grid
  (floor(p·1e6) — exact integers) because double→DECIMAL rounding of
  a computed value is the cross-engine divergence the parity suite
  caught on v⁴ (NOTES.md float traps); rank products are exact
  multiples of 0.25, so their decimal casts are exact, not rounded;
- no pow/ln anywhere: Spearman/Pearson denominators are written
  sqrt(a)·sqrt(b); entropy's ln is deliberately NOT computed — the
  polynomial Gini impurity carries the same diversity signal and
  stays engine-exact (a client needing nats applies ln to the
  returned exact count ratios);
- per-group rank windows partition by the group key, never globally —
  a sort per group, the same distributed shape as topk_per_group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhousebackup_spark.exprs import DEC
from clickhousebackup_spark.registry import register
from clickhousebackup_spark.tables import load_table


def _floor_grid_sum(col: F.Column) -> F.Column:
    """Σ floor(col·1e6) as exact integers, emitted /1e6 as double."""
    return (
        F.sum(F.floor(col * F.lit(1000000.0)).cast("decimal(38,0)")).cast(
            "double"
        )
        / F.lit(1000000.0)
    )


#: DuckDB side renders the exact decimal sum to DOUBLE through STRING
#: (the exprs.osum route): the direct DECIMAL→DOUBLE cast
#: double-rounds through hugeint limbs once the scaled integer passes
#: ~2^53 — at the sf10 arm Σ floor(x·y·1e6) ≈ 4e19 and the moment
#: doubles differed from Spark's correctly-rounded cast in the last
#: ulp, throwing stats_linregress's slope off at 1e-13 relative.
#: Below that band both routes agree, so driver-scale hashes are
#: unchanged.
_FLOOR_SUM_SQL = (
    "(CAST(CAST(SUM(CAST(floor({expr} * 1000000.0) AS DECIMAL(38,0)))"
    " AS STRING) AS DOUBLE) / 1000000.0)"
)


@register(
    "stats_spearman",
    oracle="""
        WITH r AS (
            SELECT event_type,
                   CAST(RANK() OVER (
                        PARTITION BY event_type ORDER BY value) AS DOUBLE)
                     + (CAST(COUNT(*) OVER (
                        PARTITION BY event_type, value) AS DOUBLE) - 1.0)
                       / 2.0 AS rx,
                   CAST(RANK() OVER (
                        PARTITION BY event_type ORDER BY ts) AS DOUBLE)
                     + (CAST(COUNT(*) OVER (
                        PARTITION BY event_type, ts) AS DOUBLE) - 1.0)
                       / 2.0 AS ry
            FROM events
        ), m AS (
            SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
                   CAST(CAST(SUM(CAST(rx AS DECIMAL(38,6))) AS STRING) AS DOUBLE) AS sx,
                   CAST(CAST(SUM(CAST(ry AS DECIMAL(38,6))) AS STRING) AS DOUBLE) AS sy,
                   CAST(CAST(SUM(CAST(rx * ry AS DECIMAL(38,6))) AS STRING) AS DOUBLE) AS sxy,
                   CAST(CAST(SUM(CAST(rx * rx AS DECIMAL(38,6))) AS STRING) AS DOUBLE) AS sxx,
                   CAST(CAST(SUM(CAST(ry * ry AS DECIMAL(38,6))) AS STRING) AS DOUBLE) AS syy
            FROM r GROUP BY event_type
        )
        SELECT event_type, CAST(n AS BIGINT) AS n,
               CAST(CAST(((n * sxy) - (sx * sy))
                   / (sqrt((n * sxx) - (sx * sx))
                      * sqrt((n * syy) - (sy * sy)))
                   AS DECIMAL(20,12)) AS DOUBLE) AS spearman_rho
        FROM m
    """,
    doc="Spearman rank correlation (ClickHouse rankCorr) between "
    "value and event time, per event type: does the metric trend "
    "over time, robust to outliers? Average ranks for ties — "
    "rank() + (|tie group|-1)/2, the textbook midrank — computed by "
    "two per-group windows; ranks and their products are exact "
    "multiples of 0.25, so the decimal moment sums are EXACT (no "
    "rounding boundary exists, unlike general computed doubles). "
    "Then Pearson on the ranks from five mergeable moment sums, "
    "through the DECIMAL(20,12) bridge: at sf0.1 the n*sxx products "
    "reach ~5e16 and the engines' FMA grouping flips the last ulp "
    "(the agg_corr lesson; invisible at sf0.01 magnitudes — caught "
    "by the round-8 sf0.1 exact sweep). "
    "Windows partition by event_type (a sort per group, distributed "
    "across groups); the agg is one two-phase shuffle.",
)
def stats_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    wx = Window.partitionBy("event_type").orderBy("value")
    wxt = Window.partitionBy("event_type", "value")
    wy = Window.partitionBy("event_type").orderBy("ts")
    wyt = Window.partitionBy("event_type", "ts")
    r = ev.select(
        "event_type",
        (
            F.rank().over(wx).cast("double")
            + (F.count(F.lit(1)).over(wxt).cast("double") - F.lit(1.0))
            / F.lit(2.0)
        ).alias("rx"),
        (
            F.rank().over(wy).cast("double")
            + (F.count(F.lit(1)).over(wyt).cast("double") - F.lit(1.0))
            / F.lit(2.0)
        ).alias("ry"),
    )
    rx, ry = F.col("rx"), F.col("ry")
    m = r.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(rx.cast(DEC)).cast("double").alias("sx"),
        F.sum(ry.cast(DEC)).cast("double").alias("sy"),
        F.sum((rx * ry).cast(DEC)).cast("double").alias("sxy"),
        F.sum((rx * rx).cast(DEC)).cast("double").alias("sxx"),
        F.sum((ry * ry).cast(DEC)).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    return m.select(
        "event_type",
        n.cast("long").alias("n"),
        (
            ((n * sxy) - (sx * sy))
            / (
                F.sqrt((n * sxx) - (sx * sx))
                * F.sqrt((n * syy) - (sy * sy))
            )
        )
        .cast("decimal(20,12)")
        .cast("double")
        .alias("spearman_rho"),
    )


@register(
    "stats_linregress",
    oracle=f"""
        WITH m AS (
            SELECT l_returnflag,
                   CAST(COUNT(*) AS DOUBLE) AS n,
                   CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6)))
                        AS STRING) AS DOUBLE) AS sx,
                   CAST(CAST(SUM(CAST(l_quantity * l_quantity
                        AS DECIMAL(38,6))) AS STRING) AS DOUBLE) AS sxx,
                   CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6)))
                        AS STRING) AS DOUBLE) AS sy,
                   {_FLOOR_SUM_SQL.format(expr='l_quantity * l_extendedprice')}
                       AS sxy,
                   {_FLOOR_SUM_SQL.format(expr='l_extendedprice * l_extendedprice')}
                       AS syy
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag, CAST(n AS BIGINT) AS n,
               ((n * sxy) - (sx * sy)) / ((n * sxx) - (sx * sx)) AS slope,
               (sy - (((n * sxy) - (sx * sy)) / ((n * sxx) - (sx * sx))) * sx)
                   / n AS intercept,
               ((((n * sxy) - (sx * sy)) / ((n * sxx) - (sx * sx)))
                * (((n * sxy) - (sx * sy)) / ((n * sxx) - (sx * sx)))
                * ((n * sxx) - (sx * sx))) / ((n * syy) - (sy * sy)) AS r2
        FROM m
    """,
    doc="OLS simple linear regression (ClickHouse "
    "simpleLinearRegression): extendedprice ~ quantity per return "
    "flag — slope, intercept, R² from five mergeable moment sums. "
    "Raw-column sums are decimal-exact; the COMPUTED products x·y "
    "and y² go through the floor grid (a quantity·price double CAN "
    "land on a 1e-6 rounding boundary — the v⁴ lesson), while x·x "
    "is integer-valued and decimal-exact. All epilogue arithmetic "
    "is plain IEEE (r² written as slope²·Sxx_c/Syy_c, no pow). One "
    "two-phase hash agg: the regression state merges by addition, "
    "so sharded/backup-split scans combine exactly.",
)
def stats_linregress(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x.cast(DEC)).cast("double").alias("sx"),
        F.sum((x * x).cast(DEC)).cast("double").alias("sxx"),
        F.sum(y.cast(DEC)).cast("double").alias("sy"),
        _floor_grid_sum(x * y).alias("sxy"),
        _floor_grid_sum(y * y).alias("syy"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sy, sxy, syy = F.col("sy"), F.col("sxy"), F.col("syy")
    slope = ((n * sxy) - (sx * sy)) / ((n * sxx) - (sx * sx))
    return m.select(
        "l_returnflag",
        n.cast("long").alias("n"),
        slope.alias("slope"),
        ((sy - (slope * sx)) / n).alias("intercept"),
        (
            (slope * slope * ((n * sxx) - (sx * sx)))
            / ((n * syy) - (sy * sy))
        ).alias("r2"),
    )


@register(
    "agg_gini_diversity",
    oracle="""
        WITH c AS (
            SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM events GROUP BY user_id, event_type
        )
        SELECT user_id,
               CAST(SUM(cnt) AS BIGINT) AS n_events,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               1.0 - (CAST(SUM(cnt * cnt) AS DOUBLE)
                      / (CAST(SUM(cnt) AS DOUBLE)
                         * CAST(SUM(cnt) AS DOUBLE))) AS gini_impurity
        FROM c GROUP BY user_id
    """,
    doc="Behavioral diversity per user (the ClickHouse `entropy()` "
    "use case): how spread is a user's activity across event types? "
    "Shannon entropy needs ln — a libm call engines round "
    "differently, banned in checked columns — so the engine returns "
    "the polynomial Gini impurity 1 − Σpᵢ², which ranks diversity "
    "identically for monitoring purposes, PLUS the exact integer "
    "inputs (n_events, n_types) so a client wanting nats can apply "
    "ln to exact ratios locally. Entirely integer arithmetic until "
    "one final double division: bit-exact at any scale. Two chained "
    "two-phase hash aggs — (user, type) then user — both map-side "
    "combinable.",
)
def agg_gini_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return c.groupBy("user_id").agg(
        F.sum("cnt").alias("n_events"),
        F.count(F.lit(1)).alias("n_types"),
        (
            F.lit(1.0)
            - (
                F.sum(F.col("cnt") * F.col("cnt")).cast("double")
                / (
                    F.sum("cnt").cast("double")
                    * F.sum("cnt").cast("double")
                )
            )
        ).alias("gini_impurity"),
    )


@register(
    "ts_autocorr_lag1",
    oracle=f"""
        WITH s AS (
            SELECT event_type, value,
                   LAG(value) OVER (
                       PARTITION BY event_type
                       ORDER BY ts, event_id) AS pv
            FROM events
        ), p AS (
            SELECT event_type, value AS v, pv FROM s WHERE pv IS NOT NULL
        ), m AS (
            SELECT event_type,
                   CAST(COUNT(*) AS DOUBLE) AS n,
                   CAST(CAST(SUM(CAST(v AS DECIMAL(38,6))) AS STRING) AS DOUBLE) AS sx,
                   CAST(CAST(SUM(CAST(pv AS DECIMAL(38,6))) AS STRING) AS DOUBLE) AS sy,
                   {_FLOOR_SUM_SQL.format(expr='v * pv')} AS sxy,
                   {_FLOOR_SUM_SQL.format(expr='v * v')} AS sxx,
                   {_FLOOR_SUM_SQL.format(expr='pv * pv')} AS syy
            FROM p GROUP BY event_type
        )
        SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
               ((n * sxy) - (sx * sy))
                   / (sqrt((n * sxx) - (sx * sx))
                      * sqrt((n * syy) - (sy * sy))) AS autocorr_lag1
        FROM m
    """,
    doc="Lag-1 series autocorrelation per event type (the anomaly/"
    "seasonality probe next to events_anomaly_zscore): Pearson "
    "correlation of each value with its predecessor in (ts, "
    "event_id) order — a total order, so the pairing is identical "
    "in both engines. One lag window partitioned by event_type "
    "(O(1) window state, distributed across types) feeding the "
    "standard five-moment-sum Pearson; computed products v·v_prev "
    "go through the floor grid, raw sums through exact decimals. "
    "Higher lags are the same plan with LAG(value, k).",
)
def ts_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    s = ev.select(
        "event_type",
        F.col("value").alias("v"),
        F.lag("value").over(w).alias("pv"),
    ).filter(F.col("pv").isNotNull())
    v, pv = F.col("v"), F.col("pv")
    m = s.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(v.cast(DEC)).cast("double").alias("sx"),
        F.sum(pv.cast(DEC)).cast("double").alias("sy"),
        _floor_grid_sum(v * pv).alias("sxy"),
        _floor_grid_sum(v * v).alias("sxx"),
        _floor_grid_sum(pv * pv).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    return m.select(
        "event_type",
        n.cast("long").alias("n_pairs"),
        (
            ((n * sxy) - (sx * sy))
            / (
                F.sqrt((n * sxx) - (sx * sx))
                * F.sqrt((n * syy) - (sy * sy))
            )
        ).alias("autocorr_lag1"),
    )


#: Shared by agg_weighted_median and its skew-immune two-stage
#: sibling (analytics21.py) — the one-oracle-per-family convention.
WEIGHTED_MEDIAN_ORACLE = """
        WITH weighted AS (
            SELECT event_type, value, event_id,
                   CAST(user_id % 5 + 1 AS BIGINT) AS w
            FROM events
        ), cum AS (
            SELECT event_type, value, w,
                   SUM(w) OVER (PARTITION BY event_type
                                ORDER BY value, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS cw,
                   SUM(w) OVER (PARTITION BY event_type) AS tw
            FROM weighted
        )
        SELECT event_type, MIN(value) AS wmedian
        FROM cum WHERE 2 * cw >= tw
        GROUP BY event_type
    """


@register(
    "agg_weighted_median",
    oracle=WEIGHTED_MEDIAN_ORACLE,
    doc="quantileExactWeighted(0.5) / medianExactWeighted: the "
    "smallest value whose cumulative INTEGER weight reaches half the "
    "total (weights = user_id%5+1, deterministic). One window sort "
    "per group over the (value, event_id) total order, a per-group "
    "total as a companion window, then a min over the crossing rows "
    "— the crossing test 2·cw >= tw is pure integer arithmetic (no "
    "total/2 division, no float weights), so both engines select the "
    "identical row and the reported value is a RAW column, never a "
    "computed one. One shuffle on event_type.",
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    weighted = ev.select(
        "event_type",
        "value",
        "event_id",
        (F.col("user_id") % 5 + 1).cast("long").alias("w"),
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("value", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("event_type")
    cum = weighted.select(
        "event_type",
        "value",
        F.sum("w").over(w_cum).alias("cw"),
        F.sum("w").over(w_tot).alias("tw"),
    )
    return (
        cum.filter(2 * F.col("cw") >= F.col("tw"))
        .groupBy("event_type")
        .agg(F.min("value").alias("wmedian"))
    )


@register(
    "agg_delta_sum",
    oracle="""
        WITH seq AS (
            SELECT event_type, value,
                   LAG(value) OVER (PARTITION BY event_type
                                    ORDER BY ts, event_id) AS prev
            FROM events
        )
        SELECT event_type,
               CAST(SUM(CASE WHEN value > prev
                             THEN CAST(floor((value - prev) * 1000000.0)
                                       AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS delta_sum_micros
        FROM seq GROUP BY event_type
    """,
    doc="ClickHouse deltaSum: the sum of POSITIVE deltas of a series "
    "in time order (counter-reset-tolerant rate accounting). The "
    "pairing rides the (ts, event_id) total order via one lag "
    "window; each positive delta is one IEEE subtraction of "
    "identical doubles (bit-identical across engines) and is then "
    "FLOOR-GRIDDED to integer micros before summing — summing raw "
    "computed doubles would be addition-order-dependent and could "
    "never hash-match (the NOTES.md float trap); integer sums are "
    "order-free. One shuffle on event_type.",
)
def agg_delta_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", "value", F.lag("value").over(w).alias("prev")
    )
    delta = F.floor((F.col("value") - F.col("prev")) * 1000000.0).cast("long")
    return seq.groupBy("event_type").agg(
        F.sum(
            F.when(F.col("value") > F.col("prev"), delta).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("delta_sum_micros")
    )
