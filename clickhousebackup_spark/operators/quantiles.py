"""Quantiles, ordered collections, correlation, positional explode
(wave 3 — rounding out the aggregate vocabulary).

``agg_percentile_exact`` computes interpolated quantiles from explicit
row_number arithmetic, identically in both engines — engine-native
``percentile``/``quantile_cont`` interpolate with different FMA
groupings ((1-g)a+gb vs a+(b-a)g) and can differ in the last ulp,
which the value-hash would catch. ``agg_percentile_approx`` is the
at-scale variant (fixed-size sketch, single pass) and rows-only.

``agg_corr`` uses the decimal-sum covariance formula for the same
reason: engine-native CORR folds doubles in partition order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhousebackup_spark.exprs import dsum, osum
from clickhousebackup_spark.registry import register
from clickhousebackup_spark.tables import load_table

QS = (0.25, 0.5, 0.75)


def _quantile_cols_sql() -> str:
    parts = []
    for q in QS:
        name = f"q{int(q * 100)}"
        lo = (
            f"MAX(CASE WHEN rn = CAST(floor((n - 1) * {q}) AS BIGINT) + 1 "
            f"THEN value END)"
        )
        hi = (
            f"MAX(CASE WHEN rn = least(CAST(floor((n - 1) * {q}) AS BIGINT) + 2, n) "
            f"THEN value END)"
        )
        g = f"(((MAX(n) - 1) * {q}) - floor((MAX(n) - 1) * {q}))"
        parts.append(f"{lo} + {g} * ({hi} - {lo}) AS {name}")
    return ",".join(parts)


@register(
    "agg_percentile_exact",
    oracle=f"""
        WITH ranked AS (
            SELECT event_type, value,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY value, event_id) AS rn,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM events
        )
        SELECT event_type, {_quantile_cols_sql()}
        FROM ranked GROUP BY event_type
    """,
    doc="Exact interpolated quartiles of value per event_type via "
    "shared row_number arithmetic (bit-identical across engines).",
)
def agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    # the interpolation weight g is constant per group but must be
    # aggregate-legal, hence the max(n) identity wrapper
    out_aggs = []
    for q in QS:
        pos = (F.max("n") - 1) * F.lit(q)
        lo_rn = F.floor(pos).cast("long") + 1
        hi_rn = F.least(lo_rn + 1, F.max("n"))
        g = pos - F.floor(pos)
        lo = F.max(F.when(F.col("rn") == F.floor((F.col("n") - 1) * F.lit(q)).cast("long") + 1, F.col("value")))
        hi = F.max(
            F.when(
                F.col("rn")
                == F.least(
                    F.floor((F.col("n") - 1) * F.lit(q)).cast("long") + 2,
                    F.col("n"),
                ),
                F.col("value"),
            )
        )
        out_aggs.append((lo + g * (hi - lo)).alias(f"q{int(q * 100)}"))
    return ranked.groupBy("event_type").agg(*out_aggs)


@register(
    "agg_percentile_approx",
    oracle=None,  # sketch-based estimate is engine-specific
    doc="approx_percentile — the single-pass fixed-memory quantile for "
    "100 TB (KLL/GK sketch); accuracy bound unit-testable, values not "
    "hashable cross-engine.",
)
def agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # scalar columns only — the driver's canonicalizer sorts/hashes every
    # output column and cannot handle array cells, so the sketch's three
    # quantiles are projected out of the array immediately
    sketch = ev.groupBy("event_type").agg(
        F.percentile_approx("value", list(QS), 10000).alias("quartiles")
    )
    return sketch.select(
        "event_type",
        F.element_at("quartiles", 1).alias("q25"),
        F.element_at("quartiles", 2).alias("q50"),
        F.element_at("quartiles", 3).alias("q75"),
    )


@register(
    "agg_collect_sorted",
    oracle="""
        SELECT o_custkey,
               len(list(o_orderkey)) AS n_orders,
               string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey)
                   AS order_keys_csv
        FROM orders
        WHERE o_totalprice > 150000
        GROUP BY o_custkey
    """,
    doc="Ordered collection aggregates: array_sort(collect_list) joined "
    "to a CSV string (collect order is shuffle-nondeterministic, so the "
    "sort IS the determinism discipline). Scalar output only — the "
    "driver canonicalizer can't hash array cells.",
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 150000
    )
    keys = F.array_sort(F.collect_list("o_orderkey"))
    return o.groupBy("o_custkey").agg(
        F.size(keys).cast("long").alias("n_orders"),
        F.array_join(
            F.transform(keys, lambda x: x.cast("string")), ","
        ).alias("order_keys_csv"),
    )


@register(
    "agg_corr",
    oracle=f"""
        WITH raw AS (
        SELECT l_returnflag,
               ({osum('l_quantity * l_extendedprice')}
                - {osum('l_quantity')} * {osum('l_extendedprice')} / COUNT(*))
               / sqrt(({osum('l_quantity * l_quantity')}
                       - {osum('l_quantity')} * {osum('l_quantity')} / COUNT(*))
                      * ({osum('l_extendedprice * l_extendedprice')}
                         - {osum('l_extendedprice')} * {osum('l_extendedprice')} / COUNT(*)))
                   AS corr_raw
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(CAST(corr_raw AS DECIMAL(20,12)) AS DOUBLE) AS corr_qty_price
    FROM raw
    """,
    doc="Pearson correlation from exact decimal sums (native CORR "
    "folds doubles in partition order — nondeterministic). The final "
    "value crosses a DECIMAL(20,12) bridge: the two engines' compilers "
    "group the divide/sqrt chain differently (FMA), which flips the "
    "last ulp; quantizing at 1e-12 absorbs it.",
)
def agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    n = F.count(F.lit(1))
    sq, sp = dsum(q), dsum(p)
    sqp = dsum(q * p)
    sqq, spp = dsum(q * q), dsum(p * p)
    corr = (sqp - sq * sp / n) / F.sqrt(
        (sqq - sq * sq / n) * (spp - sp * sp / n)
    )
    return li.groupBy("l_returnflag").agg(
        corr.cast("decimal(20,12)").cast("double").alias("corr_qty_price")
    )


@register(
    "posexplode_words",
    oracle="""
        SELECT doc_id,
               unnest(range(0, least(len(string_split_regex(lower(text), '\\s+')), 5))) AS pos,
               unnest(string_split_regex(lower(text), '\\s+')[1:5]) AS word
        FROM documents
    """,
    doc="Positional explode (posexplode) of the first 5 tokens — "
    "DuckDB's lockstep multi-unnest as the oracle.",
)
def posexplode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    words = F.slice(F.split(F.lower("text"), r"\s+"), 1, 5)
    return (
        d.select("doc_id", F.posexplode(words).alias("pos", "word"))
        # posexplode's ordinal is int32; the oracle's range() is int64 —
        # pin the driver-visible type.
        .withColumn("pos", F.col("pos").cast("long"))
    )


@register(
    "agg_mode",
    oracle="""
        SELECT o_orderstatus, o_orderpriority AS mode_priority,
               CAST(n AS BIGINT) AS n
        FROM (
            SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
                   ROW_NUMBER() OVER (
                       PARTITION BY o_orderstatus
                       ORDER BY COUNT(*) DESC, o_orderpriority) AS rn
            FROM orders GROUP BY o_orderstatus, o_orderpriority
        ) WHERE rn = 1
    """,
    doc="Mode (most frequent value) per group with a total-order "
    "tiebreak (count desc, value asc) — two-phase count then a "
    "group-limit window; never a collect-and-count.",
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("n").desc(), F.col("o_orderpriority")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("n").cast("long").alias("n"),
        )
    )
