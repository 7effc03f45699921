"""Pivot / unpivot + second-wave relational operators (guide §Common
OLAP patterns; beyond SURVEY §2's minimum so a reference user keeps
their full query vocabulary).

Scale notes: ``pivot`` with an explicit value list compiles to one
hash aggregate with N conditional columns — no extra shuffle vs the
plain groupBy; never call it without the value list (that adds a
distinct-scan job first). ``unpivot``/stack is a generator projection,
map-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhousebackup_spark.exprs import ogsum
from clickhousebackup_spark.operators.distrank import global_order_scan, ntile_from_pos
from clickhousebackup_spark.registry import register
from clickhousebackup_spark.tables import load_table

EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


@register(
    "pivot_counts",
    oracle=f"""
        SELECT user_id,
               {", ".join(f"COUNT(CASE WHEN event_type = '{t}' THEN 1 END) AS n_{t}"
                          for t in EVENT_TYPES)}
        FROM events GROUP BY user_id
    """,
    doc="Pivot event_type → columns (explicit value list = single "
    "hash-agg, no pre-scan for distinct values).",
)
def pivot_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    # pivot leaves value-named columns; align names + null→0 with oracle
    for t in EVENT_TYPES:
        out = out.withColumnRenamed(t, f"n_{t}").withColumn(
            f"n_{t}", F.coalesce(F.col(f"n_{t}"), F.lit(0))
        )
    return out


@register(
    "unpivot_measures",
    oracle="""
        SELECT l_orderkey, l_linenumber, 'quantity' AS measure,
               l_quantity AS val FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'price', l_extendedprice FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
    """,
    doc="Unpivot three measures to rows via stack() (generator "
    "projection, map-only, no shuffle).",
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(3, 'quantity', l_quantity, 'price', l_extendedprice, "
            "'discount', l_discount) AS (measure, val)"
        ),
    )


@register(
    "agg_stats",
    oracle=f"""
        SELECT event_type,
               ({ogsum('value * value')}
                - {ogsum('value')} * {ogsum('value')} / COUNT(value))
                   / (COUNT(value) - 1) AS var_value,
               sqrt(({ogsum('value * value')}
                - {ogsum('value')} * {ogsum('value')} / COUNT(value))
                   / (COUNT(value) - 1)) AS stddev_value,
               {ogsum('value')} / COUNT(value) AS mean_value
        FROM events GROUP BY event_type
    """,
    doc="Sample variance/stddev from exact grid sums (engine-native "
    "STDDEV folds doubles in partition order — nondeterministic; the "
    "sum-of-squares formula is order-free and bit-identical). "
    "Round-14: migrated from DECIMAL(38,6) dsum to the exprs.gsum "
    "floor-grid (exact-at-any-scale — the DECIMAL(38,6) per-row "
    "ROUND of the computed v² and DuckDB's hugeint->double "
    "double-rounding were this key's sf1 frontier).",
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhousebackup_spark.exprs import gsum

    ev = load_table(spark, sf_dir, "events")
    s1 = gsum("value")
    s2 = gsum(F.col("value") * F.col("value"))
    n = F.count("value")
    var = (s2 - s1 * s1 / n) / (n - 1)
    return ev.groupBy("event_type").agg(
        var.alias("var_value"),
        F.sqrt(var).alias("stddev_value"),
        (s1 / n).alias("mean_value"),
    )


#: Shared by win_percent_rank and its skew-immune two-stage sibling
#: (analytics21.py) — the one-oracle-per-family convention.
PERCENT_RANK_ORACLE = """
        SELECT o_orderkey, o_orderstatus, o_totalprice,
               PERCENT_RANK() OVER w AS pct_rank,
               CUME_DIST() OVER w AS cume
        FROM orders
        WINDOW w AS (PARTITION BY o_orderstatus
                     ORDER BY o_totalprice, o_orderkey)
"""


@register(
    "win_percent_rank",
    oracle=PERCENT_RANK_ORACLE,
    doc="percent_rank ((rank-1)/(n-1)) and cume_dist — exact rational "
    "doubles, identical in both engines.",
)
def win_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@register(
    "cond_null_funcs",
    oracle="""
        SELECT o_orderkey,
               coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_norm,
               CASE WHEN o_totalprice > 150000 THEN 'high'
                    WHEN o_totalprice > 50000 THEN 'mid'
                    ELSE 'low' END AS price_band,
               greatest(o_totalprice, 100000.0) AS floor_100k,
               least(o_totalprice, 100000.0) AS cap_100k,
               (o_orderstatus IS NOT DISTINCT FROM 'O') AS is_open
        FROM orders
    """,
    doc="CASE/coalesce/nullif/greatest/least/IS NOT DISTINCT FROM.",
)
def cond_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.coalesce(
            F.nullif("o_orderstatus", F.lit("P")), F.lit("PENDING")
        ).alias("status_norm"),
        F.when(F.col("o_totalprice") > 150000, "high")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.greatest("o_totalprice", F.lit(100000.0)).alias("floor_100k"),
        F.least("o_totalprice", F.lit(100000.0)).alias("cap_100k"),
        F.col("o_orderstatus").eqNullSafe(F.lit("O")).alias("is_open"),
    )


@register(
    "distinct_rows",
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
    doc="DISTINCT projection (one shuffle on the two columns).",
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderstatus", "o_orderpriority")
        .distinct()
    )


@register(
    "sample_systematic",
    oracle="""
        SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 20 = 0
    """,
    doc="Deterministic 5% systematic sample by key residue — the "
    "reproducible alternative to sample() (whose seed placement is "
    "partition-dependent and engine-specific).",
)
def sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.pmod("o_orderkey", F.lit(20)) == 0).select(
        "o_orderkey", "o_totalprice"
    )


@register(
    "scd2_merge",
    oracle="""
        WITH current AS (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
            FROM orders WHERE o_orderstatus <> 'F'
        ),
        incoming AS (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
            FROM orders WHERE o_orderstatus = 'F'
        )
        SELECT COALESCE(i.o_custkey, c.o_custkey) AS custkey,
               CASE WHEN i.o_custkey IS NOT NULL THEN i.o_orderkey
                    ELSE c.o_orderkey END AS current_orderkey,
               (i.o_custkey IS NOT NULL) AS was_updated
        FROM (SELECT * FROM current WHERE rn = 1) c
        FULL JOIN (SELECT * FROM incoming WHERE rn = 1) i
          ON c.o_custkey = i.o_custkey
    """,
    doc="MERGE-INTO emulation without a table format (guide §CDC/SCD2): "
    "latest-per-key of target full-joined with latest-per-key of "
    "source; incoming wins. The plan a Delta MERGE would produce, in "
    "plain DataFrame ops.",
)
def scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )

    def latest(df):
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )

    current = latest(o.filter(F.col("o_orderstatus") != "F")).select(
        F.col("o_custkey").alias("c_key"), F.col("o_orderkey").alias("c_ord")
    )
    incoming = latest(o.filter(F.col("o_orderstatus") == "F")).select(
        F.col("o_custkey").alias("i_key"), F.col("o_orderkey").alias("i_ord")
    )
    merged = current.join(incoming, current.c_key == incoming.i_key, "full")
    return merged.select(
        F.coalesce("i_key", "c_key").alias("custkey"),
        F.when(F.col("i_key").isNotNull(), F.col("i_ord"))
        .otherwise(F.col("c_ord"))
        .alias("current_orderkey"),
        F.col("i_key").isNotNull().alias("was_updated"),
    )


@register(
    "sample_bottom_k",
    oracle="""
        SELECT doc_id, source, hkey
        FROM (
            SELECT doc_id, source,
                   substr(md5(CAST(doc_id AS VARCHAR)), 1, 16) AS hkey,
                   ROW_NUMBER() OVER (
                       ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 16),
                                doc_id) AS rn
            FROM documents
        ) WHERE rn <= 40
    """,
    doc="Bottom-k uniform sample: the k rows with the SMALLEST md5 "
    "key — the distributed/streaming-safe way to draw a uniform "
    "fixed-size sample (order statistics on a hash are "
    "merge-able: union two bottom-k sets and re-take bottom-k; a "
    "classic reservoir is insertion-ORDER dependent and therefore "
    "nondeterministic on a cluster). Complements "
    "sample_systematic (key-residue rate sample) and "
    "sample_stratified (per-stratum rate): bottom-k fixes the "
    "SIZE, not the rate. Spark plan: TakeOrderedAndProject — no "
    "global sort, each partition keeps its local bottom-k and the "
    "driver merges k-sized heaps; (hkey, doc_id) total order.",
)
def sample_bottom_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    hkey = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 16)
    return (
        d.select("doc_id", "source", hkey.alias("hkey"))
        .orderBy("hkey", "doc_id")
        .limit(40)
    )


@register(
    "agg_histogram_equi_depth",
    oracle="""
        WITH ranked AS (
            SELECT CAST(floor(l_extendedprice * 100.0) AS BIGINT) AS cents,
                   ntile(8) OVER (
                       ORDER BY floor(l_extendedprice * 100.0),
                                l_orderkey, l_linenumber) AS bucket
            FROM lineitem
        )
        SELECT CAST(bucket AS BIGINT) AS bucket,
               CAST(MIN(cents) AS BIGINT) AS lo_cents,
               CAST(MAX(cents) AS BIGINT) AS hi_cents,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM ranked GROUP BY bucket
    """,
    doc="Equi-DEPTH histogram (the statistics shape cost-based "
    "optimizers and ClickHouse's quantile-based stats collect; "
    "agg_histogram is the equi-WIDTH sibling, dq_histogram_drift "
    "the fixed-bin one): an equal row count (+/-1) in every bucket, "
    "then min/max give the variable bucket boundaries. NTILE "
    "semantics WITHOUT the single-partition window: the bucket of a "
    "row is a closed-form function of its global position and the "
    "total count (distrank.ntile_from_pos), and the position comes "
    "from the two-pass distributed rank (range-partition on the "
    "(cents, orderkey, linenumber) TOTAL order, local row_number, "
    "broadcast per-partition offsets — sort_multi's shape), so the "
    "fact table is never coalesced to one partition and the plan "
    "holds at 100 TB. Deterministic because the order is total; all "
    "outputs integer.",
)
def agg_histogram_equi_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100.0).cast("long")
    base = li.select(
        cents.alias("cents"), "l_orderkey", "l_linenumber"
    )
    scanned = global_order_scan(
        base,
        (F.col("cents"), F.col("l_orderkey"), F.col("l_linenumber")),
        pos="_pos",
        totals={"_n_rows": F.lit(1)},
    )
    bucket = ntile_from_pos(F.col("_pos"), F.col("_n_rows"), 8)
    return (
        scanned.select("cents", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.min("cents").cast("long").alias("lo_cents"),
            F.max("cents").cast("long").alias("hi_cents"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
