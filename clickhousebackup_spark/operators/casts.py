"""Cast / schema-evolution operators (wave 4).

ANSI mode is on (Spark 4 default): plain CAST throws on malformed
input, ``try_cast`` yields NULL — the distinction a 100 TB ingest
pipeline lives on (one bad row must not kill a 6-hour job).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhousebackup_spark.registry import register
from clickhousebackup_spark.tables import load_table


@register(
    "safe_casts",
    oracle="""
        SELECT event_id,
               TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
               TRY_CAST(event_type AS BIGINT) AS bad_num,
               TRY_CAST(CAST(value AS VARCHAR) AS DOUBLE) AS roundtrip_value,
               CAST(user_id AS VARCHAR) AS user_str
        FROM events
    """,
    doc="try_cast vs cast under ANSI: malformed input → NULL, not a "
    "job-killing exception (bad_num is NULL for every row).",
)
def safe_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").try_cast("bigint").alias("k_num"),
        F.col("event_type").try_cast("bigint").alias("bad_num"),
        F.col("value").cast("string").try_cast("double").alias(
            "roundtrip_value"
        ),
        F.col("user_id").cast("string").alias("user_str"),
    )


@register(
    "union_by_name_evolved",
    oracle="""
        SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
        WHERE o_orderstatus = 'O'
        UNION ALL BY NAME
        SELECT o_orderkey, NULL AS o_orderpriority, o_totalprice FROM orders
        WHERE o_orderstatus = 'F'
    """,
    doc="Schema-evolution union: unionByName(allowMissingColumns) "
    "aligns by column name and null-fills — the append pattern when a "
    "source added a column mid-stream.",
)
def union_by_name_evolved(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    new_schema = o.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    old_schema = o.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_totalprice"
    )
    return new_schema.unionByName(old_schema, allowMissingColumns=True)


@register(
    "join_exists_correlated",
    oracle="""
        SELECT c_custkey, c_name,
               (SELECT COUNT(*) FROM orders o
                WHERE o.o_custkey = c.c_custkey) AS n_orders
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 100000)
    """,
    doc="Correlated EXISTS + correlated scalar subquery through the "
    "SQL surface — Catalyst decorrelates both into joins (no per-row "
    "re-execution, unlike a naive interpreter).",
)
def join_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhousebackup_spark.tables import register_views

    register_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(
        """
        SELECT c_custkey, c_name,
               (SELECT COUNT(*) FROM orders o
                WHERE o.o_custkey = c.c_custkey) AS n_orders
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 100000)
        """
    )


@register(
    "array_construct_ops",
    oracle="""
        SELECT r_regionkey,
               array_to_string(range(0, r_regionkey + 1), ',') AS seq_csv,
               array_to_string(flatten([range(0, r_regionkey + 1), [99]]), ',')
                   AS seq_plus_csv,
               array_to_string(list_value(r_regionkey, r_regionkey * 10), ',')
                   AS pair_csv,
               len(range(0, r_regionkey + 1)) AS seq_len
        FROM region
    """,
    doc="Array constructors: sequence, flatten, literal arrays "
    "(DuckDB range() is end-exclusive; Spark sequence() inclusive — "
    "bounds adjusted to agree). Arrays are emitted as CSV strings: the "
    "driver canonicalizer hashes scalar cells only.",
)
def array_construct_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    seq = F.sequence(F.lit(0).cast("long"), F.col("r_regionkey").cast("long"))
    return r.select(
        "r_regionkey",
        F.array_join(seq, ",").alias("seq_csv"),
        F.array_join(
            F.flatten(F.array(seq, F.array(F.lit(99).cast("long")))), ","
        ).alias("seq_plus_csv"),
        F.array_join(
            F.array(F.col("r_regionkey"), F.col("r_regionkey") * 10), ","
        ).alias("pair_csv"),
        F.size(seq).cast("long").alias("seq_len"),
    )
