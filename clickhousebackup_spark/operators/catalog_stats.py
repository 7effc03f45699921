"""Catalog statistics — the ANALYZE TABLE surface.

ClickHouse keeps per-part column min/max + NDV statistics and uses
them for partition pruning; Spark's equivalent is ``ANALYZE TABLE ...
COMPUTE STATISTICS FOR COLUMNS`` feeding the CBO. This module
materializes those statistics AS DATA — one row per column with null
count, exact distinct count, and typed min/max — the sanity report a
backup engine runs after every restore (and the input a query planner
wants before choosing join orders).

Scale: one aggregation PER COLUMN, each over a column-pruned scan —
the parquet reader materializes exactly one column per pass (check
``ReadSchema`` in the plan), which is how ANALYZE itself behaves.
Exact NDV keeps the operator oracle-checkable; the at-scale variant
swaps in approx_count_distinct (HLL — the agg_approx_distinct
contract) without changing the plan shape.

Determinism: min/max are emitted in TYPED columns (numeric as double,
timestamp as epoch micros, strings as-is) — never via engine string
rendering of doubles, which differs between Spark and DuckDB.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhousebackup_spark.registry import register
from clickhousebackup_spark.tables import load_table

#: (column, kind) pairs for the orders table; kind picks the typed
#: min/max slot so no cross-engine string rendering is involved.
_ORDERS_COLS = (
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "num"),
    ("o_orderdate", "ts"),
    ("o_orderpriority", "str"),
)


def _oracle_one(col: str, kind: str) -> str:
    if kind == "num":
        mn = f"CAST(MIN({col}) AS DOUBLE)"
        mx = f"CAST(MAX({col}) AS DOUBLE)"
    elif kind == "ts":
        mn = f"CAST(epoch_us(MIN({col})) AS DOUBLE)"
        mx = f"CAST(epoch_us(MAX({col})) AS DOUBLE)"
    else:
        mn, mx = "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)"
    s_mn = f"MIN({col})" if kind == "str" else "CAST(NULL AS VARCHAR)"
    s_mx = f"MAX({col})" if kind == "str" else "CAST(NULL AS VARCHAR)"
    return f"""
        SELECT '{col}' AS column_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) - COUNT({col}) AS BIGINT) AS n_nulls,
               CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,
               {mn} AS min_num, {mx} AS max_num,
               {s_mn} AS min_str, {s_mx} AS max_str
        FROM orders
    """


@register(
    "table_column_stats",
    oracle=" UNION ALL ".join(
        _oracle_one(c, k) for c, k in _ORDERS_COLS
    ),
    doc="ANALYZE TABLE orders COMPUTE STATISTICS FOR ALL COLUMNS, "
    "materialized as a result set: per column — row count, null "
    "count, exact NDV, typed min/max (numeric→double, "
    "timestamp→epoch µs, string→string; never an engine's double "
    "rendering). One column-pruned aggregation per column (the "
    "ReadSchema of each pass is a single field), unioned — exactly "
    "the access pattern ANALYZE uses, and each pass is a two-phase "
    "agg. The 100 TB variant replaces exact COUNT(DISTINCT) with "
    "approx_count_distinct; same plan shape, one pass, no expansion.",
)
def table_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    frames = []
    for col, kind in _ORDERS_COLS:
        c = F.col(col)
        if kind == "num":
            mn, mx = c.cast("double"), c.cast("double")
            min_num, max_num = F.min(mn), F.max(mx)
        elif kind == "ts":
            min_num = F.unix_micros(F.min(c)).cast("double")
            max_num = F.unix_micros(F.max(c)).cast("double")
        else:
            min_num = F.lit(None).cast("double")
            max_num = F.lit(None).cast("double")
        if kind == "str":
            min_str, max_str = F.min(c), F.max(c)
        else:
            min_str = F.lit(None).cast("string")
            max_str = F.lit(None).cast("string")
        frames.append(
            o.agg(
                F.count(F.lit(1)).alias("n_rows"),
                (F.count(F.lit(1)) - F.count(c)).alias("n_nulls"),
                F.count_distinct(c).alias("n_distinct"),
                min_num.alias("min_num"),
                max_num.alias("max_num"),
                min_str.alias("min_str"),
                max_str.alias("max_str"),
            ).select(F.lit(col).alias("column_name"), "*")
        )
    return reduce(DataFrame.unionByName, frames)


@register(
    "dq_expectations",
    oracle="""
        SELECT 'orders_orderkey_unique' AS check_name,
               CAST((SELECT COUNT(*) FROM (
                   SELECT o_orderkey FROM orders
                   GROUP BY o_orderkey HAVING COUNT(*) > 1))
                   AS BIGINT) AS n_violations
        UNION ALL
        SELECT 'orders_custkey_not_null',
               CAST((SELECT COUNT(*) FROM orders
                     WHERE o_custkey IS NULL) AS BIGINT)
        UNION ALL
        SELECT 'orders_totalprice_positive',
               CAST((SELECT COUNT(*) FROM orders
                     WHERE o_totalprice <= 0.0) AS BIGINT)
        UNION ALL
        SELECT 'orders_custkey_refs_customer',
               CAST((SELECT COUNT(*) FROM orders o
                     WHERE NOT EXISTS (
                         SELECT 1 FROM customer c
                         WHERE c.c_custkey = o.o_custkey))
                   AS BIGINT)
        UNION ALL
        SELECT 'orders_status_in_domain',
               CAST((SELECT COUNT(*) FROM orders
                     WHERE o_orderstatus NOT IN ('O', 'F', 'P'))
                   AS BIGINT)
        UNION ALL
        SELECT 'orders_totalprice_under_soft_cap',
               CAST((SELECT COUNT(*) FROM orders
                     WHERE o_totalprice > 300000.0) AS BIGINT)
    """,
    doc="Data-quality expectation suite (the dbt-test / "
    "Great-Expectations shape, and the audit a backup engine runs "
    "before trusting a restore): uniqueness, not-null, domain, "
    "range, and referential-integrity checks emitted as one "
    "(check_name, n_violations) report, INCLUDING one "
    "deliberately strict warn-severity check (the 300k soft price "
    "cap) that real rows violate — so the driver pins a non-zero "
    "violation count and a broken counter cannot hide behind an "
    "all-passing suite (round-7 degeneracy audit). Each check is the "
    "scale-correct plan for its class — uniqueness is a two-phase "
    "count-per-key with HAVING (never a self-join), referential "
    "integrity is a LEFT ANTI broadcast join against the dim, the "
    "scalar predicates are one pruned scan each; the union of "
    "tiny 1-row aggregates costs what its largest branch costs. "
    "All counts are exact integers — nothing for a float to wobble.",
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    def report(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).cast("long").alias("n_violations")) \
            .select(F.lit(name).alias("check_name"), "n_violations")

    dup_keys = (
        o.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )
    null_cust = o.filter(F.col("o_custkey").isNull())
    bad_price = o.filter(F.col("o_totalprice") <= 0.0)
    orphans = o.join(
        cust.select("c_custkey"),
        o.o_custkey == F.col("c_custkey"),
        "left_anti",
    )
    bad_status = o.filter(~F.col("o_orderstatus").isin("O", "F", "P"))
    over_cap = o.filter(F.col("o_totalprice") > 300000.0)
    checks = [
        ("orders_orderkey_unique", dup_keys),
        ("orders_custkey_not_null", null_cust),
        ("orders_totalprice_positive", bad_price),
        ("orders_custkey_refs_customer", orphans),
        ("orders_status_in_domain", bad_status),
        ("orders_totalprice_under_soft_cap", over_cap),
    ]
    out = report(*checks[0])
    for name, df in checks[1:]:
        out = out.unionByName(report(name, df))
    return out
