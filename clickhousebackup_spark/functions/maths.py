"""Math function family (SURVEY.md §2.B).

Only bit-deterministic functions appear in checked output: floor/ceil/
abs/sqrt/pmod and IEEE +,-,*,/ are exact functions of their inputs, so
both engines agree bitwise. ``ROUND(double, n)`` is deliberately
absent — Spark rounds the shortest decimal representation HALF_UP
while DuckDB rounds via C double arithmetic, and they disagree on
boundary values (see exprs.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhousebackup_spark.registry import register
from clickhousebackup_spark.tables import load_table


@register(
    "math_funcs",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               abs(l_extendedprice - 1000.0) AS abs_delta,
               CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
               CAST(floor(l_extendedprice / 100.0) AS BIGINT) AS price_bucket,
               mod(l_orderkey, 7) AS key_mod,
               sqrt(l_extendedprice) AS price_sqrt,
               l_extendedprice * (1 - l_discount) / (1 + l_tax) AS unit_net
        FROM lineitem
    """,
    doc="abs/ceil/floor/pmod/sqrt + mixed IEEE arithmetic.",
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 1000.0).alias("abs_delta"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor(F.col("l_extendedprice") / 100.0).alias("price_bucket"),
        F.pmod("l_orderkey", F.lit(7)).alias("key_mod"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        (
            F.col("l_extendedprice")
            * (1 - F.col("l_discount"))
            / (1 + F.col("l_tax"))
        ).alias("unit_net"),
    )
