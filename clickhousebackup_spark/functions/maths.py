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


#: ClickHouse rounding-family ladders. Each is a shared Python
#: constant so the Spark fold and the generated oracle CASE are
#: byte-derived from the SAME list — the ladder cannot drift between
#: engines.
ROUND_DURATION_LADDER = (
    0, 1, 10, 30, 60, 120, 180, 240, 300, 600,
    1200, 1800, 3600, 7200, 18000, 36000,
)
ROUND_AGE_BOUNDS = (  # (lower bound, bucket value) per CH roundAge
    (55, 55), (45, 45), (35, 35), (25, 25), (18, 18), (1, 17), (0, 0),
)
ROUND_DOWN_LADDER = (0, 10, 50, 100, 250, 500, 750)


def _ladder_case_sql(col: str, ladder) -> str:
    """Largest ladder element <= col, as a CASE descending ladder."""
    arms = " ".join(
        f"WHEN {col} >= {v} THEN {v}" for v in sorted(ladder, reverse=True)
    )
    return f"CASE {arms} ELSE {min(ladder)} END"


def _ladder_expr(col, ladder):
    expr = F.lit(min(ladder))
    for v in sorted(ladder):
        expr = F.when(col >= v, F.lit(v)).otherwise(expr)
    return expr.cast("long")


def _age_case_sql(col: str) -> str:
    arms = " ".join(
        f"WHEN {col} >= {lo} THEN {val}" for lo, val in ROUND_AGE_BOUNDS[:-1]
    )
    return f"CASE {arms} ELSE 0 END"


def _age_expr(col):
    expr = F.lit(0)
    for lo, val in reversed(ROUND_AGE_BOUNDS[:-1]):
        expr = F.when(col >= lo, F.lit(val)).otherwise(expr)
    return expr.cast("long")


@register(
    "math_round_families",
    oracle=f"""
        WITH src AS (
            SELECT l_orderkey,
                   CAST(l_linenumber AS BIGINT) AS l_linenumber,
                   CAST(FLOOR(l_extendedprice) AS BIGINT) AS xp,
                   (l_orderkey * 7 + l_linenumber) % 40000 AS dur,
                   l_partkey % 100 AS age,
                   CAST(l_quantity AS BIGINT) AS q,
                   l_suppkey % 1000 AS rv
            FROM lineitem
        )
        SELECT l_orderkey, l_linenumber,
               CAST(CASE WHEN xp < 1 THEN 0
                    ELSE 1::BIGINT << (length(bin(xp)) - 1)
                    END AS BIGINT) AS exp2,
               CAST({_ladder_case_sql("dur", ROUND_DURATION_LADDER)}
                    AS BIGINT) AS duration_rounded,
               CAST({_age_case_sql("age")} AS BIGINT) AS age_rounded,
               CAST({_ladder_case_sql("rv", ROUND_DOWN_LADDER)}
                    AS BIGINT) AS down_rounded,
               CAST(CASE WHEN q % 2 = 0 THEN q // 2
                    ELSE q // 2 + ((q // 2) % 2) END AS BIGINT)
                    AS half_q_bankers
        FROM src
    """,
    doc="ClickHouse rounding family (roundToExp2 / roundDuration / "
    "roundAge / roundDown / roundBankers — all shipped by the "
    "reference server image): exp2 is computed WITHOUT log2 "
    "(bin-string length -> 1 << (len-1): pure integer, no IEEE "
    "log whose last ulp differs across engines); the duration/age/"
    "down ladders are CASE folds generated from ONE shared Python "
    "constant so the two engines cannot drift; roundBankers is "
    "exercised on exact halves (integral quantity / 2, Spark "
    "F.bround) with the oracle restating half-even in pure integer "
    "arithmetic because DuckDB's ROUND on doubles is half-away. "
    "Map-only column expressions — no shuffle, no UDF; runs at "
    "parquet-scan speed at any scale.",
)
def math_round_families(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    xp = F.floor("l_extendedprice").cast("long")
    dur = F.pmod(F.col("l_orderkey") * 7 + F.col("l_linenumber"), F.lit(40000))
    age = F.pmod("l_partkey", F.lit(100))
    rv = F.pmod("l_suppkey", F.lit(1000))
    exp2 = F.when(xp < 1, F.lit(0)).otherwise(
        F.expr("shiftleft(1L, int(length(bin(floor(l_extendedprice))) - 1))")
    )
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        exp2.cast("long").alias("exp2"),
        _ladder_expr(dur, ROUND_DURATION_LADDER).alias("duration_rounded"),
        _age_expr(age).alias("age_rounded"),
        _ladder_expr(rv, ROUND_DOWN_LADDER).alias("down_rounded"),
        F.bround(F.col("l_quantity") / 2, 0).cast("long").alias(
            "half_q_bankers"
        ),
    )
