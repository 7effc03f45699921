"""Projection / filter / predicate operators (SURVEY.md §2.B).

``filter_age`` is the reference's retention predicate (`backup.sh:
119-122`: ``find -mmin/-mtime +N``, windows computed at `env.sh:26-29`)
made deterministic by anchoring to ``max(ts)`` instead of wall-clock.

Scale notes: the age cutoff is computed as a 1-row aggregate joined by
broadcast — no driver-side collect, no second scan barrier beyond the
tiny agg; Catalyst pushes the comparison into the scan once AQE turns
the broadcast side into a literal-ish join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhousebackup_spark.registry import register
from clickhousebackup_spark.tables import load_table


@register(
    "project_compute",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) AS revenue,
               l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
        FROM lineitem
    """,
    doc="Derived columns with explicit aliases (pure IEEE arithmetic).",
)
def project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        revenue.alias("revenue"),
        (revenue * (1 + F.col("l_tax"))).alias("charge"),
    )


@register(
    "filter_age",
    oracle="""
        SELECT event_id, ts, user_id, event_type, value
        FROM events
        WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 7 DAY
    """,
    doc="Retention age predicate (backup.sh:119-122, env.sh:26-29), "
    "anchored at max(ts) for determinism.",
)
def filter_age(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cutoff = ev.agg(
        (F.max("ts") - F.expr("INTERVAL 7 DAYS")).alias("cutoff")
    )
    return (
        ev.join(F.broadcast(cutoff))
        .filter(F.col("ts") >= F.col("cutoff"))
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


@register(
    "filter_compound",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
        FROM orders
        WHERE (o_orderstatus IN ('O', 'F')
               AND o_totalprice BETWEEN 1000 AND 150000
               AND o_orderpriority LIKE '1-%')
           OR (NOT o_orderstatus = 'P' AND o_totalprice > 180000)
           AND o_orderpriority IS NOT NULL
    """,
    doc="AND/OR/NOT, IN-list, BETWEEN, LIKE, IS NULL predicate mix.",
)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cond = (
        F.col("o_orderstatus").isin("O", "F")
        & F.col("o_totalprice").between(1000, 150000)
        & F.col("o_orderpriority").like("1-%")
    ) | (
        (~(F.col("o_orderstatus") == "P"))
        & (F.col("o_totalprice") > 180000)
        & F.col("o_orderpriority").isNotNull()
    )
    return o.filter(cond).select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
