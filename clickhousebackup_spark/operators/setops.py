"""Set operations (SURVEY.md §2.B "Set operations").

``set_except`` is the reference's prune-set idiom (`backup.sh:119-122`:
artifacts on disk minus artifacts to keep = delete set).

Scale notes: UNION ALL is a zero-shuffle concatenation; the distinct
variants shuffle once on all columns — at scale prefer pre-aggregated
keys (as these queries do: they operate on key columns, not wide rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhousebackup_spark.registry import register
from clickhousebackup_spark.tables import load_table


@register(
    "set_union_all",
    oracle="""
        SELECT event_id, user_id, event_type FROM events WHERE event_type = 'purchase'
        UNION ALL
        SELECT event_id, user_id, event_type FROM events WHERE event_type = 'signup'
    """,
    doc="Bag union of two slices (unionByName, no shuffle).",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    a = ev.filter(F.col("event_type") == "purchase")
    b = ev.filter(F.col("event_type") == "signup")
    return a.unionByName(b)


@register(
    "set_union_distinct",
    oracle="""
        SELECT user_id, event_type FROM events WHERE value > 100
        UNION
        SELECT user_id, event_type FROM events WHERE value < 10
    """,
    doc="Union + dedup (one shuffle on all columns).",
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value"
    )
    a = ev.filter(F.col("value") > 100).select("user_id", "event_type")
    b = ev.filter(F.col("value") < 10).select("user_id", "event_type")
    return a.union(b).distinct()


@register(
    "set_intersect",
    oracle="""
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="Customers appearing in both status slices (INTERSECT).",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.intersect(b)


@register(
    "set_except",
    oracle="""
        SELECT o_custkey FROM orders
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="Prune-set idiom (backup.sh:119-122): keys in A not in B.",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    a = o.select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.subtract(b)  # EXCEPT DISTINCT semantics, matching the oracle


@register(
    "set_except_all",
    oracle="""
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        EXCEPT ALL
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="EXCEPT ALL — bag (multiset) difference: each occurrence in B "
    "cancels ONE occurrence in A, so a customer with 5 open and 2 "
    "finished orders keeps 3 rows (set_except would keep 0 or 1). "
    "Spark's exceptAll plans this as a single hash aggregation over "
    "a tagged union (count per side, re-emit max(cntA-cntB, 0) "
    "copies) — one shuffle on the row value, no join, and the "
    "partial-aggregation map side absorbs per-key skew exactly like "
    "any other two-phase agg. The multiset semantics are what "
    "retention/prune accounting needs when the same key legitimately "
    "appears multiple times per generation.",
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.exceptAll(b)


@register(
    "set_intersect_all",
    oracle="""
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        INTERSECT ALL
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="INTERSECT ALL — bag intersection: a customer appearing 5 "
    "times as open and 2 times as finished yields min(5, 2) = 2 "
    "rows. Same single-shuffle tagged-count plan shape as "
    "set_except_all (emit min(cntA, cntB) copies per distinct row); "
    "together they complete the multiset algebra next to the "
    "DISTINCT-semantics set_intersect/set_except pair.",
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.intersectAll(b)
