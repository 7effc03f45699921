"""UDF / UDAF surface (SURVEY.md §2.B "UDF / UDAF / UDTF surface").

These exist to *demonstrate* the Python extension points with
oracle-checked semantics — each one's docstring states why a built-in
would normally be preferred (UDFs are the slow path: row UDFs pay
per-row serde; Pandas UDFs amortize over Arrow batches).

``udf_python`` classifies period-key strings back to their generation
grammar (`backup.sh:26-29`): ``%Y%m%d-%H%M%S`` → last, ``%Y%m%d`` →
daily, ``%Y%m``/``%G%V`` → monthly/weekly (6-digit keys whose tail
parses as a month 1–12 are monthly; the fixtures' ISO weeks 14–35
never collide, and the rule is mirrored verbatim in the oracle CASE).
"""

from __future__ import annotations

import math  # noqa: F401  (fsum documented alternative)

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from clickhousebackup_spark.registry import register
from clickhousebackup_spark.tables import load_table


@F.udf(T.StringType())
def classify_period_key(key: str) -> str:
    """Row-at-a-time Python UDF (deliberately — the contract asks for
    one); the composed CASE expression below it is the fast path."""
    if key is None:
        return None
    if "-" in key and len(key) == 15:
        return "last"
    if len(key) == 8:
        return "daily"
    if len(key) == 6:
        tail = int(key[4:6])
        return "monthly" if 1 <= tail <= 12 else "weekly"
    return "unknown"


@register(
    "udf_python",
    oracle="""
        SELECT event_id, key, CASE
            WHEN contains(key, '-') AND length(key) = 15 THEN 'last'
            WHEN length(key) = 8 THEN 'daily'
            WHEN length(key) = 6 AND CAST(key[5:6] AS INTEGER) BETWEEN 1 AND 12
                THEN 'monthly'
            WHEN length(key) = 6 THEN 'weekly'
            ELSE 'unknown' END AS generation
        FROM (
            SELECT event_id, CASE CAST(event_id % 4 AS INTEGER)
                WHEN 0 THEN strftime(ts, '%Y%m%d-%H%M%S')
                WHEN 1 THEN strftime(ts, '%Y%m%d')
                WHEN 2 THEN strftime(ts, '%Y%m')
                ELSE concat(CAST(isoyear(ts) AS VARCHAR),
                            lpad(CAST(week(ts) AS VARCHAR), 2, '0'))
            END AS key
            FROM events
        )
    """,
    doc="Scalar Python UDF: period-key → generation classifier "
    "(backup.sh:26-29 grammar), oracle-mirrored as a CASE expression.",
)
def udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    iso_week = F.concat(
        F.expr("extract(YEAROFWEEK FROM ts)").cast("string"),
        F.lpad(F.weekofyear("ts").cast("string"), 2, "0"),
    )
    key = (
        F.when(F.pmod("event_id", F.lit(4)) == 0, F.date_format("ts", "yyyyMMdd-HHmmss"))
        .when(F.pmod("event_id", F.lit(4)) == 1, F.date_format("ts", "yyyyMMdd"))
        .when(F.pmod("event_id", F.lit(4)) == 2, F.date_format("ts", "yyyyMM"))
        .otherwise(iso_week)
    )
    return ev.select("event_id", key.alias("key")).select(
        "event_id", "key", classify_period_key("key").alias("generation")
    )


@F.pandas_udf(T.DoubleType())
def _net_price(price: pd.Series, discount: pd.Series) -> pd.Series:
    # Arrow-vectorized: elementwise float64 ops are bit-identical to SQL.
    return price * (1.0 - discount)


@register(
    "udf_pandas_scalar",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) AS net_price
        FROM lineitem
    """,
    doc="Vectorized pandas_udf (Arrow batches): net price arithmetic.",
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        _net_price("l_extendedprice", "l_discount").alias("net_price"),
    )


@register(
    "udaf_pandas_grouped",
    oracle="""
        SELECT user_id,
               CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS STRING) AS DOUBLE)
                   / COUNT(value) AS mean_value,
               COUNT(*) AS n_events
        FROM events GROUP BY user_id
    """,
    doc="Grouped UDAF via applyInPandas: per-user mean computed with "
    "math.fsum (exact, order-free) so it hash-matches the decimal "
    "sum/count oracle.",
)
def udaf_pandas_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "value")

    def per_user(pdf: pd.DataFrame) -> pd.DataFrame:
        from decimal import ROUND_HALF_UP, Decimal

        vals = pdf["value"].tolist()
        # Replicate the oracle's CAST(value AS DECIMAL(38,6)) → SUM →
        # CAST AS DOUBLE pipeline exactly: quantize each value at 6 dp
        # (shortest-repr, half-up — what both engines' double→decimal
        # casts produce for these 2-dp fixtures), sum exactly, convert
        # once. Order-free, so safe under shuffle nondeterminism.
        q = Decimal("0.000001")
        total = sum(
            Decimal(repr(v)).quantize(q, rounding=ROUND_HALF_UP) for v in vals
        )
        mean = float(total) / len(vals)
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "mean_value": [mean],
                "n_events": [len(vals)],
            }
        )

    return ev.groupBy("user_id").applyInPandas(
        per_user, schema="user_id long, mean_value double, n_events long"
    )


@register(
    "udtf_python_native",
    oracle="""
        SELECT event_id,
               unnest(json_keys(props)) AS prop_key,
               json_extract_string(props,
                   concat('$.', unnest(json_keys(props)))) AS prop_value
        FROM events
    """,
    doc="Spark 3.5+ native Python UDTF (@udtf class) applied via "
    "LATERAL join — the arbitrary-fan-out extension point; the "
    "explode(from_json) form (udtf_explode_props) is its zero-"
    "Python-boundary fast path.",
)
def udtf_python_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="prop_key string, prop_value string")
    class ExplodeProps:
        def eval(self, props: str):
            import json

            if props is None:
                return
            for k, v in json.loads(props).items():
                yield (k, str(v))

    spark.udtf.register("cbs_explode_props", ExplodeProps)
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT event_id, p.prop_key, p.prop_value
        FROM events, LATERAL cbs_explode_props(props) p
        """
    )
