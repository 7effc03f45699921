"""Map/JSON function family over events.props (SURVEY.md §2.B).

``udtf_explode_props`` is the table-function surface: one output row
per parsed property key (`explode(from_json(...))` — the lateral-view
form; a Python UDTF would pay an Arrow boundary for the same shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhousebackup_spark.registry import register
from clickhousebackup_spark.tables import load_table


@register(
    "map_json_funcs",
    oracle="""
        SELECT event_id,
               json_extract_string(props, '$.k') AS k_str,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
               CAST(json_array_length(json_keys(props)) AS BIGINT) AS n_keys,
               CASE WHEN json_extract_string(props, '$.k') IS NOT NULL
                    THEN 1 ELSE 0 END AS has_k
        FROM events
    """,
    doc="get_json_object + from_json→MapType + map introspection.",
)
def map_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
        F.size(F.map_keys(m)).cast("long").alias("n_keys"),
        F.when(F.get_json_object("props", "$.k").isNotNull(), 1)
        .otherwise(0)
        .alias("has_k"),
    )


@register(
    "udtf_explode_props",
    oracle="""
        SELECT event_id,
               unnest(json_keys(props)) AS prop_key,
               json_extract_string(props,
                   concat('$.', unnest(json_keys(props)))) AS prop_value
        FROM events
    """,
    doc="Table function: one row per parsed prop key "
    "(explode(from_json) — the zero-copy UDTF form).",
)
def udtf_explode_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    return ev.select(
        "event_id", F.explode(m).alias("prop_key", "prop_value")
    )
