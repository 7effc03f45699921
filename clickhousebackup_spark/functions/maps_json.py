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


@register(
    "map_higher_order",
    oracle="""
        WITH c AS (
            SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY user_id, event_type
        ), kept AS (
            SELECT user_id,
                   concat(event_type, ':', CAST(n * 2 AS VARCHAR)) AS kv
            FROM c WHERE n * 2 >= 6
        ), agg AS (
            SELECT user_id,
                   string_agg(kv, ',' ORDER BY kv) AS kept_csv,
                   CAST(COUNT(*) AS BIGINT) AS n_kept
            FROM kept GROUP BY user_id
        ), base AS (
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_types
            FROM c GROUP BY user_id
        )
        SELECT b.user_id, b.n_types,
               CAST(COALESCE(a.n_kept, 0) AS BIGINT) AS n_kept,
               COALESCE(a.kept_csv, '') AS kept_csv
        FROM base b LEFT JOIN agg a ON b.user_id = a.user_id
    """,
    doc="Map higher-order functions (CH mapApply/mapFilter, Spark "
    "transform_values/map_filter): each user's event-type histogram "
    "becomes a MAP, values are transformed (×2), entries filtered "
    "(v ≥ 6), and the surviving map is serialized as a sorted k:v "
    "CSV — Spark genuinely evaluates the map HOF pipeline "
    "(map_from_entries → transform_values → map_filter → "
    "map_entries), while the oracle states the same result "
    "relationally (DuckDB's map HOFs are weaker; the CSV contract "
    "makes the comparison engine-neutral, the repo's array-"
    "serialization convention). One hash agg + map-side HOFs; map "
    "state is type-vocabulary-bounded per user. Empty surviving "
    "maps serialize as '' in both engines (COALESCE oracle-side — "
    "the array_to_string NULL trap).",
)
def map_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    m = c.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "n")))
        ).alias("hist")
    )
    doubled = F.transform_values("hist", lambda k, v: v * 2)
    kept = F.map_filter(doubled, lambda k, v: v >= 6)
    return m.select(
        "user_id",
        F.size("hist").cast("long").alias("n_types"),
        F.size(kept).cast("long").alias("n_kept"),
        F.array_join(
            F.sort_array(
                F.transform(
                    F.map_entries(kept),
                    lambda e: F.concat_ws(
                        ":", e["key"], e["value"].cast("string")
                    ),
                )
            ),
            ",",
        ).alias("kept_csv"),
    )
