"""String function family (SURVEY.md §2.B "Scalar functions").

``str_funcs`` reproduces the reference's filename grammar
``<db>-<period_key><suffix>`` (`backup.sh:26-34`); ``str_split_explode``
is the ``CLICKHOUSE_DB`` comma-list split (`env.sh:24`) as a
lateral explode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhousebackup_spark.registry import register
from clickhousebackup_spark.tables import load_table


@register(
    "str_funcs",
    oracle="""
        SELECT p_partkey,
               concat('db', '-', lower(p_brand), '.zip') AS artifact_name,
               upper(p_type) AS type_upper,
               substring(p_name, 1, 8) AS name_prefix,
               trim(concat('  ', p_name, '  ')) AS name_trimmed,
               lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
               length(p_name) AS name_len
        FROM part
    """,
    doc="concat/lower/upper/substring/trim/lpad/length — incl. the "
    "backup filename grammar of backup.sh:26-34.",
)
def str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.concat(F.lit("db"), F.lit("-"), F.lower("p_brand"), F.lit(".zip")).alias(
            "artifact_name"
        ),
        F.upper("p_type").alias("type_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias(
            "name_trimmed"
        ),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.length("p_name").cast("long").alias("name_len"),
    )


@register(
    "str_split_explode",
    oracle="""
        SELECT r_regionkey,
               unnest(string_split(concat('db0_', r_name, ',db1_', r_name, ',db2_', r_name), ',')) AS db
        FROM region
    """,
    doc="Comma-list → rows (the CLICKHOUSE_DB split, env.sh:24) as "
    "explode(split(...)) over a synthesized csv column.",
)
def str_split_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    csv = F.concat(
        F.lit("db0_"), F.col("r_name"),
        F.lit(",db1_"), F.col("r_name"),
        F.lit(",db2_"), F.col("r_name"),
    )
    return r.select(
        "r_regionkey", F.explode(F.split(csv, ",")).alias("db")
    )


@register(
    "str_regexp",
    oracle="""
        SELECT event_id,
               regexp_extract(event_type, '^([a-z]+)', 1) AS type_word,
               regexp_replace(props, '[0-9]+', '#', 'g') AS props_masked,
               CASE WHEN regexp_matches(event_type, '^(click|view)$')
                    THEN 1 ELSE 0 END AS is_browse
        FROM events
    """,
    doc="regexp_extract / regexp_replace (DuckDB needs the 'g' flag to "
    "match Spark's replace-all) / rlike.",
)
def str_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.regexp_extract("event_type", r"^([a-z]+)", 1).alias("type_word"),
        F.regexp_replace("props", r"[0-9]+", "#").alias("props_masked"),
        F.when(F.col("event_type").rlike(r"^(click|view)$"), 1)
        .otherwise(0)
        .alias("is_browse"),
    )


@register(
    "explode_outer_empty",
    oracle=r"""
        WITH lw AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '\s+'),
                               w -> length(w) >= 12) AS ws
            FROM documents
        )
        SELECT doc_id, unnest(ws) AS long_word
        FROM lw WHERE len(ws) > 0
        UNION ALL
        SELECT doc_id, CAST(NULL AS VARCHAR) AS long_word
        FROM lw WHERE len(ws) = 0
    """,
    doc="explode_outer vs explode — the row-preservation corner "
    "(ClickHouse LEFT ARRAY JOIN): documents whose filtered token "
    "array is EMPTY (no word of 12+ chars) must still emit one row "
    "with a NULL element, because a plain explode silently DROPS "
    "them — the classic bug where a fan-out stage loses the very "
    "rows a later aggregate needed to count as zero. Spark's "
    "GenerateExec runs with outer=true (same map-side Generate, no "
    "extra pass); the oracle spells the semantics out as "
    "unnest-nonempty UNION null-for-empty. No shuffle anywhere.",
)
def explode_outer_empty(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    long_words = F.filter(
        F.split(F.lower("text"), r"\s+"), lambda w: F.length(w) >= 12
    )
    return d.select(
        "doc_id", F.explode_outer(long_words).alias("long_word")
    )


@register(
    "str_keyvalue_parse",
    oracle="""
        SELECT o_orderkey,
               o_orderstatus AS status, o_orderpriority AS priority
        FROM orders
    """,
    doc="extractKeyValuePairs / str_to_map: parse a 'k=v;k=v' "
    "settings string (synthesized here from the order's own columns "
    "so the oracle can state the expected values directly) and read "
    "keys back via map access — the log/config-parsing surface "
    "every ingest pipeline needs. str_to_map is one JVM-side "
    "expression (no UDF, no regex backtracking blowup: split on "
    "literal delimiters), map access is O(1) per row, the whole "
    "operator is a narrow map stage; the oracle closing the loop "
    "pins that parse(render(row)) == row, the same roundtrip "
    "discipline as the sink tests.",
)
def str_keyvalue_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    rendered = F.concat(
        F.lit("status="), F.col("o_orderstatus"),
        F.lit(";priority="), F.col("o_orderpriority"),
    )
    m = F.str_to_map(rendered, F.lit(";"), F.lit("="))
    return o.select(
        "o_orderkey",
        m.getItem("status").alias("status"),
        m.getItem("priority").alias("priority"),
    )


@register(
    "str_multisearch",
    oracle="""
        SELECT p_partkey,
               CAST(instr(p_name, 'red') AS BIGINT) AS pos_red,
               CAST(instr(p_name, 'gizmo') AS BIGINT) AS pos_gizmo,
               CAST(instr(p_name, 'bolt') AS BIGINT) AS pos_bolt,
               CAST(CASE WHEN instr(p_name, 'red') > 0 THEN 1 ELSE 0 END
                  + CASE WHEN instr(p_name, 'gizmo') > 0 THEN 1 ELSE 0 END
                  + CASE WHEN instr(p_name, 'bolt') > 0 THEN 1 ELSE 0 END
                  AS BIGINT) AS n_hits
        FROM part
    """,
    doc="ClickHouse multiSearchAllPositions / multiSearchAny: one "
    "pass over a string column locating several needles at once "
    "(1-based position, 0 when absent — the CH convention both "
    "engines' instr shares). CH fuses the needles into one "
    "Volnitsky scan; Spark evaluates the instr family inside one "
    "whole-stage-codegen projection over the same single pass of "
    "the column — either way a narrow map stage, no shuffle, and "
    "the scan reads only p_partkey/p_name (column pruning). "
    "Needles come from the fixture's real name vocabulary (the "
    "round-7 audit caught the original green/steel/tomato set "
    "matching nothing — vacuous positions). "
    "part_trigram_search is the indexed variant for unbounded "
    "needle sets; this is the fixed-needle fast path.",
)
def str_multisearch(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    hits = [F.instr("p_name", n) for n in ("red", "gizmo", "bolt")]
    n_hits = sum(
        (F.when(h > 0, 1).otherwise(0) for h in hits), F.lit(0)
    )
    return p.select(
        "p_partkey",
        hits[0].cast("long").alias("pos_red"),
        hits[1].cast("long").alias("pos_gizmo"),
        hits[2].cast("long").alias("pos_bolt"),
        n_hits.cast("long").alias("n_hits"),
    )
