"""Snapshot-catalog construction (FIXTURES.md §2 `snapshot_catalog`).

The reference's state is a directory of artifact files; its implicit
schema is `(db, generation, period_key, path, mtime, link_count)`
(SURVEY.md §1.1). We make that catalog an explicit DataFrame, derived
deterministically from the events fixture: each event becomes one
snapshot record.

Scale note: the catalog is pure column arithmetic over one scan — no
shuffle, no UDF; at 100 TB of catalog rows this is a map-only stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clickhousebackup_spark.backup.config import GENERATIONS


def period_key_expr(ts_col: str, generation_col: str) -> F.Column:
    """The four filename grammars of backup.sh:26-29, switched on the
    generation: %Y%m%d-%H%M%S / %Y%m%d / ISO %G%V / %Y%m."""
    iso_week = F.concat(
        F.expr(f"extract(YEAROFWEEK FROM {ts_col})").cast("string"),
        F.lpad(F.weekofyear(ts_col).cast("string"), 2, "0"),
    )
    g = F.col(generation_col)
    return (
        F.when(g == "last", F.date_format(ts_col, "yyyyMMdd-HHmmss"))
        .when(g == "daily", F.date_format(ts_col, "yyyyMMdd"))
        .when(g == "weekly", iso_week)
        .otherwise(F.date_format(ts_col, "yyyyMM"))
    )


def build_catalog(events: DataFrame, suffix: str = ".zip") -> DataFrame:
    """events → snapshot_catalog (FIXTURES.md §2 derivation).

    db = 'db' || user_id % 3 (the multi-DB loop, backup.sh:24);
    generation from event_id % 4 (backup.sh:21's four dirs);
    path = `<db>-<period_key><suffix>` (backup.sh:26-34);
    content_hash = md5 over identity fields (hardlink analog,
    backup.sh:77-96); size_bytes from value.
    """
    gen_array = F.array(*[F.lit(g) for g in GENERATIONS])
    cat = events.select(
        F.concat(F.lit("db"), F.pmod("user_id", F.lit(3)).cast("string")).alias(
            "db"
        ),
        F.element_at(gen_array, (F.pmod("event_id", F.lit(4)) + 1).cast("int")).alias(
            "generation"
        ),
        F.col("ts").alias("snapshot_ts"),
        F.col("event_id").alias("snapshot_id"),
        F.floor(F.col("value") * 1000).cast("long").alias("size_bytes"),
    )
    cat = cat.withColumn("period_key", period_key_expr("snapshot_ts", "generation"))
    return cat.select(
        "db",
        "generation",
        "period_key",
        "snapshot_ts",
        "snapshot_id",
        F.concat(F.col("db"), F.lit("-"), F.col("period_key"), F.lit(suffix)).alias(
            "path"
        ),
        F.md5(F.concat_ws("|", "db", "generation", "period_key", "snapshot_id")).alias(
            "content_hash"
        ),
        "size_bytes",
    )


#: DuckDB mirror of build_catalog, used to assemble oracle SQL strings.
CATALOG_ORACLE_CTE = """
    catalog AS (
        SELECT
            concat('db', CAST(user_id % 3 AS VARCHAR)) AS db,
            CASE CAST(event_id % 4 AS INTEGER)
                WHEN 0 THEN 'last' WHEN 1 THEN 'daily'
                WHEN 2 THEN 'weekly' ELSE 'monthly' END AS generation,
            ts AS snapshot_ts,
            event_id AS snapshot_id,
            CAST(floor(value * 1000) AS BIGINT) AS size_bytes,
            CASE CAST(event_id % 4 AS INTEGER)
                WHEN 0 THEN strftime(ts, '%Y%m%d-%H%M%S')
                WHEN 1 THEN strftime(ts, '%Y%m%d')
                WHEN 2 THEN concat(CAST(isoyear(ts) AS VARCHAR),
                                   lpad(CAST(week(ts) AS VARCHAR), 2, '0'))
                ELSE strftime(ts, '%Y%m') END AS period_key
        FROM events
    ),
    catalog_full AS (
        SELECT db, generation, period_key, snapshot_ts, snapshot_id,
               concat(db, '-', period_key, '.zip') AS path,
               md5(concat_ws('|', db, generation, period_key,
                             CAST(snapshot_id AS VARCHAR))) AS content_hash,
               size_bytes
        FROM catalog
    )
"""
