"""Hash function family (SURVEY.md §2.B).

The reference's hardlink content-identity (`backup.sh:77-81,92-96`:
two generation entries pointing at the same inode) maps to content
addressing — a hash column shared by identical payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhousebackup_spark.registry import register
from clickhousebackup_spark.tables import load_table


@register(
    "hash_funcs",
    oracle="""
        SELECT doc_id,
               md5(text) AS content_md5,
               sha256(text) AS content_sha256,
               md5(concat(lang, '|', source)) AS partition_hash
        FROM documents
    """,
    doc="Content hashes (hardlink identity of backup.sh:77-96): "
    "md5 + sha2-256 over documents.",
)
def hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("content_md5"),
        F.sha2(F.col("text"), 256).alias("content_sha256"),
        F.md5(F.concat(F.col("lang"), F.lit("|"), F.col("source"))).alias(
            "partition_hash"
        ),
    )
