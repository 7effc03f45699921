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


@register(
    "bit_funcs",
    oracle="""
        SELECT o_orderkey,
               o_orderkey & 255 AS low_byte,
               o_orderkey | 4096 AS with_flag,
               xor(o_orderkey, 21845) AS xored,
               (o_orderkey & 255) << 4 AS shifted_l,
               o_orderkey >> 2 AS shifted_r,
               CAST(bit_count(o_orderkey) AS BIGINT) AS popcount
        FROM orders
    """,
    doc="Bitwise function family: and/or/xor, shifts, popcount — the "
    "flag-mask vocabulary (shift input masked to a byte first so ANSI "
    "overflow can't fire).",
)
def bit_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.lit(21845)).alias("xored"),
        F.shiftleft(k.bitwiseAND(F.lit(255)), 4).cast("long").alias("shifted_l"),
        F.shiftright(k, 2).cast("long").alias("shifted_r"),
        F.bit_count(k).cast("long").alias("popcount"),
    )


@register(
    "encode_funcs",
    oracle="""
        SELECT doc_id,
               base64(CAST(lang AS BLOB)) AS lang_b64,
               upper(CAST(hex(CAST(source AS BLOB)) AS VARCHAR))
                   AS source_hex,
               CAST(octet_length(CAST(text AS BLOB)) AS BIGINT)
                   AS text_bytes,
               md5(concat(lang, '|', source)) AS pair_md5
        FROM documents
    """,
    doc="Encoding family (ClickHouse base64Encode/hex/length parity): "
    "base64 and hex of utf-8 bytes, byte length (≠ char length for "
    "multibyte), and a composite-key md5. All JVM-side codegen'd "
    "expressions; byte semantics pinned cross-engine via the BLOB "
    "casts in the oracle.",
)
def encode_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.base64(F.col("lang").cast("binary")).alias("lang_b64"),
        F.upper(F.hex(F.col("source").cast("binary"))).alias("source_hex"),
        F.octet_length("text").cast("long").alias("text_bytes"),
        F.md5(F.concat(F.col("lang"), F.lit("|"), F.col("source"))).alias(
            "pair_md5"
        ),
    )
