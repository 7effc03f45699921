"""Multimodal-column operators (north-star extension).

Modality payloads are opaque ``binary`` columns with typed metadata —
the same stance the reference takes toward its artifacts (content
opaque, catalog metadata real; SURVEY.md §1.1). The Spark-side
plumbing (schemas, Arrow batch shape, mapInPandas signatures,
partitioning) is real and tested; the actual image/audio decode is
stubbed behind ``NotImplementedError`` + a deterministic fake, since
codec libraries aren't in this container.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhousebackup_spark.registry import register
from clickhousebackup_spark.tables import load_table, parallelize


@register(
    "multimodal_join",
    oracle="""
        SELECT d.doc_id, d.lang, d.n_chars, e.label,
               CAST(len(e.embedding) AS BIGINT) AS n_dims
        FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        WHERE e.label = 1
    """,
    doc="Cross-modality equi join (documents ⋈ embeddings on "
    "doc_id=vec_id) filtered by label.",
)
def multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("label") == 1)
    return d.join(e, d.doc_id == e.vec_id).select(
        "doc_id",
        "lang",
        "n_chars",
        "label",
        F.size("embedding").cast("long").alias("n_dims"),
    )


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Synthesize the opaque-binary modality column + typed metadata
    (media_type, byte length) from text — the schema a real ingest
    would produce for image/audio blobs."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        F.length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
    )


def decode_media(payload: bytes, media_type: str):
    """The real decode hook — image/audio libs absent in this container.

    STUB (clearly marked, per the build contract): raises so callers
    fall back to :func:`fake_features`, which is deterministic.
    """
    raise NotImplementedError(
        "media codecs unavailable in this environment; use fake_features"
    )


def fake_features(payload: bytes, n: int = 4) -> list[float]:
    """Deterministic stand-in feature extractor: n moments of the raw
    bytes — stable across runs/machines, so pipeline tests are real."""
    if not payload:
        return [0.0] * n
    b = list(payload)
    total = float(len(b))
    mean = sum(b) / total
    feats = [total, mean]
    for p in (2, 3):
        feats.append(sum((x - mean) ** p for x in b) / total)
    return feats[:n]


@register(
    "multimodal_features",
    oracle=None,  # Python feature extraction → rows-only; determinism
    # and batch plumbing are unit-tested.
    doc="mapInPandas feature extraction over opaque binary payloads: "
    "Arrow-batched, per-partition, schema-typed — the real plumbing "
    "with the decode step stubbed deterministically.",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_binary_payload(parallelize(load_table(spark, sf_dir, "documents")))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fake_features(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "f0": [f[0] for f in feats],
                    "f1": [f[1] for f in feats],
                    "f2": [f[2] for f in feats],
                    "f3": [f[3] for f in feats],
                }
            )

    return docs.mapInPandas(
        extract,
        schema="doc_id long, media_type string, n_bytes long, "
        "f0 double, f1 double, f2 double, f3 double",
    )


@register(
    "multimodal_frame_sample",
    oracle="""
        WITH sized AS (
            SELECT doc_id,
                   CASE WHEN CAST(doc_id % 3 AS INTEGER) = 0 THEN 'image/png'
                        WHEN CAST(doc_id % 3 AS INTEGER) = 1 THEN 'audio/wav'
                        ELSE 'video/mp4' END AS media_type,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                   least(4, greatest(octet_length(encode(text)) // 8, 1)) AS n_frames
            FROM documents
        )
        SELECT doc_id, media_type, n_bytes,
               unnest(range(0, n_frames)) AS frame_idx,
               unnest(range(0, n_frames)) * CAST(n_bytes // n_frames AS BIGINT)
                   AS frame_offset
        FROM sized
    """,
    doc="Frame-sampling plumbing: one row per sampled 'frame' index "
    "(every n_bytes/8 step, ≤4 frames) — the explode shape a video "
    "pipeline needs, without a codec.",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_binary_payload(load_table(spark, sf_dir, "documents"))
    n_frames = F.least(F.lit(4), F.greatest((F.col("n_bytes") / 8).cast("long"), F.lit(1)))
    return docs.select(
        "doc_id",
        "media_type",
        "n_bytes",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).withColumn(
        "frame_offset", F.col("frame_idx") * (F.col("n_bytes") / n_frames).cast("long")
    )


@register(
    "multimodal_dedup",
    oracle="""
        SELECT doc_id, md5(text) AS payload_md5,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        FROM (
            SELECT doc_id, text,
                   ROW_NUMBER() OVER (PARTITION BY md5(text),
                                      octet_length(encode(text))
                                      ORDER BY doc_id) AS rn
            FROM documents
        ) WHERE rn = 1
    """,
    doc="Binary-payload dedup: keep the lowest doc_id per (md5, size) "
    "of the opaque payload — dedup_exact lifted to the multimodal "
    "column (Spark hashes the binary directly; the oracle hashes the "
    "identical utf-8 bytes via md5(text)). One shuffle on the 16-byte "
    "key; the first gate of any image/audio ingest.",
)
def multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = with_binary_payload(
        parallelize(load_table(spark, sf_dir, "documents"))
    )
    w = Window.partitionBy(F.md5("payload"), "n_bytes").orderBy("doc_id")
    return (
        d.select(
            "doc_id",
            F.md5("payload").alias("payload_md5"),
            "n_bytes",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select("doc_id", "payload_md5", "n_bytes")
    )
