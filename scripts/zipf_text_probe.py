#!/usr/bin/env python
"""Zipf-vocabulary text-corpus scale probe (VERDICT r10 item 4).

The driver fixture's documents table has a CLOSED ~31-word vocabulary
(~930 possible bigrams), which makes several text keys
corpus-structural: every bigram is frequent, so rarity-ordered prefix
filtering (dedup_ngram_jaccard) never meets the heavy-tailed gram
distribution it exploits, and rare-band features degenerate. This
probe builds a deterministic OPEN-vocabulary corpus with a zipfian
rank-frequency law (word rank r drawn with p(r) ~ 1/r via the inverse
CDF r = floor(V^u), u uniform from xxhash64 — no RNG, fully
reproducible) at two scales (sf0.1-shaped 50k docs and sf1-shaped
500k docs), plants exact + near duplicates at a fixed 10%%+10%% rate
(block head copied at block positions 8 and 9; position 8 appends 5
junk words, bigram Jaccard ~0.9), and measures:

- engine wall for dedup_ngram_jaccard / corpus_dup_ngrams /
  text_rarity_score (the three keys VERDICT named);
- the PPJoin candidate census for dedup_ngram_jaccard (mirrors
  extensions/dedup.py:454's prefix+length-filter stages): distinct
  candidate pairs, candidate ratio vs all n(n-1)/2 pairs, candidates
  per doc, max prefix-gram bucket, and verify yield.

The scale claim under test: with a heavy-tailed vocabulary the prefix
index holds each doc's RAREST grams, so candidate count grows ~linearly
with planted-dup count while possible pairs grow n^2 — the candidate
RATIO must fall ~10x at 10x scale and candidates/doc stay ~flat.

Usage: python scripts/zipf_text_probe.py [n_small] [n_big]
Prints one JSON object; recorded in PLANS_r11.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

VOCAB = 30_000
JACCARD_T = 0.8


def build_zipf_docs(spark: SparkSession, n_docs: int) -> str:
    """Deterministic zipf-vocabulary documents table; returns the
    sf_dir-shaped directory holding documents.parquet."""
    out_dir = os.path.join(tempfile.gettempdir(), f"cbs_zipf_{n_docs}")
    out = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out_dir  # deterministic construction → safe reuse
    d = spark.range(0, n_docs, 1, 32).select(F.col("id").alias("doc_id"))
    pos = F.pmod(F.col("doc_id"), F.lit(10))
    head = F.col("doc_id") - pos
    # block positions 8/9 reuse the head's word stream: 9 = exact dup,
    # 8 = near dup (5 appended junk words keyed by doc_id, not seed)
    seed = F.when(pos >= 8, head).otherwise(F.col("doc_id"))
    d = d.withColumn("seed", seed)
    m = (F.lit(40) + F.pmod(F.xxhash64(F.lit("len"), F.col("seed")), F.lit(41))).cast(
        "int"
    )
    words = F.transform(
        F.sequence(F.lit(1), m),
        lambda j: F.concat(
            F.lit("w"),
            F.floor(
                F.pow(
                    F.lit(float(VOCAB)),
                    F.pmod(
                        F.xxhash64(F.lit("w"), F.col("seed"), j), F.lit(1_000_000)
                    ).cast("double")
                    / F.lit(1_000_000.0),
                )
            ).cast("string"),
        ),
    )
    base = F.array_join(words, " ")
    extra = F.concat_ws(
        " ",
        *[
            F.concat(
                F.lit("x"),
                F.pmod(
                    F.xxhash64(F.lit("nd"), F.col("doc_id"), F.lit(j)),
                    F.lit(VOCAB),
                ).cast("string"),
            )
            for j in range(5)
        ],
    )
    text = F.when(pos == 8, F.concat_ws(" ", base, extra)).otherwise(base)
    (
        d.select(
            "doc_id",
            text.alias("text"),
            F.lit("en").alias("lang"),
            F.concat(F.lit("src"), pos.cast("string")).alias("source"),
        )
        .withColumn("n_chars", F.length("text"))
        .write.mode("overwrite")
        .parquet(out)
    )
    return out_dir


def candidate_census(spark: SparkSession, sf_dir: str) -> dict:
    """Mirror dedup_ngram_jaccard's candidate pipeline (extensions/
    dedup.py:454) up to — but not including — the exact verify, and
    count what the verify stage would have to touch."""
    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    words = F.split(F.lower("text"), r"\s+")
    n = F.size(words)
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n - 1, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(words, i, 2)),
        )
    )
    g = d.select("doc_id", grams.alias("gs")).localCheckpoint(eager=True)
    toks = g.select("doc_id", F.explode("gs").alias("gram"))
    freq = toks.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    per_doc = (
        toks.join(freq, "gram")
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("df", "gram"))).alias("by_rarity"))
    )
    ng = F.size("by_rarity")
    prefix_len = ng - F.ceil(ng * F.lit(JACCARD_T)).cast("int") + 1
    prefix = per_doc.select(
        "doc_id",
        ng.alias("sz"),
        F.explode(
            F.transform(F.slice("by_rarity", 1, prefix_len), lambda s: s["gram"])
        ).alias("gram"),
    ).localCheckpoint(eager=True)
    max_bucket = (
        prefix.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("b"))
        .agg(F.max("b"))
        .collect()[0][0]
    )
    cand = (
        prefix.alias("pa")
        .join(prefix.alias("pb"), "gram")
        .filter(
            (F.col("pa.doc_id") < F.col("pb.doc_id"))
            & (
                F.least(F.col("pa.sz"), F.col("pb.sz")).cast("double")
                >= F.lit(JACCARD_T) * F.greatest(F.col("pa.sz"), F.col("pb.sz"))
            )
        )
        .select(
            F.col("pa.doc_id").alias("a_id"), F.col("pb.doc_id").alias("b_id")
        )
        .distinct()
        .count()
    )
    return {"cand_pairs": cand, "max_prefix_bucket": max_bucket}


def probe_scale(spark: SparkSession, n_docs: int) -> dict:
    from clickhousebackup_spark.registry import get_spec

    sf_dir = build_zipf_docs(spark, n_docs)
    out: dict = {"n_docs": n_docs}
    for key in ("dedup_ngram_jaccard", "corpus_dup_ngrams", "text_rarity_score"):
        t0 = time.time()
        rows = get_spec(key).fn(spark, sf_dir).count()
        out[key] = {"wall": round(time.time() - t0, 2), "rows": rows}
    census = candidate_census(spark, sf_dir)
    pairs_all = n_docs * (n_docs - 1) / 2
    out["ppjoin"] = {
        **census,
        "cand_ratio": census["cand_pairs"] / pairs_all,
        "cand_per_doc": round(census["cand_pairs"] / n_docs, 3),
        "verify_yield": round(
            out["dedup_ngram_jaccard"]["rows"] / max(census["cand_pairs"], 1), 4
        ),
    }
    return out


def main() -> int:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    n_big = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    spark = (
        SparkSession.builder.master("local[16]")
        .appName("zipf-text-probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    res = {
        "vocab": VOCAB,
        "small": probe_scale(spark, n_small),
        "big": probe_scale(spark, n_big),
    }
    s, b = res["small"], res["big"]
    res["scaling"] = {
        "wall_ratio_ngram_jaccard": round(
            b["dedup_ngram_jaccard"]["wall"] / s["dedup_ngram_jaccard"]["wall"], 2
        ),
        "wall_ratio_dup_ngrams": round(
            b["corpus_dup_ngrams"]["wall"] / s["corpus_dup_ngrams"]["wall"], 2
        ),
        "wall_ratio_rarity": round(
            b["text_rarity_score"]["wall"] / s["text_rarity_score"]["wall"], 2
        ),
        "cand_ratio_improvement": round(
            s["ppjoin"]["cand_ratio"] / b["ppjoin"]["cand_ratio"], 2
        ),
    }
    print(json.dumps(res))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
