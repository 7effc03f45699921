#!/usr/bin/env python
"""The LLM training-data pipeline, end to end — the round-7 showcase.

Chains the engine's curation vertical the way a production corpus
build does, each stage a registry key (so every step shown here is
also driver-hash-checked against a DuckDB oracle):

    quality gates -> dedup (exact, near-dup + estimator calibration)
    -> contamination -> mixing/upsampling -> deterministic shuffle
    -> packing      ...and the ANN serving side:
    brute-force -> PQ codes -> ADC top-k -> MRL dimension dial

Runs standalone against the sf0.001 fixtures in ~1 minute:

    python examples/training_data_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    from pyspark.sql import functions as F

    from clickhousebackup_spark.registry import all_specs
    from clickhousebackup_spark.session import get_spark

    spark = get_spark("training-pipeline")
    q = {k: s.fn for k, s in all_specs().items()}

    print(f"== training-data pipeline over {SF} ==")

    # 1. Per-doc quality gates (C4/Gopher battery + linear score)
    gates = q["text_c4_gates"](spark, SF)
    short = gates.filter(F.col("flag_short_doc") == 1).count()
    print(f"quality: {gates.count()} docs, {short} fail the short-doc gate")

    # 1b. Round-10 gates: the Gopher rule battery (integer permille
    # thresholds) and canonical-URL dedup — the FIRST dedup pass of a
    # web crawl (tracking params / case / port / param-order variants
    # of one URL collapse before any content hashing runs)
    gopher = q["text_quality_gopher"](spark, SF)
    n_pass = gopher.filter(F.col("gopher_pass") == 1).count()
    print(f"gopher rules: {n_pass}/{gopher.count()} docs pass")
    urls = q["url_canonical_dedup"](spark, SF)
    dup_urls = urls.filter(F.col("n_docs") > 1).count()
    print(
        f"canonical URLs: {urls.count()} groups, {dup_urls} with "
        "collapsed raw variants"
    )

    # 2. Dedup: exact identity, then near-dup with calibrated sketches
    exact = q["dedup_exact"](spark, SF)
    print(f"dedup exact: {exact.count()} surviving docs")
    calib = q["dedup_minhash_estimate_vs_truth"](spark, SF)
    err = calib.agg(
        F.max(F.abs("err_permille")).alias("max_abs_err")
    ).collect()[0]
    print(
        f"dedup near-dup: {calib.count()} LSH candidate pairs; "
        f"minhash-vs-truth max |error| {err['max_abs_err']} permille"
    )

    # 3. Contamination screen against the eval set — the cheap
    # bitset flag pass first (round 9; exact FP accounting), then the
    # n-gram-grain exact overlap on what it flags
    screen = q["contamination_bitset"](spark, SF).collect()[0]
    print(
        f"contamination screen: {screen['n_flagged']} flagged of "
        f"{screen['n_train']} ({screen['n_false_pos']} bucket FPs)"
    )
    contam = q["contamination_overlap"](spark, SF)
    print(f"contamination: {contam.count()} flagged doc/eval overlaps")

    # 4. Mix + upsample + deterministic epoch shuffle. The language
    # mix is temperature-scaled first (round 9: the mBERT/XLM-R
    # alpha-smoothing that upsamples tail languages), and any
    # held-out split comes from consistent USER-level hash sampling,
    # not row Bernoulli
    temp = q["corpus_temperature_mix"](spark, SF)
    head = temp.orderBy(F.col("n_docs").desc()).limit(2).collect()
    print(
        "temperature mix (alpha=0.7): "
        + ", ".join(
            f"{r['lang']} {r['share_micro'] / 10000:.1f}%->"
            f"{r['w07_micro'] / 10000:.1f}%"
            for r in head
        )
    )
    sample = q["sample_hash_consistent"](spark, SF)
    srow = sample.agg(
        F.sum("n_sampled").alias("s"), F.sum("n_total").alias("t")
    ).collect()[0]
    print(f"hash sample: {srow['s']}/{srow['t']} events via 10% user buckets")
    mix = q["corpus_mix_plan"](spark, SF)
    print(f"mix plan: {mix.count()} source rows")
    up = q["corpus_upsample_repeat"](spark, SF)
    print(f"upsampled corpus: {up.count()} doc-copies")
    shuf = q["corpus_global_shuffle"](spark, SF)
    n_shards = shuf.select("shard").distinct().count()
    print(f"epoch shuffle: {shuf.count()} docs over {n_shards} shards")

    # 5. Pack into fixed-length training sequences
    packed = q["corpus_pack_sequences"](spark, SF)
    print(f"packed sequences: {packed.count()}")

    # 5b. Round-8 ordering/export stages: stripe sources evenly
    # through the run, then plan the shard writes
    inter = q["corpus_interleave_round_robin"](spark, SF)
    first = inter.orderBy("global_pos").limit(4).collect()
    print(
        "interleave head: "
        + ", ".join(f"#{r['global_pos']} {r['source']}" for r in first)
    )
    manifest = q["corpus_shard_manifest"](spark, SF)
    mrow = manifest.agg(
        F.max("n_docs").alias("mx"), F.min("n_docs").alias("mn")
    ).collect()[0]
    print(
        f"shard manifest: {manifest.count()} shards, "
        f"{mrow['mn']}-{mrow['mx']} docs/shard"
    )
    budget = q["multimodal_patch_budget"](spark, SF)
    tok = budget.agg(F.sum("n_tokens").alias("t")).collect()[0]
    print(f"multimodal token budget: {tok['t']} tokens")

    # 6. ANN serving side: PQ codes -> ADC top-k -> MRL dial
    codes = q["emb_pq_codes"](spark, SF)
    print(f"PQ codes: {codes.count()} vectors encoded")
    topk = q["sim_pq_adc_topk"](spark, SF)
    print("ADC top-5 for query 0:")
    for r in topk.collect():
        print(
            f"  rank {r['rank']}: vec {r['vec_id']} "
            f"(codes {r['code0']}{r['code1']}{r['code2']}{r['code3']})"
        )
    curve = q["emb_mrl_overlap_curve"](spark, SF)
    avg = curve.agg(
        *[
            F.avg(c).alias(c)
            for c in ("overlap20_d8", "overlap20_d16", "overlap20_d32")
        ]
    ).collect()[0]
    print(
        "MRL overlap@20 by prefix dims: "
        f"8d {avg['overlap20_d8']:.1f}, 16d {avg['overlap20_d16']:.1f}, "
        f"32d {avg['overlap20_d32']:.1f} of 20"
    )

    # 7. Contrastive-training mining (round 8): hardest wrong-label
    # neighbors per query, plus the class-geometry audit behind them
    hard = q["emb_hard_negatives"](spark, SF)
    print(f"hard negatives: {hard.count()} (top-3 x 5 queries)")
    sep = q["emb_centroid_distances"](spark, SF)
    closest = sep.orderBy("dist").limit(1).collect()[0]
    print(
        f"closest class pair: labels {closest['label_a']}/"
        f"{closest['label_b']} at centroid distance {closest['dist']:.3f}"
    )

    spark.stop()
    print("== pipeline complete ==")


if __name__ == "__main__":
    main()
