#!/usr/bin/env python
"""sf1 scale probe for the dedup/curation family (VERDICT r2 item #5).

Emulates an sf1-sized corpus (~500k docs, 10x the bench sf0.1) by
unioning ten perturbed copies of the sf0.1 documents table: copy i of
doc d keeps d's text and appends ceil(|words|/3) tokens derived from
(md5(text), i) — identical texts get identical filler WITHIN a copy
(so each original duplicate pair survives in every copy: linear pair
scaling), while cross-copy bigram Jaccard drops to ~0.6 < 0.8 (so no
10-clique output explosion that would measure result size rather than
algorithm scaling). doc_ids are offset per copy to stay unique.

Measures wall time at sf0.1 and the emulated sf1 for:
  dedup_minhash, dedup_ngram_jaccard, contamination_overlap,
  dedup_clusters_neardup
plus the candidate-bucket maxima that the "bounded buckets" scale
claims rest on (max MinHash band-bucket size, max PPJoin prefix-gram
bucket size). Prints one JSON object; results are recorded in
NOTES.md (run of 2026-08-13).

Usage: python scripts/scale_probe_sf1.py [base_sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def build_sf1(spark, base_sf: str) -> str:
    out_dir = os.path.join(tempfile.gettempdir(), "cbs_sf1_probe")
    out = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(out):
        return out_dir  # reuse: deterministic construction
    docs = spark.read.parquet(f"{base_sf}/documents.parquet")
    copies = []
    for i in range(10):
        filler = F.concat_ws(
            " ",
            F.transform(
                F.sequence(
                    F.lit(1),
                    F.greatest(
                        (F.size(F.split(F.col("text"), r"\s+")) / 3).cast("int"),
                        F.lit(10),
                    ),
                ),
                lambda j: F.concat(
                    F.lit(f"u{i}c"), F.substring(F.md5("text"), 1, 8),
                    F.lit("x"), j.cast("string"),
                ),
            ),
        )
        copies.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                F.concat_ws(" ", "text", filler).alias("text"),
                "lang",
                "source",
                F.col("n_chars"),
            )
        )
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    big.repartition(32).write.mode("overwrite").parquet(out)
    return out_dir


def build_sf1_part(spark, base_sf: str) -> None:
    """10x part table for the dedup_fuzzy_blocked probe. Copy i of
    part p keeps p's name plus a copy-distinct md5-derived token of
    LENGTH 6+i: within-copy duplicate distances are preserved (same
    suffix), cross-copy pairs differ by a >3-edit random token so the
    verify filter rejects them (no output explosion), and the varying
    token length spreads copies across length buckets the way real
    growth spreads real data."""
    out = os.path.join(tempfile.gettempdir(), "cbs_sf1_probe", "part.parquet")
    if os.path.exists(out):
        return
    part = spark.read.parquet(f"{base_sf}/part.parquet")
    copies = []
    for i in range(10):
        suffix = F.concat(
            F.lit(" "), F.substring(F.md5(F.concat(F.lit(str(i)), "p_name")), 1, 6 + i)
        )
        copies.append(
            part.select(
                (F.col("p_partkey") + F.lit(i * 10_000_000)).alias("p_partkey"),
                F.concat("p_name", suffix).alias("p_name"),
                "p_brand",
                "p_type",
                "p_size",
                "p_retailprice",
            )
        )
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    big.repartition(32).write.mode("overwrite").parquet(out)


def build_sf1_embeddings(spark, base_sf: str) -> None:
    """10x embeddings for the sim_knn_join probe: vec_ids offset per
    copy, each vector element nudged by a copy-dependent epsilon so
    copies aren't bit-identical (identical vectors would make every
    top-k a tie-break exercise rather than a ranking)."""
    out = os.path.join(
        tempfile.gettempdir(), "cbs_sf1_probe", "embeddings.parquet"
    )
    if os.path.exists(out):
        return
    emb = spark.read.parquet(f"{base_sf}/embeddings.parquet")
    copies = []
    for i in range(10):
        copies.append(
            emb.select(
                (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x: x + F.lit(float(i) * 1e-3),
                ).alias("embedding"),
                "label",
            )
        )
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    big.repartition(32).write.mode("overwrite").parquet(out)


def bucket_maxima(spark, sf_dir: str) -> dict:
    from clickhousebackup_spark.extensions.dedup import (
        N_BANDS,
        N_MINHASH,
        minhash_signatures,
    )
    from clickhousebackup_spark.tables import load_table, parallelize

    d = parallelize(load_table(spark, sf_dir, "documents"))
    sigs = minhash_signatures(d)
    rows_per_band = N_MINHASH // N_BANDS
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.slice("sig", b * rows_per_band + 1, rows_per_band)
                        ).alias("bucket"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    minhash_max = (
        bands.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("m"))
        .collect()[0]["m"]
    )
    # PPJoin prefix-gram bucket: replicate dedup_ngram_jaccard's prefix
    words = F.split(F.lower("text"), r"\s+")
    n = F.size(words)
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n - 1, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(words, i, 2)),
        )
    )
    g = d.select("doc_id", grams.alias("gs"))
    toks = g.select("doc_id", F.explode("gs").alias("gram"))
    freq = toks.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    per_doc = (
        toks.join(freq, "gram")
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("df", "gram"))).alias("by_rarity"))
    )
    ng = F.size("by_rarity")
    prefix_len = ng - F.ceil(ng * F.lit(0.8)).cast("int") + 1
    prefix = per_doc.select(
        F.explode(
            F.transform(F.slice("by_rarity", 1, prefix_len), lambda s: s["gram"])
        ).alias("gram")
    )
    prefix_max = (
        prefix.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("m"))
        .collect()[0]["m"]
    )
    return {"minhash_band_bucket_max": minhash_max, "ppjoin_prefix_bucket_max": prefix_max}


def fuzzy_knn_maxima(spark, sf_dir: str) -> dict:
    """Max candidate-block sizes for the round-5 probe additions: the
    (brand, len_bucket) fuzzy block and the sign-LSH knn bucket — the
    quantities the quadratic-within-block worst cases are bounded by."""
    from clickhousebackup_spark.extensions.similarity import lsh_bucket_expr
    from clickhousebackup_spark.tables import load_table, parallelize

    part = load_table(spark, sf_dir, "part")
    fuzzy_max = (
        part.groupBy("p_brand", F.expr("length(p_name) div 4").alias("lb"))
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("m"))
        .collect()[0]["m"]
    )
    emb = parallelize(load_table(spark, sf_dir, "embeddings"))
    knn_max = (
        emb.groupBy(lsh_bucket_expr("embedding").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("m"))
        .collect()[0]["m"]
    )
    return {"fuzzy_block_max": fuzzy_max, "knn_lsh_bucket_max": knn_max}


def build_sf1_facts(spark, base_sf: str) -> None:
    """10x fact tables for the round-9 probe (VERDICT r8 item 3): the
    six de-scale-killed distrank operators rank/cumsum over lineitem,
    orders, and events, so those are the tables that must grow.
    Copies offset every key column (10x orders AND 10x customers —
    rank-scale tests should see more groups, not just heavier ones);
    events.value gets a +i*1e-6 per-copy nudge so the DISTINCT-value
    domain (what made stats_roc_auc row-scale) also grows ~10x."""
    root = os.path.join(tempfile.gettempdir(), "cbs_sf1_probe")
    os.makedirs(root, exist_ok=True)

    def tenfold(df, mutate):
        copies = [mutate(df, i) for i in range(10)]
        big = copies[0]
        for c in copies[1:]:
            big = big.unionByName(c)
        return big.repartition(32)

    out = os.path.join(root, "lineitem.parquet")
    if not os.path.exists(out):
        li = spark.read.parquet(f"{base_sf}/lineitem.parquet")
        tenfold(
            li,
            lambda df, i: df.withColumn(
                "l_orderkey", F.col("l_orderkey") + F.lit(i * 100_000_000)
            ),
        ).write.mode("overwrite").parquet(out)
    out = os.path.join(root, "orders.parquet")
    if not os.path.exists(out):
        o = spark.read.parquet(f"{base_sf}/orders.parquet")
        tenfold(
            o,
            lambda df, i: df.withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(i * 100_000_000)
            ).withColumn(
                "o_custkey", F.col("o_custkey") + F.lit(i * 100_000_000)
            ),
        ).write.mode("overwrite").parquet(out)
    out = os.path.join(root, "events.parquet")
    if not os.path.exists(out):
        ev = spark.read.parquet(f"{base_sf}/events.parquet")
        tenfold(
            ev,
            lambda df, i: df.withColumn(
                "event_id", F.col("event_id") + F.lit(i * 100_000_000)
            )
            .withColumn("user_id", F.col("user_id") + F.lit(i * 100_000_000))
            .withColumn("value", F.col("value") + F.lit(i * 1e-6)),
        ).write.mode("overwrite").parquet(out)
    # unscaled dims: link through so load_table finds every table
    for t in (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
    ):
        dst = os.path.join(root, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(f"{base_sf}/{t}.parquet", dst)


def _shuffle_bytes_total(spark) -> int:
    """Cumulative shuffle write bytes across completed stages, via the
    UI REST API (the only place PySpark exposes stage metrics)."""
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    if not ui:
        return -1
    try:
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages?status=COMPLETE",
            timeout=10,
        ) as r:
            stages = json.loads(r.read())
        return sum(s.get("shuffleWriteBytes", 0) for s in stages)
    except Exception:
        return -1


def _last_sql_plan(spark) -> str:
    """Final physical plan description of the most recent SQL
    execution, via the UI REST API — the only place the POST-execution
    adaptive plan (with OptimizeSkewedJoin's skew=true marks) is
    visible from PySpark."""
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    if not ui:
        return ""
    try:
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/sql?length=1000",
            timeout=10,
        ) as r:
            execs = json.loads(r.read())
        if not execs:
            return ""
        last = max(execs, key=lambda e: e.get("id", -1))
        return last.get("planDescription", "")
    except Exception:
        return ""


#: round-9 probe set: the six distrank conversions + every bench
#: extra whose driving table the emulated sf1 scales (docs/embeddings
#: from the original builders; lineitem/orders/events from
#: build_sf1_facts). Vocabulary-input extras (dict_hierarchy_flatten)
#: and the streaming-trigger-floor key (stream_stateful_totals) are
#: excluded — their walls measure fixed overhead, not data scaling.
R9_KEYS = (
    "agg_histogram_equi_depth",
    "stats_mannwhitney_u",
    "stats_roc_auc",
    "stats_ks_test",
    "orders_rfm_segments",
    "orders_pareto_8020",
    "sort_multi",
    "text_chunk_passages",
    "merge_aggregating_shards",
    "graph_pagerank",
    "skyline_orders",
    "dedup_ngram_jaccard",
    "quality_linear_score",
    "bpe_merge_candidates",
    "ts_lttb_downsample",
    "text_minhash_export",
    "win_sliding_distinct",
    "corpus_dup_ngrams",
    "emb_pq_codes",
    "sessionize_gap",
    "merge_graphite_rollup",
    "sim_pq_adc_topk",
    "text_ngram_novelty",
    "join_lateral_topn",
    "backup_dedup_savings",
    "dedup_minhash",
)

#: round-9 batch-2/3 additions (this session): every new key whose
#: driving table the emulated sf1 scales (events/orders/documents/
#: embeddings). sql_quantified_compare is excluded — it reads
#: supplier, which the probe does not scale.
R9B_KEYS = (
    "stats_entropy",
    "stats_theils_u",
    "stats_contingency_coef",
    "stats_student_ttest",
    "stats_ab_min_sample",
    "seq_gaps_islands",
    "date_parse_best_effort",
    "corpus_temperature_mix",
    "emb_power_iteration_pc1",
    "emb_random_projection",
    "sample_hash_consistent",
    "dq_benford_law",
    "events_markov_stationary",
)

#: round-10 probe (VERDICT r9 item 2): the 12 continuation-session
#: batch-4/5 keys (analytics10/11.py, extensions/linalg.py) that had
#: plan budgets + three-scale exactness but no sf1 row yet. All read
#: tables the emulated sf1 scales (events/orders/lineitem/documents/
#: embeddings).
R10_KEYS = (
    "ts_stl_decompose",
    "stats_anova_oneway",
    "stats_jarque_bera",
    "ts_cusum_alarm",
    "token_bigram_entropy",
    "stats_linregress_multi",
    "dq_schema_profile",
    "stats_levene_bf",
    "stats_runs_test",
    "text_mattr_diversity",
    "date_business_days",
    "emb_pca2_deflation",
)

#: round-10 additions (operators/analytics12.py + scan_dpp_join):
#: probed the round they are registered, same criterion.
R10B_KEYS = (
    "emb_kmeans",  # oracled round 10 — first probe row under the contract
    "agg_argmax_argmin",
    "stats_covariance",
    "win_session_window_builtin",
    "text_quality_gopher",
    "url_canonical_dedup",
    "scan_dpp_join",
    "math_round_families",
    "text_blocklist_filter",
)


R11_KEYS = (
    # round-11 additions (operators/analytics13.py): events-scaled
    # rank/window/agg keys, the orders-scaled ABC scan, and the
    # documents-scaled TF-IDF extraction
    "stats_kruskal_wallis",
    "orders_abc_analysis",
    "text_tfidf_topk",
    "ts_rolling_slope",
    "win_groups_frame_emulated",
    "events_peak_hour",
    # batch 2 (operators/analytics14.py)
    "orders_seasonal_index",
    "scan_minmax_pruned",
    "dq_orders_lineitem_reconcile",
    "lineitem_revenue_waterfall",
    "stats_permutation_test_hash",
    "path_transition_lift",
    # batch 3 (operators/analytics15.py)
    "stats_welch_anova",
    "events_wau_rolling",
    "win_frame_exclude_current",
    "agg_combinators_if_matrix",
    "dedup_hierarchical_two_level",
    "intervals_peak_position",
    "str_has_subsequence",
    "ts_backtest_seasonal_naive",
    "scan_bloom_filter_lookup",
)


def main_r9(probe_keys: tuple = R9_KEYS) -> None:
    base_sf = (
        sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    )
    from pyspark.sql import SparkSession

    from clickhousebackup_spark.registry import all_specs
    from clickhousebackup_spark.session import get_spark

    # the engine session disables the UI; the probe needs its REST
    # API for stage shuffle metrics, so rebuild with it on (a fresh
    # SparkContext in the same JVM honors spark.ui.enabled)
    spark = get_spark("cbs-sf1-probe-r9")
    if not spark.sparkContext.uiWebUrl:
        spark.stop()
        spark = (
            SparkSession.builder.master("local[32]")
            .appName("cbs-sf1-probe-r9")
            .config("spark.ui.enabled", "true")
            .config("spark.sql.shuffle.partitions", "32")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.driver.memory", "8g")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    sf1_dir = build_sf1(spark, base_sf)
    build_sf1_part(spark, base_sf)
    build_sf1_embeddings(spark, base_sf)
    build_sf1_facts(spark, base_sf)
    report: dict = {"base_sf": base_sf, "keys": {}}
    for k in probe_keys:
        row: dict = {}
        for label, sf in (("sf0.1", base_sf), ("sf1", sf1_dir)):
            t0 = time.perf_counter()
            sh0 = _shuffle_bytes_total(spark)
            rows = specs[k].fn(spark, sf).count()
            wall = round(time.perf_counter() - t0, 2)
            sh = _shuffle_bytes_total(spark)
            row[label] = {
                "wall_s": wall,
                "rows": rows,
                "shuffle_mb": round((sh - sh0) / 1e6, 1)
                if sh >= 0 and sh0 >= 0
                else None,
            }
            print(f"# {label} {k}: {wall}s rows={rows}", file=sys.stderr)
        r = (
            round(row["sf1"]["wall_s"] / row["sf0.1"]["wall_s"], 2)
            if row["sf0.1"]["wall_s"] > 0
            else None
        )
        row["wall_ratio"] = r
        row["linear_ok"] = bool(r is not None and r <= 10.0)
        report["keys"][k] = row
    report["all_linear"] = all(
        v["linear_ok"] for v in report["keys"].values()
    )
    print(json.dumps(report))
    spark.stop()


def build_zipf_facts(spark, base_sf: str) -> str:
    """Zipf-skewed variant of the sf0.1 tables (VERDICT r9 item 2):
    same row counts and bytes as base, but orders.o_custkey and
    lineitem.l_orderkey are remapped through a hash-deterministic
    heavy-tail draw over their own contiguous [0, N) domains —
    rank = N^(u^2) with u = (xxhash64(row key) mod 1e6 + .5)/1e6, so
    the hottest key takes ~sqrt(ln 2 / ln N) ~ 25-27%% of all rows
    (vs 1/N uniform). The uniform perturbed-copy corpus never
    stresses AQE skew handling; this dir does. All other tables are
    byte-identical copies so every probe key still resolves its
    inputs."""
    root = os.path.join(tempfile.gettempdir(), "cbs_zipf_probe")
    os.makedirs(root, exist_ok=True)

    def zipf_key(seed_col, n_keys):
        u = (F.pmod(F.xxhash64(seed_col), F.lit(1_000_000)).cast("double")
             + F.lit(0.5)) / F.lit(1_000_000.0)
        return F.least(
            F.lit(n_keys - 1),
            (F.floor(F.pow(F.lit(float(n_keys)), u * u)) - F.lit(1))
            .cast("long"),
        )

    out = os.path.join(root, "orders.parquet")
    if not os.path.exists(out):
        o = spark.read.parquet(f"{base_sf}/orders.parquet")
        n_cust = spark.read.parquet(f"{base_sf}/customer.parquet").count()
        o.withColumn(
            "o_custkey", zipf_key(F.col("o_orderkey"), n_cust)
        ).repartition(32).write.mode("overwrite").parquet(out)
    out = os.path.join(root, "lineitem.parquet")
    if not os.path.exists(out):
        li = spark.read.parquet(f"{base_sf}/lineitem.parquet")
        n_ord = spark.read.parquet(f"{base_sf}/orders.parquet").count()
        li.withColumn(
            "l_orderkey",
            zipf_key(
                F.xxhash64("l_orderkey", "l_linenumber", "l_partkey"),
                n_ord,
            ),
        ).repartition(32).write.mode("overwrite").parquet(out)
    for t in ("region", "nation", "customer", "supplier", "part",
              "events", "documents", "embeddings"):
        dst = os.path.join(root, f"{t}.parquet")
        src = os.path.join(base_sf, f"{t}.parquet")
        if not os.path.exists(dst) and os.path.exists(src):
            os.symlink(src, dst)
    return root


ZIPF_KEYS = ("join_inner", "q5_local_supplier_volume", "join_skew_salted")


def main_zipf() -> None:
    """Skewed-join probe: run the top join keys against the zipf dir
    and the uniform base, record wall/rows/shuffle bytes and whether
    AQE marked the sort-merge join skew-split (isSkew=true in the
    final adaptive plan). Criterion: zipf wall <= 3x uniform wall —
    the hot key must spread across reducers, not stall one."""
    base_sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    from pyspark.sql import SparkSession

    from clickhousebackup_spark.registry import all_specs
    from clickhousebackup_spark.session import get_spark

    spark = get_spark("cbs-zipf-probe")
    if not spark.sparkContext.uiWebUrl:
        spark.stop()
        spark = (
            SparkSession.builder.master("local[32]")
            .appName("cbs-zipf-probe")
            .config("spark.ui.enabled", "true")
            .config("spark.sql.shuffle.partitions", "32")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.driver.memory", "8g")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    zipf_dir = build_zipf_facts(spark, base_sf)
    hot = (
        spark.read.parquet(f"{zipf_dir}/orders.parquet")
        .groupBy("o_custkey").count().orderBy(F.desc("count")).limit(1)
        .collect()[0]
    )
    n_orders = spark.read.parquet(f"{zipf_dir}/orders.parquet").count()
    report: dict = {
        "base_sf": base_sf,
        "hot_custkey_share": round(hot["count"] / n_orders, 3),
        "keys": {},
    }
    # At sf0.1 Catalyst broadcasts every dim side, which is itself the
    # right answer to probe-key skew (broadcast hash joins are
    # skew-immune). The *_smj arms force shuffle joins with
    # probe-scaled AQE skew thresholds so the mechanism that matters
    # at 100 TB — OptimizeSkewedJoin splitting the hot partition — is
    # actually exercised, not just assumed.
    smj_confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32k",
    }

    def run_one(k, sf, forced_smj):
        saved = {}
        if forced_smj:
            for c, v in smj_confs.items():
                saved[c] = spark.conf.get(c, None)
                spark.conf.set(c, v)
        try:
            t0 = time.perf_counter()
            sh0 = _shuffle_bytes_total(spark)
            df = specs[k].fn(spark, sf)
            rows = df.count()
            wall = round(time.perf_counter() - t0, 2)
            sh = _shuffle_bytes_total(spark)
            # the count() above ran its OWN QueryExecution; df's plan
            # object never executed, so AQE's final skew marks are
            # only visible in the UI's record of that execution
            plan = _last_sql_plan(spark)
            return {
                "wall_s": wall,
                "rows": rows,
                "shuffle_mb": round((sh - sh0) / 1e6, 1)
                if sh >= 0 and sh0 >= 0
                else None,
                "aqe_skew_split": "isSkew=true" in plan
                or "skew=true" in plan,
            }
        finally:
            for c, v in saved.items():
                if v is None:
                    spark.conf.unset(c)
                else:
                    spark.conf.set(c, v)

    for k in ZIPF_KEYS:
        row: dict = {}
        for label, sf, forced in (
            ("uniform", base_sf, False),
            ("zipf", zipf_dir, False),
            ("uniform_smj", base_sf, True),
            ("zipf_smj", zipf_dir, True),
        ):
            row[label] = run_one(k, sf, forced)
            print(
                f"# {label} {k}: {row[label]['wall_s']}s "
                f"rows={row[label]['rows']} "
                f"skew_split={row[label]['aqe_skew_split']}",
                file=sys.stderr,
            )
        for tag in ("", "_smj"):
            u, z = row[f"uniform{tag}"], row[f"zipf{tag}"]
            row[f"wall_ratio{tag}"] = (
                round(z["wall_s"] / u["wall_s"], 2)
                if u["wall_s"] > 0
                else None
            )
        row["skew_ok"] = bool(
            row["wall_ratio"] is not None
            and row["wall_ratio"] <= 3.0
            and row["wall_ratio_smj"] is not None
            and row["wall_ratio_smj"] <= 3.0
        )
        report["keys"][k] = row
    report["all_ok"] = all(
        v["skew_ok"]
        # rows from mains that predate the gating flag (main_zipf's
        # join-skew probe) are all gated claims.
        for v in report["keys"].values()
        if v.get("gated", True)
    )
    report["skew_split_demonstrated"] = any(
        v["zipf_smj"]["aqe_skew_split"] for v in report["keys"].values()
    )
    print(json.dumps(report))
    spark.stop()


def main() -> None:
    base_sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from clickhousebackup_spark.registry import all_specs
    from clickhousebackup_spark.session import get_spark

    spark = get_spark("cbs-sf1-probe")
    specs = all_specs()
    keys = (
        "dedup_minhash",
        "dedup_ngram_jaccard",
        "contamination_overlap",
        "dedup_clusters_neardup",
        "text_chunk_passages",
        "quality_linear_score",
        "dedup_passage",
        # round-5 additions (VERDICT r4 item #6)
        "dedup_fuzzy_blocked",
        "sim_knn_join",
    )
    report: dict = {"base_sf": base_sf}
    sf1_dir = build_sf1(spark, base_sf)
    build_sf1_part(spark, base_sf)
    build_sf1_embeddings(spark, base_sf)
    for label, sf in (("sf0.1", base_sf), ("sf1_emulated", sf1_dir)):
        n_docs = spark.read.parquet(f"{sf}/documents.parquet").count()
        entry = {"n_docs": n_docs, "timings": {}, "rows": {}}
        for k in keys:
            t0 = time.perf_counter()
            rows = specs[k].fn(spark, sf).count()
            entry["timings"][k] = round(time.perf_counter() - t0, 2)
            entry["rows"][k] = rows
            print(f"# {label} {k}: {entry['timings'][k]}s rows={rows}", file=sys.stderr)
        entry["buckets"] = bucket_maxima(spark, sf)
        entry["buckets"].update(fuzzy_knn_maxima(spark, sf))
        report[label] = entry
    print(json.dumps(report))
    spark.stop()


def _stage_task_stats(spark, seen: set) -> tuple:
    """(max single-task executorRunTime sec across stages NOT in
    ``seen``, updated seen-set) via the UI REST API taskSummary —
    the per-task metric AQE cannot fix for windows, hence the probe's
    headline number."""
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    if not ui:
        return -1.0, seen
    try:
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages?status=COMPLETE",
            timeout=10,
        ) as r:
            stages = json.loads(r.read())
    except Exception:
        return -1.0, seen
    max_task = 0.0
    new_seen = set(seen)
    for s in stages:
        sid = (s["stageId"], s["attemptId"])
        if sid in seen:
            continue
        new_seen.add(sid)
        try:
            with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/stages/"
                f"{s['stageId']}/{s['attemptId']}/taskSummary?"
                f"quantiles=1.0",
                timeout=10,
            ) as r:
                summ = json.loads(r.read())
            max_task = max(max_task, summ["executorRunTime"][-1] / 1000.0)
        except Exception:
            continue
    return round(max_task, 2), new_seen


#: Window/agg keys that partition on user_id (sessionize_gap,
#: funnel_steps: bare user_id — the true hot-partition shape;
#: win_keep_newest: (user_id, day) compound) or o_custkey
#: (topk_per_group — rides the zipf orders remap).
#: sessionize_gap_twostage is the round-12 salting rewrite: same
#: output as sessionize_gap, window partitioned by (user_id,
#: day-bucket) + seam merge — listed right after the flat key so the
#: max-task ratios sit side by side in the artifact.
#: sessionize_gap_adaptive dispatches per key-distribution — on the
#: probe's uniform arm it must ride the flat plan's cost, on the zipf
#: arm the two-stage plan's: the best column of each row above.
#: Flat per-user window keys measured as UNGATED straggler baselines:
#: they are the cost the two-stage rewrites exist to beat (the probe
#: records their ratios honestly — flat path_transitions hits wall
#: x4.76 / max-task x8.91 at the 24%-hot key), so the 3x wall gate
#: only applies to keys that CLAIM skew tolerance.
ZIPF_UNGATED_BASELINE = {
    "sessionize_gap",
    "funnel_steps",
    "path_transitions",
    "win_running_sum",
    "win_rank_dense",
    "win_sliding_avg",
    # STRUCTURAL-straggler flat forms: their group keys are
    # bounded-domain columns (5 event types / 3 statuses) on BOTH
    # arms, so each task holds n/|domain| rows regardless of the
    # user-key distribution. The zipf/uniform RATIO is therefore ~1
    # for them — the evidence columns are the ABSOLUTE max_task_s of
    # flat vs two-stage.
    "agg_percentile_exact",
    "win_ntile_firstlast",
    "win_cume_dist_nth",
    "ts_nonneg_derivative",
    # round-15: families 10/11 flat forms (5-type weight histogram /
    # 3-status percent_rank) — same bounded-domain structural class
    "agg_weighted_median",
    "win_percent_rank",
}

#: Dispatch keys SWITCH plans between the arms (flat on uniform,
#: two-stage on zipf), so their cross-arm WALL ratio conflates the
#: plan change with the skew effect (the flat uniform branch is the
#: cheapest plan in the table). Their promise is "never the
#: straggler plan" — gate them on max-task ratio instead.
ZIPF_ADAPTIVE_KEYS = {
    "sessionize_gap_adaptive",
    "win_sliding_avg_adaptive",
}

ZIPF_WINDOW_KEYS = (
    "sessionize_gap",
    "sessionize_gap_twostage",
    "sessionize_gap_adaptive",
    "win_keep_newest",
    "topk_per_group",
    "topk_per_group_twostage",
    "funnel_steps",
    "funnel_steps_twostage",
    "path_transitions",
    "path_transitions_twostage",
    "win_running_sum",
    "win_running_sum_twostage",
    "win_rank_dense",
    "win_rank_dense_twostage",
    "agg_percentile_exact",
    "agg_percentile_exact_twostage",
    "win_sliding_avg",
    "win_sliding_avg_twostage",
    "win_sliding_avg_adaptive",
    "win_ntile_firstlast",
    "win_ntile_firstlast_twostage",
    "win_cume_dist_nth",
    "win_cume_dist_nth_twostage",
    "ts_nonneg_derivative",
    "ts_nonneg_derivative_twostage",
    # round-14 family 8/9 additions (analytics20.py)
    "sequence_count_pairs",
    "sequence_count_pairs_twostage",
    "agg_ema",
    "agg_ema_twostage",
    # round-15: families 10/11 (analytics21.py) join the probe
    "agg_weighted_median",
    "agg_weighted_median_twostage",
    "win_percent_rank",
    "win_percent_rank_twostage",
)


def build_zipf_window_arms(spark, base_sf: str, mult: int) -> tuple:
    """Two work-identical arms for the window-skew probe, at
    ``mult``x the base rows: events and orders with UNIFORM keys
    (per-copy offsets — every group small) vs ZIPF keys (heavy-tail
    remap over the same mult-scaled domain — the hottest user/custkey
    owns ~25-30% of all rows). Input bytes, row counts, and the
    non-key columns are identical across arms, so any wall/max-task
    delta is the key distribution and nothing else. The first cut of
    this probe ran at 1x/10x where tasks stayed sub-second and
    scan time drowned the signal; mult=100 (10M events) makes the hot
    user's single window partition a multi-second sort."""

    def zipf_key(seed_col, n_keys):
        u = (
            F.pmod(F.xxhash64(seed_col), F.lit(1_000_000)).cast("double")
            + F.lit(0.5)
        ) / F.lit(1_000_000.0)
        return F.least(
            F.lit(n_keys - 1),
            (F.floor(F.pow(F.lit(float(n_keys)), u * u)) - F.lit(1)).cast(
                "long"
            ),
        )

    def fold(df, mutate):
        copies = [mutate(df, i) for i in range(mult)]
        big = copies[0]
        for c in copies[1:]:
            big = big.unionByName(c)
        return big.repartition(32)

    root = os.path.join(tempfile.gettempdir(), f"cbs_zipfwin_{mult}")
    arms = {}
    ev = spark.read.parquet(f"{base_sf}/events.parquet")
    n_users = mult * (1 + ev.agg(F.max("user_id")).collect()[0][0])
    o = spark.read.parquet(f"{base_sf}/orders.parquet")
    n_cust = mult * spark.read.parquet(f"{base_sf}/customer.parquet").count()
    for arm in ("uniform", "zipf"):
        adir = os.path.join(root, arm)
        os.makedirs(adir, exist_ok=True)
        out = os.path.join(adir, "events.parquet")
        if not os.path.exists(os.path.join(out, "_SUCCESS")):
            big = fold(
                ev,
                lambda df, i: df.withColumn(
                    "event_id", F.col("event_id") + F.lit(i * 100_000_000)
                ).withColumn("value", F.col("value") + F.lit(i * 1e-6))
                .withColumn(
                    "user_id", F.col("user_id") + F.lit(i * 1_000_000)
                ),
            )
            if arm == "zipf":
                big = big.withColumn(
                    "user_id",
                    zipf_key(F.xxhash64("event_id", "ts"), int(n_users)),
                )
            big.write.mode("overwrite").parquet(out)
        out = os.path.join(adir, "orders.parquet")
        if not os.path.exists(os.path.join(out, "_SUCCESS")):
            big = fold(
                o,
                lambda df, i: df.withColumn(
                    "o_orderkey", F.col("o_orderkey") + F.lit(i * 100_000_000)
                ).withColumn(
                    "o_custkey", F.col("o_custkey") + F.lit(i * 1_000_000)
                ),
            )
            if arm == "zipf":
                big = big.withColumn(
                    "o_custkey", zipf_key(F.col("o_orderkey"), int(n_cust))
                )
            big.write.mode("overwrite").parquet(out)
        for t in ("region", "nation", "customer", "supplier", "part",
                  "lineitem", "documents", "embeddings"):
            dst = os.path.join(adir, f"{t}.parquet")
            src = os.path.join(base_sf, f"{t}.parquet")
            if not os.path.exists(dst) and os.path.exists(src):
                os.symlink(src, dst)
        arms[arm] = adir
    return arms["uniform"], arms["zipf"]


def main_zipf_window() -> None:
    """Skewed-key WINDOW/AGG probe (VERDICT r10 item 5): joins
    broadcast away skew and aggregations absorb it in map-side
    partials, but a partitioned window/sessionization must ship every
    row of the hot key to ONE task — AQE has no skew rewrite for
    windows. Measure uniform vs zipf wall AND max-task-duration for
    the four keys whose exchanges partition on the skewed key, over
    work-identical 100x arms (10M events / 15M orders). Criterion:
    zipf wall <= 3x uniform; the max-task ratio is recorded un-gated —
    it is the honest cost of a ~25%-hot key under a partitioned
    window, and the number a salting/two-stage rewrite would have to
    beat."""
    base_sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    mult = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    from pyspark.sql import SparkSession

    from clickhousebackup_spark.registry import all_specs
    from clickhousebackup_spark.session import get_spark

    # CBS_PROBE_MASTER overrides the probe master — the multi-JVM arm
    # (e.g. local-cluster[4,8,4096]) measures the SAME skew shapes
    # under serialized network shuffle and per-executor heaps instead
    # of one shared-memory JVM.
    master = os.environ.get("CBS_PROBE_MASTER")
    spark = None if master else get_spark("cbs-zipf-window-probe")
    if spark is not None and not spark.sparkContext.uiWebUrl:
        spark.stop()
        spark = None
    if spark is None:
        builder = (
            SparkSession.builder.master(master or "local[32]")
            .appName("cbs-zipf-window-probe")
            .config("spark.ui.enabled", "true")
            .config("spark.sql.shuffle.partitions", "32")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.driver.memory", "16g")
        )
        if (master or "").startswith("local-cluster"):
            builder = builder.config(
                "spark.executorEnv.PYTHONPATH",
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
        spark = builder.getOrCreate()
        spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    uniform_dir, zipf_dir = build_zipf_window_arms(spark, base_sf, mult)
    ev = spark.read.parquet(f"{zipf_dir}/events.parquet")
    n_ev = ev.count()
    hot = (
        ev.groupBy("user_id").count().orderBy(F.desc("count")).limit(1)
        .collect()[0]
    )
    report: dict = {
        "base_sf": base_sf,
        "mult": mult,
        "n_events": n_ev,
        "hot_user_share": round(hot["count"] / n_ev, 3),
        "hot_user_rows": hot["count"],
        "keys": {},
    }

    seen: set = set()

    def run_one(k, sf):
        nonlocal seen
        # settle: absorb stages from setup so they don't pollute
        _, seen = _stage_task_stats(spark, seen)
        t0 = time.perf_counter()
        df = specs[k].fn(spark, sf)
        # NOT a bare count(): Catalyst prunes cardinality-preserving
        # operators under count — a per-row window like
        # win_running_sum would vanish from the measured plan (caught
        # round 13: the flat prefix sum "beat" its own straggler).
        # Hashing every output row forces the full plan; the hash
        # cost is identical across the work-identical arms.
        h = F.xxhash64(*[F.col(c).cast("string") for c in df.columns])
        row = df.select(h.alias("h")).agg(
            F.count(F.lit(1)).alias("n"), F.max("h").alias("hmax")
        ).collect()[0]
        wall = round(time.perf_counter() - t0, 2)
        max_task, seen = _stage_task_stats(spark, seen)
        return {"wall_s": wall, "rows": row["n"], "max_task_s": max_task}

    # optional key filter: --zipf-window sf mult key1 key2 ...
    only = [a for a in sys.argv[4:] if not a.startswith("-")]
    probe_keys = [k for k in ZIPF_WINDOW_KEYS if not only or k in only]
    for k in probe_keys:
        row = {
            "uniform": run_one(k, uniform_dir),
            "zipf": run_one(k, zipf_dir),
        }
        u, z = row["uniform"], row["zipf"]
        row["wall_ratio"] = (
            round(z["wall_s"] / u["wall_s"], 2) if u["wall_s"] > 0 else None
        )
        row["max_task_ratio"] = (
            round(z["max_task_s"] / u["max_task_s"], 2)
            if u["max_task_s"] and u["max_task_s"] > 0
            else None
        )
        if k in ZIPF_ADAPTIVE_KEYS:
            row["skew_ok"] = bool(
                row["max_task_ratio"] and row["max_task_ratio"] <= 3.0
            )
            row["gate"] = "max_task_ratio<=3 (plan-switching dispatch)"
        else:
            row["skew_ok"] = bool(
                row["wall_ratio"] and row["wall_ratio"] <= 3.0
            )
            row["gate"] = "wall_ratio<=3"
        row["gated"] = k not in ZIPF_UNGATED_BASELINE
        print(
            f"# {k}: uniform {u['wall_s']}s/{u['max_task_s']}s-task, "
            f"zipf {z['wall_s']}s/{z['max_task_s']}s-task "
            f"(wall x{row['wall_ratio']}, task x{row['max_task_ratio']})",
            file=sys.stderr,
        )
        report["keys"][k] = row
    report["all_ok"] = all(
        v["skew_ok"]
        # rows from mains that predate the gating flag (main_zipf's
        # join-skew probe) are all gated claims.
        for v in report["keys"].values()
        if v.get("gated", True)
    )
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--r9":
        main_r9()
    elif len(sys.argv) > 1 and sys.argv[1] == "--r9b":
        main_r9(R9B_KEYS)
    elif len(sys.argv) > 1 and sys.argv[1] == "--r10":
        main_r9(R10_KEYS)
    elif len(sys.argv) > 1 and sys.argv[1] == "--r10b":
        main_r9(R10B_KEYS)
    elif len(sys.argv) > 1 and sys.argv[1] == "--r11":
        main_r9(R11_KEYS)
    elif len(sys.argv) > 1 and sys.argv[1] == "--zipf":
        main_zipf()
    elif len(sys.argv) > 1 and sys.argv[1] == "--zipf-window":
        main_zipf_window()
    else:
        main()