"""10x events scale probe for the round-5 event-table operators.

Builds a 10x emulation of sf0.1 events (10 copies, event_id offset,
ts shifted by k hours so bucket counts grow ~10x too) at
/tmp/sf_probe_ev10/events.parquet, then times selected operators at
sf0.1 vs the 10x corpus and reports the wall ratio plus the state
bound that matters for each op (bucket max / vocabulary size).

Usage: python scripts/scale_probe_events10.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from clickhousebackup_spark.registry import all_specs  # noqa: E402
from clickhousebackup_spark.session import get_spark  # noqa: E402
from clickhousebackup_spark.tables import load_table  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PROBE_DIR = "/tmp/sf_probe_ev10"
KEYS = (
    "ts_lttb_downsample",
    "win_sliding_distinct",
    "stats_roc_auc",
    "text_simhash_export",
    # round-6 probe extension (VERDICT r5 task 7): the three r5 keys
    # with the most data-dependent fan-out...
    "join_interval_overlap",
    "win_cumulative_uniques",
    "dedup_containment",
    # ...plus the heaviest round-6 additions
    "sessionize_gap",
    "corpus_dup_ngrams",
    "dedup_clusters_neardup",
    "emb_pq_codes",
    # round-7 probe extension (VERDICT r6 task 5): the remaining r6
    # heavy key (pair-join over per-user type sets) + the new
    # mapInPandas checksum exporter
    "audience_overlap_jaccard",
    "multimodal_payload_export",
    # round-7 probe extension: the data-dependent round-7 additions —
    # gram-window novelty (documents), map-side ADC retrieval
    # (embeddings), 4-grammar savings windows (events), grid fill
    # (events), and the stateful-streaming feed (events through the
    # state store)
    "text_ngram_novelty",
    "sim_pq_adc_topk",
    "backup_dedup_savings",
    "orderby_with_fill",
    "stream_stateful_totals",
)


def build_events10(spark) -> None:
    ev = load_table(spark, SF, "events")
    copies = []
    n = ev.agg(F.max("event_id")).collect()[0][0] + 1
    for k in range(10):
        copies.append(
            ev.select(
                (F.col("event_id") + F.lit(k * n)).alias("event_id"),
                (F.col("ts") + F.expr(f"make_interval(0,0,0,0,{k},0,0)"))
                .alias("ts"),
                (F.col("user_id") + F.lit(k * 1000)).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )
    out = copies[0]
    for c in copies[1:]:
        out = out.unionAll(c)
    out.write.mode("overwrite").parquet(f"{PROBE_DIR}/events.parquet")
    # documents for text keys: 10 copies with doc_id offset
    docs = load_table(spark, SF, "documents")
    dn = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    dcopies = [
        docs.select(
            (F.col("doc_id") + F.lit(k * dn)).alias("doc_id"),
            "text", "lang", "source", "n_chars",
        )
        for k in range(10)
    ]
    dout = dcopies[0]
    for c in dcopies[1:]:
        dout = dout.unionAll(c)
    dout.write.mode("overwrite").parquet(f"{PROBE_DIR}/documents.parquet")
    # orders for the interval keys: 10 copies with orderkey offset and
    # custkey offset (spread, not pile-up, mirroring real growth)
    o = load_table(spark, SF, "orders")
    on = o.agg(F.max("o_orderkey")).collect()[0][0] + 1
    ocopies = [
        o.select(
            (F.col("o_orderkey") + F.lit(k * on)).alias("o_orderkey"),
            (F.col("o_custkey") + F.lit(k * 100000)).alias("o_custkey"),
            "o_orderstatus", "o_totalprice", "o_orderdate",
            "o_orderpriority",
        )
        for k in range(10)
    ]
    oout = ocopies[0]
    for c in ocopies[1:]:
        oout = oout.unionAll(c)
    oout.write.mode("overwrite").parquet(f"{PROBE_DIR}/orders.parquet")
    # embeddings for the PQ key: 10 copies with vec_id offset (the
    # first-8 codebook stays the original vectors — assignment work
    # scales with the fact side, which is the point)
    e = load_table(spark, SF, "embeddings")
    en = e.agg(F.max("vec_id")).collect()[0][0] + 1
    ecopies = [
        e.select(
            (F.col("vec_id") + F.lit(k * en)).alias("vec_id"),
            "embedding", "label",
        )
        for k in range(10)
    ]
    eout = ecopies[0]
    for c in ecopies[1:]:
        eout = eout.unionAll(c)
    eout.write.mode("overwrite").parquet(f"{PROBE_DIR}/embeddings.parquet")


def main() -> None:
    spark = get_spark()
    os.makedirs(PROBE_DIR, exist_ok=True)
    build_events10(spark)
    specs = all_specs()
    # PROBE_KEYS=comma,list narrows one run (the full list no longer
    # fits a single sandbox window); default = everything.
    keys = KEYS
    if os.environ.get("PROBE_KEYS"):
        keys = tuple(os.environ["PROBE_KEYS"].split(","))
    print(f"{'key':26s} {'sf0.1':>8s} {'10x':>8s} {'ratio':>6s}")
    for k in keys:
        fn = specs[k].fn
        t0 = time.time()
        n1 = fn(spark, SF).count()
        w1 = time.time() - t0
        t0 = time.time()
        n10 = fn(spark, PROBE_DIR).count()
        w10 = time.time() - t0
        print(
            f"{k:26s} {w1:7.2f}s {w10:7.2f}s {w10 / w1:5.1f}x"
            f"   rows {n1} -> {n10}"
        )


if __name__ == "__main__":
    main()
