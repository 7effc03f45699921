#!/usr/bin/env python
"""End-to-end tour of the engine — the script a reference
(clickhouse-backup) user runs to see every surface they rely on,
re-expressed Spark-first. Runs standalone against the sf0.001
fixtures in under a minute:

    python examples/quickstart.py [sf_dir]

Covers: analytics queries from the registry, the backup lifecycle
(snapshot -> incremental -> retention -> restore), an LLM-curation
pipeline (dedup + quality + chunking), and the FileTopic streaming
path with checkpointed resume.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    from pyspark.sql import functions as F

    from clickhousebackup_spark.engine import BackupEngine
    from clickhousebackup_spark.backup.config import BackupConfig
    from clickhousebackup_spark.registry import all_specs
    from clickhousebackup_spark.session import get_spark
    from clickhousebackup_spark.streaming.topic import FileTopic
    from clickhousebackup_spark.tables import load_table

    spark = get_spark("quickstart")
    specs = all_specs()

    # -- 1. analytics: any registry key is a plain (spark, sf) call --
    q3 = specs["q3_shipping_priority"].fn(spark, SF)
    print("TPC-H Q3 top row:", q3.first())

    # -- 2. backup lifecycle (the reference's whole surface) --
    eng = BackupEngine(
        spark,
        BackupConfig(
            host="demo", dbs="db0", user="u", password="p",
            backup_dir=tempfile.mkdtemp(prefix="qs_backups_"),
        ),
    )
    orders = load_table(spark, SF, "orders")
    eng.run_backup({"db0": {"orders": orders}})
    delta = orders.limit(50)  # pretend these rows changed
    eng.run_incremental({"db0": {"orders": orders.unionByName(delta)}})
    plan = eng.retention_plan()
    print(
        "retention plan (keep=1/drop=0):",
        plan.groupBy("keep").count().orderBy("keep").collect(),
    )
    latest = eng.restore_latest("db0")
    full = eng.restore_incremental("db0", "orders")
    print(
        "latest snapshot rows (the delta):", latest.count(),
        "| full incremental restore:", full.count(),
        "(base", orders.count(), "+ 50 delta)",
    )

    # -- 3. LLM curation pipeline: compose registry operators --
    keep = specs["curation_keep_set"].fn(spark, SF)
    scored = specs["quality_linear_score"].fn(spark, SF)
    chunks = specs["text_chunk_passages"].fn(spark, SF)
    kept_chunks = (
        chunks.join(keep.select("doc_id"), "doc_id")
        .join(scored.filter(F.col("score") > 0).select("doc_id"), "doc_id")
    )
    print(
        "curation: chunks from kept, positively-scored docs:",
        kept_chunks.count(),
        "of",
        chunks.count(),
    )

    # -- 3b. training-set assembly: split -> dedup -> pack --
    splits = specs["corpus_split_train_eval"].fn(spark, SF)
    train_ids = splits.filter(F.col("split") == "train").select("doc_id")
    exact_keep = specs["dedup_exact"].fn(spark, SF).select("doc_id")
    packed = specs["corpus_pack_sequences"].fn(spark, SF)
    train_packed = (
        packed.join(train_ids, "doc_id").join(exact_keep, "doc_id")
    )
    print(
        "training set: packed rows from deduped train-split docs:",
        train_packed.count(),
        "of",
        packed.count(),
    )

    # -- 4. streaming: broker-shaped topic with checkpointed resume --
    topic = FileTopic(tempfile.mkdtemp(prefix="qs_topic_") + "/events")
    ev = load_table(spark, SF, "events").select("event_id", "user_id", "value")
    for i in range(3):
        topic.publish(ev.filter(F.pmod("event_id", F.lit(3)) == i))
    counts = []
    q = (
        topic.consume(spark, "event_id long, user_id long, value double")
        .writeStream.foreachBatch(lambda df, _b: counts.append(df.count()))
        .option("checkpointLocation", tempfile.mkdtemp(prefix="qs_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    print("topic consumed per micro-batch:", counts, "total:", sum(counts))

    spark.stop()
    print("quickstart OK")


if __name__ == "__main__":
    main()
