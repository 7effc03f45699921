"""FileTopic: broker-shaped source semantics — segment offsets,
checkpointed resume (exactly-once per segment), backpressure, and
retention pruning.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from clickhousebackup_spark.streaming.topic import FileTopic
from clickhousebackup_spark.tables import load_table

SCHEMA = "event_id long, user_id long, value double"


def _publish_three(topic, spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    for i in range(3):
        topic.publish(ev.filter(F.pmod("event_id", F.lit(3)) == i))
    return ev.count()


def _drain(topic, spark, checkpoint, batches):
    q = (
        topic.consume(spark, SCHEMA, max_segments_per_trigger=1)
        .writeStream.foreachBatch(
            lambda df, bid: batches.append(df.count())
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_publish_assigns_monotonic_offsets(spark, sf_dir, tmp_path):
    topic = FileTopic(str(tmp_path / "t"))
    assert topic.next_offset() == 0
    _publish_three(topic, spark, sf_dir)
    assert topic.next_offset() == 3
    assert [d[-2:] for d in topic._segments()] == ["00", "01", "02"]


def test_consume_is_exactly_once_across_restarts(spark, sf_dir, tmp_path):
    topic = FileTopic(str(tmp_path / "t"))
    total = _publish_three(topic, spark, sf_dir)
    ckpt = str(tmp_path / "ckpt")

    batches: list[int] = []
    _drain(topic, spark, ckpt, batches)
    assert sum(batches) == total
    # maxFilesPerTrigger=1 → one segment per micro-batch
    assert len(batches) == 3

    # restart with the SAME checkpoint: nothing new → no rows
    batches2: list[int] = []
    _drain(topic, spark, ckpt, batches2)
    assert sum(batches2) == 0

    # publish one more segment; only IT is consumed on resume
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    extra = ev.limit(7)
    topic.publish(extra)
    batches3: list[int] = []
    _drain(topic, spark, ckpt, batches3)
    assert sum(batches3) == 7


def test_backfill_read_and_prune(spark, sf_dir, tmp_path):
    topic = FileTopic(str(tmp_path / "t"))
    total = _publish_three(topic, spark, sf_dir)
    assert topic.read_all(spark).count() == total
    removed = topic.prune_consumed(before_offset=2)
    assert len(removed) == 2
    assert all(not os.path.exists(p) for p in removed)
    assert [d[-2:] for d in topic._segments()] == ["02"]
    # offsets never rewind after a prune
    assert topic.next_offset() == 3
