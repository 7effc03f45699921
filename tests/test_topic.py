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


def test_topic_feeds_watermarked_window_agg(spark, sf_dir, tmp_path):
    """Integration: FileTopic segments -> watermarked tumbling window
    -> append sink. The streaming aggregate over the topic must equal
    the batch aggregate over the same rows (windows closed by the
    final watermark advance)."""
    import datetime as dt

    from pyspark.sql import functions as F

    topic = FileTopic(str(tmp_path / "t"))
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(minutes=37 * i % 300), float(i)) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    # Segments are time-bucketed, but a segment holds MULTIPLE part
    # files and maxFilesPerTrigger trickles them out in file (not
    # time) order — so the watermark DELAY must cover the
    # intra-segment disorder (segment span = 100 min), exactly as a
    # real pipeline sizes its delay to the producer's batch window.
    # An undersized delay drops stragglers as late (verified: a
    # 1-minute delay loses rows here — correct watermark semantics).
    for i in range(3):
        lo = t0 + dt.timedelta(minutes=100 * i)
        hi = t0 + dt.timedelta(minutes=100 * (i + 1))
        topic.publish(df.filter((F.col("ts") >= lo) & (F.col("ts") < hi)))
    # one far-future row so the watermark passes every real window
    topic.publish(
        spark.createDataFrame(
            [(999, t0 + dt.timedelta(days=2), 0.0)],
            "event_id long, ts timestamp, value double",
        )
    )

    out = []
    q = (
        topic.consume(spark, "event_id long, ts timestamp, value double", 1)
        .withWatermark("ts", "101 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .writeStream.outputMode("append")
        .foreachBatch(lambda d, _b: out.extend(d.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r["w"]["start"], r["n"]) for r in out}
    want = {
        (r["w"]["start"], r["n"])
        for r in df.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # every real window closed by the final watermark advance must
    # carry the exact batch-aggregate count
    assert want <= got
