"""KafkaPythonFeed conformance (VERDICT r9 item 8): the kafka-python-
shaped binding behind the RecordFeed seam, run against the in-process
mock broker — same conformance shapes as test_streaming_feed.py runs
over FileTopic, plus the client-surface semantics (contiguous
offsets, poll budgets, log-start retention) and the import gate for
the real client library."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhousebackup_spark.sources.readers import ConnectorUnavailable
from clickhousebackup_spark.streaming.feed import RecordFeed, feed_backfill
from clickhousebackup_spark.streaming.kafka_feed import (
    KafkaPythonFeed,
    MockKafkaConsumer,
    MockKafkaProducer,
    TopicPartition,
    mock_client,
    reset_mock_broker,
)
from clickhousebackup_spark.tables import load_table

SCHEMA = "event_id long, user_id long, value double"


@pytest.fixture()
def feed(tmp_path):
    bootstrap = f"mock-{tmp_path.name}:9092"
    reset_mock_broker(bootstrap)
    yield KafkaPythonFeed(
        bootstrap_servers=bootstrap,
        topic="events",
        staging_dir=str(tmp_path / "staged"),
        schema=SCHEMA,
        client=mock_client,
    )
    reset_mock_broker(bootstrap)


def test_satisfies_record_feed_protocol(feed):
    assert isinstance(feed, RecordFeed)


def test_mock_client_offsets_are_contiguous_and_pollable():
    reset_mock_broker("m:1")
    p = MockKafkaProducer(bootstrap_servers="m:1")
    offsets = [p.send("t", f"v{i}".encode()).get(timeout=1).offset for i in range(5)]
    assert offsets == [0, 1, 2, 3, 4]
    c = MockKafkaConsumer("t", bootstrap_servers="m:1")
    tp = TopicPartition("t", 0)
    assert c.end_offsets([tp])[tp] == 5
    first = c.poll(max_records=2)
    assert [r.offset for r in first[tp]] == [0, 1]
    rest = list(c)  # iterator drains from the post-poll position
    assert [r.value for r in rest] == [b"v2", b"v3", b"v4"]
    assert c.poll() == {}


def test_publish_backfill_roundtrip(spark, sf_dir, feed):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    feed.publish(ev.filter(F.col("event_id") % 2 == 0))
    feed.publish(ev.filter(F.col("event_id") % 2 == 1))
    assert feed.next_offset() == ev.count()
    got = feed_backfill(feed, spark)
    assert got.count() == ev.count()
    assert {r["event_id"] for r in got.select("event_id").collect()} == {
        r["event_id"] for r in ev.select("event_id").collect()
    }


def test_streaming_consume_exactly_once_with_backpressure(
    spark, sf_dir, feed, tmp_path
):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    n_batches = 3
    for i in range(n_batches):
        feed.publish(ev.filter(F.pmod("event_id", F.lit(n_batches)) == i))
        assert feed.pump(spark) is not None  # one segment per publish
    assert feed.pump(spark) is None  # nothing new

    seen: list[int] = []
    q = (
        feed.consume(spark, SCHEMA, max_segments_per_trigger=1)
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, bid: seen.append(df.count()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # backpressure: one staged segment per micro-batch; exactly-once:
    # totals equal the published row count with no replays
    assert len(seen) == n_batches
    assert sum(seen) == ev.count()


def test_prune_advances_broker_log_start(spark, sf_dir, feed):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    ).limit(10)
    feed.publish(ev)
    feed.pump(spark)
    feed.publish(ev)
    feed.pump(spark)
    removed = feed.prune_consumed(10)
    assert len(removed) == 1
    assert feed.read_all(spark).count() == 10  # only the second batch
    # a fresh earliest-consumer starts at the advanced log-start
    c = MockKafkaConsumer("events", bootstrap_servers=feed.bootstrap_servers)
    tp = TopicPartition("events", 0)
    assert c.position(tp) == 10


def test_real_client_import_is_gated(tmp_path):
    with pytest.raises(ConnectorUnavailable):
        KafkaPythonFeed(
            bootstrap_servers="real:9092",
            topic="t",
            staging_dir=str(tmp_path / "s"),
            schema=SCHEMA,
        )


def test_consume_resumes_from_checkpoint_after_restart(
    spark, sf_dir, feed, tmp_path
):
    """Exactly-once across RESTARTS: a second streaming query on the
    same checkpoint must process only segments staged since the first
    query committed — the file-source offset log is the broker
    consumer-group offset analog."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    ckpt = str(tmp_path / "ckpt")

    def drain():
        seen = []
        q = (
            feed.consume(spark, SCHEMA, max_segments_per_trigger=1)
            .writeStream.outputMode("append")
            .foreachBatch(lambda df, bid: seen.append(df.count()))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return seen

    first = ev.filter(F.col("event_id") % 2 == 0)
    feed.publish(first)
    feed.pump(spark)
    run1 = drain()
    assert sum(run1) == first.count()

    second = ev.filter(F.col("event_id") % 2 == 1)
    feed.publish(second)
    feed.pump(spark)
    run2 = drain()  # fresh query object, same checkpoint
    # only the NEW segment is processed — no replay of run 1's rows
    assert sum(run2) == second.count()
    assert len(run2) == 1


def test_partial_segment_is_reaped_and_repumped(spark, sf_dir, feed, tmp_path):
    """Crash-safety (ADVICE r10): a segment dir whose NAME matches but
    that never committed (no _SUCCESS — e.g. a crash mid
    df.write.parquet) must NOT advance _staged_end on restart;
    otherwise its [start,end) records are permanently skipped. A
    restarted feed reaps the junk dir and re-pumps the range from the
    broker."""
    import os
    import shutil

    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "value")
        .limit(20)
    )
    feed.publish(ev)
    seg = feed.pump(spark)
    assert seg is not None and feed._staged_end == 20

    # simulate the crash: the segment dir exists, _SUCCESS does not
    os.remove(os.path.join(seg, "_SUCCESS"))

    restarted = KafkaPythonFeed(
        bootstrap_servers=feed.bootstrap_servers,
        topic=feed.topic,
        staging_dir=feed.staging_dir,
        schema=SCHEMA,
        client=mock_client,
    )
    # the markerless dir was reaped, so the offset range is unstaged again
    assert not os.path.exists(seg)
    assert restarted._staged_end == 0
    seg2 = restarted.pump(spark)
    assert seg2 is not None and restarted._staged_end == 20
    assert restarted.read_all(spark).count() == 20
    shutil.rmtree(feed.staging_dir, ignore_errors=True)


def test_interrupted_tmp_write_is_reaped_and_repumped(spark, sf_dir, feed):
    """Round-11 review fix: pump() commits by atomic rename of a
    dot-prefixed temp dir (invisible to Spark's file listers, so
    consume()'s seg-* glob can never read a partial write). A
    leftover .tmp-seg-* from an interrupted write must be reaped on
    restart and its range re-pumped."""
    import os
    import shutil

    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "value")
        .limit(10)
    )
    feed.publish(ev)
    # simulate a crash BEFORE the rename: temp dir exists, no seg dir
    tmp = os.path.join(feed.staging_dir, ".tmp-seg-000000000000-000000000010")
    os.makedirs(tmp, exist_ok=True)
    open(os.path.join(tmp, "part-00000.parquet"), "w").write("junk")

    restarted = KafkaPythonFeed(
        bootstrap_servers=feed.bootstrap_servers,
        topic=feed.topic,
        staging_dir=feed.staging_dir,
        schema=SCHEMA,
        client=mock_client,
    )
    assert not os.path.exists(tmp)
    assert restarted._staged_end == 0
    seg = restarted.pump(spark)
    assert seg is not None and os.path.exists(os.path.join(seg, "_SUCCESS"))
    assert restarted.read_all(spark).count() == 10
    shutil.rmtree(feed.staging_dir, ignore_errors=True)


def test_dot_tmp_dirs_are_invisible_to_readers(spark, sf_dir, feed):
    """The rename-commit protocol rests on Spark's file listers
    skipping '.'-prefixed paths — pin that: a VALID parquet segment
    under a .tmp-seg-* name must not appear in read_all()."""
    import os
    import shutil

    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "value")
        .limit(5)
    )
    feed.publish(ev)
    feed.pump(spark)
    assert feed.read_all(spark).count() == 5
    # a complete, readable parquet dir — but uncommitted (dot name)
    tmp = os.path.join(feed.staging_dir, ".tmp-seg-000000000005-000000000009")
    ev.limit(4).write.mode("overwrite").parquet(tmp)
    assert spark.read.parquet(tmp).count() == 4  # readable directly...
    assert feed.read_all(spark).count() == 5  # ...but invisible to the glob
    shutil.rmtree(feed.staging_dir, ignore_errors=True)


def test_publish_bulk_is_gated_without_connector_jar(spark, sf_dir, feed):
    """publish_bulk routes through the Spark Kafka connector sink
    (executor-side, the data-scale path); this image has no
    spark-sql-kafka jar, so the failed datasource lookup must raise
    the loud ConnectorUnavailable gate with the jar recipe — the same
    contract as the Delta/Iceberg sources — never a cryptic
    ClassNotFound."""
    import pytest

    from clickhousebackup_spark.sources.readers import ConnectorUnavailable
    from clickhousebackup_spark.tables import load_table

    df = load_table(spark, sf_dir, "orders").limit(5)
    with pytest.raises(ConnectorUnavailable, match="spark-sql-kafka"):
        feed.publish_bulk(df)
