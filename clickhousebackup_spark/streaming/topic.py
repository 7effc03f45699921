"""File-backed message topic — the broker-shaped streaming source.

The reference schedules backups with go-cron (`/root/reference/
init.sh:14`); a production deployment of this engine would instead
consume change events from a broker (Kafka). No broker client jars
ship in this image, so this module provides the honest stand-in: a
**file topic** with real topic semantics built on Spark's file
streaming source —

- *append-only segments*: each ``publish`` writes one immutable,
  monotonically numbered parquet segment (``seg-000042``), the
  file-system analog of a partition's record batches;
- *offsets & resume*: the consumer is ``spark.readStream`` over the
  segment directory; Spark's file-source offset log (in the
  checkpoint) records which segments each run has consumed, so a
  restarted consumer resumes after the last committed segment —
  exactly-once per segment within one checkpoint lineage;
- *backpressure*: ``maxFilesPerTrigger`` bounds segments per
  micro-batch, the file analog of ``maxOffsetsPerTrigger``.

Swapping in a real broker later changes ONLY the two reader/writer
calls (``format("kafka")`` + ``option("subscribe", ...)``); every
downstream transform, watermark, and sink keeps working — which is
the point of declaring sources behind this seam.

Scale: publishing is a plain distributed parquet write (one segment
may hold any number of files; the segment dir is the commit unit);
consumption parallelism is per-file, so a 1000-executor cluster
drains a backlog segment-parallel. The driver-side listing cost is
O(unconsumed segments), bounded by compaction/retention of old
segments (``prune_consumed``).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

_SEG_RE = re.compile(r"^seg-(\d{6})$")


@dataclass
class FileTopic:
    """A named append-only topic rooted at ``path``."""

    path: str

    def _segments(self) -> list[str]:
        if not os.path.isdir(self.path):
            return []
        return sorted(d for d in os.listdir(self.path) if _SEG_RE.match(d))

    def next_offset(self) -> int:
        segs = self._segments()
        return int(_SEG_RE.match(segs[-1]).group(1)) + 1 if segs else 0

    def publish(self, df: DataFrame) -> str:
        """Append one segment; returns its path. The write is staged
        by Spark (_temporary) and becomes visible atomically at the
        final rename, so a concurrent consumer never sees a partial
        segment."""
        seg = os.path.join(self.path, f"seg-{self.next_offset():06d}")
        df.write.mode("error").parquet(seg)
        return seg

    def consume(
        self,
        spark: SparkSession,
        schema: str,
        max_segments_per_trigger: int = 1,
    ) -> DataFrame:
        """Streaming DataFrame over the topic (glob over segments).

        Offsets live in the query's checkpoint (file-source log);
        pass the same ``checkpointLocation`` to resume.
        """
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_segments_per_trigger)
            .parquet(os.path.join(self.path, "seg-*"))
        )

    def read_all(self, spark: SparkSession) -> DataFrame:
        """Batch read of the full topic (the backfill path)."""
        return spark.read.parquet(os.path.join(self.path, "seg-*"))

    def prune_consumed(self, before_offset: int) -> list[str]:
        """Retention: drop segments below ``before_offset`` (already
        committed by every consumer group). Returns removed paths —
        the topic analog of the reference's age-based prune
        (`backup.sh:119-122`)."""
        import shutil

        removed = []
        for d in self._segments():
            if int(_SEG_RE.match(d).group(1)) < before_offset:
                full = os.path.join(self.path, d)
                shutil.rmtree(full)
                removed.append(full)
        return removed


def _register_queries() -> None:
    from pyspark.sql import functions as F

    from clickhousebackup_spark.registry import register
    from clickhousebackup_spark.scratch import scratch_path
    from clickhousebackup_spark.tables import load_table

    @register(
        "topic_roundtrip",
        oracle="SELECT event_id, user_id, value FROM events",
        doc="Broker-shaped source e2e THROUGH the RecordFeed seam "
        "(streaming/feed.py): publish events as 3 immutable "
        "offset-numbered topic segments (FileTopic — the file-source "
        "stand-in for a Kafka partition; no broker client in this "
        "image), then the batch-backfill read via the protocol. "
        "Hash-checked against the source table: segmentation loses "
        "nothing and preserves values. The streaming consume path "
        "(checkpointed offsets, exactly-once per segment, "
        "maxFilesPerTrigger backpressure) is golden-tested in "
        "tests/test_topic.py; source-agnosticism (same transforms "
        "over FileTopic AND the rate source) in "
        "tests/test_streaming_feed.py.",
    )
    def topic_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
        import shutil

        from clickhousebackup_spark.streaming.feed import feed_backfill

        path = scratch_path(spark, "topic_rt", sf_dir)
        shutil.rmtree(path, ignore_errors=True)
        topic = FileTopic(path)
        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "user_id", "value"
        )
        for i in range(3):
            topic.publish(ev.filter(F.pmod("event_id", F.lit(3)) == i))
        return feed_backfill(topic, spark)


_register_queries()
