"""Structured Streaming engine (SURVEY.md §2.B streaming rows + A18/A20).

The reference's scheduler is go-cron forking backup.sh on a cadence
(`init.sh:14`, `Dockerfile:20`); its lifecycle notification is a
webhook (`hooks/00-webhook`). Here:

- cadence → ``trigger(processingTime=...)`` via :func:`cron_to_trigger`
  (``BACKUP_ON_START`` → ``availableNow``, A18);
- notifications → ``foreachBatch`` posting per-batch summaries through
  the same hook machinery as batch jobs (A20);
- the data-plane operators (tumbling/sliding/session windows,
  watermarked dedup) are the *same* expressions as their batch
  equivalents in batch_equiv.py — Spark evaluates them identically;
  only the incremental state management differs.

Scale notes: watermarks bound state size (without one, a streaming agg
keeps every window forever); ``dropDuplicatesWithinWatermark`` holds
only the in-horizon key set. Sinks are exactly-once per epoch via
foreachBatch + idempotent writes.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: go-cron/cron-ish schedule → processingTime interval (A18).
_CRON_ALIASES = {
    "@hourly": "1 hour",
    "@daily": "1 day",
    "@weekly": "7 days",
    "@monthly": "30 days",
    "@every 1m": "1 minute",
}


def cron_to_trigger(schedule: str, on_start: bool = False) -> dict:
    """Map the reference's SCHEDULE/BACKUP_ON_START to a streaming
    trigger kwarg dict (go-cron's `-s`/`-i`, init.sh:10-14)."""
    if on_start:
        return {"availableNow": True}
    if schedule in _CRON_ALIASES:
        return {"processingTime": _CRON_ALIASES[schedule]}
    if schedule.startswith("@every "):
        return {"processingTime": schedule.removeprefix("@every ")}
    # plain 5-field cron: approximate with its smallest repeating unit
    fields = schedule.split()
    if len(fields) == 5 and fields[0].startswith("*/"):
        return {"processingTime": f"{int(fields[0][2:])} minutes"}
    return {"processingTime": "1 day"}  # @daily default, Dockerfile:20


def tumbling_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Per-day tumbling counts with a watermark (streaming form of
    batch_equiv.stream_tumbling)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
        )
    )


def sliding_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
        )
    )


def session_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Stateful dedup on event_id within the watermark horizon — the
    streaming form of the hardlink identity (A13/A14): the first
    arrival wins, later duplicates inside the horizon are dropped,
    state is bounded by the horizon."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_to_memory_sink(
    stream_df: DataFrame, query_name: str, output_mode: str = "append"
):
    """Drive a streaming query to completion against a bounded source
    (memory/parquet) — the unit-test harness shape."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def query_health(query) -> dict:
    """A19 analog: the probe-able status surface go-cron serves over
    HTTP on HEALTHCHECK_PORT (init.sh:14, Dockerfile:29,44-45), as a
    dict built from StreamingQuery.status/lastProgress — the payload a
    liveness endpoint would serialize."""
    return {
        "id": str(query.id),
        "run_id": str(query.runId),
        "name": query.name,
        "is_active": query.isActive,
        "status": dict(query.status or {}),
        "last_progress": dict(query.lastProgress or {}),
    }


def session_health(spark) -> dict:
    """Health of every active streaming query in the session plus an
    overall ok flag (any query that died with an exception → not ok)."""
    queries = [query_health(q) for q in spark.streams.active]
    return {
        "ok": all(q["is_active"] for q in queries),
        "n_active": len(queries),
        "queries": queries,
    }


def run_foreach_webhook(
    stream_df: DataFrame,
    post: Callable[[dict], None],
    checkpoint_dir: str,
):
    """A20 as a streaming sink: each epoch POSTs a summary dict through
    ``post`` (injected for tests; production passes hooks.webhook_hook's
    transport). foreachBatch gives exactly-once per epoch-id."""

    def per_batch(batch_df: DataFrame, epoch_id: int) -> None:
        n = batch_df.count()
        post({"status": "post-backup", "epoch": epoch_id, "rows": n})

    q = (
        stream_df.writeStream.foreachBatch(per_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def interval_join(
    left: DataFrame,
    right: DataFrame,
    watermark: str = "1 hour",
    interval: str = "30 minutes",
) -> DataFrame:
    """Watermarked stream-stream inner join: same-user events within
    ``interval`` after the left event. Both sides carry a watermark so
    Spark can bound the join state buffer (without one the left buffer
    grows forever); the time-interval condition is what lets the state
    manager evict rows past the horizon."""
    a = left.withWatermark("ts", watermark).alias("a")
    b = right.withWatermark("ts", watermark).alias("b")
    return a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.ts") > F.col("a.ts"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr(f"INTERVAL {interval}")),
    ).select(
        F.col("a.event_id").alias("a_event"),
        F.col("b.event_id").alias("b_event"),
        F.col("a.user_id").alias("user_id"),
    )
