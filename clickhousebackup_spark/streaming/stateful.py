"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §1.2: "applyInPandasWithState for custom stateful
operators").

The operator is the reference's running per-db backup bookkeeping made
streaming: for each key (user_id here, db in the backup vertical) keep
a running (count, sum, last_ts) state across micro-batches and emit
the updated totals each batch — the state a scheduler would consult
for "has this db backed up recently, and how much".

Scale notes: state lives in the state store, partitioned by key —
size is O(distinct keys), not O(events); timeouts (GroupStateTimeout)
are how idle keys get evicted in production.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, n_events long, total_value double, last_ts timestamp"
)
STATE_SCHEMA = "n long, total double, last_us long"


def _update_totals(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    import math

    (user_id,) = key
    n, total, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # fsum: order-free exact accumulation (same discipline as the
        # batch UDAF — state must not depend on batch arrival slicing)
        total = math.fsum([total] + pdf["value"].tolist())
        batch_max_us = int(pdf["ts"].astype("int64").max() // 1000)
        last_us = max(last_us, batch_max_us)
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total],
            "last_ts": [pd.Timestamp(last_us * 1000)],
        }
    )


def running_totals(events: DataFrame) -> DataFrame:
    """Streaming running totals per user with explicit state."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSION_OUTPUT = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
SESSION_STATE = "start_us long, last_us long, n long"
_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap


def _sessionize(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    closed: list[tuple[int, int, int]] = []

    if state.hasTimedOut:
        # watermark passed last_event + gap with no new data: the open
        # session can never be extended — flush it and clear state.
        start_us, last_us, n = state.get
        closed.append((start_us, last_us, n))
        state.remove()
    else:
        start_us, last_us, n = state.get if state.exists else (0, 0, 0)
        times: list[int] = []
        for pdf in pdfs:
            times.extend(int(v) // 1000 for v in pdf["ts"].astype("int64"))
        times.sort()
        for t in times:
            if n == 0:
                start_us, last_us, n = t, t, 1
            elif t - last_us > _GAP_US:
                closed.append((start_us, last_us, n))
                start_us, last_us, n = t, t, 1
            else:
                last_us, n = max(last_us, t), n + 1
        if n:
            state.update((start_us, last_us, n))
            # event-time timer: fire once the watermark clears the gap
            state.setTimeoutTimestamp((last_us + _GAP_US) // 1000)

    yield pd.DataFrame(
        {
            "user_id": [user_id] * len(closed),
            "session_start": [pd.Timestamp(s * 1000) for s, _, _ in closed],
            "session_end": [pd.Timestamp(e * 1000) for _, e, _ in closed],
            "n_events": [n for _, _, n in closed],
        }
    )


def sessionize(events: DataFrame, watermark_delay: str = "1 minute") -> DataFrame:
    """Custom stateful sessionization: emit each user session when it
    CLOSES — either a later event arrives past the 30-minute gap, or
    the event-time watermark passes ``last_event + gap`` (timeout
    flush), so quiet users' sessions still materialize without
    waiting for their next visit.

    This is the operator ``session_window`` can't express when the
    output must be append-only closed sessions with custom state
    (e.g. carrying running aggregates per session). State is
    O(active users), partitioned by key in the state store; at scale
    the timeout sweep is how the store stays bounded.
    """
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize,
            outputStructType=SESSION_OUTPUT,
            stateStructType=SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# --- driver-checked key: real stateful streaming run, exact oracle ---

EXACT_OUTPUT = (
    "user_id long, n_events long, total_value_micro long, last_us long"
)
EXACT_STATE = "n long, total_micro long, last_us long"


def _register_queries() -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from clickhousebackup_spark.registry import register
    from clickhousebackup_spark.scratch import scratch_path
    from clickhousebackup_spark.tables import load_table

    @register(
        "stream_stateful_totals",
        oracle="""
            SELECT user_id,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(CAST(floor(value * 1000000.0) AS BIGINT))
                        AS BIGINT) AS total_value_micro,
                   CAST(MAX(epoch_us(ts)) AS BIGINT) AS last_us
            FROM events GROUP BY user_id
        """,
        doc="END-TO-END stateful streaming, driver-hash-checked: "
        "events are re-laid as a 4-file parquet feed, consumed with "
        "maxFilesPerTrigger=1 (four real micro-batches), and folded "
        "through applyInPandasWithState keeping per-user (count, "
        "integer-µ value sum, max event-time) state across batches; "
        "trigger=availableNow drains the feed, the memory sink "
        "collects every update, and the final state per user (the "
        "row with the max monotone n_events) must equal the one-shot "
        "batch aggregate. Value is pre-quantized to an integer µ-grid "
        "(the ts_vwap convention) so state folding is exact integer "
        "addition — batch-slicing order cannot perturb the hash. "
        "Scale: state is O(distinct users) in the state store, "
        "partitioned by key; the feed drains file-parallel. The "
        "sibling operators (event-time-timeout sessionize, webhook "
        "lifecycle) are unit-tested in tests/test_streaming.py; this "
        "key puts the state-store path itself under the driver gate. "
        "Reference anchor: the per-db running backup bookkeeping a "
        "scheduler consults (backup.sh:99-115 latest-pointer state).",
    )
    def stream_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
        import shutil

        # defined HERE (not module level) so cloudpickle ships it by
        # VALUE — executors outside this repo can't import the package
        def _update_totals_exact(key, pdfs, state):
            """All-integer running totals: value pre-quantized to a
            µ-grid upstream, so state accumulation is exact integer
            addition — bit-identical regardless of how the file source
            slices rows into micro-batches."""
            import pandas as _pd

            (user_id,) = key
            n, total_micro, last_us = (
                state.get if state.exists else (0, 0, 0)
            )
            for pdf in pdfs:
                n += len(pdf)
                total_micro += int(pdf["value_micro"].sum())
                last_us = max(last_us, int(pdf["us"].max()))
            state.update((n, total_micro, last_us))
            yield _pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "total_value_micro": [total_micro],
                    "last_us": [last_us],
                }
            )

        ev = load_table(spark, sf_dir, "events").select(
            "user_id",
            F.floor(F.col("value") * F.lit(1000000.0))
            .cast("long")
            .alias("value_micro"),
            F.unix_micros("ts").alias("us"),
        )
        src = scratch_path(spark, "sst_src", sf_dir)
        ev.repartition(4).write.mode("overwrite").parquet(src)
        # fresh checkpoint per call: the file-source offset log would
        # otherwise mark the feed consumed and a rerun would emit
        # nothing (rerun-stability contract)
        ckpt = scratch_path(spark, "sst_ckpt", sf_dir)
        shutil.rmtree(ckpt, ignore_errors=True)
        feed = (
            spark.readStream.schema(
                "user_id long, value_micro long, us long"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        updates = feed.groupBy("user_id").applyInPandasWithState(
            _update_totals_exact,
            outputStructType=EXACT_OUTPUT,
            stateStructType=EXACT_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        # State-store partition count is pinned at checkpoint creation
        # from spark.sql.shuffle.partitions — a streaming DESIGN
        # parameter that should track feed volume and key cardinality,
        # not default to the batch shuffle width: every micro-batch
        # schedules one stateful Python task PER state partition, so an
        # oversized count multiplies fixed per-task pandas/worker cost
        # across all four batches (32 partitions → 7.1 s, 8 → 5.6 s at
        # sf0.1's 100k-row feed, identical output). Sized from parquet
        # footer metadata (no Spark job): one partition per ~12.5k feed
        # rows, floor 8, capped at the session's shuffle width so
        # larger arms scale back up; unknown size → leave the session
        # conf untouched. Restored in finally — the checkpoint has
        # already pinned the stream's own value by then.
        from clickhousebackup_spark.tables import table_rows_metadata

        n_rows = table_rows_metadata(sf_dir, "events")
        old_parts = spark.conf.get("spark.sql.shuffle.partitions")
        if n_rows is not None:
            state_parts = min(
                int(old_parts), max(8, n_rows // 12_500)
            )
            spark.conf.set("spark.sql.shuffle.partitions", str(state_parts))
        q = None
        try:
            q = (
                updates.writeStream.format("memory")
                .queryName("sst_updates")
                .option("checkpointLocation", ckpt)
                .outputMode("update")
                .trigger(availableNow=True)
                .start()
            )
            if not q.awaitTermination(300):
                raise TimeoutError(
                    "stream_stateful_totals: feed did not drain in 300s"
                )
        finally:
            # restore only after the drain: the micro-batch thread
            # reads the conf when it plans the first batch, which can
            # happen after start() returns
            spark.conf.set("spark.sql.shuffle.partitions", old_parts)
            if q is not None and q.isActive:
                q.stop()
        # the memory table holds one update row per (user, batch it
        # appeared in); n_events is strictly monotone per user, so the
        # final state is the unique max-n row
        w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
        return (
            spark.table("sst_updates")
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )


_register_queries()
