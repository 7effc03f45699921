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
