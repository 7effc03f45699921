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
