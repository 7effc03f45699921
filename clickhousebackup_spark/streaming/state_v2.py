"""Arbitrary-state streaming v2: the transformWithStateInPandas API
(Spark 4.x ``StatefulProcessor``) — the successor to
applyInPandasWithState with composable typed state (value/list/map
state handles), event-time timers registered through the handle, and
state TTL.

ENVIRONMENT-GATED: the TWS Python driver worker speaks protobuf to
the JVM, so this surface needs the ``protobuf`` package
(``google.protobuf``). This container does not ship it (measured:
``ModuleNotFoundError``, and installs are not allowed), so the module
exposes :data:`HAS_TWS_DEPS` and the conformance test in
tests/test_streaming_feed.py skips when it is False — the same
gating discipline as the Delta/Iceberg table formats in
sources/readers.py. On a production cluster (protobuf ships with
every Spark 4 distro's python deps) this is a drop-in.

The processor mirrors stream_stateful_totals' exact-integer contract
(streaming/stateful.py): values pre-quantized to a µ-grid so state
folding is integer addition — bit-identical regardless of how the
source slices rows into micro-batches. That keeps the v1 and v2
operators oracle-equivalent: same input feed, same final state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

try:  # pragma: no cover - environment probe
    import google.protobuf  # noqa: F401

    HAS_TWS_DEPS = True
except Exception:  # pragma: no cover
    HAS_TWS_DEPS = False

OUTPUT_SCHEMA = (
    "user_id long, n_events long, total_value_micro long, last_us long"
)
STATE_SCHEMA = "n long, total_micro long, last_us long"


def _make_processor():
    """Build the StatefulProcessor class lazily — importing
    pyspark.sql.streaming.StatefulProcessor is safe everywhere, but
    the class is only constructed when the caller actually has the
    runtime deps."""
    import pandas as pd
    from pyspark.sql.streaming import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotalsProcessor(StatefulProcessor):
        """Per-user (count, integer-µ sum, max event-time) totals in a
        single ValueState — v2's typed-state twin of
        stateful._update_totals_exact."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timer_values):
            n, total_micro, last_us = (
                self._totals.get() if self._totals.exists() else (0, 0, 0)
            )
            for pdf in rows:
                n += len(pdf)
                total_micro += int(pdf["value_micro"].sum())
                last_us = max(last_us, int(pdf["us"].max()))
            self._totals.update((n, total_micro, last_us))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value_micro": [total_micro],
                    "last_us": [last_us],
                }
            )

        def close(self) -> None:
            pass

    return RunningTotalsProcessor()


def running_totals_v2(events: DataFrame) -> DataFrame:
    """Streaming running totals per user through the v2 state API.

    ``events`` must carry (user_id long, value_micro long, us long) —
    the same pre-quantized feed stream_stateful_totals writes. Raises
    ImportError with a clear message when the environment lacks the
    TWS python deps; callers gate on :data:`HAS_TWS_DEPS`.
    """
    if not HAS_TWS_DEPS:
        raise ImportError(
            "transformWithStateInPandas needs the protobuf package "
            "(google.protobuf) for its Python driver worker; gate on "
            "state_v2.HAS_TWS_DEPS"
        )
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_make_processor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
