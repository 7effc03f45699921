"""Two-pass distributed global order scan — rank / running sum /
totals over a TOTAL order without a single-partition window.

The pattern (first shipped inline in ``sort_multi``,
operators/sorts.py): range-partition on the sort key so partition i
holds a contiguous key range, compute row numbers / running sums
WITHIN each partition (parallel, partitioned window), aggregate one
tiny per-partition summary table (n_partitions rows), turn it into
cumulative offsets with a window over that tiny table, and broadcast
the offsets back. Global position = partition offset + local
position; global running sum = partition prefix + local running sum.
Wall-clock and memory stay per-partition at any scale — this is the
plan MapReduce TeraSort and every distributed rank implementation
use, vs. ``Window.orderBy(...)`` which moves ALL rows to one
partition (the ``WindowExec: No Partition Defined`` warning).

The ranged subtree is materialized ONCE (localCheckpoint) before the
summary and detail branches read it: both MUST observe identical
partition boundaries, and RangePartitioner's sampling seed varies
with RDD id, so relying on exchange reuse to dedupe the two
evaluations would be a race, not a contract.

The offsets table itself uses an unpartitioned window — over
n_shuffle_partitions rows, bounded by cluster config, not data;
tests/test_plan_canary.py allow-lists exactly this shape per key.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "_distrank_pid"


def global_order_scan(
    df: DataFrame,
    keys: Sequence[Column],
    *,
    pos: str | None = None,
    cumsum: Mapping[str, Column] | None = None,
    totals: Mapping[str, Column] | None = None,
) -> DataFrame:
    """Return ``df`` (same columns, plus the requested ones) ordered
    observables computed over the total order defined by ``keys``:

    - ``pos``: 1-based global row number (long) — requires ``keys``
      to be a total order for determinism.
    - ``cumsum``: ``{out_name: expr}`` inclusive running sums of
      ``expr`` in key order (sum type follows Spark's sum of the
      expression's type, e.g. decimal stays decimal).
    - ``totals``: ``{out_name: expr}`` global sums of ``expr``
      attached to every row (computed on the tiny summary table —
      no second scan, no extra shuffle of the fact).
    """
    cumsum = dict(cumsum or {})
    totals = dict(totals or {})
    if pos is None and not cumsum and not totals:
        raise ValueError("request at least one of pos/cumsum/totals")

    ranged = (
        df.repartitionByRange(*keys)
        .sortWithinPartitions(*keys)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=True)
    )

    sum_exprs = {**cumsum, **totals}
    per = ranged.groupBy(_PID).agg(
        F.count(F.lit(1)).alias("_n"),
        *[F.sum(e).alias(f"_s_{name}") for name, e in sum_exprs.items()],
    )
    w_prev = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.partitionBy()
    off_cols = [
        F.col(_PID),
        F.coalesce(F.sum("_n").over(w_prev), F.lit(0)).alias("_off"),
    ]
    for name in cumsum:
        off_cols.append(
            F.coalesce(
                F.sum(f"_s_{name}").over(w_prev), F.lit(0)
            ).alias(f"_coff_{name}")
        )
    for name in totals:
        off_cols.append(F.sum(f"_s_{name}").over(w_all).alias(f"_tot_{name}"))
    offsets = per.select(*off_cols)

    w_local = Window.partitionBy(_PID).orderBy(*keys)
    w_run = w_local.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out_cols = [F.col(c) for c in df.columns]
    if pos is not None:
        out_cols.append(
            (F.col("_off") + F.row_number().over(w_local))
            .cast("long")
            .alias(pos)
        )
    for name, e in cumsum.items():
        out_cols.append(
            (F.col(f"_coff_{name}") + F.sum(e).over(w_run)).alias(name)
        )
    for name in totals:
        out_cols.append(F.col(f"_tot_{name}").alias(name))
    return ranged.join(F.broadcast(offsets), _PID).select(*out_cols)


def ntile_from_pos(pos: Column, n_rows: Column, k: int) -> Column:
    """SQL NTILE(k) bucket from a 1-based global position and the
    total row count — NTILE in closed form, so an equi-depth cut
    needs only the two-pass global position, never a global window.
    Standard semantics: the first ``n mod k`` buckets get
    ``ceil(n/k)`` rows, the rest ``floor(n/k)``."""
    p = pos - F.lit(1)  # 0-based
    q = F.floor(n_rows / F.lit(k))
    r = n_rows % F.lit(k)
    big = r * (q + 1)  # rows covered by the (q+1)-sized buckets
    return (
        F.when(p < big, F.floor(p / (q + 1)))
        .otherwise(r + F.floor((p - big) / F.greatest(q, F.lit(1))))
        + F.lit(1)
    ).cast("long")
