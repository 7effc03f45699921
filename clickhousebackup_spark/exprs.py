"""Shared expression builders enforcing the hash-stability conventions.

Why decimal sums (registry.py docstring has the short form): Spark's
``SUM(double)`` folds in partition order, which is nondeterministic
run-to-run, and DuckDB's fold order differs again — so a double sum of
60k values can disagree in the last few ulps and break the driver's
value-hash. ``SUM(CAST(x AS DECIMAL(38,6)))`` is exact (order-free) in
both engines; the final DECIMAL→DOUBLE cast is IEEE round-to-nearest
in both. Averages are written as that sum divided by a COUNT — two
bit-identical doubles divide bit-identically.

The same logic says: never ``ROUND(double, n)`` in a checked result
(Spark rounds the shortest decimal repr HALF_UP, DuckDB rounds via C
arithmetic — they disagree on boundary values), but ``floor/ceil/abs/
sqrt/pmod`` and +,-,*,/ are exact IEEE functions of their inputs and
therefore safe.

At scale these conventions are free: decimal hash-aggregation is still
a single partial+final hash agg (map-side combine), and Spark's
Decimal(38,x) is a 16-byte unscaled long — no plan-shape change.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,6)"


def dsum(col: Column | str) -> Column:
    """Order-independent double sum: exact decimal sum, emitted as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Deterministic mean: exact decimal sum / count, double division."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c) / F.count(c)


def osum(sql_expr: str) -> str:
    """DuckDB oracle twin of :func:`dsum`."""
    return f"CAST(SUM(CAST({sql_expr} AS DECIMAL(38,6))) AS DOUBLE)"


def oavg(sql_expr: str) -> str:
    """DuckDB oracle twin of :func:`davg`."""
    return f"({osum(sql_expr)} / COUNT({sql_expr}))"
