"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-
insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``clickhousebackup_spark`` package; this
module only adapts its registry to the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's whole job in one plan (SURVEY.md §7 P0): derive a
    snapshot catalog from events (backup.sh's directory-of-artifacts
    state), compute the four period keys (backup.sh:26-29), keep the
    newest snapshot per (db, generation, period) (backup.sh:90-97),
    and mark which artifacts the retention policy keeps
    (backup.sh:119-122).
    """
    from clickhousebackup_spark.backup.queries import flagship_retention_plan

    return flagship_retention_plan(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 Part B."""
    from clickhousebackup_spark.registry import all_specs

    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for every hash-checkable query key."""
    from clickhousebackup_spark.registry import all_specs

    return {
        name: spec.oracle
        for name, spec in all_specs().items()
        if spec.oracle is not None
    }
