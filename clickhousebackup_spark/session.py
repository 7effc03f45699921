"""SparkSession factory.

Conventions fixed here (SURVEY.md §7 P0) so every query result is
hash-stable against the DuckDB oracle:

- session timezone pinned to UTC (Spark timestamps are session-TZ
  rendered; DuckDB's are UTC-naive);
- AQE on (runtime join-strategy switching, skew-join splitting,
  partition coalescing — the free 100TB-scale levers);
- shuffle partitions sized to the local core count rather than the
  200 default (right for local tests; on a real cluster this is set
  ∝ input size / target partition bytes);
- ``spark.sql.legacy.parquet.nanosAsLong=true`` because the events
  fixture carries Parquet TIMESTAMP(NANOS) which Spark otherwise
  refuses (``tables.load_table`` converts the long back to a µs
  timestamp losslessly — the generator emits whole microseconds).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Runtime confs applied to *any* session we touch (settable post-start).
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


#: Sessions already configured — each conf.set is a py4j round-trip
#: (~1-2 ms), and the table loader calls this on EVERY load, so an
#: un-memoized apply costs real driver wall on plan-construction-heavy
#: paths. Confs are never unset mid-session, so once is enough.
_CONFIGURED_SESSIONS: "weakref.WeakSet[SparkSession]" = None  # type: ignore[assignment]


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Best-effort apply of runtime confs to an externally-built session.

    The verification driver owns its own SparkSession; queries must
    work there too, so the table loader routes through this. Applied
    once per session (memoized): the confs are static for the life of
    the process and nothing in the engine unsets them.
    """
    global _CONFIGURED_SESSIONS
    if _CONFIGURED_SESSIONS is None:
        import weakref

        _CONFIGURED_SESSIONS = weakref.WeakSet()
    try:
        if spark in _CONFIGURED_SESSIONS:
            return spark
    except TypeError:
        pass  # non-weak-referenceable mock: fall through, apply every time
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # immutable in this build — builder-set sessions already have it
    try:
        _CONFIGURED_SESSIONS.add(spark)
    except TypeError:
        pass
    return spark


def get_spark(
    app_name: str = "clickhousebackup-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or (int(cpus) if cpus.isdigit() else 32)
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    for k, v in RUNTIME_CONFS.items():
        b = b.config(k, v)
    return apply_runtime_confs(b.getOrCreate())
