"""Fixture-table loaders (FIXTURES.md §1).

``load_table`` is the single read path for every operator: parquet
scan + the one normalization the fixtures need (events.ts arrives as
Parquet TIMESTAMP(NANOS) which Spark reads as a nanosecond long under
``nanosAsLong``; we convert with integer division — double division
would lose precision above 2^53 ns).

At 100 TB these reads stay exactly the same calls: Catalyst pushes
filters/column pruning into the parquet scan, and partition discovery
parallelizes across the cluster. Nothing here collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhousebackup_spark.session import apply_runtime_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table; normalizes events.ts to a µs timestamp."""
    apply_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ns → µs losslessly (fixture emits whole microseconds); `div`
        # is integer division — `/` would round-trip through double
        # and wobble.
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    # Newer Spark reads the fixtures' parquet timestamps (µs and
    # NANOS alike) as TIMESTAMP_NTZ — the nanosAsLong legacy conf no
    # longer applies. Under the UTC session tz the cast below is a
    # pure retype — same wall values — and keeps every downstream
    # unix_micros/window expression on the TIMESTAMP type the whole
    # engine (and the recorded driver hashes) were built against.
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def table_rows_metadata(sf_dir: str, name: str) -> int | None:
    """Row count of one fixture table from parquet FOOTER metadata —
    driver-side pyarrow, no Spark job, directory-aware (skips
    dot/underscore entries Spark's reader ignores). Returns None when
    the count cannot be established (missing pyarrow, unreadable
    layout); callers use it only for scale-dispatch decisions (e.g.
    exact-baseline probe caps), so None must mean "take the exact
    path", never an error. Same plan-construction-side-effect-free
    discipline as analytics16's adaptive hot-share probe.
    """
    import os

    try:
        import pyarrow.parquet as pq
    except Exception:
        return None
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        if os.path.isdir(path):
            files = [
                e.path
                for e in os.scandir(path)
                if e.is_file()
                and e.name.endswith(".parquet")
                and not e.name.startswith((".", "_"))
            ]
        else:
            files = [path]
        return sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    except Exception:
        return None


def parallelize(df: DataFrame, min_parallelism: int | None = None) -> DataFrame:
    """Ensure a scan fans out to the full core count.

    The fixture files carry a single parquet row group, so Spark reads
    each in ONE task — a CPU-heavy expression downstream then runs on
    1 of 32 cores. This repartitions ONLY when the scan's input file
    count is below the session's parallelism; on production data (many
    files / row groups) the check is a no-op and no shuffle is added.

    The probe is ``df.inputFiles()`` — a driver-side file listing —
    NOT ``df.rdd.getNumPartitions()``, which forces a full plan→RDD
    conversion on the driver per call. A single file larger than
    ``spark.sql.files.maxPartitionBytes`` still splits into multiple
    scan tasks, so the file-count heuristic only ever adds a shuffle
    for small single-file inputs, where it costs nothing.
    """
    spark = df.sparkSession
    target = min_parallelism or spark.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:  # non-file-backed plan (e.g. in-memory fixture)
        return df
    if 0 < n_files < target:
        return df.repartition(target)
    return df


def register_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    """Register temp views so operators can use spark.sql(...) directly."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
