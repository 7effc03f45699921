"""Source/sink connectors (SURVEY.md §2.B scans group + guide §Sources).

Parquet is the primary format (tables.py). This module adds the rest
of the practical surface with explicit schemas everywhere (inference
is an anti-pattern at scale: it costs an extra full pass and can flip
types between runs):

- CSV / JSON / ORC roundtrips;
- a REAL, e2e-tested JDBC connector: Spark bundles the Derby embedded
  driver (pyspark/jars/derby-*.jar), so `sink_jdbc_roundtrip` writes a
  table through a genuine JDBC transaction and reads it back — the
  driver hash-checks the roundtrip. Against a networked RDBMS only
  the URL/driver options change (see read_jdbc's partitioning notes);
- table-format (Delta/Iceberg) connectors stay gated behind classpath
  checks, since their jars aren't in this image (stubs raise a clear
  error instead of a Py4J stack).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from clickhousebackup_spark.registry import register

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).option("header", "true").csv(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", "true").csv(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


class ConnectorUnavailable(RuntimeError):
    """Raised when a connector's jars aren't on the classpath."""


def read_jdbc(
    spark: SparkSession, url: str, dbtable: str, **options
) -> DataFrame:
    """JDBC source. Spark's bundled Derby embedded driver makes this
    e2e-usable in-image (`jdbc:derby:<path>`); for a networked RDBMS
    pass its driver class + add the jar via spark.jars.

    Scale notes for real use: always set partitionColumn/lowerBound/
    upperBound/numPartitions — otherwise the whole table reads through
    one connection.
    """
    try:
        reader = spark.read.format("jdbc").option("url", url).option(
            "dbtable", dbtable
        )
        for k, v in options.items():
            reader = reader.option(k, v)
        return reader.load()
    except Exception as e:  # ClassNotFound / Py4J
        raise ConnectorUnavailable(
            f"JDBC driver unavailable for {url!r}; add the driver jar via "
            f"spark.jars"
        ) from e


def write_jdbc(
    df: DataFrame, url: str, dbtable: str, mode: str = "overwrite", **options
) -> None:
    """JDBC sink (same driver notes as read_jdbc). Keep write
    parallelism modest against single-node databases — every partition
    opens its own connection/transaction."""
    writer = df.write.format("jdbc").option("url", url).option("dbtable", dbtable)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.mode(mode).save()


@register(
    "sink_jdbc_roundtrip",
    oracle="SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders",
    doc="REAL JDBC sink + source roundtrip through Spark's bundled "
    "Derby embedded driver: write orders into a Derby database (one "
    "transaction per partition, coalesced to 4 against the embedded "
    "engine), read it back over JDBC, hash-check against the parquet "
    "original. Proves the connector path end-to-end — with a "
    "networked RDBMS only url/driver change, plus partitionColumn "
    "bounds for parallel reads (read_jdbc notes).",
)
def sink_jdbc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import tempfile

    from clickhousebackup_spark.tables import load_table

    suffix = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    db = os.path.join(tempfile.gettempdir(), f"cbs_derby_{suffix}")
    url = f"jdbc:derby:{db};create=true"
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    write_jdbc(o.coalesce(4), url, "orders_rt", driver=DERBY_DRIVER)
    return read_jdbc(spark, url, "orders_rt", driver=DERBY_DRIVER)


def read_delta(spark: SparkSession, path: str) -> DataFrame:
    """Delta Lake source — jar not in this image (guide §Sources)."""
    try:
        return spark.read.format("delta").load(path)
    except Exception as e:
        raise ConnectorUnavailable(
            "delta-spark jars not on classpath; install delta-spark and set "
            "spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension"
        ) from e


def read_iceberg(spark: SparkSession, table: str) -> DataFrame:
    """Iceberg source — jar not in this image (guide §Sources)."""
    try:
        return spark.read.format("iceberg").load(table)
    except Exception as e:
        raise ConnectorUnavailable(
            "iceberg-spark-runtime jars not on classpath"
        ) from e


@register(
    "scan_csv_malformed",
    oracle="""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(CASE WHEN o_orderkey % 97 = 0 THEN 1 END)
                   AS BIGINT) AS n_null_key,
               CAST(SUM(CASE WHEN o_orderkey % 97 <> 0
                        THEN CAST(floor(o_totalprice * 100) AS BIGINT)
                        END) AS BIGINT) AS sum_cents_valid,
               CAST(COUNT(CASE WHEN o_orderkey % 97 <> 0 THEN 1 END)
                   AS BIGINT) AS n_after_drop
        FROM orders
    """,
    doc="Malformed-row CSV handling: a CSV export where every 97th "
    "row's key field is corrupted ('X' prefix — unparseable as "
    "LONG), read back twice: PERMISSIVE mode nulls ONLY the bad "
    "field and keeps the row (n_null_key counts them; the intact "
    "cents field still parses — verified Spark semantics), "
    "DROPMALFORMED drops the whole row (n_after_drop). This is the "
    "ingestion-robustness contract every production CSV feed needs "
    "pinned: silent row loss vs null-field quarantine is a POLICY "
    "choice and both paths must be countable. Money travels as "
    "integer cents (floor(price·100) — no float→text→float "
    "roundtrip). The oracle recomputes all four counts from the "
    "source table. Write is one text sink; both reads are map-only "
    "scans feeding single-row aggregates.",
)
def scan_csv_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from clickhousebackup_spark.scratch import scratch_path
    from clickhousebackup_spark.tables import load_table

    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    line = F.concat_ws(
        ",",
        F.when(
            F.col("o_orderkey") % 97 == 0,
            F.concat(F.lit("X"), F.col("o_orderkey").cast("string")),
        ).otherwise(F.col("o_orderkey").cast("string")),
        cents.cast("string"),
    )
    out = scratch_path(spark, "csv_malformed", sf_dir)
    o.select(line.alias("value")).write.mode("overwrite").text(out)
    schema = "k LONG, cents LONG"
    perm = spark.read.schema(schema).option("mode", "PERMISSIVE").csv(out)
    drop = spark.read.schema(schema).option("mode", "DROPMALFORMED").csv(out)
    pa = perm.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        (F.count(F.lit(1)) - F.count("k")).cast("long").alias("n_null_key"),
        F.sum(F.when(F.col("k").isNotNull(), F.col("cents")))
        .cast("long")
        .alias("sum_cents_valid"),
    )
    # CSV column pruning means an unreferenced-column count(1) never
    # parses the fields, so DROPMALFORMED silently drops NOTHING —
    # reference BOTH columns in the aggregate to force a full parse
    # (a real Spark footgun worth pinning; kept rows have both fields
    # valid so least(count(k), count(cents)) is the surviving count).
    da = drop.agg(
        F.least(F.count("k"), F.count("cents"))
        .cast("long")
        .alias("n_after_drop")
    )
    return pa.join(da)
