"""Source/sink connectors (SURVEY.md §2.B scans group + guide §Sources).

Parquet is the primary format (tables.py). This module adds the rest
of the practical surface with explicit schemas everywhere (inference
is an anti-pattern at scale: it costs an extra full pass and can flip
types between runs):

- CSV / JSON / ORC roundtrips;
- JDBC and table-format (Delta/Iceberg) connectors gated behind
  import/classpath checks, since their jars aren't in this image
  (stubs raise a clear error instead of a Py4J stack).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


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
    """JDBC source. Works iff a driver jar is on the classpath; this
    image ships none, so we fail with a actionable message instead of
    a raw ClassNotFoundException.

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
            f"spark.jars (not shipped in this image)"
        ) from e


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
