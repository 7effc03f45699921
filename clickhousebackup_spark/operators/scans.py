"""Scan / source / sink operators (SURVEY.md §2.B "Scans / sources / sinks").

Reference anchor: the read side of the one real data movement in the
reference, ``BACKUP DATABASE`` (`backup.sh:38-45`) — our engine's scan
path is ``spark.read.parquet`` with Catalyst pushdown.

Scale notes: a bare ``spark.read.parquet(path)`` is already the
100 TB-correct call — file listing is distributed, row-group pruning
and column pruning happen in the scan node, and
``spark.sql.files.maxPartitionBytes`` controls split sizing. The
projected scan exists to *prove* pruning: its physical plan must show
``ReadSchema`` with only the three columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from clickhousebackup_spark.registry import register
from clickhousebackup_spark.tables import load_table


@register(
    "scan_parquet",
    oracle="SELECT * FROM lineitem",
    doc="Full parquet scan of lineitem (read side of backup.sh:38-45).",
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem")


@register(
    "scan_projected",
    oracle="SELECT l_orderkey, l_quantity, l_shipdate FROM lineitem",
    doc="Column-pruned scan — ReadSchema must carry only 3 columns.",
)
def scan_projected(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_shipdate"
    )


CSV_COLS = ("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")

_CSV_SCHEMA = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_quantity", T.DoubleType()),
    ]
)


@register(
    "sink_csv_roundtrip",
    oracle="SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity FROM lineitem",
    doc="CSV sink + explicit-schema source roundtrip (no inference).",
)
def sink_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhousebackup_spark.scratch import scratch_path

    out = scratch_path(spark, "lineitem_csv", sf_dir)
    df = load_table(spark, sf_dir, "lineitem").select(*CSV_COLS)
    df.write.mode("overwrite").option("header", "true").csv(out)
    return spark.read.schema(_CSV_SCHEMA).option("header", "true").csv(out)


_JSON_SCHEMA = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_quantity", T.DoubleType()),
    ]
)


@register(
    "sink_json_roundtrip",
    oracle="SELECT l_orderkey, l_returnflag, l_quantity FROM lineitem",
    doc="JSON-lines sink + explicit-schema source roundtrip — the "
    "interchange format the reference's ClickHouse server speaks "
    "(JSONEachRow). Explicit read schema (no inference pass: schema "
    "inference is a second full scan at 100 TB) and scratch-dir "
    "staging shared with the CSV sink.",
)
def sink_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhousebackup_spark.scratch import scratch_path

    out = scratch_path(spark, "lineitem_json", sf_dir)
    df = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity"
    )
    df.write.mode("overwrite").json(out)
    return spark.read.schema(_JSON_SCHEMA).json(out)


@register(
    "sink_orc_roundtrip",
    oracle="""
        SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
               l_returnflag, l_quantity, l_shipdate
        FROM lineitem
    """,
    doc="ORC sink + source roundtrip — the third columnar interchange "
    "format next to parquet and the text sinks; self-describing "
    "schema (no inference pass needed), predicate-pushdown-capable "
    "like parquet. Completes the format matrix: parquet (snapshots), "
    "CSV/JSON (text interchange), ORC (columnar interchange), JDBC "
    "(RDBMS), FileTopic (streaming segments).",
)
def sink_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhousebackup_spark.scratch import scratch_path

    out = scratch_path(spark, "lineitem_orc", sf_dir)
    df = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        "l_returnflag",
        "l_quantity",
        "l_shipdate",
    )
    df.write.mode("overwrite").orc(out)
    return spark.read.orc(out)


@register(
    "scan_file_metadata",
    oracle="""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_keys,
               CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
               CAST(MAX(o_orderkey) AS BIGINT) AS max_key
        FROM orders
    """,
    doc="File-provenance virtual columns — ClickHouse's _file/_path "
    "(every File/S3/HDFS table function exposes them) as Spark's "
    "_metadata struct (file_name etc., Spark 3.4+). The lineage "
    "primitive data audits lean on (which shard produced these "
    "rows?), and it rides the scan for free — no extra read, the "
    "file name is constant per split. Checked LAYOUT-NORMALIZED "
    "since round 15: the engine rolls up per physical file first "
    "(the _metadata.file_name grouping under test — one partial agg "
    "per split, one row per file), then re-aggregates the per-file "
    "rollup to table totals (row count summed across files, key span "
    "across files) so the contract holds at ANY part multiplicity — "
    "the pre-r15 per-file row shape was exact only on single-file "
    "layouts and carried the last sf1-arm allowlist entry. n_keys is "
    "a global COUNT(DISTINCT) on the same scan (per-file distincts "
    "don't compose); at a million-file lake both branches stay one "
    "scan + vocabulary-sized exchanges.",
)
def scan_file_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    per_file = (
        o.select(
            F.col("_metadata.file_name").alias("file_name"), "o_orderkey"
        )
        .groupBy("file_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("f_rows"),
            F.min("o_orderkey").cast("long").alias("f_min"),
            F.max("o_orderkey").cast("long").alias("f_max"),
        )
    )
    totals = per_file.agg(
        F.sum("f_rows").cast("long").alias("n_rows"),
        F.min("f_min").cast("long").alias("min_key"),
        F.max("f_max").cast("long").alias("max_key"),
    )
    keys = o.agg(F.countDistinct("o_orderkey").cast("long").alias("n_keys"))
    return totals.crossJoin(keys).select(
        "n_rows", "n_keys", "min_key", "max_key"
    )
