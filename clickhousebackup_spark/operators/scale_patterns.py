"""Scale-pattern operators: the explicit shuffle-management idioms the
brief calls out (salting for skew, bucketing for co-located joins,
partition-pruned scans). Each is oracle-checked to prove the
rewritten plan computes the SAME relation as the naive one.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhousebackup_spark.exprs import osum
from clickhousebackup_spark.registry import register
from clickhousebackup_spark.tables import load_table

N_SALTS = 8


@register(
    "join_skew_salted",
    oracle=f"""
        SELECT o_custkey, COUNT(*) AS n_lines, {osum('l_quantity')} AS total_qty
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        GROUP BY o_custkey
    """,
    doc="Skew-salted join: the fact side salts its key into N_SALTS "
    "sub-keys and the dim side explodes across all salts, so one hot "
    "key spreads over N reducers instead of stalling one. Result is "
    "oracle-identical to the unsalted join; AQE's skew-join does this "
    "adaptively, this operator is the explicit form for engines/configs "
    "without it.",
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "salt", F.pmod(F.xxhash64("l_linenumber", "l_partkey"), F.lit(N_SALTS))
    )
    o = load_table(spark, sf_dir, "orders").withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(N_SALTS - 1)))
    )
    joined = li.join(
        o,
        (li.l_orderkey == o.o_orderkey) & (li.salt == o.salt),
    )
    from clickhousebackup_spark.exprs import dsum

    return joined.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        dsum("l_quantity").alias("total_qty"),
    )


@register(
    "join_bucketed",
    oracle="""
        SELECT o_orderkey, o_custkey, n_lines FROM orders
        JOIN (SELECT l_orderkey, COUNT(*) AS n_lines FROM lineitem
              GROUP BY l_orderkey) l
          ON l.l_orderkey = o_orderkey
    """,
    doc="Bucketed co-located join: both sides written bucketBy(8, key) "
    "as tables, so the join reads pre-hashed buckets and needs NO "
    "shuffle exchange on either side — the 100 TB idiom for a fact "
    "table joined on the same key every day.",
)
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    # bucketBy requires saveAsTable. warehouse.dir is a static conf we
    # cannot set on the driver's vanilla session, so the tables live in
    # a dedicated database whose LOCATION is under the system temp dir
    # — repeated runs never accumulate residue inside the repo's
    # working tree (the old behavior left spark-warehouse/ droppings).
    import hashlib
    import re
    import shutil
    import tempfile

    # per-application warehouse: a FIXED dir races concurrently-running
    # test shards / driver sims (one process rmtree's the location a
    # sibling is writing); applicationId is unique per session, and the
    # rmtree below still clears orphans from this session's reruns.
    from clickhousebackup_spark.scratch import reap_stale_siblings

    app = re.sub(r"\W", "_", spark.sparkContext.applicationId)
    db = f"cbs_scratch_{app}"
    wh = os.path.join(tempfile.gettempdir(), f"cbs_bucketed_warehouse_{app}")
    # per-app dirs accumulate across sessions; reclaim pre-boot ones
    # no trailing underscore: also reaps the legacy fixed-name
    # "cbs_bucketed_warehouse" dir pre-change versions left behind
    reap_stale_siblings(os.path.join(tempfile.gettempdir(), "cbs_bucketed_warehouse"))
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{wh}'")
    suffix = hashlib.md5(sf_dir.encode()).hexdigest()[:8]  # stable across
    # processes (hash() is salted per interpreter → junk-table buildup)
    o_tbl, l_tbl = f"orders_b{suffix}", f"linecounts_b{suffix}"
    for t in (o_tbl, l_tbl):
        # DROP covers this session's catalog; the rmtree covers orphaned
        # location dirs from this session's previous runs (the in-memory
        # catalog forgets them but LOCATION_ALREADY_EXISTS still fires).
        spark.sql(f"DROP TABLE IF EXISTS {db}.{t}")
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)

    load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    ).write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(
        f"{db}.{o_tbl}"
    )
    load_table(spark, sf_dir, "lineitem").groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines")
    ).write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(
        f"{db}.{l_tbl}"
    )

    o = spark.table(f"{db}.{o_tbl}")
    line_counts = spark.table(f"{db}.{l_tbl}")
    return o.join(line_counts, o.o_orderkey == line_counts.l_orderkey).select(
        "o_orderkey", "o_custkey", "n_lines"
    )


@register(
    "scan_partition_pruned",
    oracle="""
        SELECT event_id, user_id, strftime(ts, '%Y%m%d') AS day
        FROM events
        WHERE strftime(ts, '%Y%m%d') = '20240115'
    """,
    doc="Partition-pruned scan: events snapshotted partitionBy(day), "
    "then a day-filtered read — Spark prunes to the one matching "
    "directory (PartitionFilters, the find -maxdepth analog of "
    "backup.sh:119-122) instead of scanning all days.",
)
def scan_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhousebackup_spark.scratch import scratch_path

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyyMMdd")
    )
    out = scratch_path(spark, "events_by_day", sf_dir)
    ev.select("event_id", "user_id", "day").write.mode("overwrite").partitionBy(
        "day"
    ).parquet(out)
    back = spark.read.parquet(out).filter(F.col("day") == "20240115")
    return back.select(
        "event_id", "user_id", F.col("day").cast("string").alias("day")
    )


@register(
    "scan_dpp_join",
    oracle="""
        WITH f AS (
            SELECT event_id, user_id,
                   CAST(strftime(ts, '%Y%m%d') AS BIGINT) AS day
            FROM events
        ), dim AS (
            SELECT DISTINCT day FROM f WHERE day % 10 = 5
        )
        SELECT f.day,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT f.user_id) AS BIGINT) AS n_users
        FROM f JOIN dim ON f.day = dim.day
        GROUP BY f.day
    """,
    doc="Dynamic partition pruning: events snapshotted "
    "partitionBy(day), then joined to a FILTERED dim of days — "
    "Catalyst injects the dim's values as a runtime PartitionFilter "
    "(`dynamicpruning#...` on the fact scan, asserted in "
    "tests/test_runtime_filters.py), so the fact side reads only the "
    "matching day directories even though the day set is not known "
    "until runtime. This is the mechanism that makes star-schema "
    "fact scans at 100 TB read 3 partitions instead of 3000 when "
    "the dim filter is selective; scan_partition_pruned shows the "
    "STATIC-literal version of the same pruning. The dim is "
    "broadcast, so the pruning subquery reuses the join's broadcast "
    "exchange (free). Day is kept INTEGER so partition-column type "
    "inference on re-read matches the join key type exactly.",
)
def scan_dpp_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhousebackup_spark.scratch import scratch_path

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyyMMdd").cast("int")
    )
    out = scratch_path(spark, "events_by_day_int", sf_dir)
    ev.select("event_id", "user_id", "day").write.mode(
        "overwrite"
    ).partitionBy("day").parquet(out)
    fact = spark.read.parquet(out)
    dim = (
        ev.select("day").distinct().filter(F.pmod("day", F.lit(10)) == 5)
    )
    return (
        fact.join(F.broadcast(dim), "day")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.col("day").cast("long").alias("day"), "n_events", "n_users"
        )
    )


# 16-bit × 16-bit Morton (Z-order) interleave as one integer
# expression, generated once and shared verbatim by the Spark plan
# and the DuckDB oracle — bit semantics are identical 64-bit shifts
# in both engines.
_Z16 = " + ".join(
    f"(((a >> {i}) & 1) * {1 << (2 * i + 1)})"
    f" + (((b >> {i}) & 1) * {1 << (2 * i)})"
    for i in range(16)
)


@register(
    "zorder_layout",
    oracle=f"""
        SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, zval
        FROM (
            SELECT l_orderkey,
                   CAST(l_linenumber AS BIGINT) AS l_linenumber,
                   l_partkey, l_suppkey,
                   CAST({_Z16} AS BIGINT) AS zval
            FROM (
                SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
                       l_partkey % 65536 AS a, l_suppkey % 65536 AS b
                FROM lineitem
            )
        )
        ORDER BY zval, l_orderkey, l_linenumber
        LIMIT 100
    """,
    doc="Z-order (Morton) clustering key: interleave the low 16 bits "
    "of l_partkey and l_suppkey into one 32-bit z-value and emit the "
    "first 100 rows of the clustered order (total-order tiebreak). "
    "Writing a table sorted by zval gives every parquet file a tight "
    "min/max envelope on BOTH dimensions, so predicates on either "
    "column prune files — the multi-dimensional data-skipping layout "
    "(Delta/Iceberg OPTIMIZE ZORDER, ClickHouse multi-column "
    "ORDER BY analog). The interleave is 32 shift/mask terms of pure "
    "64-bit integer arithmetic generated from one shared template — "
    "fully codegen'd, map-only; the global sort is the same "
    "range-partitioned TakeOrdered plan as topk_limit here, or a "
    "full repartitionByRange before write in the layout job.",
)
def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    li = li.withColumn("a", F.pmod(F.col("l_partkey"), F.lit(65536))).withColumn(
        "b", F.pmod(F.col("l_suppkey"), F.lit(65536))
    )
    li = li.withColumn("zval", F.expr(_Z16).cast("long"))
    return (
        li.select(
            "l_orderkey",
            F.col("l_linenumber").cast("long").alias("l_linenumber"),
            "l_partkey",
            "l_suppkey",
            "zval",
        )
        .orderBy("zval", "l_orderkey", "l_linenumber")
        .limit(100)
    )


class runtime_bloom_join:
    """Context manager enabling Spark's runtime bloom-filter join
    pruning for big×big shuffle joins — the semi-join reduction that
    matters at 100 TB: the filtered build side publishes a bloom
    filter of its join keys, and the probe side's SCAN drops
    non-matching rows before the shuffle, cutting exchange volume by
    the build side's selectivity.

    Not a registry key: the confs must be live at *execution* time
    and are session-global, so wrapping a registered query would
    leak `autoBroadcastJoinThreshold=-1` into unrelated queries.
    Production clusters set these once in spark-defaults; here the
    manager sets/restores them around a specific job. Plan-asserted
    in tests/test_plan_shapes.py (might_contain + bloom_filter_agg).
    """

    #: (conf, forced value) — thresholds dropped so the tiny fixture
    #: join exercises the same plan a 100 TB join would.
    _CONFS = (
        ("spark.sql.optimizer.runtime.bloomFilter.enabled", "true"),
        ("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10GB"),
        ("spark.sql.optimizer.runtimeFilter.number.threshold", "10"),
        (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        ),
        ("spark.sql.autoBroadcastJoinThreshold", "-1"),
        ("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"),
    )

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._saved: list[tuple[str, str | None]] = []

    def __enter__(self):
        for k, v in self._CONFS:
            try:
                old = self.spark.conf.get(k)
            except Exception:
                old = None
            self._saved.append((k, old))
            self.spark.conf.set(k, v)
        return self.spark

    def __exit__(self, *exc):
        for k, old in self._saved:
            if old is None:
                self.spark.conf.unset(k)
            else:
                self.spark.conf.set(k, old)
        return False


@register(
    "sink_bucketed_sorted",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice
        FROM orders WHERE o_totalprice > 100000.0
    """,
    doc="Bucketed + sorted SINK: orders written bucketBy(8, "
    "o_custkey).sortBy(o_custkey, o_orderkey) as a table, then read "
    "back filtered. This is the write-side half of the bucketed-join "
    "idiom (join_bucketed is the read side): pay one clustered write, "
    "and every later join/groupBy on o_custkey skips its exchange, "
    "while the within-bucket sort gives parquet row-group min/max "
    "envelopes that make key-range predicates cheap. The roundtrip "
    "re-emits the rows, so the oracle pins that bucketing LOSES "
    "NOTHING — same multiset out as in. Warehouse hygiene: the "
    "database name AND location carry the Spark applicationId, so "
    "two concurrent sessions on the same sf_dir can never race on "
    "DROP TABLE + rmtree + saveAsTable or read a directory the "
    "other just removed (ADVICE r4 fix, mirroring "
    "backup_incremental_roundtrip's scratch_path discipline).",
)
def sink_bucketed_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import re
    import shutil
    import tempfile

    from clickhousebackup_spark.scratch import reap_stale_siblings

    app = re.sub(r"\W", "_", spark.sparkContext.applicationId)
    db = f"cbs_scratch_{app}"
    wh = os.path.join(tempfile.gettempdir(), f"cbs_bucketed_warehouse_{app}")
    # no trailing underscore: also reaps the legacy fixed-name
    # "cbs_bucketed_warehouse" dir pre-change versions left behind
    reap_stale_siblings(os.path.join(tempfile.gettempdir(), "cbs_bucketed_warehouse"))
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{wh}'")
    suffix = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    tbl = f"orders_sorted_b{suffix}"
    spark.sql(f"DROP TABLE IF EXISTS {db}.{tbl}")
    shutil.rmtree(os.path.join(wh, tbl), ignore_errors=True)

    load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    ).write.bucketBy(8, "o_custkey").sortBy(
        "o_custkey", "o_orderkey"
    ).saveAsTable(f"{db}.{tbl}")

    return spark.table(f"{db}.{tbl}").filter(
        F.col("o_totalprice") > 100000.0
    )


@register(
    "scan_schema_merge",
    oracle="""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
               CAST(COUNT(CASE WHEN o_orderkey % 2 = 1
                          THEN o_orderpriority END) AS BIGINT)
                   AS n_with_priority,
               CAST(COUNT(DISTINCT CASE WHEN o_orderkey % 2 = 1
                          THEN o_orderpriority END) AS BIGINT)
                   AS n_priorities
        FROM orders
    """,
    doc="Schema-evolution scan (mergeSchema): two parquet snapshots "
    "written with DIFFERENT schemas — the old half (even orderkeys) "
    "lacks o_orderpriority, the new half (odd) carries it — read "
    "back as ONE table with spark.read.option('mergeSchema', true); "
    "missing columns come back NULL for old files. This is how a "
    "100 TB lakehouse survives additive schema change without "
    "rewriting history: each file keeps its own schema, the footer "
    "union is computed at planning time (cost scales with file "
    "count, not data; production pins the merged schema in a "
    "catalog). The oracle recomputes the same aggregate from the "
    "source table — count, key sum, and priority presence counts "
    "prove NULL-backfill semantics exactly. Sister key of "
    "union_by_name_evolved (which evolves at the DataFrame level; "
    "this key evolves at the FILE level).",
)
def scan_schema_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhousebackup_spark.scratch import scratch_path

    o = load_table(spark, sf_dir, "orders")
    out = scratch_path(spark, "orders_schema_merge", sf_dir)
    old = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice"
    )
    new = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    old.write.mode("overwrite").parquet(out + "/part=old")
    new.write.mode("overwrite").parquet(out + "/part=new")
    back = spark.read.option("mergeSchema", "true").parquet(out)
    return back.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("o_orderkey").cast("long").alias("key_sum"),
        F.count("o_orderpriority").cast("long").alias("n_with_priority"),
        F.countDistinct("o_orderpriority").cast("long").alias("n_priorities"),
    )
