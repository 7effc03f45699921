"""Runtime filtering at the plan level: the two mechanisms a
1000-executor cluster leans on when a dim-side filter should shrink a
fact scan that is too big to read blind.

1. Dynamic partition pruning (default-on): scan_dpp_join's fact scan
   must carry a `dynamicpruning` PartitionFilter — the dim's surviving
   day values prune fact DIRECTORIES at runtime.
2. Runtime bloom-filter join (InjectRuntimeFilter): conf-gated
   demonstration that Spark plants a `bloom_filter_agg`/`might_contain`
   semi-filter on the large side when the creation side is filtered,
   and that the rewritten plan returns the SAME relation. Kept as a
   test (not a registry key) because the rule reads its confs at
   optimization time — a registered key must not mutate session confs
   the driver's other keys would inherit.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhousebackup_spark.plans import inspect
from clickhousebackup_spark.registry import all_specs
from clickhousebackup_spark.tables import load_table


def test_scan_dpp_join_prunes_partitions_dynamically(spark, sf_dir):
    df = all_specs()["scan_dpp_join"].fn(spark, sf_dir)
    plan = inspect.formatted(df)
    assert "dynamicpruning" in plan, plan
    # and the pruning rides the PARTITION filter of the fact scan,
    # not a post-scan data filter
    assert any(
        "PartitionFilters" in line and "dynamicpruning" in line
        for line in plan.splitlines()
    ), plan


#: Runtime bloom-filter confs, probe-scaled: local fixtures are far
#: below the 10 MB/10 GB production thresholds.
_BLOOM_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10MB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


@pytest.fixture()
def bloom_confs(spark):
    saved = {}
    for k, v in _BLOOM_CONFS.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    yield
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_runtime_bloom_filter_fires_and_preserves_results(
    spark, sf_dir, bloom_confs
):
    def build():
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderstatus") == "F"
        )
        return (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    df = build()
    plan = inspect.physical_plan(df)
    assert "might_contain" in plan or "bloom_filter" in plan.lower(), plan
    got = {r["o_orderstatus"]: r["n"] for r in df.collect()}

    # same relation without the runtime filter
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.enabled", "false"
    )
    want = {r["o_orderstatus"]: r["n"] for r in build().collect()}
    assert got == want
