"""Lakehouse-format gate probes (VERDICT r9 item 8): the Delta /
Iceberg readers are import-gated today (no jars in this image) and
must ACTIVATE, not just stop erroring, the day the package appears.

Each probe is two-armed on the same assertion surface:
- package absent (this image): the reader raises ConnectorUnavailable
  with an actionable install hint — never a raw py4j stack;
- package present (a real cluster): a full write→read roundtrip runs,
  so the gate cannot rot into a permanently-dead branch.
"""

from __future__ import annotations

import importlib.util

import pytest

from clickhousebackup_spark.sources.readers import (
    ConnectorUnavailable,
    read_delta,
    read_iceberg,
)

_HAS_DELTA = importlib.util.find_spec("delta") is not None


def test_delta_gate(spark, sf_dir, tmp_path):
    if not _HAS_DELTA:
        with pytest.raises(ConnectorUnavailable) as e:
            read_delta(spark, str(tmp_path / "nope"))
        assert "delta-spark" in str(e.value)  # actionable hint
        return
    # activation arm: delta-spark is importable — prove the reader
    # actually works end to end (requires the session to carry the
    # Delta SQL extension; configure_spark_with_delta_pip does that
    # on a real cluster)
    df = spark.range(5).withColumnRenamed("id", "k")
    path = str(tmp_path / "tbl")
    df.write.format("delta").save(path)
    assert read_delta(spark, path).count() == 5


def test_iceberg_gate(spark):
    try:
        df = read_iceberg(spark, "nonexistent_catalog.db.tbl")
    except ConnectorUnavailable as e:
        assert "iceberg" in str(e).lower()
        return
    # activation arm: an iceberg catalog is on the classpath; the
    # nonexistent table must fail with a catalog error, not silence
    with pytest.raises(Exception):
        df.count()


def test_jdbc_single_jvm_gate(spark):
    """sink_jdbc_roundtrip's deployment-shape gate (round-11
    local-cluster sweep finding): embedded Derby — the only JDBC
    engine in this image — boots in exactly one JVM, so the key runs
    fully under local[...] masters and must raise a loud
    ConnectorUnavailable (not a py4j double-boot stack) under any
    multi-executor master."""
    from clickhousebackup_spark.sources.readers import (
        single_jvm_master,
        sink_jdbc_roundtrip,
    )

    # this suite runs on local[...] — the predicate must say single-JVM
    assert single_jvm_master(spark)

    class _Conf:
        def __init__(self, master):
            self._m = master

        def get(self, key, default=None):
            return self._m if key == "spark.master" else default

    class _FakeSession:
        def __init__(self, master):
            self.conf = _Conf(master)

    for master in ("local-cluster[2,2,1024]", "spark://host:7077",
                   "yarn", "k8s://https://host:6443"):
        assert not single_jvm_master(_FakeSession(master))
        with pytest.raises(ConnectorUnavailable) as e:
            sink_jdbc_roundtrip(_FakeSession(master), "/root/testdata/sf0.001")
        assert "network-reachable" in str(e.value)
    for master in ("local[8]", "local[*]", "local"):
        assert single_jvm_master(_FakeSession(master))


def test_avro_gate(spark, tmp_path):
    """Two-armed like the Delta/Iceberg gates: without the external
    spark-avro module the readers raise an actionable
    ConnectorUnavailable (never a raw 'Failed to find data source'
    analysis error); with it on the classpath the roundtrip runs."""
    from clickhousebackup_spark.sources.readers import read_avro, write_avro

    df = spark.range(5).withColumnRenamed("id", "k")
    path = str(tmp_path / "tbl_avro")
    try:
        write_avro(df, path)
    except ConnectorUnavailable as e:
        assert "spark-avro" in str(e) and "--packages" in str(e)
        with pytest.raises(ConnectorUnavailable):
            read_avro(spark, path)
        return
    # activation arm: module present — prove the roundtrip end to end
    assert read_avro(spark, path).count() == 5
