"""The public engine facade (SURVEY.md §3.4's three entry points).

A user of the reference configures env vars and gets scheduled
``backup.sh`` runs. Here the same surface is:

    from clickhousebackup_spark.engine import BackupEngine
    eng = BackupEngine(spark, BackupConfig(host=..., dbs="db0,db1",
                       user=..., password=..., backup_dir=...))
    eng.add_hook(webhook_hook(url))          # hooks/00-webhook
    result = eng.run_backup({"orders": df})  # one backup.sh run
    plan = eng.retention_plan()              # the find…rm classification
    eng.prune(plan)                          # apply it

plus the relational surface (``table()``, ``sql()``) the reference
delegates to ClickHouse behind `backup.sh:45`.

Every run is the reference's lifecycle (backup.sh:16-130): pre hooks →
per-db snapshot loop → generation propagation → latest pointers →
retention prune → post hooks, with the error trap firing error hooks.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhousebackup_spark.backup.catalog import period_key_expr
from clickhousebackup_spark.backup.config import (
    GENERATIONS,
    BackupConfig,
    validate_backup_dir,
)
from clickhousebackup_spark.backup.hooks import Hook, LifecycleHooks
from clickhousebackup_spark.backup.retention import (
    keep_newest_per_period,
    latest_pointers,
    prune_delete_set,
    retention_plan,
)
from clickhousebackup_spark.backup.snapshot import SnapshotResult, snapshot_table
from clickhousebackup_spark.tables import load_table

CATALOG_SCHEMA = (
    "db string, generation string, period_key string, snapshot_ts timestamp, "
    "snapshot_id long, path string, content_hash string, size_bytes long"
)


@dataclass
class BackupEngine:
    spark: SparkSession
    config: BackupConfig
    hooks: LifecycleHooks = field(default_factory=LifecycleHooks)
    _snapshot_seq: int = 0

    def __post_init__(self):
        validate_backup_dir(self.config.backup_dir)  # env.sh:32-35

    # -- relational entry points (what ClickHouse serves in the ref) --

    def table(self, sf_dir: str, name: str) -> DataFrame:
        return load_table(self.spark, sf_dir, name)

    def sql(self, query: str) -> DataFrame:
        return self.spark.sql(query)

    # -- lifecycle --

    def add_hook(self, hook: Hook) -> "BackupEngine":
        self.hooks.add(hook)
        return self

    # -- the backup.sh run --

    def run_backup(
        self, tables_by_db: dict[str, dict[str, DataFrame]], now=None
    ) -> list[SnapshotResult]:
        """One scheduled run: for each configured db (env.sh:24 split),
        snapshot its tables with the `last` period key and register all
        four generation rows in the catalog (backup.sh:24-97)."""
        import datetime as dt

        now = now or dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)

        def job() -> list[SnapshotResult]:
            results: list[SnapshotResult] = []
            for db in self.config.db_list:  # backup.sh:24
                for tname, df in tables_by_db.get(db, {}).items():
                    key = now.strftime("%Y%m%d-%H%M%S")  # backup.sh:26
                    res = snapshot_table(
                        df, self.config.backup_dir, db, tname, key
                    )
                    results.append(res)
                    self._register(db, tname, res, now)
            return results

        return self.hooks.run_job(job)  # pre/post/error per backup.sh

    def _register(self, db: str, table: str, res: SnapshotResult, now) -> None:
        rows = []
        for gen in GENERATIONS:
            rows.append(
                (db, gen, "", now, self._snapshot_seq, res.path, "", res.n_rows)
            )
            self._snapshot_seq += 1
        new = self.spark.createDataFrame(rows, CATALOG_SCHEMA).withColumn(
            "period_key", period_key_expr("snapshot_ts", "generation")
        ).withColumn(
            "content_hash",
            F.md5(F.concat_ws("|", "db", "generation", "period_key", "path")),
        )
        self._append_catalog(
            new.select(
                "db",
                "generation",
                "period_key",
                "snapshot_ts",
                "snapshot_id",
                "path",
                "content_hash",
                "size_bytes",
            )
        )

    # -- catalog state (the reference's directory listing, explicit) --

    @property
    def catalog_path(self) -> str:
        return os.path.join(self.config.backup_dir, "_catalog")

    def _append_catalog(self, df: DataFrame) -> None:
        # partitioned by generation (SURVEY §1.2/§4.1: the reference's
        # last/daily/weekly/monthly dirs) so retention scans prune to
        # one generation directory instead of reading the full catalog.
        df.write.mode("append").partitionBy("generation").parquet(
            self.catalog_path
        )

    def catalog(self) -> DataFrame:
        if not os.path.exists(self.catalog_path):
            return self.spark.createDataFrame([], CATALOG_SCHEMA)
        return self.spark.read.parquet(self.catalog_path)

    # -- retention (backup.sh:90-122) --

    def generation_state(self) -> DataFrame:
        """Keep-newest-per-period view of the catalog (A14)."""
        return keep_newest_per_period(self.catalog())

    def latest(self) -> DataFrame:
        """`-latest` pointers (A15), honoring latest_type='none'."""
        if self.config.latest_type == "none":  # backup.sh:113
            return self.spark.createDataFrame(
                [], "db string, generation string, latest_target string, "
                "latest_ts timestamp, pointer_name string"
            )
        return latest_pointers(self.catalog(), self.config.suffix)

    def retention_plan(self, now_col=None) -> DataFrame:
        return retention_plan(
            self.generation_state(), self.config.retention, now_col
        )

    def restore(self, db: str, table: str, period_key: str | None = None) -> DataFrame:
        """Read a snapshot back — the restore path the reference leaves
        to manual `RESTORE` invocation. Defaults to the newest snapshot
        of (db, table); pass a period_key for point-in-time restore."""
        cat = self.catalog().filter(
            (F.col("db") == db) & F.col("path").contains(f"/{table}-")
        )
        if period_key is not None:
            cat = cat.filter(F.col("path").contains(f"{table}-{period_key}"))
        newest = (
            cat.orderBy(F.col("snapshot_ts").desc(), F.col("snapshot_id").desc())
            .select("path")
            .limit(1)
            .collect()
        )
        if not newest:
            raise FileNotFoundError(
                f"no snapshot found for ({db}, {table}, {period_key or 'latest'})"
            )
        return self.spark.read.parquet(newest[0]["path"])

    def prune(self, plan: DataFrame | None = None) -> DataFrame:
        """The delete set (find…rm analog). Returns it; removing the
        snapshot dirs is the caller's side effect to apply, mirroring
        how backup.sh separates listing from rm."""
        plan = plan if plan is not None else self.retention_plan()
        return prune_delete_set(self.generation_state(), plan)
