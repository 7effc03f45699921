"""Retention semantics as pure DataFrame transforms (A14/A15/A16).

Each function takes a snapshot-catalog DataFrame (catalog.py) and
returns a plan DataFrame — nothing here touches storage; the caller
applies the delete plan (mirroring how `backup.sh` separates listing
(`find`) from action (`rm`)).

Scale notes: all three ops shuffle once on (db, generation[, period])
— the natural partitioning of a backup catalog; at 100 TB the catalog
would additionally be stored partitioned by `generation` so the prune
scan prunes partitions before reading (the find -maxdepth analog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window  # noqa: F401  (Window used by keep_newest)
from pyspark.sql import functions as F

from clickhousebackup_spark.backup.config import RetentionPolicy


def keep_newest_per_period(catalog: DataFrame) -> DataFrame:
    """backup.sh:90-97: within one (db, generation, period_key) the
    newest snapshot wins (`ln -f` overwrites the period's artifact).
    Tiebreak on snapshot_id for hash determinism."""
    w = Window.partitionBy("db", "generation", "period_key").orderBy(
        F.col("snapshot_ts").desc(), F.col("snapshot_id").desc()
    )
    return (
        catalog.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def latest_pointers(catalog: DataFrame, suffix: str = ".zip") -> DataFrame:
    """backup.sh:99-115: per (db, generation), point `<db>-latest` at
    the newest artifact (max_by with total-order tiebreak)."""
    key = F.struct(F.col("snapshot_ts"), F.col("snapshot_id"))
    return catalog.groupBy("db", "generation").agg(
        F.max_by("path", key).alias("latest_target"),
        F.max("snapshot_ts").alias("latest_ts"),
        F.concat(F.col("db"), F.lit("-latest"), F.lit(suffix)).alias(
            "pointer_name"
        ),
    )


def retention_plan(
    catalog: DataFrame,
    policy: RetentionPolicy | None = None,
    now_col: F.Column | None = None,
) -> DataFrame:
    """backup.sh:119-122 (`find -mmin/-mtime +N … rm`) as a keep/delete
    classification.

    Adds ``age_minutes`` (vs the newest snapshot overall unless
    ``now_col`` is given — wall-clock would break determinism) and
    ``keep`` per the per-generation windows of env.sh:26-29.
    """
    policy = policy or RetentionPolicy()
    windows = policy.window_minutes()
    if now_col is None and all(
        isinstance(v, int) and not isinstance(v, bool)
        for v in windows.values()
    ):
        # Anchor "now" at the newest snapshot via a 1-row broadcast —
        # a global window here would collapse to a single partition.
        # Default path as parsed selectExpr stages (r17 construction
        # lever): plan-identical to the Column build (canonicalized
        # compare pinned in tests/test_optimizations_r17.py; note the
        # 60000000.0D double literal — bare 60000000.0 parses as
        # DECIMAL and would change age_minutes' type), construct
        # 94 → 43 ms under every retention-consuming key.
        mx = catalog.agg(F.max("snapshot_ts").alias("_now"))
        keep_window = (
            f"CASE WHEN generation = 'last' THEN {windows['last']} "
            f"WHEN generation = 'daily' THEN {windows['daily']} "
            f"WHEN generation = 'weekly' THEN {windows['weekly']} "
            f"ELSE {windows['monthly']} END"
        )
        return (
            catalog.join(F.broadcast(mx))
            .selectExpr(
                "*",
                "(unix_micros(_now) - unix_micros(snapshot_ts)) "
                "/ 60000000.0D AS age_minutes",
            )
            .selectExpr(
                "*", f"CAST(age_minutes <= {keep_window} AS LONG) AS keep"
            )
            .drop("_now")
        )
    # caller-supplied anchor (a Column isn't nameable in a parsed
    # string — engine.retention_plan(now_col=…)) or non-int policy
    # windows (a float would parse as DECIMAL and change types): keep
    # the Column build.
    drop_now = False
    if now_col is None:
        mx = catalog.agg(F.max("snapshot_ts").alias("_now"))
        catalog = catalog.join(F.broadcast(mx))
        now_col = F.col("_now")
        drop_now = True
    age_min = (
        (F.unix_micros(now_col) - F.unix_micros(F.col("snapshot_ts")))
        / F.lit(60_000_000.0)
    )
    keep_window = (
        F.when(F.col("generation") == "last", F.lit(windows["last"]))
        .when(F.col("generation") == "daily", F.lit(windows["daily"]))
        .when(F.col("generation") == "weekly", F.lit(windows["weekly"]))
        .otherwise(F.lit(windows["monthly"]))
    )
    out = catalog.withColumn("age_minutes", age_min).withColumn(
        "keep", (F.col("age_minutes") <= keep_window).cast("long")
    )
    return out.drop("_now") if drop_now else out


def prune_delete_set(catalog: DataFrame, plan: DataFrame) -> DataFrame:
    """The delete set as an anti-join of catalog against kept rows —
    the engine-side `rm` list (operator idiom of set_except/join_anti)."""
    kept = plan.filter(F.col("keep") == 1).select("db", "generation", "path")
    return catalog.join(kept, on=["db", "generation", "path"], how="left_anti")
