"""Round-14 operator additions: skew playbook families EIGHT and NINE
— the two per-user behavior keys the round-13 zipf probe left without
two-stage siblings.

``sequence_count_pairs`` (behavior.py) sums a per-user running view
count over purchase rows — family 4's prefix-sum shape (the flat
win_running_sum measured ×7.5 max-task under the 24%-hot user), and
``agg_ema`` selects each user's trailing-EMA_HORIZON rows with a
row_number window partitioned by the bare ``user_id`` — family 5's
rank shape (flat win_rank_dense ×8.6 max-task). Both rewrites follow
the analytics16/17 bucket+seam recipe: the event-scale exchange keys
on ``(user_id, day-bucket)`` so no task ever holds more than one
user-day, and the per-user pass runs over bucket SUMMARIES (~3 orders
of magnitude smaller). Both are hash-identical to their flat keys and
REGISTER WITH THE SAME ORACLE OBJECT (behavior.SEQUENCE_PAIRS_ORACLE
/ behavior.EMA_ORACLE) — the one-oracle-per-family convention.

Exactness arguments:

- **sequence_count_pairs_twostage** is pure integer arithmetic, so
  regrouping is exactly lossless: every (view, later purchase) pair
  is WITHIN one bucket — counted by the same running-count window now
  partitioned on (user_id, bucket) — or CROSSES buckets, in which
  case it is (views in any earlier bucket) × (purchases in this
  bucket): one summary row per (user, bucket) carries (n_views,
  n_purchases), and an exclusive per-user prefix sum over summaries
  prices every cross pair. Users are emitted iff they have ≥1
  purchase row — the same emission rule as the flat key's
  filter-then-group (a purchase with zero prior views contributes a
  0 to the sum, never drops the user).

- **agg_ema_twostage** decomposes the trailing-K SELECTION, not the
  fold: count rows per (user, bucket); a per-user scan over bucket
  summaries in bucket-DESC order finds how many rows live in NEWER
  buckets (excl_newer); only buckets with excl_newer < K contribute
  trailing rows, and a row's global recency rank is excl_newer +
  rank-within-its-bucket (row_number DESC over (user_id, bucket) —
  the skew-immune window). Rows with global rank <= K are exactly
  the flat key's rn <= K rows; the fold then sorts the SAME <= K
  values under the SAME (ts, event_id) total order and applies the
  SAME left fold expression — bit-identical doubles, shared oracle.

Reference anchor: the reference delegates queries to ClickHouse
(backup.sh:45); sequenceCount and exponentialMovingAverage are the
ClickHouse behavior functions these keys map (see the flat keys'
docstrings for the per-function notes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhousebackup_spark.operators.analytics16 import BUCKET_US
from clickhousebackup_spark.operators.behavior import (
    EMA_HORIZON,
    EMA_ORACLE,
    SEQUENCE_PAIRS_ORACLE,
)
from clickhousebackup_spark.registry import register
from clickhousebackup_spark.tables import load_table


@register(
    "sequence_count_pairs_twostage",
    oracle=SEQUENCE_PAIRS_ORACLE,
    doc="Skew-immune rewrite of sequence_count_pairs (per-user count "
    "of (view, later purchase) ordered pairs), hash-identical to the "
    "flat key — family EIGHT of the bucket+seam playbook. Stage 1: "
    "the flat key's running view count, window partitioned on "
    "(user_id, day-bucket) instead of the bare user_id — within-"
    "bucket pairs, no task holds more than one user-day. Stage 2: "
    "one summary row per (user, bucket) with (n_views, n_purchases); "
    "an exclusive per-user prefix sum over these summaries (lag "
    "frame, ~3 orders of magnitude fewer rows than events) gives "
    "views-in-earlier-buckets, and cross-bucket pairs are that "
    "count times the bucket's purchases. Integer arithmetic "
    "throughout, so the regrouping is exactly lossless; emission "
    "rule (users with >=1 purchase) replicated via the purchase "
    "count. Shares behavior.SEQUENCE_PAIRS_ORACLE with the flat key.",
)
def sequence_count_pairs_twostage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
    ).withColumn("bucket", (F.col("us") / F.lit(BUCKET_US)).cast("long"))

    # Stage 1: within-bucket pairs — the event-scale exchange keys on
    # (user_id, bucket), the skew-immunity invariant.
    wloc = (
        Window.partitionBy("user_id", "bucket")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    vb_local = F.coalesce(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).over(
            wloc
        ),
        F.lit(0),
    )
    local = (
        ev.withColumn("vb", vb_local)
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "bucket")
        .agg(F.sum("vb").alias("local_pairs"))
    )

    # Stage 2: per-(user, bucket) summaries; the per-user window runs
    # over these (one row per user-day), never over events.
    summary = ev.groupBy("user_id", "bucket").agg(
        F.sum(
            F.when(F.col("event_type") == "view", 1).otherwise(0)
        ).alias("n_views"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("n_purch"),
    )
    wseam = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seam = summary.withColumn(
        "views_before", F.coalesce(F.sum("n_views").over(wseam), F.lit(0))
    )

    per_bucket = (
        seam.join(local, ["user_id", "bucket"], "left")
        .select(
            "user_id",
            "n_purch",
            (
                F.coalesce(F.col("local_pairs"), F.lit(0))
                + F.col("views_before") * F.col("n_purch")
            ).alias("pairs"),
        )
    )
    return (
        per_bucket.groupBy("user_id")
        .agg(
            F.sum("pairs").alias("pairs"),
            F.sum("n_purch").alias("n_purch"),
        )
        # same emission rule as the flat key: one output row per user
        # WITH at least one purchase (zero prior views still emits 0)
        .filter(F.col("n_purch") > 0)
        .select("user_id", F.col("pairs").cast("long").alias("n_pairs"))
    )


@register(
    "agg_ema_twostage",
    oracle=EMA_ORACLE,
    doc="Skew-immune rewrite of agg_ema (trailing-100 EMA, alpha=0.5), "
    "bit-identical to the flat key — family NINE: rank decomposition "
    "applied to a trailing-K selection. The flat key's row_number "
    "DESC window partitions on the bare user_id (the measured "
    "~x8 max-task straggler shape under a hot user); here rows are "
    "counted per (user, day-bucket), a per-user scan over bucket "
    "summaries in bucket-DESC order computes each bucket's "
    "rows-in-newer-buckets (excl_newer, an exclusive prefix sum over "
    "~user-days rows), buckets with excl_newer >= K are pruned "
    "BEFORE any event-scale ranking, and a row's global recency rank "
    "is excl_newer + row_number DESC within its (user_id, bucket) — "
    "the skew-immune window; no task ranks more than one user-day. "
    "Rows with global rank <= K are exactly the flat rn <= K set, "
    "and the final fold sorts the same <= K values under the same "
    "(ts, event_id) total order and applies the same left fold — "
    "bit-identical doubles. Shares behavior.EMA_ORACLE.",
)
def agg_ema_twostage(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.unix_micros("ts").alias("us"),
    ).withColumn("bucket", (F.col("us") / F.lit(BUCKET_US)).cast("long"))

    # Per-(user, bucket) row counts -> per-user exclusive prefix of
    # rows in NEWER buckets (bucket DESC order); only buckets that
    # still intersect the trailing-K window survive.
    counts = ev.groupBy("user_id", "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )
    wdesc = (
        Window.partitionBy("user_id")
        .orderBy(F.col("bucket").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    needed = (
        counts.withColumn(
            "excl_newer", F.coalesce(F.sum("c").over(wdesc), F.lit(0))
        )
        .filter(F.col("excl_newer") < EMA_HORIZON)
        .select("user_id", "bucket", "excl_newer")
    )

    # Event-scale rank runs ONLY inside surviving buckets, partitioned
    # by (user_id, bucket) — one user-day per task, at most.
    wloc = Window.partitionBy("user_id", "bucket").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    recent = (
        ev.join(needed, ["user_id", "bucket"])
        .withColumn("rn_local", F.row_number().over(wloc))
        .filter(F.col("excl_newer") + F.col("rn_local") <= EMA_HORIZON)
        .select("user_id", "ts", "event_id", "value")
    )

    # Identical fold to the flat key over the identical <= K rows.
    seq = F.sort_array(F.collect_list(F.struct("ts", "event_id", "value")))
    return (
        recent.groupBy("user_id")
        .agg(F.transform(seq, lambda s: s["value"]).alias("vals"))
        .select(
            "user_id",
            F.expr(
                "aggregate(slice(vals, 2, greatest(size(vals) - 1, 0)),"
                " element_at(vals, 1), (acc, x) -> acc * 0.5D + x * 0.5D)"
            ).alias("ema_value"),
        )
    )
