"""Round-13 late additions: skew playbook family FIVE — rank windows.

Four operator families already carry the bucket+seam rewrite
(sessionize, funnel, path/lag, prefix sum — analytics16.py); the zipf
probe measured their flat forms at ×4.5–8.5 max-task under a ~25 %-hot
key because a partitioned window ships the whole hot key to ONE task
and AQE has no skew rewrite for windows. Rank windows are the last
window shape in the registry still on a bare hot-key partition, and
they decompose on a DIFFERENT invariant than the time-ordered
families, which is why they get their own module:

- **Top-k per group is a semilattice.** The global top-k of a group
  is contained in the union of the top-k of ANY partition of that
  group's rows (each global winner is at worst k-th in its own cell
  under the strict (value DESC, unique-key) total order). So the salt
  does not need to respect time or value: a UNIFORM salt —
  ``pmod(o_orderkey, SALT)`` — caps max-task at hot-rows/SALT
  unconditionally, with no analogue of the all-events-in-one-day
  degradation the temporal buckets accept. Stage 2 re-ranks the ≤
  k·SALT survivors per group — constant-bounded rows per group.

- **Full ranking needs positions, not just winners**, so the salt
  must be ORDER-compatible: bucket by the ranked VALUE itself
  (``floor(o_totalprice / 1000)``). floor(x/c) is monotone in x, so
  the global (price DESC, o_orderkey) order visits buckets in
  non-increasing order, equal prices can never straddle a bucket
  boundary, and

      rank = (# rows in strictly-better buckets) + local rank.

  The offset is a per-(cust, bucket) COUNT — map-side combinable —
  accumulated by a per-customer window over bucket summaries (≤ ~560
  rows per customer at the observed o_totalprice range), exactly the
  running-sum seam with COUNT in place of SUM. Because the registered
  ORDER BY carries the unique o_orderkey tiebreak, every ordering
  tuple is distinct — RANK = DENSE_RANK = ROW_NUMBER globally AND
  within any bucket, so one row-count offset serves both outputs (a
  dense-rank offset would count distinct preceding tuples, which IS
  the row count here). Caveat shared with the temporal buckets: a
  degenerate column with one constant value collapses to one bucket;
  the salted top-k form above is the uniform-salt alternative when
  only winners are needed.

Both keys are oracle-identical to their flat siblings (ONE shared
oracle object each — TOPK_PER_GROUP_ORACLE / RANK_DENSE_ORACLE), so
the plan choice is invisible to correctness, and both keep the family
invariant: no order-scale task ever holds more than one salt cell /
one customer-kilobucket.

Reference mapping: the reference (backup.sh:38-45) delegates queries
to the ClickHouse server; per-group top-k and ranked exports are the
canonical CH retention/leaderboard patterns (LIMIT BY, topK), and
MergeTree shards them across parts exactly the way the salt cells
shard a hot group here.

Family rules carried from analytics16: integer rank outputs CAST
BIGINT; every order carries the unique-key total-order tiebreak; no
per-row Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhousebackup_spark.operators.sorts import TOPK_PER_GROUP_ORACLE
from clickhousebackup_spark.operators.windows import (
    CUME_DIST_NTH_ORACLE,
    NTILE_FIRSTLAST_ORACLE,
    RANK_DENSE_ORACLE,
)
from clickhousebackup_spark.registry import register
from clickhousebackup_spark.tables import load_table

#: Stage-1 fan-out for the salted top-k. Max task ≈ hot-group rows /
#: TOPK_SALT regardless of any data distribution (the salt is a pmod
#: of the unique order key); stage-2 survivors are ≤ 3·TOPK_SALT rows
#: per group. 32 matches the test harness's shuffle parallelism; at
#: 100 TB it would scale with the cluster's cores-per-hot-key budget.
TOPK_SALT = 32

#: Value-bucket width for the rank decomposition: o_totalprice spans
#: ~[850, 560k] in every TPC-H-like arm, so 1000 yields ~560 buckets —
#: the hot customer's rows split across up to ~560 tasks, and the
#: per-customer offset window runs over ≤ ~560 summary rows. The
#: width only sizes tasks; exactness holds for ANY width because the
#: bucket is a monotone function of the ranked value.
RANK_BUCKET_WIDTH = 1000.0


@register(
    "topk_per_group_twostage",
    oracle=TOPK_PER_GROUP_ORACLE,
    doc="Skew-immune rewrite of topk_per_group (top-3 orders per "
    "customer), oracle-identical to the flat key — the FIFTH operator "
    "family on the skew playbook and the first on a UNIFORM salt: "
    "top-k is a semilattice (every global winner is ≤ k-th in its own "
    "salt cell under the strict (price DESC, o_orderkey) order), so "
    "stage 1 takes the local top-3 inside (o_custkey, "
    "pmod(o_orderkey, 32)) window partitions — max-task capped at "
    "hot-customer rows / 32 for ANY distribution, no temporal/value "
    "degeneracy — and stage 2 re-ranks the ≤ 96 survivors per "
    "customer. The stage-2 window partitions on the bare customer "
    "but over a constant-bounded row set, which is the entire point. "
    "One extra exchange vs the flat key's single o_custkey window is "
    "the deliberate price for removing the hot-key sort (the flat "
    "per-key window family measured ×4.5–8.5 max-task on the zipf "
    "arm).",
)
def topk_per_group_twostage(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.pmod(F.col("o_orderkey"), F.lit(TOPK_SALT)).alias("salt"),
    )

    # Stage 1: local top-3 inside each (cust, salt) cell. Any row NOT
    # in its cell's top-3 is dominated by 3 same-cell rows, hence by
    # ≥3 same-customer rows globally — it cannot be a global winner.
    wloc = Window.partitionBy("o_custkey", "salt").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    survivors = (
        o.withColumn("rn_loc", F.row_number().over(wloc))
        .filter(F.col("rn_loc") <= 3)
        .drop("rn_loc", "salt")
    )

    # Stage 2: exact re-rank of ≤ 3·SALT rows per customer.
    wfin = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        survivors.withColumn(
            "rank_in_cust", F.row_number().over(wfin).cast("long")
        )
        .filter(F.col("rank_in_cust") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank_in_cust")
    )


@register(
    "win_rank_dense_twostage",
    oracle=RANK_DENSE_ORACLE,
    doc="Skew-immune rewrite of win_rank_dense (rank + dense_rank of "
    "every order within its customer), oracle-identical to the flat "
    "key. Event-grain output forbids the top-k pruning, so the salt "
    "must be order-compatible: bucket by the ranked value itself "
    "(floor(o_totalprice/1000) — monotone, so equal prices never "
    "straddle buckets and the global (price DESC, o_orderkey) order "
    "visits buckets in non-increasing order). rank = count of rows "
    "in strictly-better buckets + rank within the bucket; the offset "
    "is a map-side-combinable per-(cust, bucket) COUNT accumulated by "
    "a per-customer window over ≤ ~560 bucket-summary rows — the "
    "running-sum seam with COUNT for SUM. The registered ORDER BY "
    "carries the unique o_orderkey, so ordering tuples are distinct "
    "and RANK = DENSE_RANK = ROW_NUMBER everywhere — one offset "
    "serves both output columns (a dense offset would count distinct "
    "preceding tuples = the row count). No order-scale task holds "
    "more than one customer-kilobucket; the flat key's hot-customer "
    "sort was the straggler shape the probe family measured at "
    "×4.5–8.5 max-task.",
)
def win_rank_dense_twostage(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.floor(F.col("o_totalprice") / F.lit(RANK_BUCKET_WIDTH))
        .cast("long")
        .alias("vbucket"),
    )

    # Stage 1: local rank inside (cust, value-bucket). The ordering
    # tuple is unique, so rank() here equals row_number(); rank() is
    # kept for semantic fidelity with the flat key.
    wloc = Window.partitionBy("o_custkey", "vbucket").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    local = o.withColumn("rnk_loc", F.rank().over(wloc))

    # Stage 2: rows per (cust, bucket) — same grouping keys as the
    # stage-1 exchange — then the strictly-better-buckets offset per
    # customer over summary rows only (bucket DESC = better first).
    counts = local.groupBy("o_custkey", "vbucket").agg(
        F.count(F.lit(1)).alias("n")
    )
    wseam = Window.partitionBy("o_custkey").orderBy(F.col("vbucket").desc())
    offsets = counts.withColumn(
        "offset",
        F.coalesce(
            F.sum("n").over(wseam.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).cast("long"),
    ).select("o_custkey", "vbucket", "offset")

    # Stage 3: fold the offset back onto order-grain rows on the
    # stage-1 keys. Both rank flavours coincide under the unique
    # total order (see module docstring).
    folded = local.join(offsets, ["o_custkey", "vbucket"])
    grank = (F.col("offset") + F.col("rnk_loc")).cast("long")
    return folded.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        grank.alias("rnk"),
        grank.alias("drnk"),
    )


@register(
    "win_ntile_firstlast_twostage",
    oracle=NTILE_FIRSTLAST_ORACLE,
    doc="Skew-immune rewrite of win_ntile_firstlast (quartile + "
    "first/last orderkey per o_orderstatus), oracle-identical to the "
    "flat key — the rank decomposition above generalized to DERIVED "
    "positional outputs, on a STRUCTURAL straggler (o_orderstatus "
    "has 3 values, so the flat window sorts n/3 rows per task at any "
    "scale — the audited low-cardinality shape). The global rank "
    "comes from the (status, price-kilobucket) decomposition exactly "
    "as win_rank_dense_twostage (monotone buckets, COUNT offsets "
    "over ≤ ~560 summary rows); then every output is closed-form "
    "integer arithmetic on (rn, n): NTILE(4)'s "
    "larger-groups-first split is rn ≤ (s+1)·e ? ceil(rn/(s+1)) : "
    "e + ceil((rn − (s+1)·e)/s) with s = n div 4, e = n mod 4; "
    "first/last value are the rank-1 and rank-n rows, recovered from "
    "a 2-row-per-status extremes table broadcast back. No "
    "order-scale task holds more than one status-kilobucket.",
)
def win_ntile_firstlast_twostage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus",
        "o_orderkey",
        "o_totalprice",
        F.floor(F.col("o_totalprice") / F.lit(RANK_BUCKET_WIDTH))
        .cast("long")
        .alias("vbucket"),
    )

    wloc = Window.partitionBy("o_orderstatus", "vbucket").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    local = o.withColumn("rn_loc", F.row_number().over(wloc))

    counts = local.groupBy("o_orderstatus", "vbucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wseam = Window.partitionBy("o_orderstatus").orderBy(
        F.col("vbucket").desc()
    )
    wstat = Window.partitionBy("o_orderstatus")
    offsets = counts.select(
        "o_orderstatus",
        "vbucket",
        F.coalesce(
            F.sum("cnt").over(
                wseam.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("offset"),
        F.sum("cnt").over(wstat).alias("n_stat"),
    )

    folded = local.join(offsets, ["o_orderstatus", "vbucket"]).select(
        "o_orderstatus",
        "o_orderkey",
        "o_totalprice",
        (F.col("offset") + F.col("rn_loc")).cast("long").alias("rn"),
        F.col("n_stat").cast("long").alias("n"),
    )

    # Extremes: first/last under (price DESC, orderkey) are pure
    # argmax/argmin — a map-side-combinable aggregate straight off
    # the base table, no window and no rank-subtree replay. The
    # negated orderkey inverts the tiebreak inside the struct order:
    # first row = max price then MIN key; last = min price then MAX.
    extremes = o.groupBy("o_orderstatus").agg(
        F.expr(
            "max_by(o_orderkey, struct(o_totalprice, -o_orderkey))"
        ).alias("top_orderkey"),
        F.expr(
            "min_by(o_orderkey, struct(o_totalprice, -o_orderkey))"
        ).alias("bottom_orderkey"),
    )

    # NTILE(4), larger groups first: s = n div 4 rows in the small
    # tiles, the first e = n mod 4 tiles get s + 1. Pure INTEGER
    # arithmetic (div, never /): ceil(a/b) = (a + b - 1) div b on
    # positives; the s = 0 case (n < 4) is entirely inside the first
    # branch since rn <= n = e there.
    quartile = F.expr(
        "CAST(CASE WHEN rn <= (n div 4 + 1) * (n % 4) "
        "THEN (rn + n div 4) div (n div 4 + 1) "
        "ELSE n % 4 + (rn - (n div 4 + 1) * (n % 4) + n div 4 - 1) "
        "     div (n div 4) END AS BIGINT)"
    )
    return folded.join(F.broadcast(extremes), "o_orderstatus").select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        quartile.alias("quartile"),
        "top_orderkey",
        "bottom_orderkey",
    )


@register(
    "win_cume_dist_nth_twostage",
    oracle=CUME_DIST_NTH_ORACLE,
    doc="Skew-immune rewrite of win_cume_dist_nth (tie-aware "
    "cume_dist over value + nth_value(event_id, 2) per event_type), "
    "oracle-identical to the flat key — the rank decomposition "
    "extended to TIE-AWARE positional semantics on another "
    "structural straggler (5-value event_type; the flat window sorts "
    "n/5 rows per task at any scale). The unique-tiebreak rank rn "
    "comes from (type, floor(value)) local ranks + COUNT offsets "
    "over summary rows (value ASC here — offsets cumulate ascending); "
    "cume_dist's numerator is the PEER-GROUP MAX rank — peers share "
    "a value, hence a bucket, so it is a max window over "
    "(type, bucket, value) — and cd = peer_max/n replays the same "
    "two-long double division cume_dist itself performs. "
    "nth_value(2) is the rank-2 row's event_id, recovered by a "
    "1-row-per-type broadcast (left join: a single-row type keeps "
    "the NULL the flat frame produces). No event-scale task holds "
    "more than one (type, value-unit) bucket.",
)
def win_cume_dist_nth_twostage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        "value",
        F.floor(F.col("value")).cast("long").alias("vbucket"),
    )

    # Stage 1: local rank inside (type, value-bucket) under the
    # (value ASC, event_id) total order, plus the per-peer-group max
    # local rank (peers = equal value, always same bucket).
    wloc = Window.partitionBy("event_type", "vbucket").orderBy(
        "value", "event_id"
    )
    wpeer = Window.partitionBy("event_type", "vbucket", "value")
    local = ev.select(
        "event_id",
        "event_type",
        "value",
        "vbucket",
        F.row_number().over(wloc).alias("rn_loc"),
    ).withColumn("peer_max_loc", F.max("rn_loc").over(wpeer))

    # Stage 2: ascending COUNT offsets + per-type totals over the
    # bucket-summary rows.
    counts = local.groupBy("event_type", "vbucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wseam = Window.partitionBy("event_type").orderBy("vbucket")
    wtype = Window.partitionBy("event_type")
    offsets = counts.select(
        "event_type",
        "vbucket",
        F.coalesce(
            F.sum("cnt").over(
                wseam.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("offset"),
        F.sum("cnt").over(wtype).alias("n_type"),
    )

    folded = local.join(offsets, ["event_type", "vbucket"]).select(
        "event_id",
        "event_type",
        "value",
        (F.col("offset") + F.col("rn_loc")).cast("long").alias("rn"),
        (F.col("offset") + F.col("peer_max_loc"))
        .cast("long")
        .alias("peer_max"),
        F.col("n_type").cast("long").alias("n"),
    )

    # nth_value(2): the rank-2 row per type, broadcast back; a LEFT
    # join keeps the NULL a single-row partition produces.
    seconds = folded.filter(F.col("rn") == 2).select(
        "event_type", F.col("event_id").alias("second_event_id")
    )
    return folded.join(F.broadcast(seconds), "event_type", "left").select(
        "event_id",
        "event_type",
        "value",
        # the same two-BIGINT double division cume_dist performs
        (F.col("peer_max") / F.col("n")).alias("cd"),
        "second_event_id",
    )
