"""Round-13 late additions: skew playbook family SEVEN — bounded
time-range window frames.

Families one through six (analytics16/17/18.py) cover order-dependent
scans (sessionize), min-chains (funnel), 1-row seams (lag), prefix
offsets (running sum), count offsets (rank), and histogram selection
(quantiles). The remaining flat window shape still partitioned on a
bare hot key is the BOUNDED range frame: ``win_sliding_avg`` computes
a 1-hour trailing mean per user, and a partitioned range window ships
every row of the hot user to ONE task exactly like the prefix-sum
straggler (×5.5 wall / ×8.5 max-task on the zipf arm for the
unbounded cousin).

A bounded frame decomposes on a simpler invariant than any family
before it: **if the salt bucket is wider than the frame, a row's
frame spans at most two buckets** (its own and the previous one).
With day buckets against the 1-hour frame:

- **Local pass.** The same range window, partitioned by (user_id,
  day-bucket) — covers every frame contribution from the row's own
  bucket. Max task = one user-day.
- **Seam pass.** Only rows in the first HOUR of a bucket can reach
  back into the previous bucket, and only rows in the last HOUR of a
  bucket can be reached. Union those two thin slices (sources tagged
  into the NEXT bucket so they co-partition with their targets) and
  run ONE more range window with a conditional aggregate — sum/count
  over SOURCE rows only, evaluated at target rows. A window, not a
  join: the first cut of this key joined the slices and the zipf
  probe measured the join quadratic in rows-per-hour (3.3k first-hour
  targets × 3.3k last-hour sources per hot user-day = 11M pairs/day,
  ×13.8 max-task); the range window over the same 6.6k-row slice is
  incremental and linear.
- **Recombination is exact** because the frame aggregate is a
  DECIMAL(38,6) SUM and a COUNT — both associative — and the final
  ``CAST(sum AS DOUBLE) / count`` replays the flat key's expression
  on bit-identical inputs: local + seam decimal parts add exactly,
  disjointly (same-timestamp peers share a bucket, so the seam never
  double-counts a peer).

The RANGE frame has no ordering subtleties for the seam: membership
is the pure time predicate ts ∈ [t−1h, t] on the same user (peers at
equal ts are included by definition, and equal ts ⇒ equal bucket ⇒
handled by the local pass).

Scale contract: both event-scale exchanges are balanced — the local
window keys on (user, bucket) (max task one user-day; the family's
standing caveat about a corpus compressed into one day applies), and
the recombination join keys on the UNIQUE event_id (uniform by
construction). The seam join touches only the two 1/24 slices. The
deliberate price is re-scanning events for the seam slices (scans
are embarrassingly parallel; the flat key's hot-user sort is not).

Reference mapping: the reference (backup.sh:38-45) delegates queries
to ClickHouse, where trailing-window aggregates over MergeTree parts
merge per-part partials exactly this way (parts play the buckets).

Family rules carried forward: every order carries the unique-key
tiebreak where ordering matters; integer outputs CAST BIGINT; no
per-row Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhousebackup_spark.exprs import DEC
from clickhousebackup_spark.operators.windows import SLIDING_AVG_ORACLE
from clickhousebackup_spark.registry import register
from clickhousebackup_spark.tables import load_table

#: Frame width (µs) — fixed by the flat key's contract (1 hour).
FRAME_US = 3_600_000_000
#: Salt-bucket width (µs) — TWICE the frame. Exactness only needs
#: BUCKET_US >= FRAME_US (frame spans ≤ 2 buckets); the width is the
#: task-sizing knob, and it matters more here than in the other
#: temporal families because Spark evaluates a bounded frame by
#: re-aggregating it per row — a window task costs
#: O(rows_in_partition × rows_in_frame). Day buckets left the hot
#: user's 80k-row day at ~13s (measured); frame-sized buckets cap a
#: task at one user-2h slice. Exactly 2× also makes the seam slices
#: DISJOINT halves (first hour = targets, second hour = sources of
#: the next bucket), so the seam union carries each event once.
BUCKET_US = 2 * FRAME_US


@register(
    "win_sliding_avg_twostage",
    oracle=SLIDING_AVG_ORACLE,
    doc="Skew-immune rewrite of win_sliding_avg (1-hour trailing mean "
    "of value per user, RANGE frame on epoch-µs), oracle-identical to "
    "the flat key — the SEVENTH operator family on the skew playbook. "
    "Bounded-frame invariant: a day bucket is wider than the 1-hour "
    "frame, so a row's frame spans at most its own and the previous "
    "bucket. Local pass = the same range window partitioned (user, "
    "day-bucket); seam pass = ONE more range window over the union "
    "of each bucket's first-hour rows and the previous bucket's "
    "last-hour rows (sources tagged into the next bucket; a "
    "conditional sum/count over source rows evaluated at target "
    "rows — incremental and linear where a slice JOIN measured "
    "quadratic in rows-per-hour); recombination adds the DECIMAL(38,6) "
    "sums and BIGINT counts exactly and replays the flat CAST(sum AS "
    "DOUBLE)/count — bit-identical output. Event-scale exchanges: "
    "the (user, bucket) window and the unique-event_id fold join, "
    "both balanced under ANY user distribution. The flat key ships "
    "the hot user's every row to one task (the unbounded cousin "
    "measured ×8.5 max-task); here no task holds more than one "
    "user-day.",
)
def win_sliding_avg_twostage(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .withColumn("ts_us", F.unix_micros("ts"))
        .withColumn(
            "bucket", F.floor(F.col("ts_us") / F.lit(BUCKET_US)).cast("long")
        )
        .withColumn("off_us", F.col("ts_us") - F.col("bucket") * F.lit(BUCKET_US))
    )

    # Local pass: frame contributions from the row's own bucket.
    wloc = (
        Window.partitionBy("user_id", "bucket")
        .orderBy("ts_us")
        .rangeBetween(-FRAME_US, 0)
    )
    local = ev.select(
        "event_id",
        "user_id",
        "ts",
        "bucket",
        "ts_us",
        "off_us",
        F.sum(F.col("value").cast(DEC)).over(wloc).alias("loc_sum"),
        F.count("value").over(wloc).alias("loc_cnt"),
    )

    # Seam pass: only first-hour rows can reach back, only last-hour
    # rows can be reached. A target at offset o has frame floor
    # t−1h = bucket_start − (1h − o): for o >= 1h that is inside the
    # bucket (no seam); a source at offset o_r contributes only when
    # o_r >= BUCKET − 1h + o >= 23h. Sources are tagged into the NEXT
    # bucket so each (user, bucket) window partition holds one day's
    # targets plus the previous day's sources; every source ts is
    # strictly below every target ts (different days), so the range
    # frame [t−1h, t] evaluated at a target row captures exactly the
    # in-range sources, and the conditional aggregate ignores the
    # co-partitioned targets. One incremental window over two ~1/24
    # slices — NOT a join, which would be quadratic in rows-per-hour
    # (measured: ×13.8 max-task on the zipf arm before this rewrite).
    targets = ev.filter(F.col("off_us") < F.lit(FRAME_US)).select(
        "event_id",
        "user_id",
        "bucket",
        "ts_us",
        F.lit(None).cast("double").alias("src_value"),
    )
    sources = ev.filter(
        F.col("off_us") >= F.lit(BUCKET_US - FRAME_US)
    ).select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        (F.col("bucket") + 1).alias("bucket"),
        "ts_us",
        F.col("value").alias("src_value"),
    )
    wseam = (
        Window.partitionBy("user_id", "bucket")
        .orderBy("ts_us")
        .rangeBetween(-FRAME_US, 0)
    )
    seam = (
        targets.unionByName(sources)
        .select(
            "event_id",
            F.sum(F.col("src_value").cast(DEC)).over(wseam).alias("seam_sum"),
            F.count("src_value").over(wseam).alias("seam_cnt"),
        )
        .filter(F.col("event_id").isNotNull())
    )

    # Recombination on the unique event_id; decimal addition is exact
    # and the final expression replays the flat key's verbatim.
    zero_dec = F.lit(0).cast(DEC)
    return local.join(seam, "event_id", "left").select(
        "event_id",
        "user_id",
        "ts",
        (
            (F.col("loc_sum") + F.coalesce(F.col("seam_sum"), zero_dec))
            .cast("double")
            / (F.col("loc_cnt") + F.coalesce(F.col("seam_cnt"), F.lit(0)))
        ).alias("moving_avg"),
    )


@register(
    "win_sliding_avg_adaptive",
    oracle=SLIDING_AVG_ORACLE,
    doc="Key-distribution dispatch for the bounded-frame family, "
    "completing the adaptive story the sessionizer started "
    "(sessionize_gap_adaptive): the flat win_sliding_avg wins on "
    "uniform keys (one exchange, no seam machinery — probe walls "
    "4.6s vs 5.5s uniform) and loses catastrophically on hot keys "
    "(x34 max-task — Spark re-aggregates a bounded frame per row, so "
    "the hot user's task costs O(rows x frame_rows)); the two-stage "
    "sibling inverts both. This key reads the SAME memoized "
    "hot-share probe (analytics16._events_hot_share: one bounded "
    "two-phase aggregate over the pruned user_id column, cached on "
    "the events table's file identity, side-effect free after the "
    "first action) and returns whichever branch fits — both branches "
    "are oracle-identical (ONE shared SLIDING_AVG_ORACLE across all "
    "three keys), so the physical choice is invisible to "
    "correctness, exactly how an engine should treat plan selection. "
    "At 100 TB the dispatch statistic comes from table statistics "
    "instead of a scan.",
)
def win_sliding_avg_adaptive(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhousebackup_spark.operators.analytics16 import (
        ADAPTIVE_HOT_SHARE,
        _events_hot_share,
    )
    from clickhousebackup_spark.operators.windows import win_sliding_avg

    hot, total = _events_hot_share(spark, sf_dir)
    skewed = total > 0 and hot / total > ADAPTIVE_HOT_SHARE
    branch = win_sliding_avg_twostage if skewed else win_sliding_avg
    return branch(spark, sf_dir)
