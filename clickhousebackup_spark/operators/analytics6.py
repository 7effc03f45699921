"""Round-7 operator additions (batch 1): OHLC bars, integer-exact
VWAP, weekly churn/resurrection flags, last-touch attribution,
time-constrained sequence match, LIMIT..OFFSET..BY, Wilson score
intervals, and Cohen's d effect size.

ClickHouse parity targets: the candlestick/monitoring rollup every CH
metrics deployment builds with argMin/argMax per time bucket
(`ts_ohlc_bars`), the finance VWAP aggregate (`ts_vwap` — emitted on
an exact integer micro-grid, no cross-engine float division),
week-over-week churn dashboards built on retention()/arrayJoin
(`user_churn_flags`), last-touch marketing attribution — the as-of
join pattern CH docs demo with ASOF JOIN (`attribution_last_touch`),
sequenceMatch's time-conditioned pattern `(?1)(?t<=N)(?2)`
(`sequence_match_timed`), the LIMIT n OFFSET m BY clause
(`limit_by_offset` — sibling of `limit_by`), and the A/B-testing
statistics CH ships as minSampleSize*/proportions z-machinery
(`stats_wilson_ci`, `stats_cohens_d`).

Reference mapping: the reference (backup.sh:38-45) delegates query
execution to the ClickHouse server; each key re-expresses one
server-side capability as a first-class Spark plan.

Float-determinism rules (registry docstring): doubles in checked
columns are either RAW stored values picked by integer-keyed
selection (OHLC), or derived from INTEGER moments through identical
+,-,*,/ and sqrt expression trees in both engines (Wilson, Cohen's
d — safe per the registry convention; pow/ln never appear). Window
cumsums/integer window sums CAST to BIGINT in oracles (HUGEINT
trap). Every keep-one carries a (us, event_id) total-order tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhousebackup_spark.registry import register
from clickhousebackup_spark.tables import load_table

WEEK_US = 7 * 86_400 * 1_000_000


@register(
    "ts_ohlc_bars",
    oracle="""
        WITH e AS (
            SELECT strftime(ts, '%Y-%m-%d') AS day,
                   epoch_us(ts) AS us, event_id, value
            FROM events
        ), r AS (
            SELECT day, value,
                   ROW_NUMBER() OVER (PARTITION BY day
                       ORDER BY us, event_id) AS rn_a,
                   ROW_NUMBER() OVER (PARTITION BY day
                       ORDER BY us DESC, event_id DESC) AS rn_d
            FROM e
        )
        SELECT day,
               MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
               MAX(value) AS high,
               MIN(value) AS low,
               MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM r GROUP BY day
    """,
    doc="OHLC candlestick bars per day over the events value series — "
    "ClickHouse argMin(value, ts)/argMax(value, ts) per time bucket, "
    "the monitoring/finance rollup. Open/close are RAW stored "
    "doubles picked by an integer-keyed (us, event_id) total order "
    "(selection-only — no float arithmetic crosses engines); "
    "high/low/n are plain min/max/count. Spark: both row_number "
    "directions and the aggregate share ONE day-hash exchange (the "
    "second window only re-sorts); at 100 TB the day partitioning "
    "is the natural ingest order, so the sort is near-free and the "
    "state per bucket is O(1).",
)
def ts_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.unix_micros("ts").alias("us"),
        "event_id",
        "value",
    )
    wa = Window.partitionBy("day").orderBy("us", "event_id")
    wd = Window.partitionBy("day").orderBy(
        F.col("us").desc(), F.col("event_id").desc()
    )
    r = e.select(
        "day",
        "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return r.groupBy("day").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


@register(
    "ts_vwap",
    oracle="""
        WITH e AS (
            SELECT strftime(ts, '%Y-%m-%d') AS day,
                   CAST(floor(value * CAST(event_id % 10 + 1 AS DOUBLE)
                              * 1000000.0) AS BIGINT) AS pv_micro,
                   event_id % 10 + 1 AS vol
            FROM events
        )
        SELECT day,
               CAST(SUM(pv_micro) AS BIGINT) AS pv_micro_sum,
               CAST(SUM(vol) AS BIGINT) AS vol_sum,
               CAST(SUM(pv_micro) // SUM(vol) AS BIGINT) AS vwap_micro
        FROM e GROUP BY day
    """,
    doc="Volume-weighted average price per day on an exact integer "
    "micro-grid: price = the stored value, volume = a deterministic "
    "event_id-derived lot size. price*volume is ONE identical IEEE "
    "multiply in both engines, floored to µ-units (BIGINT) before "
    "summation, and the VWAP itself is integer division of two "
    "int64 sums — no cross-engine float aggregation anywhere (the "
    "floor-grid convention). One scan, one two-phase hash aggregate "
    "on ~31 day cells; map-side partials make the exchange bytes "
    "proportional to cells, not rows — the 100 TB shape.",
)
def ts_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.floor(
            F.col("value")
            * (F.col("event_id") % 10 + 1).cast("double")
            * F.lit(1000000.0)
        )
        .cast("long")
        .alias("pv_micro"),
        (F.col("event_id") % 10 + 1).alias("vol"),
    )
    return e.groupBy("day").agg(
        F.sum("pv_micro").cast("long").alias("pv_micro_sum"),
        F.sum("vol").cast("long").alias("vol_sum"),
        F.expr("sum(pv_micro) div sum(vol)").cast("long").alias("vwap_micro"),
    )


@register(
    "user_churn_flags",
    oracle=f"""
        WITH uw AS (
            SELECT DISTINCT user_id,
                   epoch_us(ts) // {WEEK_US} AS week
            FROM events
            WHERE event_type = 'purchase' AND event_id % 7 = 0
        ), horizon AS (
            SELECT MAX(week) AS max_week FROM uw
        ), flagged AS (
            SELECT user_id, week,
                   LEAD(week) OVER (PARTITION BY user_id
                                    ORDER BY week) AS next_week
            FROM uw
        )
        SELECT f.user_id,
               CAST(COUNT(*) AS BIGINT) AS n_active_weeks,
               CAST(SUM(CASE WHEN (f.next_week IS NULL
                                   AND f.week < h.max_week)
                              OR f.next_week > f.week + 1
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_churns,
               CAST(SUM(CASE WHEN f.next_week > f.week + 1
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrections
        FROM flagged f CROSS JOIN horizon h
        GROUP BY f.user_id
    """,
    doc="Week-over-week churn/resurrection flags — the retention() "
    "dashboard CH deployments build per user: a churn is an active "
    "week with no activity the following week (including falling "
    "silent before the corpus horizon); a resurrection is a return "
    "after ≥1 silent week (every resurrection is also counted as "
    "the churn that preceded it). Activity = QUALIFYING purchases "
    "(the deterministic event_id%7 subset — dense-enough fixtures "
    "made every user active every week, flagged by the round-7 "
    "degeneracy audit; churn flags must actually fire). Weeks are "
    "epoch-µs integer "
    "division (no dialect week()/ISO divergence). Plan: distinct "
    "(user, week) grid, one lead window and the per-user aggregate "
    "REUSING the same user partitioning, plus a 1-row horizon "
    "broadcast — two exchanges over a grid that is users×weeks, "
    "already tiny relative to raw events at any scale.",
)
def user_churn_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    uw = (
        load_table(spark, sf_dir, "events")
        .filter(
            (F.col("event_type") == "purchase")
            & (F.col("event_id") % 7 == 0)
        )
        .select(
            "user_id",
            F.expr(f"unix_micros(ts) div {WEEK_US}").alias("week"),
        )
        .distinct()
    )
    horizon = uw.agg(F.max("week").alias("max_week"))
    w = Window.partitionBy("user_id").orderBy("week")
    flagged = uw.withColumn("next_week", F.lead("week").over(w))
    churn = F.when(
        (F.col("next_week").isNull() & (F.col("week") < F.col("max_week")))
        | (F.col("next_week") > F.col("week") + 1),
        1,
    ).otherwise(0)
    res = F.when(F.col("next_week") > F.col("week") + 1, 1).otherwise(0)
    return (
        flagged.join(F.broadcast(horizon))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_active_weeks"),
            F.sum(churn).cast("long").alias("n_churns"),
            F.sum(res).cast("long").alias("n_resurrections"),
        )
    )


ATTRIB_WINDOW_US = 7 * 86_400 * 1_000_000


@register(
    "attribution_last_touch",
    oracle=f"""
        WITH tagged AS (
            SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
                   struct_pack(
                       touch_us := CASE WHEN event_type IN ('click', 'view')
                                        THEN epoch_us(ts) ELSE -1 END,
                       touch_id := CASE WHEN event_type IN ('click', 'view')
                                        THEN event_id ELSE -1 END,
                       touch_type := CASE WHEN event_type IN ('click', 'view')
                                          THEN event_type ELSE 'none' END
                   ) AS touch
            FROM events
            WHERE event_type IN ('click', 'view', 'purchase')
        ), carried AS (
            SELECT user_id, event_id, event_type, us,
                   MAX(touch) OVER (
                       PARTITION BY user_id ORDER BY us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS last_touch
            FROM tagged
        )
        SELECT user_id, event_id AS purchase_id,
               CASE WHEN last_touch.touch_us >= 0
                     AND us - last_touch.touch_us <= {ATTRIB_WINDOW_US}
                    THEN last_touch.touch_id ELSE -1 END AS touch_id,
               CASE WHEN last_touch.touch_us >= 0
                     AND us - last_touch.touch_us <= {ATTRIB_WINDOW_US}
                    THEN last_touch.touch_type ELSE 'none' END AS touch_type,
               CASE WHEN last_touch.touch_us >= 0
                     AND us - last_touch.touch_us <= {ATTRIB_WINDOW_US}
                    THEN us - last_touch.touch_us ELSE -1 END AS gap_us
        FROM carried WHERE event_type = 'purchase'
    """,
    doc="Last-touch attribution: each purchase credits the latest "
    "click/view by the same user within a 7-day lookback — the CH "
    "ASOF JOIN marketing demo, expressed as the linear union+last "
    "pattern (registry as-of convention): tag touches and purchases "
    "in ONE stream, carry the running latest (touch_us, touch_id, "
    "touch_type) struct over a (user, time) window, filter to "
    "purchases. Struct max carries the whole touch row at once; "
    "touch_us leads the struct and non-touch rows carry a -1 "
    "sentinel (never NULL — engines disagree on NULL-field struct "
    "ordering), so the max IS the latest touch. One exchange, no "
    "join at all — at 100 TB "
    "this beats the join-then-filter O(touches×purchases) shape by "
    "construction. COALESCE sentinels (-1/'none') keep outputs "
    "NULL-free (nullable-int trap).",
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view", "purchase")
    )
    is_touch = F.col("event_type").isin("click", "view")
    tagged = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
        F.struct(
            F.when(is_touch, F.unix_micros("ts")).otherwise(-1).alias("touch_us"),
            F.when(is_touch, F.col("event_id")).otherwise(-1).alias("touch_id"),
            F.when(is_touch, F.col("event_type"))
            .otherwise("none")
            .alias("touch_type"),
        ).alias("touch"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = tagged.withColumn("last_touch", F.max("touch").over(w))
    ok = (F.col("last_touch.touch_us") >= 0) & (
        F.col("us") - F.col("last_touch.touch_us") <= ATTRIB_WINDOW_US
    )
    return carried.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.when(ok, F.col("last_touch.touch_id")).otherwise(-1).alias("touch_id"),
        F.when(ok, F.col("last_touch.touch_type"))
        .otherwise("none")
        .alias("touch_type"),
        F.when(ok, F.col("us") - F.col("last_touch.touch_us"))
        .otherwise(-1)
        .alias("gap_us"),
    )


SEQ_T_US = 3_600 * 1_000_000


@register(
    "sequence_match_timed",
    oracle=f"""
        WITH tagged AS (
            SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
                   CASE WHEN event_type = 'click'
                        THEN epoch_us(ts) END AS click_us
            FROM events WHERE event_type IN ('click', 'purchase')
        ), carried AS (
            SELECT user_id, event_type, us,
                   MAX(click_us) OVER (
                       PARTITION BY user_id ORDER BY us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS last_click_us
            FROM tagged
        ), gaps AS (
            SELECT user_id, us - last_click_us AS gap_us
            FROM carried
            WHERE event_type = 'purchase' AND last_click_us IS NOT NULL
        )
        SELECT u.user_id,
               CAST(COALESCE(SUM(CASE WHEN g.gap_us <= {SEQ_T_US}
                                 THEN 1 ELSE 0 END), 0) AS BIGINT)
                   AS n_matched,
               CAST(CASE WHEN COALESCE(SUM(CASE WHEN g.gap_us <= {SEQ_T_US}
                                      THEN 1 ELSE 0 END), 0) > 0
                    THEN 1 ELSE 0 END AS BIGINT) AS matched,
               CAST(COALESCE(MIN(CASE WHEN g.gap_us <= {SEQ_T_US}
                                 THEN g.gap_us END), -1) AS BIGINT)
                   AS min_gap_us
        FROM (SELECT DISTINCT user_id FROM events) u
        LEFT JOIN gaps g ON g.user_id = u.user_id
        GROUP BY u.user_id
    """,
    doc="ClickHouse sequenceMatch('(?1)(?t<=3600)(?2)') — click "
    "followed by purchase within one hour, per user: a purchase "
    "matches iff the LATEST preceding click is within the bound "
    "(any-click semantics reduce to latest-click since a nearer "
    "click can only shrink the gap). Same linear union+last window "
    "as the as-of family — one exchange, no click×purchase join; "
    "per-user outputs are match count, flag, and min matched gap "
    "with a -1 sentinel. The user spine LEFT JOIN keeps silent "
    "users in the output (count-zero rows are evidence too).",
)
def sequence_match_timed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
        F.when(F.col("event_type") == "click", F.unix_micros("ts")).alias(
            "click_us"
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    gaps = (
        tagged.withColumn("last_click_us", F.max("click_us").over(w))
        .filter(
            (F.col("event_type") == "purchase")
            & F.col("last_click_us").isNotNull()
        )
        .select("user_id", (F.col("us") - F.col("last_click_us")).alias("gap_us"))
    )
    users = ev.select("user_id").distinct()
    hit = F.when(F.col("gap_us") <= SEQ_T_US, 1).otherwise(0)
    agg = users.join(gaps, "user_id", "left").groupBy("user_id").agg(
        F.coalesce(F.sum(hit), F.lit(0)).cast("long").alias("n_matched"),
        F.coalesce(
            F.min(F.when(F.col("gap_us") <= SEQ_T_US, F.col("gap_us"))),
            F.lit(-1),
        )
        .cast("long")
        .alias("min_gap_us"),
    )
    return agg.select(
        "user_id",
        "n_matched",
        (F.col("n_matched") > 0).cast("long").alias("matched"),
        "min_gap_us",
    )


@register(
    "limit_by_offset",
    oracle="""
        WITH r AS (
            SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
            FROM events
        )
        SELECT user_id, event_id, event_type, us
        FROM r WHERE rn BETWEEN 2 AND 3
    """,
    doc="ClickHouse `LIMIT 2 OFFSET 1 BY user_id`: per user, skip the "
    "newest event and keep the next two — the pagination-per-key "
    "clause (sibling of `limit_by`, which pins OFFSET 0). One "
    "row_number window over the user partitioning with a (us, "
    "event_id) total-order tiebreak; Spark's WindowGroupLimit "
    "pushes the rn<=3 bound into the sort, so per-user state is "
    "O(offset+limit), not O(events) — the property that makes "
    "LIMIT BY usable on 100 TB event streams.",
)
def limit_by_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("us").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") >= 2) & (F.col("rn") <= 3))
        .drop("rn")
    )


@register(
    "stats_wilson_ci",
    oracle="""
        WITH c AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN value > 100.0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS k
            FROM events GROUP BY event_type
        )
        SELECT event_type, n, k,
               (CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
                + 1.9208 / CAST(n AS DOUBLE)
                - 1.96 * sqrt(((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                               * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                               + 0.9604 / CAST(n AS DOUBLE))
                              / CAST(n AS DOUBLE)))
               / (1.0 + 3.8416 / CAST(n AS DOUBLE)) AS wilson_lo,
               (CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
                + 1.9208 / CAST(n AS DOUBLE)
                + 1.96 * sqrt(((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                               * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                               + 0.9604 / CAST(n AS DOUBLE))
                              / CAST(n AS DOUBLE)))
               / (1.0 + 3.8416 / CAST(n AS DOUBLE)) AS wilson_hi
        FROM c
    """,
    doc="Wilson score 95% interval for the per-event-type conversion "
    "rate (share of events with value > 100) — the interval "
    "ClickHouse A/B tooling (minSampleSizeConversion and friends) "
    "is built around, and the one that stays honest at small n "
    "where the normal approximation lies. The checked doubles are "
    "derived ONLY from integer counts through an identical "
    "+,-,*,/,sqrt expression tree (z constants pre-folded to "
    "literals: 1.96, 1.9208=z²/2, 0.9604=z²/4·... , 3.8416=z²), so "
    "both engines walk the same IEEE sequence — the registry "
    "convention that pow/ln never cross engines but sqrt does. One "
    "5-cell aggregate: map-side combine, nothing at scale.",
)
def stats_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("value") > 100.0, 1).otherwise(0))
            .cast("long")
            .alias("k"),
        )
    )
    nd = F.col("n").cast("double")
    p = F.col("k").cast("double") / nd
    center_lo = p + F.lit(1.9208) / nd
    margin = F.lit(1.96) * F.sqrt(
        (p * (F.lit(1.0) - p) + F.lit(0.9604) / nd) / nd
    )
    denom = F.lit(1.0) + F.lit(3.8416) / nd
    return c.select(
        "event_type",
        "n",
        "k",
        ((center_lo - margin) / denom).alias("wilson_lo"),
        ((center_lo + margin) / denom).alias("wilson_hi"),
    )


@register(
    "stats_cohens_d",
    oracle="""
        WITH g AS (
            SELECT event_type,
                   CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
            FROM events WHERE event_type IN ('purchase', 'click')
        ), m AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(cents) AS BIGINT) AS s,
                   CAST(SUM(cents * cents) AS BIGINT) AS ss
            FROM g GROUP BY event_type
        )
        SELECT a.n AS n1, b.n AS n2, a.s AS s1, b.s AS s2,
               a.ss AS ss1, b.ss AS ss2,
               (CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE)
                - CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE))
               / sqrt(((CAST(a.ss AS DOUBLE)
                        - CAST(a.s AS DOUBLE) * CAST(a.s AS DOUBLE)
                          / CAST(a.n AS DOUBLE))
                       + (CAST(b.ss AS DOUBLE)
                          - CAST(b.s AS DOUBLE) * CAST(b.s AS DOUBLE)
                            / CAST(b.n AS DOUBLE)))
                      / CAST(a.n + b.n - 2 AS DOUBLE)) AS cohens_d
        FROM (SELECT * FROM m WHERE event_type = 'purchase') a
        CROSS JOIN (SELECT * FROM m WHERE event_type = 'click') b
    """,
    doc="Cohen's d effect size between purchase and click value "
    "distributions, on the exact integer cent grid: per-group "
    "moments (n, Σx, Σx²) are BIGINT-exact (cents ≤ 49k ⇒ Σx² "
    "fits int64 through sf100), and d = (m₁−m₂)/s_pooled is ONE "
    "identical double expression over those six integers — the "
    "integer-moment bridge that keeps a float statistic hash-exact "
    "cross-engine. The pinned integer columns make any engine "
    "disagreement diagnosable to the exact moment. Plan: one "
    "2-group aggregate + a 1×1 cross join.",
)
def stats_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "click"))
        .select(
            "event_type",
            F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("cents"),
        )
    )
    m = g.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).cast("long").alias("ss"),
    )
    a = m.filter(F.col("event_type") == "purchase").select(
        F.col("n").alias("n1"), F.col("s").alias("s1"), F.col("ss").alias("ss1")
    )
    b = m.filter(F.col("event_type") == "click").select(
        F.col("n").alias("n2"), F.col("s").alias("s2"), F.col("ss").alias("ss2")
    )
    j = a.join(F.broadcast(b))
    d1 = F.col("n1").cast("double")
    d2 = F.col("n2").cast("double")
    m1 = F.col("s1").cast("double") / d1
    m2 = F.col("s2").cast("double") / d2
    ssq1 = F.col("ss1").cast("double") - F.col("s1").cast("double") * F.col(
        "s1"
    ).cast("double") / d1
    ssq2 = F.col("ss2").cast("double") - F.col("s2").cast("double") * F.col(
        "s2"
    ).cast("double") / d2
    pooled = F.sqrt((ssq1 + ssq2) / (F.col("n1") + F.col("n2") - 2).cast("double"))
    return j.select(
        "n1",
        "n2",
        "s1",
        "s2",
        "ss1",
        "ss2",
        ((m1 - m2) / pooled).alias("cohens_d"),
    )
