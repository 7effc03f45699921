"""Window-function operators (SURVEY.md §2.B "Window functions").

``win_keep_newest`` is the reference's keep-newest-per-period
semantics (`backup.sh:90-97`: re-running within a period hardlinks
over — newest snapshot wins per (db, period)).

Scale notes: window functions shuffle on their partition keys; every
window here partitions on a real key (user_id / custkey / segment) so
parallelism survives scale-up — no global unpartitioned windows except
``sort_multi``'s explicitly-documented rank (see sorts.py). Frames use
epoch-µs longs for range windows so both engines see identical
ordering values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhousebackup_spark.exprs import DEC
from clickhousebackup_spark.registry import register
from clickhousebackup_spark.tables import load_table, parallelize


@register(
    "win_keep_newest",
    oracle="""
        SELECT user_id, day, event_id, ts
        FROM (
            SELECT user_id, strftime(ts, '%Y%m%d') AS day, event_id, ts,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id, strftime(ts, '%Y%m%d')
                       ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    doc="Keep-newest-per-period (backup.sh:90-97 `ln -f` overwrite): "
    "row_number over (user, day) desc with event_id tiebreak.",
)
def win_keep_newest(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Keyed fan-out of the single-row-group fixture scan: hash on
    # user_id (a subset of the window's partition keys) satisfies the
    # window's clustering, so the plan keeps exactly one exchange —
    # now BELOW the scan instead of above the 1-task date_format +
    # sort work (0.79 s → 0.42 s at sf0.1). No-op at production file
    # counts (tables.parallelize).
    ev = parallelize(
        load_table(spark, sf_dir, "events"), by=("user_id",)
    ).withColumn("day", F.date_format("ts", "yyyyMMdd"))
    w = Window.partitionBy("user_id", "day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "day", "event_id", "ts")
    )


#: Shared between win_rank_dense (flat per-customer rank window) and
#: win_rank_dense_twostage (skew-immune value-bucket rewrite,
#: analytics17): hash-identical output contract, ONE oracle object —
#: same convention as RUNNING_SUM_ORACLE / FUNNEL_ORACLE. Note the
#: ORDER BY carries the unique o_orderkey tiebreak, so every ordering
#: tuple is distinct and RANK = DENSE_RANK = ROW_NUMBER by definition;
#: both engines and both plan shapes agree on that total order.
RANK_DENSE_ORACLE = """
        SELECT o_custkey, o_orderkey, o_totalprice,
               RANK() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
               DENSE_RANK() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS drnk
        FROM orders
"""


@register(
    "win_rank_dense",
    oracle=RANK_DENSE_ORACLE,
    doc="rank + dense_rank of order totals per customer.",
)
def win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
    )


@register(
    "win_lag_lead",
    oracle="""
        SELECT event_id, user_id, ts,
               LAG(ts) OVER w AS prev_ts,
               LEAD(ts) OVER w AS next_ts,
               epoch_us(ts) - epoch_us(LAG(ts) OVER w) AS gap_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="Previous/next event per user; gap in integer µs (epoch-µs "
    "longs, not float seconds, for cross-engine equality).",
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        prev.alias("prev_ts"),
        F.lead("ts").over(w).alias("next_ts"),
        (F.unix_micros(F.col("ts")) - F.unix_micros(prev)).alias("gap_us"),
    )


#: Shared between win_running_sum (flat per-customer prefix sum) and
#: win_running_sum_twostage (skew-immune rewrite, analytics16): the
#: two keys promise hash-identical output, so the oracle is ONE object
#: — same convention as FUNNEL_ORACLE / PATH_TRANSITIONS_ORACLE.
RUNNING_SUM_ORACLE = """
        SELECT o_custkey, o_orderkey, o_orderdate,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS running_total
        FROM orders
"""


@register(
    "win_running_sum",
    oracle=RUNNING_SUM_ORACLE,
    doc="Running revenue per customer (rowsBetween frame); decimal "
    "running sum so every prefix is exact in both engines.",
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias(
            "running_total"
        ),
    )


#: Shared between win_sliding_avg (flat per-user 1-hour range frame)
#: and win_sliding_avg_twostage (skew-immune rewrite, analytics19):
#: the two keys promise hash-identical output, so the oracle is ONE
#: object — same convention as RUNNING_SUM_ORACLE above.
SLIDING_AVG_ORACLE = """
        SELECT event_id, user_id, ts,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE)
                   / COUNT(value) OVER w AS moving_avg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""


@register(
    "win_sliding_avg",
    oracle=SLIDING_AVG_ORACLE,
    doc="Moving average per user over a 1-hour range frame keyed on "
    "epoch-µs; avg = exact decimal sum / count.",
)
def win_sliding_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros("ts")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        (
            F.sum(F.col("value").cast(DEC)).over(w).cast("double")
            / F.count("value").over(w)
        ).alias("moving_avg"),
    )


#: ONE oracle object shared by the flat key and its two-stage sibling
#: (operators/analytics17.py) — the skew-playbook convention.
NTILE_FIRSTLAST_ORACLE = """
        SELECT o_orderkey, o_orderstatus, o_totalprice,
               NTILE(4) OVER w AS quartile,
               FIRST_VALUE(o_orderkey) OVER w AS top_orderkey,
               LAST_VALUE(o_orderkey) OVER (
                   PARTITION BY o_orderstatus
                   ORDER BY o_totalprice DESC, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS bottom_orderkey
        FROM orders
        WINDOW w AS (PARTITION BY o_orderstatus
                     ORDER BY o_totalprice DESC, o_orderkey)
"""


@register(
    "win_ntile_firstlast",
    oracle=NTILE_FIRSTLAST_ORACLE,
    doc="ntile(4) + first/last value with an explicit full frame "
    "(default frame would make last_value = current row).",
)
def win_ntile_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    order = [F.col("o_totalprice").desc(), F.col("o_orderkey")]
    w = Window.partitionBy("o_orderstatus").orderBy(*order)
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.first("o_orderkey").over(w).alias("top_orderkey"),
        F.last("o_orderkey").over(w_full).alias("bottom_orderkey"),
    )


@register(
    "win_range_frame",
    oracle="""
        SELECT event_id, user_id,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts)
                   RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS sum_last_hour
        FROM events
    """,
    doc="Time-RANGE window frame: per event, the same user's value sum "
    "over the trailing hour — ordered by epoch-µs so the frame bound "
    "is engine-agnostic arithmetic, decimal-summed so partition order "
    "can't wobble the double. The rows-vs-range distinction matters: "
    "a ROWS frame counts rows, this counts TIME.",
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(38,6)"))
        .over(w)
        .cast("double")
        .alias("sum_last_hour"),
    )


@register(
    "date_fill_forward",
    oracle="""
        WITH span AS (
            SELECT min(date_trunc('day', ts)) AS d0,
                   max(date_trunc('day', ts)) AS d1
            FROM events
        ), days AS (
            SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
            FROM span
        ), users AS (
            SELECT DISTINCT user_id FROM events WHERE user_id % 7 = 0
        ), daily AS (
            SELECT user_id, date_trunc('day', ts) AS day,
                   CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS STRING) AS DOUBLE) AS day_value
            FROM events WHERE user_id % 7 = 0
            GROUP BY user_id, day
        )
        SELECT u.user_id, d.day,
               last_value(dd.day_value IGNORE NULLS) OVER (
                   PARTITION BY u.user_id ORDER BY d.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS filled_value
        FROM users u
        CROSS JOIN days d
        LEFT JOIN daily dd ON dd.user_id = u.user_id AND dd.day = d.day
    """,
    doc="Time-series gap fill (the ClickHouse ORDER BY ... WITH FILL "
    "analog): densify each user's daily value series over the corpus's "
    "full day span and forward-fill missing days with the last "
    "observed value (null until first observation). The dense day "
    "spine comes from a broadcast 1-row (min,max) aggregate + "
    "sequence — never a driver-side date loop; the fill is one "
    "last(ignorenulls) window per user partition. Users subsampled "
    "(user_id % 7 = 0) to keep the densified fixture output bounded; "
    "at scale the spine join is a broadcast of a few thousand days "
    "against the user dimension.",
)
def date_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 7 == 0)
    span = ev.agg(
        F.min(F.date_trunc("day", "ts")).alias("d0"),
        F.max(F.date_trunc("day", "ts")).alias("d1"),
    )
    days = span.select(
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    users = ev.select("user_id").distinct()
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(F.col("value").cast(DEC)).cast("double").alias("day_value"))
    spine = users.crossJoin(F.broadcast(days))
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .withColumn("filled_value", F.last("day_value", ignorenulls=True).over(w))
        .select("user_id", "day", "filled_value")
    )


@register(
    "date_fill_interpolate",
    oracle="""
        WITH span AS (
            SELECT min(date_trunc('day', ts)) AS d0,
                   max(date_trunc('day', ts)) AS d1
            FROM events
        ), days AS (
            SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
            FROM span
        ), users AS (
            SELECT DISTINCT user_id FROM events WHERE user_id % 7 = 0
        ), daily AS (
            SELECT user_id, date_trunc('day', ts) AS day,
                   CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS STRING) AS DOUBLE) AS day_value
            FROM events WHERE user_id % 7 = 0
            GROUP BY user_id, day
        ), dense AS (
            SELECT u.user_id, d.day, dd.day_value,
                   last_value(dd.day_value IGNORE NULLS) OVER (
                       PARTITION BY u.user_id ORDER BY d.day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS prev_val,
                   last_value(CASE WHEN dd.day_value IS NOT NULL
                                   THEN d.day END IGNORE NULLS) OVER (
                       PARTITION BY u.user_id ORDER BY d.day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS prev_day,
                   first_value(dd.day_value IGNORE NULLS) OVER (
                       PARTITION BY u.user_id ORDER BY d.day
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                       AS next_val,
                   first_value(CASE WHEN dd.day_value IS NOT NULL
                                    THEN d.day END IGNORE NULLS) OVER (
                       PARTITION BY u.user_id ORDER BY d.day
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                       AS next_day
            FROM users u
            CROSS JOIN days d
            LEFT JOIN daily dd ON dd.user_id = u.user_id AND dd.day = d.day
        )
        SELECT user_id, day,
               CASE WHEN day_value IS NOT NULL THEN day_value
                    WHEN prev_val IS NULL THEN NULL
                    WHEN next_val IS NULL THEN prev_val
                    ELSE prev_val + (next_val - prev_val)
                         * (CAST(datediff('day', prev_day, day) AS DOUBLE)
                            / CAST(datediff('day', prev_day, next_day)
                                   AS DOUBLE))
               END AS filled_value
        FROM dense
    """,
    doc="WITH FILL INTERPOLATE analog: densify each user's daily "
    "series and LINEARLY interpolate interior gaps between the "
    "previous and next observation ((next-prev) scaled by the day "
    "fraction — identical IEEE expression order in both engines); "
    "holds the last value after the final observation and stays NULL "
    "before the first. Two symmetric ignore-nulls windows over one "
    "user partition — same single-shuffle shape as "
    "date_fill_forward, just a backward pass added.",
)
def date_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 7 == 0)
    span = ev.agg(
        F.min(F.date_trunc("day", "ts")).alias("d0"),
        F.max(F.date_trunc("day", "ts")).alias("d1"),
    )
    days = span.select(
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    users = ev.select("user_id").distinct()
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(F.col("value").cast(DEC)).cast("double").alias("day_value"))
    spine = users.crossJoin(F.broadcast(days))
    back = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("day_value").isNotNull(), F.col("day"))
    dense = (
        spine.join(daily, ["user_id", "day"], "left")
        .withColumn("prev_val", F.last("day_value", ignorenulls=True).over(back))
        .withColumn("prev_day", F.last(obs_day, ignorenulls=True).over(back))
        .withColumn("next_val", F.first("day_value", ignorenulls=True).over(fwd))
        .withColumn("next_day", F.first(obs_day, ignorenulls=True).over(fwd))
    )
    frac = F.datediff(F.col("day"), F.col("prev_day")).cast("double") / F.datediff(
        F.col("next_day"), F.col("prev_day")
    ).cast("double")
    filled = (
        F.when(F.col("day_value").isNotNull(), F.col("day_value"))
        .when(F.col("prev_val").isNull(), F.lit(None).cast("double"))
        .when(F.col("next_val").isNull(), F.col("prev_val"))
        .otherwise(
            F.col("prev_val") + (F.col("next_val") - F.col("prev_val")) * frac
        )
    )
    return dense.select("user_id", "day", filled.alias("filled_value"))


@register(
    "win_moving_median",
    oracle="""
        SELECT event_id, user_id,
               median(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS med5
        FROM events
    """,
    doc="Centered 5-row moving median per user (the robust smoother "
    "windowed mean can't give you): Spark has no median window "
    "aggregate, so the frame is materialized as a sorted 5-element "
    "array (bounded by the FRAME, not the data — safe at any scale) "
    "and the median read out positionally, averaging the two middles "
    "for even edge frames exactly as DuckDB's median() interpolates. "
    "One window exchange on user_id.",
)
def win_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, 2)
    )
    frame = F.sort_array(F.collect_list("value").over(w))
    n = F.size(frame)
    mid_hi = F.element_at(frame, (n / 2 + 1).cast("int"))
    mid_lo = F.element_at(frame, (n / 2).cast("int"))
    med = F.when(n % 2 == 1, F.element_at(frame, ((n + 1) / 2).cast("int"))).otherwise(
        (mid_lo + mid_hi) / 2
    )
    return ev.select("event_id", "user_id", med.alias("med5"))


#: ONE oracle object shared by the flat key and its two-stage sibling
#: (operators/analytics17.py) — the skew-playbook convention.
CUME_DIST_NTH_ORACLE = """
        SELECT event_id, event_type, value,
               cume_dist() OVER (
                   PARTITION BY event_type ORDER BY value) AS cd,
               nth_value(event_id, 2) OVER (
                   PARTITION BY event_type
                   ORDER BY value, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING
                        AND UNBOUNDED FOLLOWING) AS second_event_id
        FROM events
"""


@register(
    "win_cume_dist_nth",
    oracle=CUME_DIST_NTH_ORACLE,
    doc="cume_dist + nth_value complete the rank-function family "
    "(next to rank/dense_rank/ntile/percent_rank already covered): "
    "cume_dist is tie-aware (depends only on the value column, so "
    "ties can't wobble the hash), and nth_value(2) runs over an "
    "EXPLICIT full-partition frame ordered by the (value, event_id) "
    "total order — Spark and DuckDB default nth_value frames differ "
    "(running vs full), so the frame is always spelled out. One "
    "shuffle on event_type; both functions are O(1) state after the "
    "per-group sort.",
)
def win_cume_dist_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w_cd = Window.partitionBy("event_type").orderBy("value")
    w_nth = (
        Window.partitionBy("event_type")
        .orderBy("value", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "event_id",
        "event_type",
        "value",
        F.cume_dist().over(w_cd).alias("cd"),
        F.nth_value("event_id", 2).over(w_nth).alias("second_event_id"),
    )


@register(
    "win_ratio_to_report",
    oracle="""
        WITH tot AS (
            SELECT event_id, event_type, value,
                   CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (
                       PARTITION BY event_type) AS DOUBLE) AS type_total
            FROM events
        )
        SELECT event_id, event_type, value,
               value / type_total AS share
        FROM tot
    """,
    doc="ratio_to_report / percent-of-total: each event's share of "
    "its type's total value — the window denominator everyone "
    "writes as a self-join-with-aggregate before learning windows. "
    "One unordered window (no sort — a partition-total frame "
    "compiles to a single hash-style window pass), one shuffle on "
    "event_type. Float discipline: the denominator is a "
    "DECIMAL-exact sum cast to double (order-free), and the share "
    "is ONE IEEE division of identical operands per row — never a "
    "sum of computed doubles.",
)
def win_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type")
    total = F.sum(F.col("value").cast("decimal(38,6)")).over(w).cast("double")
    return ev.select(
        "event_id",
        "event_type",
        "value",
        (F.col("value") / total).alias("share"),
    )
