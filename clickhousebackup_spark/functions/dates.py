"""Date/time function family (SURVEY.md §2.B).

``date_buckets`` computes all four period-key grammars of the
reference's filename scheme (`backup.sh:26-29`):
``%Y%m%d-%H%M%S`` (last), ``%Y%m%d`` (daily), ISO ``%G%V`` (weekly),
``%Y%m`` (monthly). Spark 3+ refuses week-based-year pattern letters
under the default policy, so the weekly key composes
``extract(YEAROFWEEK)`` + zero-padded ``weekofyear`` (SURVEY.md §1.2).

``date_arith`` carries the retention-window arithmetic of
`env.sh:26-29` (minutes / days / weeks·7+1 / months·31+1) as interval
literals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhousebackup_spark.registry import register
from clickhousebackup_spark.tables import load_table


@register(
    "date_buckets",
    oracle="""
        SELECT event_id,
               strftime(ts, '%Y%m%d-%H%M%S') AS key_last,
               strftime(ts, '%Y%m%d') AS key_daily,
               concat(CAST(isoyear(ts) AS VARCHAR),
                      lpad(CAST(week(ts) AS VARCHAR), 2, '0')) AS key_weekly,
               strftime(ts, '%Y%m') AS key_monthly
        FROM events
    """,
    doc="The four period keys of backup.sh:26-29; ISO week composed "
    "from YEAROFWEEK + weekofyear.",
)
def date_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    iso_week = F.concat(
        F.expr("extract(YEAROFWEEK FROM ts)").cast("string"),
        F.lpad(F.weekofyear("ts").cast("string"), 2, "0"),
    )
    return ev.select(
        "event_id",
        F.date_format("ts", "yyyyMMdd-HHmmss").alias("key_last"),
        F.date_format("ts", "yyyyMMdd").alias("key_daily"),
        iso_week.alias("key_weekly"),
        F.date_format("ts", "yyyyMM").alias("key_monthly"),
    )


@register(
    "date_arith",
    oracle="""
        SELECT event_id, ts,
               date_trunc('month', ts) AS month_start,
               date_trunc('week', ts) AS week_start,
               ts + INTERVAL 7 DAY AS keep_days_horizon,
               ts - INTERVAL 1440 MINUTE AS keep_mins_cutoff,
               ts + INTERVAL 29 DAY AS keep_weeks_horizon,
               ts + INTERVAL 187 DAY AS keep_months_horizon,
               date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS days_since_epoch0
        FROM events
    """,
    doc="date_trunc, ts ± INTERVAL with the reference's retention "
    "windows (env.sh:26-29: 1440 min, 7 d, 4·7+1 d, 6·31+1 d), datediff.",
)
def date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "ts",
        F.date_trunc("month", "ts").alias("month_start"),
        F.date_trunc("week", "ts").alias("week_start"),
        (F.col("ts") + F.expr("INTERVAL 7 DAYS")).alias("keep_days_horizon"),
        (F.col("ts") - F.expr("INTERVAL 1440 MINUTES")).alias("keep_mins_cutoff"),
        (F.col("ts") + F.expr("INTERVAL 29 DAYS")).alias("keep_weeks_horizon"),
        (F.col("ts") + F.expr("INTERVAL 187 DAYS")).alias("keep_months_horizon"),
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).cast("long").alias(
            "days_since_epoch0"
        ),
    )


@register(
    "date_bucket_custom",
    oracle="""
        SELECT to_timestamp(
                   (epoch_us(ts) // 900000000) * 900
               ) AT TIME ZONE 'UTC' AS bucket_15m,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS STRING) AS DOUBLE)
                   AS total_value
        FROM events
        GROUP BY bucket_15m
    """,
    doc="toStartOfInterval(ts, INTERVAL 15 MINUTE) — arbitrary-"
    "interval time bucketing beyond the named calendar functions "
    "(date_buckets covers hour/day/ISO-week/month): FLOOR-divide the "
    "epoch MICROSECOND count to the interval — pure integer "
    "arithmetic (subtract pmod, then divide), so bucket edges are "
    "bit-identical across engines and immune to timezone/DST "
    "arithmetic (the reason ClickHouse implements it the same way). "
    "Floor (not truncate-toward-zero `div`) matters for pre-epoch "
    "timestamps: DuckDB's `//` floors, so negative unix_micros would "
    "otherwise land one interval apart (ADVICE r4 fix). One "
    "two-phase hash agg on the derived bucket; at 100 TB this is the "
    "pre-aggregation feeding rollup_time_hierarchy's hour level.",
)
def date_bucket_custom(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bucket = F.timestamp_seconds(
        F.expr(
            "(unix_micros(ts) - pmod(unix_micros(ts), 900000000))"
            " div 900000000"
        )
        * 900
    )
    return ev.groupBy(bucket.alias("bucket_15m")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("value").cast("decimal(38,6)"))
        .cast("double")
        .alias("total_value"),
    )


@register(
    "date_timezone_convert",
    oracle="""
        SELECT event_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS utc_wall,
               strftime(ts - INTERVAL 5 HOUR, '%Y-%m-%d %H:%M:%S')
                   AS ny_wall,
               strftime(ts + INTERVAL 9 HOUR, '%Y-%m-%d %H:%M:%S')
                   AS tokyo_wall,
               CAST(hour(ts - INTERVAL 5 HOUR) AS BIGINT) AS ny_hour,
               CAST(CASE WHEN strftime(ts + INTERVAL 9 HOUR, '%Y-%m-%d')
                              <> strftime(ts, '%Y-%m-%d')
                    THEN 1 ELSE 0 END AS BIGINT) AS tokyo_next_day
        FROM events
    """,
    doc="Timezone conversion (ClickHouse toTimeZone): UTC event "
    "times rendered as America/New_York and Asia/Tokyo wall clocks, "
    "with the hour and the date-line rollover flag. The Spark side "
    "runs the REAL tzdb path (from_utc_timestamp); the oracle pins "
    "the expected walls as fixed interval arithmetic because the "
    "January-2024 fixture sits entirely in EST (UTC-5, no DST "
    "transition) and JST is offset-constant — so the gate verifies "
    "Spark's tz machinery against the known answer rather than "
    "trusting two tzdb copies to agree on arbitrary dates. Wall "
    "clocks emitted as STRINGS (date-through-pandas trap). "
    "Map-only at any scale.",
)
def date_timezone_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ny = F.from_utc_timestamp("ts", "America/New_York")
    tk = F.from_utc_timestamp("ts", "Asia/Tokyo")
    fmt = "yyyy-MM-dd HH:mm:ss"
    return ev.select(
        "event_id",
        F.date_format("ts", fmt).alias("utc_wall"),
        F.date_format(ny, fmt).alias("ny_wall"),
        F.date_format(tk, fmt).alias("tokyo_wall"),
        F.hour(ny).cast("long").alias("ny_hour"),
        F.when(
            F.date_format(tk, "yyyy-MM-dd") != F.date_format("ts", "yyyy-MM-dd"),
            1,
        )
        .otherwise(0)
        .cast("long")
        .alias("tokyo_next_day"),
    )
