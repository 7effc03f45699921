"""Round-6 operator additions (batch 1): sessionization,
run-length encoding, seasonality profiles, χ² contingency cells,
cohort LTV curves, dense array enumeration, human-readable
formatting, and the numbers() table source.

ClickHouse parity targets: the implicit sessionization every CH
funnel/retention deployment builds with windowFunnel + neighbor()
(`sessionize_gap`), arrayCompact's counting sibling used for
token-stream compression (`seq_rle_encode`), the dashboard
seasonality matrix (`ts_seasonality_profile`), the χ² independence
test CH ships as `theilsU`/`cramersV` cousins (`stats_chi2_cells` —
cramersV itself is already covered by `stats_cramers_v`),
cohort lifetime-value curves (`cohort_revenue_ltv`),
arrayEnumerateDense (`array_enumerate_dense`), formatReadableSize /
formatReadableQuantity (`str_format_readable`), and the `numbers()` /
`generate_series` table source (`source_numbers_range`).

Reference mapping: the reference (backup.sh:38-45) delegates all
query execution to the ClickHouse server; each key here re-expresses
one server-side capability as a first-class Spark DataFrame plan.

Family rules carried from analytics3/4: window cumsums CAST to
BIGINT in the DuckDB oracle (integer window SUMs type as HUGEINT →
pandas float64 → driver hash breakage — the round-5 lesson, enforced
by tests/test_oracle_types.py); double aggregation goes through
DECIMAL(38,6) sums of RAW stored doubles only; day-of-week is
normalized to Sunday=0 in both engines (Spark dayofweek() is
Sunday=1, DuckDB's is Sunday=0); every keep-one/rank carries a
total-order tiebreak; no per-row Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhousebackup_spark.registry import register
from clickhousebackup_spark.tables import load_table

#: Session gap threshold in microseconds (30 minutes) — the industry
#: default (GA, Amplitude, CH windowFunnel deployments all ship 30m).
SESSION_GAP_US = 30 * 60 * 1_000_000

#: THE flat per-user sessionization truth — shared verbatim by the
#: flat key and both round-12 physical rewrites (twostage,
#: adaptive, operators/analytics16.py): their whole contract is
#: hash-identical output, so the oracle string must be ONE object,
#: never a copy that can drift.
SESSIONIZE_ORACLE = f"""
        WITH e AS (
            SELECT user_id, event_id, event_type, epoch_us(ts) AS us
            FROM events
        ), f AS (
            SELECT user_id, event_id, event_type, us,
                   CASE WHEN us - LAG(us) OVER (PARTITION BY user_id
                                                ORDER BY us, event_id)
                             > {SESSION_GAP_US}
                          OR LAG(us) OVER (PARTITION BY user_id
                                           ORDER BY us, event_id) IS NULL
                        THEN 1 ELSE 0 END AS new_sess
            FROM e
        ), s AS (
            SELECT user_id, event_type, us,
                   CAST(SUM(new_sess) OVER (PARTITION BY user_id
                       ORDER BY us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS session_id
            FROM f
        )
        SELECT user_id, session_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(MIN(us) AS BIGINT) AS start_us,
               CAST(MAX(us) AS BIGINT) AS end_us,
               CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
        FROM s GROUP BY user_id, session_id
    """


@register(
    "sessionize_gap",
    oracle=SESSIONIZE_ORACLE,
    doc="30-minute-gap sessionization: the per-user session "
    "assignment every funnel/retention pipeline starts from (CH "
    "deployments build it with neighbor()/windowFunnel; GA and "
    "Amplitude bake the same 30m default in). A session boundary "
    "falls where the gap from the previous event exceeds the "
    "threshold; session ids are a per-user window cumsum over the "
    "(ts, event_id) total order, then one per-session aggregate. "
    "Two window passes + one agg REUSING the same user_id "
    "partitioning — one shuffle total; session state is O(1) per "
    "row (the lag), and at 100 TB the per-user sort is the "
    "MergeTree order CH reads for free. All outputs integer "
    "(epoch-µs bounds, counts); the cumsum is CAST BIGINT in the "
    "oracle (HUGEINT trap).",
)
def sessionize_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    new_sess = (
        F.when(
            (F.col("us") - F.lag("us").over(w) > SESSION_GAP_US)
            | F.lag("us").over(w).isNull(),
            1,
        )
        .otherwise(0)
    )
    cum = Window.partitionBy("user_id").orderBy("us", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    s = ev.withColumn("new_sess", new_sess).withColumn(
        "session_id", F.sum("new_sess").over(cum).cast("long")
    )
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min("us").cast("long").alias("start_us"),
        F.max("us").cast("long").alias("end_us"),
        F.countDistinct("event_type").cast("long").alias("n_types"),
    )


@register(
    "seq_rle_encode",
    oracle="""
        WITH e AS (
            SELECT user_id, event_id, event_type, epoch_us(ts) AS us
            FROM events
        ), p AS (
            SELECT user_id, event_type, us, event_id,
                   CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY us, event_id) AS BIGINT) AS pos,
                   CASE WHEN LAG(event_type) OVER (PARTITION BY user_id
                            ORDER BY us, event_id) IS DISTINCT FROM
                            event_type
                        THEN 1 ELSE 0 END AS new_run
            FROM e
        ), r AS (
            SELECT user_id, event_type, pos,
                   CAST(SUM(new_run) OVER (PARTITION BY user_id
                       ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS run_id
            FROM p
        )
        SELECT user_id, run_id, MIN(event_type) AS event_type,
               CAST(COUNT(*) AS BIGINT) AS run_len,
               CAST(MIN(pos) AS BIGINT) AS start_idx
        FROM r GROUP BY user_id, run_id
    """,
    doc="Run-length encoding of each user's event-type sequence "
    "(ordered by the (ts, event_id) total order): consecutive equal "
    "types collapse to (run_id, type, run_len, start_idx) — "
    "ClickHouse arrayCompact's counting sibling, and the compression "
    "pass token-stream pipelines run over repeated-token spans "
    "before packing. Boundary = lag-compare (IS DISTINCT FROM so a "
    "leading NULL type still opens run 0 identically in both "
    "engines), run ids = per-user window cumsum, then one agg on the "
    "same partitioning — one shuffle, O(1) window state. Integer "
    "outputs; cumsum CAST BIGINT (HUGEINT trap).",
)
def seq_rle_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    p = ev.select(
        "user_id",
        "event_type",
        F.row_number().over(w).cast("long").alias("pos"),
        F.when(
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
        )
        .otherwise(0)
        .alias("new_run"),
    )
    cum = Window.partitionBy("user_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = p.withColumn("run_id", F.sum("new_run").over(cum).cast("long"))
    return r.groupBy("user_id", "run_id").agg(
        F.min("event_type").alias("event_type"),
        F.count(F.lit(1)).cast("long").alias("run_len"),
        F.min("pos").cast("long").alias("start_idx"),
    )


@register(
    "ts_seasonality_profile",
    oracle="""
        SELECT event_type,
               CAST(dayofweek(ts) AS BIGINT) AS dow,
               CAST(hour(ts) AS BIGINT) AS hr,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS STRING) AS DOUBLE)
                   / COUNT(*) AS mean_value
        FROM events
        GROUP BY event_type, dayofweek(ts), hour(ts)
    """,
    doc="Seasonality profile: per (series, day-of-week, hour) event "
    "count and mean value — the weekly-rhythm matrix behind every "
    "monitoring heatmap and the seasonal-naive baseline forecasters "
    "difference against. One two-phase hash agg over at most "
    "series×7×24 groups (state is calendar-bounded, not "
    "data-bounded — the 100 TB shape). Day-of-week normalized to "
    "Sunday=0 in both engines (Spark dayofweek() is Sunday=1 → "
    "minus 1; DuckDB's is already Sunday=0); mean = order-free "
    "decimal sum of the RAW stored doubles ÷ count, divided "
    "identically as doubles in both engines.",
)
def ts_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            (F.dayofweek("ts") - 1).cast("long").alias("dow"),
            F.hour("ts").cast("long").alias("hr"),
            "value",
        )
        .groupBy("event_type", "dow", "hr")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            (
                F.sum(F.col("value").cast("decimal(38,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("mean_value"),
        )
    )


@register(
    "stats_chi2_cells",
    oracle="""
        WITH cell AS (
            SELECT event_type,
                   CAST(dayofweek(ts) AS BIGINT) AS dow,
                   CAST(COUNT(*) AS BIGINT) AS o
            FROM events GROUP BY event_type, dayofweek(ts)
        ), tot AS (
            SELECT event_type, dow, o,
                   CAST(SUM(o) OVER (PARTITION BY event_type) AS BIGINT)
                       AS r,
                   CAST(SUM(o) OVER (PARTITION BY dow) AS BIGINT) AS c,
                   CAST(SUM(o) OVER () AS BIGINT) AS n
            FROM cell
        )
        SELECT event_type, dow, o, r, c, n,
               CAST(CAST(o AS DECIMAL(38,0)) * n
                    - CAST(r AS DECIMAL(38,0)) * c AS VARCHAR) AS dev_num,
               CAST(CAST(CAST(o AS DECIMAL(38,0)) * n
                         - CAST(r AS DECIMAL(38,0)) * c AS DECIMAL(38,0))
                    AS DOUBLE)
               * CAST(CAST(CAST(o AS DECIMAL(38,0)) * n
                           - CAST(r AS DECIMAL(38,0)) * c AS DECIMAL(38,0))
                      AS DOUBLE)
               / (CAST(n AS DOUBLE) * r * c) AS chi2_contrib
        FROM tot
    """,
    doc="χ² independence-test cells for the event_type × day-of-week "
    "contingency table: observed count O, row/column/grand totals "
    "R/C/N, the exact integer deviation numerator O·N − R·C "
    "(DECIMAL(38,0), serialized as a string — it grows as N² and "
    "int64 dies near 3e9 events, the stats_mean_ci lesson), and the "
    "per-cell χ² contribution (O·N−R·C)²/(N·R·C) as ONE identical "
    "IEEE expression tree both engines evaluate on the same exact "
    "inputs. Emitting per-CELL contributions (not the summed "
    "statistic) keeps every checked double a single deterministic "
    "expression — the caller sums client-side if they want the "
    "statistic, or feeds the cells to a p-value table. One hash agg "
    "+ three windows over the CELL table (≤ types×7 rows — "
    "vocabulary-bounded, trivially safe at any event count).",
)
def stats_chi2_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    d0 = "decimal(38,0)"
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", (F.dayofweek("ts") - 1).cast("long").alias("dow")
    )
    cell = ev.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).cast("long").alias("o")
    )
    tot = cell.select(
        "event_type",
        "dow",
        "o",
        F.sum("o").over(Window.partitionBy("event_type")).cast("long").alias("r"),
        F.sum("o").over(Window.partitionBy("dow")).cast("long").alias("c"),
        F.sum("o").over(Window.partitionBy()).cast("long").alias("n"),
    )
    dev = F.col("o").cast(d0) * F.col("n") - F.col("r").cast(d0) * F.col("c")
    dev_d = dev.cast(d0).cast("double")
    return tot.select(
        "event_type",
        "dow",
        "o",
        "r",
        "c",
        "n",
        dev.cast(d0).cast("string").alias("dev_num"),
        (
            dev_d * dev_d
            / (F.col("n").cast("double") * F.col("r") * F.col("c"))
        ).alias("chi2_contrib"),
    )


@register(
    "cohort_revenue_ltv",
    oracle="""
        WITH first_m AS (
            -- cohort month as a 'YYYY-MM' STRING: pandas renders DATE
            -- and TIMESTAMP cells differently across the two engines
            -- (date vs midnight timestamp), so calendar keys are
            -- strings by repo convention (strftime day keys in
            -- windows.py).
            SELECT o_custkey,
                   strftime(date_trunc('month', MIN(o_orderdate)),
                            '%Y-%m') AS cohort_month,
                   date_trunc('month', MIN(o_orderdate)) AS cm_ts
            FROM orders GROUP BY o_custkey
        ), o AS (
            SELECT f.cohort_month,
                   (year(o.o_orderdate) * 12 + month(o.o_orderdate))
                   - (year(f.cm_ts) * 12 + month(f.cm_ts))
                       AS age_months,
                   o.o_totalprice
            FROM orders o JOIN first_m f ON o.o_custkey = f.o_custkey
        ), per AS (
            SELECT cohort_month, CAST(age_months AS BIGINT) AS age_months,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS rev_dec
            FROM o GROUP BY cohort_month, age_months
        )
        SELECT cohort_month, age_months, n_orders,
               CAST(rev_dec AS DOUBLE) AS revenue,
               CAST(SUM(rev_dec) OVER (PARTITION BY cohort_month
                   ORDER BY age_months
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS DOUBLE) AS cum_revenue
        FROM per
    """,
    doc="Cohort lifetime-value curve: customers grouped by first-"
    "order month, revenue accumulated by cohort age in months — the "
    "LTV matrix every growth dashboard draws and the retention-"
    "weighted revenue input to payback models. Cohort assignment is "
    "one customer-keyed agg broadcast back onto orders; ages are "
    "pure integer calendar arithmetic (y·12+m differences — no "
    "month-length edge cases); per-(cohort, age) revenue is an "
    "order-free DECIMAL(38,6) sum of the raw stored doubles, and the "
    "cumulative curve is a window sum over the DECIMAL (exact — "
    "decimals never HUGEINT) cast to double only at the edge. Two "
    "shuffles (customer agg, cohort-cell agg) + one window over the "
    "cohort×age cell table (calendar-bounded rows).",
)
def cohort_revenue_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    first_m = o.groupBy("o_custkey").agg(
        F.date_format(F.date_trunc("month", F.min("o_orderdate")), "yyyy-MM")
        .alias("cohort_month"),
        F.date_trunc("month", F.min("o_orderdate")).alias("cm_ts"),
    )
    joined = o.join(F.broadcast(first_m), "o_custkey").select(
        "cohort_month",
        (
            (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
            - (F.year("cm_ts") * 12 + F.month("cm_ts"))
        )
        .cast("long")
        .alias("age_months"),
        "o_totalprice",
    )
    per = joined.groupBy("cohort_month", "age_months").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("rev_dec"),
    )
    w = (
        Window.partitionBy("cohort_month")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return per.select(
        "cohort_month",
        "age_months",
        "n_orders",
        F.col("rev_dec").cast("double").alias("revenue"),
        F.sum("rev_dec").over(w).cast("double").alias("cum_revenue"),
    )


@register(
    "array_enumerate_dense",
    oracle="""
        WITH p AS (
            SELECT user_id, event_id, event_type,
                   CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY epoch_us(ts), event_id) AS BIGINT) AS pos
            FROM events
        ), fp AS (
            SELECT user_id, event_type,
                   CAST(MIN(pos) AS BIGINT) AS first_pos
            FROM p GROUP BY user_id, event_type
        )
        SELECT p.user_id, p.pos, p.event_type,
               CAST(DENSE_RANK() OVER (PARTITION BY p.user_id
                   ORDER BY fp.first_pos) AS BIGINT) AS dense_idx
        FROM p JOIN fp
          ON p.user_id = fp.user_id AND p.event_type = fp.event_type
    """,
    doc="ClickHouse arrayEnumerateDense over each user's event-type "
    "sequence: every element gets the dense index of its value in "
    "order of FIRST appearance (a,b,a,c → 1,2,1,3) — the "
    "vocabulary-interning step sequence models run before integer-"
    "encoding a stream. Rather than collecting arrays, the dense "
    "index is computed relationally: positions via one row_number "
    "window, first-appearance positions via one agg, dense_rank over "
    "first_pos joined back — all three REUSE the user_id "
    "partitioning (one shuffle; the join is user-co-partitioned). "
    "Integer outputs only.",
)
def array_enumerate_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    p = ev.select(
        "user_id",
        "event_type",
        F.row_number().over(w).cast("long").alias("pos"),
    )
    fp = p.groupBy("user_id", "event_type").agg(
        F.min("pos").cast("long").alias("first_pos")
    )
    dr = Window.partitionBy("user_id").orderBy("first_pos")
    return (
        p.join(fp, ["user_id", "event_type"])
        .select(
            "user_id",
            "pos",
            "event_type",
            F.dense_rank().over(dr).cast("long").alias("dense_idx"),
        )
    )


#: IEC units for str_format_readable — thresholds in bytes.
_IEC_UNITS = (("GiB", 1024**3), ("MiB", 1024**2), ("KiB", 1024), ("B", 1))
_SI_UNITS = (("billion", 10**9), ("million", 10**6), ("thousand", 10**3), ("", 1))


def _readable_sql(expr: str, units) -> str:
    """CASE chain: pick the largest unit ≤ value, format with exact
    integer hundredths (no float rounding anywhere)."""
    cases = []
    for name, k in units[:-1]:
        cases.append(
            f"WHEN {expr} >= {k} THEN "
            f"concat(CAST(({expr} * 100 // {k}) // 100 AS VARCHAR), '.', "
            f"lpad(CAST(({expr} * 100 // {k}) % 100 AS VARCHAR), 2, '0'), "
            f"' ', '{name}')"
        )
    last = units[-1][0]
    sep = f" ' {last}'" if last else " ''"
    return (
        "CASE "
        + " ".join(cases)
        + f" ELSE concat(CAST({expr} AS VARCHAR),{sep}) END"
    )


@register(
    "str_format_readable",
    oracle=f"""
        WITH b AS (
            SELECT doc_id, n_chars * 997 AS n_bytes, n_chars
            FROM documents
        )
        SELECT doc_id, CAST(n_bytes AS BIGINT) AS n_bytes,
               {_readable_sql("n_bytes", _IEC_UNITS)} AS readable_size,
               {_readable_sql("n_chars", _SI_UNITS)} AS readable_qty
        FROM b
    """,
    doc="ClickHouse formatReadableSize / formatReadableQuantity: "
    "human-readable '12.34 MiB' / '1.23 million' strings — rendered "
    "with PURE INTEGER arithmetic (value·100 // unit, split into "
    "whole.hundredths with lpad) so the formatted string is "
    "bit-identical in both engines: no float rounding, no printf "
    "dialect, no locale. The unit pick is a bounded CASE chain "
    "(codegen-friendly, map-only — no shuffle at all). The synthetic "
    "byte count (n_chars·997) spans B→GiB at fixture scale.",
)
def str_format_readable(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", (F.col("n_chars") * 997).cast("long").alias("n_bytes"),
        "n_chars",
    )

    def chain(expr: str, units) -> str:
        cases = []
        for name, k in units[:-1]:
            cases.append(
                f"WHEN {expr} >= {k} THEN "
                f"concat(CAST(({expr} * 100 div {k}) div 100 AS STRING), '.', "
                f"lpad(CAST(({expr} * 100 div {k}) % 100 AS STRING), 2, '0'), "
                f"' ', '{name}')"
            )
        last = units[-1][0]
        sep = f" ' {last}'" if last else " ''"
        return (
            "CASE "
            + " ".join(cases)
            + f" ELSE concat(CAST({expr} AS STRING),{sep}) END"
        )

    return d.select(
        "doc_id",
        "n_bytes",
        F.expr(chain("n_bytes", _IEC_UNITS)).alias("readable_size"),
        F.expr(chain("n_chars", _SI_UNITS)).alias("readable_qty"),
    )


@register(
    "source_numbers_range",
    oracle="""
        SELECT CAST(r.range AS BIGINT) AS number,
               CAST(r.range * r.range AS BIGINT) AS square,
               CAST(r.range % 7 AS BIGINT) AS mod7,
               strftime(DATE '2024-01-01' + INTERVAL (r.range) DAY,
                        '%Y-%m-%d') AS day
        FROM range(0, 1000) r
    """,
    doc="ClickHouse numbers(N) / generate_series as a TABLE SOURCE: "
    "1000 rows generated engine-side (Spark: spark.range — a "
    "parallelized Range scan with no input files; DuckDB: range()) "
    "with derived integer and date-spine columns. The generator "
    "backs every synthetic-spine pattern the repo uses (day spines "
    "in windows.py, probe grids in quantiles.py) — this key pins its "
    "cross-engine contract explicitly. Range scans parallelize "
    "perfectly (each task generates its slice — no I/O, no shuffle).",
)
def source_numbers_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.range(0, 1000).select(
        F.col("id").cast("long").alias("number"),
        (F.col("id") * F.col("id")).cast("long").alias("square"),
        (F.col("id") % 7).cast("long").alias("mod7"),
        F.date_format(
            F.date_add(
                F.lit("2024-01-01").cast("date"), F.col("id").cast("int")
            ),
            "yyyy-MM-dd",
        ).alias("day"),
    )


@register(
    "topk_with_others",
    oracle="""
        WITH c AS (
            SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY user_id, event_type
        ), ranked AS (
            SELECT user_id, event_type, n,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY n DESC, event_type) AS rk
            FROM c
        )
        SELECT user_id,
               CASE WHEN rk <= 3 THEN event_type ELSE 'other' END
                   AS bucket,
               CAST(SUM(n) AS BIGINT) AS n_events,
               CAST(COUNT(*) AS BIGINT) AS n_types
        FROM ranked
        GROUP BY user_id,
                 CASE WHEN rk <= 3 THEN event_type ELSE 'other' END
    """,
    doc="Top-3-plus-'other' report shape: each user's three most "
    "frequent event types keep their names, the long tail lumps "
    "into one 'other' bucket — the fixed-width breakdown every "
    "dashboard pie/stacked-bar needs (CH users build it with LIMIT "
    "BY + a union; here it is rank-then-relabel-then-reaggregate in "
    "one flow). Rank under the (count DESC, type) total order; both "
    "aggs and the window REUSE the user_id partitioning — one "
    "shuffle; output is ≤ 4 rows per user regardless of type "
    "vocabulary (the property that makes the report safe to "
    "materialize at 100 TB).",
)
def topk_with_others(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w = Window.partitionBy("user_id").orderBy(F.col("n").desc(), "event_type")
    ranked = c.withColumn("rk", F.row_number().over(w))
    return (
        ranked.withColumn(
            "bucket",
            F.when(F.col("rk") <= 3, F.col("event_type")).otherwise("other"),
        )
        .groupBy("user_id", "bucket")
        .agg(
            F.sum("n").cast("long").alias("n_events"),
            F.count(F.lit(1)).cast("long").alias("n_types"),
        )
    )


@register(
    "dq_volume_anomaly",
    oracle="""
        WITH d AS (
            SELECT event_type,
                   strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        )
        SELECT event_type, day, n,
               CAST(COALESCE(LAG(n) OVER (PARTITION BY event_type
                   ORDER BY day), 0) AS BIGINT) AS prev_n,
               CAST(n - COALESCE(LAG(n) OVER (PARTITION BY event_type
                   ORDER BY day), 0) AS BIGINT) AS delta,
               CAST(CASE WHEN LAG(n) OVER (PARTITION BY event_type
                        ORDER BY day) IS NOT NULL
                     AND abs(n - LAG(n) OVER (PARTITION BY event_type
                         ORDER BY day)) * 2
                         > LAG(n) OVER (PARTITION BY event_type
                           ORDER BY day)
                    THEN 1 ELSE 0 END AS BIGINT) AS anomaly
        FROM d
    """,
    doc="Data-quality volume anomaly flags: per (series, day) row "
    "count, the previous observed day's count, the delta, and a "
    ">50%-swing flag — the day-over-day freshness/volume check "
    "every ingestion pipeline alerts on (events_anomaly_zscore "
    "watches VALUES; this watches ROW VOLUME, the first thing that "
    "breaks when an upstream feed stalls or double-delivers). The "
    "comparison is PURE INTEGER (|Δ|·2 > prev — no percentage "
    "division, no negative integer-division dialect trap); first "
    "observed day is prev=0, flagged 0 (no baseline). One "
    "calendar-bounded agg + one lag window over the tiny cell "
    "table.",
)
def dq_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    prev = F.lag("n").over(w)
    return d.select(
        "event_type",
        "day",
        "n",
        F.coalesce(prev, F.lit(0)).cast("long").alias("prev_n"),
        (F.col("n") - F.coalesce(prev, F.lit(0))).cast("long").alias("delta"),
        F.when(
            prev.isNotNull() & (F.abs(F.col("n") - prev) * 2 > prev), 1
        )
        .otherwise(0)
        .cast("long")
        .alias("anomaly"),
    )


@register(
    "audience_overlap_jaccard",
    oracle="""
        WITH ut AS (
            SELECT DISTINCT user_id, event_type FROM events
        ), sizes AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users
            FROM ut GROUP BY event_type
        ), both_ AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   CAST(COUNT(*) AS BIGINT) AS n_both
            FROM ut a JOIN ut b
              ON a.user_id = b.user_id AND a.event_type < b.event_type
            GROUP BY a.event_type, b.event_type
        )
        SELECT j.type_a, j.type_b, sa.n_users AS n_a, sb.n_users AS n_b,
               j.n_both,
               CAST(j.n_both * 1000
                    // (sa.n_users + sb.n_users - j.n_both) AS BIGINT)
                   AS jaccard_permille
        FROM both_ j
        JOIN sizes sa ON j.type_a = sa.event_type
        JOIN sizes sb ON j.type_b = sb.event_type
    """,
    doc="Audience-overlap matrix: for every pair of event types, the "
    "user-set Jaccard overlap — the segment-overlap query behind "
    "campaign planning and feature-cannibalization analysis (CH "
    "users build it with uniqExact + arrayIntersect; here it is "
    "pure counting: |A∩B| from a user-keyed self-join of the "
    "DISTINCT (user, type) table, |A∪B| = |A|+|B|−|A∩B|). The "
    "self-join is keyed on user_id (co-partitioned, never "
    "all-pairs-of-users) and the pair space is type-vocabulary-"
    "bounded. Jaccard emitted as integer permille — no float "
    "division. Two aggs + one user-keyed join + two tiny "
    "broadcast-size lookups.",
)
def audience_overlap_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    sizes = ut.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    a, b = ut.alias("a"), ut.alias("b")
    both = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    sa = sizes.select(
        F.col("event_type").alias("type_a"), F.col("n_users").alias("n_a")
    )
    sb = sizes.select(
        F.col("event_type").alias("type_b"), F.col("n_users").alias("n_b")
    )
    return (
        both.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_both",
            F.expr(
                "CAST(n_both * 1000 div (n_a + n_b - n_both) AS LONG)"
            ).alias("jaccard_permille"),
        )
    )


@register(
    "orders_interarrival_hist",
    oracle="""
        WITH gaps AS (
            SELECT o_custkey,
                   date_diff('day',
                       LAG(o_orderdate) OVER (PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey),
                       o_orderdate) AS gap_days
            FROM orders
        ), b AS (
            SELECT CASE WHEN gap_days = 0 THEN 'same_day'
                        WHEN gap_days <= 7 THEN 'week'
                        WHEN gap_days <= 30 THEN 'month'
                        WHEN gap_days <= 90 THEN 'quarter'
                        ELSE 'longer' END AS bucket,
                   gap_days
            FROM gaps WHERE gap_days IS NOT NULL
        )
        SELECT bucket,
               CAST(COUNT(*) AS BIGINT) AS n_gaps,
               CAST(MIN(gap_days) AS BIGINT) AS min_days,
               CAST(MAX(gap_days) AS BIGINT) AS max_days,
               CAST(SUM(gap_days) AS BIGINT) AS total_days
        FROM b GROUP BY bucket
    """,
    doc="Customer inter-arrival (re-order gap) histogram: per-"
    "customer consecutive-order day gaps via one lag window under "
    "the (date, orderkey) total order, bucketed into the retention "
    "bands every repeat-purchase analysis uses (same-day / week / "
    "month / quarter / longer) — the empirical distribution behind "
    "churn-window and next-order-prediction features "
    "(orders_rfm_segments scores customers; THIS key measures the "
    "corpus-wide cadence). Integer date arithmetic only; one "
    "customer-partitioned window + one 5-cell agg.",
)
def orders_interarrival_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).alias("gap_days")
    ).filter(F.col("gap_days").isNotNull())
    b = gaps.select(
        F.when(F.col("gap_days") == 0, "same_day")
        .when(F.col("gap_days") <= 7, "week")
        .when(F.col("gap_days") <= 30, "month")
        .when(F.col("gap_days") <= 90, "quarter")
        .otherwise("longer")
        .alias("bucket"),
        "gap_days",
    )
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.min("gap_days").cast("long").alias("min_days"),
        F.max("gap_days").cast("long").alias("max_days"),
        F.sum("gap_days").cast("long").alias("total_days"),
    )


@register(
    "agg_time_decay_halflife",
    oracle="""
        WITH anchor AS (
            SELECT date_trunc('day', MAX(ts)) AS aday FROM events
        ), g AS (
            SELECT e.event_type,
                   CAST(FLOOR(e.value * 1e4) AS BIGINT) AS v4,
                   CAST(date_diff('day', date_trunc('day', e.ts), a.aday)
                        // 7 AS BIGINT) AS age_weeks
            FROM events e CROSS JOIN anchor a
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(v4 >> LEAST(age_weeks, 62)) AS BIGINT)
                   AS decayed_v4,
               CAST(SUM(v4) AS BIGINT) AS raw_v4
        FROM g GROUP BY event_type
    """,
    doc="Half-life time-decayed sum (CH exponentialTimeDecayedSum "
    "with λ = one halving per week) — recency-weighted scoring for "
    "trending/ranking feeds — made EXACTLY reproducible by keeping "
    "the decay on the integer grid: values on the 1e-4 floor grid, "
    "age bucketed in whole weeks (anchored at the dataset's max "
    "day), and the decay applied as a RIGHT SHIFT (v >> age_weeks "
    "— exactly halving per half-life, shift capped at 62). No "
    "exp()/pow() ever runs, so there is nothing to diverge between "
    "engines' libm (the float trap that keeps true exponential "
    "decay out of checked columns). One broadcast anchor + ONE "
    "two-phase hash agg; the decayed and raw sums ride the same "
    "aggregate. CH evaluates the same shape with floats and "
    "documents the equivalence for power-of-two bases.",
)
def agg_time_decay_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    anchor = ev.agg(F.date_trunc("day", F.max("ts")).alias("aday"))
    g = ev.join(F.broadcast(anchor)).select(
        "event_type",
        F.floor(F.col("value") * 1e4).cast("long").alias("v4"),
        F.expr(
            "CAST(datediff(aday, date_trunc('day', ts)) div 7 AS LONG)"
        ).alias("age_weeks"),
    )
    return g.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.expr("shiftright(v4, CAST(least(age_weeks, 62) AS INT))")
        )
        .cast("long")
        .alias("decayed_v4"),
        F.sum("v4").cast("long").alias("raw_v4"),
    )


@register(
    "session_type_affinity",
    oracle=f"""
        WITH e AS (
            SELECT user_id, event_id, event_type, epoch_us(ts) AS us
            FROM events
        ), f AS (
            SELECT user_id, event_type, us, event_id,
                   CASE WHEN us - LAG(us) OVER (PARTITION BY user_id
                                                ORDER BY us, event_id)
                             > {SESSION_GAP_US}
                          OR LAG(us) OVER (PARTITION BY user_id
                                           ORDER BY us, event_id) IS NULL
                        THEN 1 ELSE 0 END AS new_sess
            FROM e
        ), s AS (
            SELECT user_id, event_type,
                   CAST(SUM(new_sess) OVER (PARTITION BY user_id
                       ORDER BY us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS session_id
            FROM f
        ), st AS (
            SELECT DISTINCT user_id, session_id, event_type FROM s
        ), n_sess AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS total FROM (
                SELECT DISTINCT user_id, session_id FROM st)
        ), per_type AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM st GROUP BY event_type
        ), pairs AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   CAST(COUNT(*) AS BIGINT) AS n_both
            FROM st a JOIN st b
              ON a.user_id = b.user_id AND a.session_id = b.session_id
             AND a.event_type < b.event_type
            GROUP BY a.event_type, b.event_type
        )
        SELECT p.type_a, p.type_b, p.n_both,
               ta.n AS n_a, tb.n AS n_b, ns.total AS n_sessions,
               CAST(p.n_both * ns.total * 1000 // (ta.n * tb.n)
                   AS BIGINT) AS lift_permille
        FROM pairs p
        JOIN per_type ta ON p.type_a = ta.event_type
        JOIN per_type tb ON p.type_b = tb.event_type
        CROSS JOIN n_sess ns
    """,
    doc="Session-scoped type affinity (market-basket lift over "
    "SESSIONS instead of orders — the behavioral sibling of "
    "orders_market_basket): for each event-type pair, the lift "
    "P(a,b)/(P(a)·P(b)) over 30-minute sessions, computed as the "
    "exact integer n_both·N·1000 // (n_a·n_b) — no probability "
    "doubles. Sessions come from the sessionize_gap cumsum; the "
    "pair counts join on the (user, session) key (co-partitioned, "
    "never all-pairs); per-type totals and the session count "
    "broadcast. Lift > 1000‰ ⇒ types co-occur beyond independence "
    "— the signal behind next-action recommendation and funnel "
    "design. Type vocabulary bounds the output.",
)
def session_type_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    new_sess = (
        F.when(
            (F.col("us") - F.lag("us").over(w) > SESSION_GAP_US)
            | F.lag("us").over(w).isNull(),
            1,
        )
        .otherwise(0)
    )
    cum = Window.partitionBy("user_id").orderBy("us", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    st = (
        ev.withColumn("new_sess", new_sess)
        .withColumn("session_id", F.sum("new_sess").over(cum).cast("long"))
        .select("user_id", "session_id", "event_type")
        .distinct()
    )
    n_sess = st.select("user_id", "session_id").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions")
    )
    per_type = st.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    a, b = st.alias("a"), st.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.session_id") == F.col("b.session_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    ta = per_type.select(
        F.col("event_type").alias("type_a"), F.col("n").alias("n_a")
    )
    tb = per_type.select(
        F.col("event_type").alias("type_b"), F.col("n").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(ta), "type_a")
        .join(F.broadcast(tb), "type_b")
        .join(F.broadcast(n_sess))
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            "n_sessions",
            F.expr(
                "CAST(n_both * n_sessions * 1000 div (n_a * n_b) AS LONG)"
            ).alias("lift_permille"),
        )
    )


@register(
    "orders_mix_shift",
    oracle="""
        WITH m AS (
            SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m')
                       AS month,
                   o_orderpriority AS pri,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM orders GROUP BY 1, 2
        ), s AS (
            SELECT month, pri, n,
                   CAST(SUM(n) OVER (PARTITION BY month) AS BIGINT)
                       AS month_total,
                   CAST(n * 1000 // SUM(n) OVER (PARTITION BY month)
                       AS BIGINT) AS share_permille
            FROM m
        )
        SELECT month, pri, n, month_total, share_permille,
               CAST(share_permille
                    - COALESCE(LAG(share_permille) OVER (
                          PARTITION BY pri ORDER BY month), 0)
                   AS BIGINT) AS shift_permille
        FROM s
    """,
    doc="Composition mix-shift report: each order priority's share of "
    "its month (integer permille) and the month-over-month shift in "
    "that share — the 'is our mix changing or just our volume' "
    "decomposition every BI review runs (volume up + mix flat reads "
    "completely differently from volume flat + mix shifting). Two "
    "windows over the month×priority cell table (calendar-bounded): "
    "a month-partition total for shares, a priority-partition lag "
    "for shifts — shares as n·1000//total, shifts as integer "
    "differences, no float division anywhere. First observed month "
    "shifts against 0 (documented baseline).",
)
def orders_mix_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
            "month"
        ),
        F.col("o_orderpriority").alias("pri"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    wm = Window.partitionBy("month")
    s = m.select(
        "month",
        "pri",
        "n",
        F.sum("n").over(wm).cast("long").alias("month_total"),
        F.expr(
            "CAST(n * 1000 div SUM(n) OVER (PARTITION BY month) AS LONG)"
        ).alias("share_permille"),
    )
    wl = Window.partitionBy("pri").orderBy("month")
    return s.withColumn(
        "shift_permille",
        (
            F.col("share_permille")
            - F.coalesce(F.lag("share_permille").over(wl), F.lit(0))
        )
        .cast("long"),
    )
