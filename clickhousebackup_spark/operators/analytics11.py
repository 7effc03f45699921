"""Round-9 operator batch 5: Brown-Forsythe variance homogeneity,
Wald-Wolfowitz runs test, MATTR lexical diversity, and business-day
latency arithmetic.

Reference anchor: the reference (backup.sh:45) delegates every query
to ClickHouse; these map the next ClickHouse analytics ring —
levene-style robust spread comparison and randomness testing on
restored metric tables (the ``welchTTest``/``mannWhitneyUTest``
family's neighbors), the lexical-diversity score corpus curators run
beside ``text_quality_score``, and the weekday arithmetic
(``toDayOfWeek``-based) behind every SLA latency report.

Float discipline: per the registry conventions — exact integer/
decimal state wherever a sum crosses rows, explicit left-to-right
folds where a double reduction is order-sensitive, floor-micro grid
for ln/ratio outputs, raw IEEE for +,-,*,/,sqrt chains on
deterministic doubles, and NULL guards mirrored in both engines for
degenerate denominators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhousebackup_spark.exprs import DEC, gsum_dec, ogsum_dec
from clickhousebackup_spark.registry import register
from clickhousebackup_spark.tables import load_table, parallelize


def _micro(col):
    return F.floor(F.lit(1000000.0) * col).cast("long")


@register(
    "stats_levene_bf",
    oracle=f"""
        WITH ranked AS (
            SELECT event_type, value,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                       ORDER BY value, event_id) AS rn,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM events
        ), med AS (
            SELECT event_type,
                   MAX(CASE WHEN rn = (n + 1) // 2 THEN value END)
                       AS med
            FROM ranked GROUP BY event_type
        ), dev AS (
            SELECT e.event_type, abs(e.value - m.med) AS dv
            FROM events e JOIN med m ON e.event_type = m.event_type
        ), g AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_g,
                   {ogsum_dec('dv')} AS s1d,
                   {ogsum_dec('dv * dv')} AS s2d
            FROM dev GROUP BY event_type
        ), t AS (
            SELECT CAST(SUM(n_g) AS BIGINT) AS n,
                   CAST(COUNT(*) AS BIGINT) AS k,
                   (CAST(CAST(SUM(s1d) AS VARCHAR) AS DOUBLE)
                    / 1000000.0) AS s1,
                   (CAST(CAST(SUM(s2d) AS VARCHAR) AS DOUBLE)
                    / 1000000.0) AS s2,
                   list_reduce(
                       list_prepend(CAST(0 AS DOUBLE),
                           list((CAST(CAST(s1d AS VARCHAR) AS DOUBLE)
                                 / 1000000.0)
                                * (CAST(CAST(s1d AS VARCHAR) AS DOUBLE)
                                   / 1000000.0)
                                / CAST(n_g AS DOUBLE)
                                ORDER BY event_type)),
                       (a, b) -> a + b) AS ssb_raw
            FROM g
        )
        SELECT n, k,
               ssb_raw - s1 * s1 / CAST(n AS DOUBLE) AS ss_between,
               s2 - ssb_raw AS ss_within,
               CASE WHEN s2 - ssb_raw > CAST(0 AS DOUBLE) THEN
                   ((ssb_raw - s1 * s1 / CAST(n AS DOUBLE))
                        / CAST(k - 1 AS DOUBLE))
                   / ((s2 - ssb_raw) / CAST(n - k AS DOUBLE))
               END AS f_bf
        FROM t
    """,
    doc="Brown-Forsythe robust variance-homogeneity test across event "
    "types (the median-centered Levene variant — what ClickHouse "
    "users pair with analysisOfVariance when normality is doubtful): "
    "one-way ANOVA F on |x - median_g|. The group median is the "
    "LOWER order statistic rn = (n+1)//2 (an exact input value, no "
    "interpolation — value-identical in both engines), picked via "
    "the agg_percentile_exact window pattern; deviations are exact "
    "IEEE |x - med|; the downstream moment/fold discipline is "
    "stats_anova_oneway's verbatim (round-14: exact exprs.gsum_dec "
    "floor-grid sums rendered to double through a VARCHAR, sorted "
    "left-to-right SSB fold, SSW NULL guard). Plan: one partitioned "
    "rank window + 5-row median broadcast join + one moment agg; at "
    "100 TB the rank window would move to the value-histogram "
    "two-pass grain (stats_mannwhitney_u's plan), unchanged "
    "semantics.",
)
def stats_levene_bf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = e.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    med = ranked.groupBy("event_type").agg(
        F.max(
            F.when(
                F.col("rn")
                == F.floor((F.col("n") + 1) / F.lit(2.0)).cast("long"),
                F.col("value"),
            )
        ).alias("med")
    )
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("med")).alias("dv")
    )
    dv = F.col("dv")
    g = dev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        gsum_dec(dv).alias("s1d"),
        gsum_dec(dv * dv).alias("s2d"),
    )
    mio = F.lit(1000000.0)
    s1d_dbl = F.col("s1d").cast("string").cast("double") / mio
    t = g.agg(
        F.sum("n_g").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        (F.sum("s1d").cast("string").cast("double") / mio).alias("s1"),
        (F.sum("s2d").cast("string").cast("double") / mio).alias("s2"),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("event_type"),
                        (
                            s1d_dbl * s1d_dbl / F.col("n_g").cast("double")
                        ).alias("term"),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["term"],
        ).alias("ssb_raw"),
    )
    n_d = F.col("n").cast("double")
    ssb = F.col("ssb_raw") - F.col("s1") * F.col("s1") / n_d
    ssw = F.col("s2") - F.col("ssb_raw")
    f_bf = (ssb / (F.col("k") - F.lit(1)).cast("double")) / (
        ssw / (F.col("n") - F.col("k")).cast("double")
    )
    return t.select(
        "n",
        "k",
        ssb.alias("ss_between"),
        ssw.alias("ss_within"),
        F.when(ssw > F.lit(0.0), f_bf).alias("f_bf"),
    )


@register(
    "stats_runs_test",
    oracle="""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS STRING) AS DOUBLE)
                       / COUNT(*) AS z
            FROM events GROUP BY event_type, day
        ), series AS (
            SELECT event_type, list(z ORDER BY day) AS s,
                   CAST(COUNT(*) AS BIGINT) AS n_days
            FROM daily GROUP BY event_type
        ), mom AS (
            SELECT event_type, s, n_days,
                   list_reduce(s, (a, b) -> a + b)
                       / CAST(n_days AS DOUBLE) AS mu
            FROM series
        ), signs AS (
            SELECT event_type, n_days,
                   list_transform(s, z -> CASE WHEN z > mu
                       THEN 1 ELSE 0 END) AS sg
            FROM mom
        ), counts AS (
            SELECT event_type, n_days,
                   CAST(list_sum(sg) AS BIGINT) AS n_above,
                   CAST(n_days - list_sum(sg) AS BIGINT) AS n_below,
                   CAST(1 + list_sum(list_transform(
                       generate_series(1, len(sg) - 1),
                       i -> CASE WHEN sg[i] <> sg[i + 1]
                            THEN 1 ELSE 0 END)) AS BIGINT) AS n_runs
            FROM signs
        )
        SELECT event_type, n_days, n_above, n_below, n_runs,
               CASE WHEN n_above > 0 AND n_below > 0
                    AND n_above + n_below > 1 THEN
                   (CAST(n_runs AS DOUBLE)
                    - (CAST(1 AS DOUBLE)
                       + CAST(2 AS DOUBLE) * n_above * n_below
                         / CAST(n_above + n_below AS DOUBLE)))
                   / sqrt(CAST(2 AS DOUBLE) * n_above * n_below
                          * (CAST(2 AS DOUBLE) * n_above * n_below
                             - n_above - n_below)
                          / (CAST(n_above + n_below AS DOUBLE)
                             * CAST(n_above + n_below AS DOUBLE)
                             * CAST(n_above + n_below - 1 AS DOUBLE)))
               END AS z_runs
        FROM counts
    """,
    doc="Wald-Wolfowitz runs test for randomness of each event type's "
    "daily-mean series around its mean — the sequential-independence "
    "audit behind 'is this metric drifting or just noisy' (pairs "
    "with ts_cusum_alarm; a low run count = positive autocorrelation "
    "= drift). The mean is a left-to-right fold over the day-sorted "
    "array (DuckDB list_reduce's first-element init equals Spark's "
    "0.0-init aggregate because 0+x is exact); above/below signs, "
    "run count (1 + adjacent-sign transitions) and the n1/n2 counts "
    "are exact integers; the normal-approximation z rides pure IEEE "
    "with a NULL guard when either side is empty. Series length is "
    "calendar-bounded; the data-scale work is one daily hash agg.",
)
def stats_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        (
            F.sum(F.col("value").cast(DEC)).cast("double")
            / F.count(F.lit(1))
        ).alias("z")
    )
    series = daily.groupBy("event_type").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("day"), F.col("z")))
            ),
            lambda st: st["z"],
        ).alias("s"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    mu = F.aggregate(
        F.col("s"), F.lit(0.0), lambda a, b: a + b
    ) / F.col("n_days").cast("double")
    signs = series.select(
        "event_type",
        "n_days",
        F.transform(
            "s",
            lambda z: F.when(z > mu, F.lit(1)).otherwise(F.lit(0)),
        ).alias("sg"),
    )
    sg = F.col("sg")
    transitions = F.aggregate(
        F.zip_with(
            F.slice(sg, 1, F.size(sg) - 1),
            F.slice(sg, 2, F.size(sg) - 1),
            lambda a, b: F.when(a != b, F.lit(1)).otherwise(F.lit(0)),
        ),
        F.lit(0),
        lambda a, b: a + b,
    )
    counts = signs.select(
        "event_type",
        "n_days",
        F.aggregate(sg, F.lit(0), lambda a, b: a + b)
        .cast("long")
        .alias("n_above"),
        (
            F.col("n_days")
            - F.aggregate(sg, F.lit(0), lambda a, b: a + b)
        )
        .cast("long")
        .alias("n_below"),
        (F.lit(1) + transitions).cast("long").alias("n_runs"),
    )
    na = F.col("n_above").cast("double")
    nb = F.col("n_below").cast("double")
    ntot = na + nb
    e_runs = F.lit(1.0) + F.lit(2.0) * na * nb / ntot
    var_runs = (
        F.lit(2.0)
        * na
        * nb
        * (F.lit(2.0) * na * nb - na - nb)
        / (ntot * ntot * (ntot - F.lit(1.0)))
    )
    z_runs = (F.col("n_runs").cast("double") - e_runs) / F.sqrt(var_runs)
    return counts.select(
        "event_type",
        "n_days",
        "n_above",
        "n_below",
        "n_runs",
        F.when(
            (F.col("n_above") > 0)
            & (F.col("n_below") > 0)
            & (F.col("n_above") + F.col("n_below") > 1),
            z_runs,
        ).alias("z_runs"),
    )


#: MATTR window length (tokens); docs shorter than this use one
#: whole-doc window (win = least(W, n)).
_MATTR_W = 25


@register(
    "text_mattr_diversity",
    oracle=f"""
        WITH toks AS (
            SELECT lang,
                   list_filter(string_split_regex(lower(text), '\\s+'),
                               x -> x <> '') AS ws
            FROM documents
        ), per_doc AS (
            SELECT lang, len(ws) AS n_tok,
                   least({_MATTR_W}, len(ws)) AS win,
                   len(ws) - least({_MATTR_W}, len(ws)) + 1 AS n_win,
                   list_sum(list_transform(
                       generate_series(1, len(ws)
                           - least({_MATTR_W}, len(ws)) + 1),
                       i -> len(list_distinct(list_slice(ws, i,
                           i + least({_MATTR_W}, len(ws)) - 1)))))
                       AS sum_distinct
            FROM toks WHERE len(ws) > 0
        ), scored AS (
            SELECT lang, n_tok, n_win, sum_distinct,
                   CAST(sum_distinct AS DOUBLE)
                       / (CAST(win AS DOUBLE) * CAST(n_win AS DOUBLE))
                       AS mattr
            FROM per_doc
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
               CAST(SUM(CAST(sum_distinct AS BIGINT)) AS BIGINT)
                   AS sum_distinct,
               CAST(FLOOR(CAST(1000000 AS DOUBLE)
                   * CAST(SUM(CAST(mattr AS DECIMAL(38,12))) AS DOUBLE)
                   / COUNT(*)) AS BIGINT) AS mean_mattr_micro
        FROM scored GROUP BY lang
    """,
    doc="Moving-average type-token ratio (MATTR, window 25) per "
    "language — the length-robust lexical-diversity score corpus "
    "curators use where raw TTR is length-biased (Covington & "
    "McFall): mean over all windows of distinct-tokens/window-size, "
    "short docs degrading to whole-doc TTR. Window distinct counts "
    "and their per-doc sums are exact integers built IN-ROW "
    "(doc-length-bounded arrays, no shuffle); the per-doc ratio is "
    "pure IEEE; the cross-doc mean crosses DECIMAL(38,12) (order-"
    "free) and lands on the floor-micro grid. Tokenization matches "
    "text_top_terms. Plan: per-row expressions + ONE hash agg — "
    "map-side combined, embarrassingly parallel at any corpus size "
    "(per-row cost is O(n_tok * W), the price of exactness).",
)
def text_mattr_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = parallelize(load_table(spark, sf_dir, "documents"))
    ws = F.filter(
        F.split(F.lower("text"), r"\s+"), lambda x: x != F.lit("")
    )
    n = F.size(F.col("ws"))
    win = F.least(F.lit(_MATTR_W), n)
    n_win = n - win + F.lit(1)
    sum_distinct = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), n_win),
            lambda i: F.size(
                F.array_distinct(F.slice(F.col("ws"), i, win))
            ),
        ),
        F.lit(0),
        lambda a, b: a + b,
    )
    per_doc = (
        d.select("lang", ws.alias("ws"))
        .filter(n > 0)
        .select(
            "lang",
            n.alias("n_tok"),
            win.alias("win"),
            n_win.alias("n_win"),
            sum_distinct.alias("sum_distinct"),
        )
    )
    mattr = F.col("sum_distinct").cast("double") / (
        F.col("win").cast("double") * F.col("n_win").cast("double")
    )
    scored = per_doc.select(
        "lang", "n_tok", "sum_distinct", mattr.alias("mattr")
    )
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
        F.sum(F.col("sum_distinct").cast("long"))
        .cast("long")
        .alias("sum_distinct"),
        F.floor(
            F.lit(1000000.0)
            * F.sum(F.col("mattr").cast("decimal(38,12)")).cast("double")
            / F.count(F.lit(1))
        )
        .cast("long")
        .alias("mean_mattr_micro"),
    )


#: Business-day epoch: a Monday predating every fixture date.
_BD_EPOCH = "1990-01-01"


def _bizdays_sql(col: str) -> str:
    """DuckDB: weekdays in [epoch Monday, col) — closed-form."""
    dd = f"({col} - DATE '{_BD_EPOCH}')"
    return (
        f"(5 * ({dd} // 7) + least({dd} % 7, 5))"
    )


@register(
    "date_business_days",
    oracle=f"""
        WITH lat AS (
            SELECT o.o_orderpriority,
                   CAST({_bizdays_sql("CAST(l.l_shipdate AS DATE)")}
                        - {_bizdays_sql("CAST(o.o_orderdate AS DATE)")}
                        AS BIGINT) AS latency_bd
            FROM orders o JOIN lineitem l
              ON l.l_orderkey = o.o_orderkey
        )
        SELECT o_orderpriority, latency_bd,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lat GROUP BY o_orderpriority, latency_bd
    """,
    doc="Order-to-ship latency in BUSINESS days per priority class — "
    "the SLA arithmetic every ops report needs (ClickHouse: "
    "toDayOfWeek folklore): weekdays-between via the closed form "
    "f(d) = 5*(days//7) + min(days%7, 5) counting from a Monday "
    "epoch (1990-01-01) that predates every fixture date, so the "
    "floor-div/modulo never see a negative operand (Spark div "
    "truncates where DuckDB // floors — the known negative-division "
    "trap, designed out). The measure is SIGNED — the fixture "
    "contains ship-before-order anomaly rows, which surface as "
    "negative latencies (numpy's busday_count flips to begin-"
    "exclusive on reversed ranges; this operator keeps the "
    "self-consistent f(b)-f(a) measure). Everything is exact "
    "integer arithmetic; output grain priority x latency is "
    "calendar-span-bounded. Plan: "
    "one UNHINTED join (size-based broadcast at fixture scale; AQE "
    "shuffle join at 100 TB) + one map-side-combined hash agg.",
)
def date_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    def bizdays(col):
        dd = F.datediff(col.cast("date"), F.lit(_BD_EPOCH))
        return F.lit(5) * F.floor(dd / F.lit(7.0)).cast(
            "long"
        ) + F.least(F.pmod(dd, F.lit(7)).cast("long"), F.lit(5))

    lat = li.join(
        o, li["l_orderkey"] == o["o_orderkey"]
    ).select(
        "o_orderpriority",
        (bizdays(F.col("l_shipdate")) - bizdays(F.col("o_orderdate")))
        .cast("long")
        .alias("latency_bd"),
    )
    return lat.groupBy("o_orderpriority", "latency_bd").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines")
    )
