"""Round-9 operator batch 4: seasonal-trend decomposition, one-way
ANOVA, Jarque-Bera normality, CUSUM drift alarms, bigram conditional
entropy, two-feature OLS, and a per-column schema-profile audit.

Reference anchor: the reference (backup.sh:45) delegates every query
to ClickHouse; these keys map the next ring of ClickHouse analytics
its users run on the restored tables — ``seriesDecomposeSTL``,
``analysisOfVariance`` (24.8+), ``skewPop/kurtPop`` composites,
drift/alarm monitoring over backup metrics, n-gram language-model
audits, ``stochasticLinearRegression``'s closed-form little sibling,
and the ``system.columns``-plus-``uniqExact`` table profile a backup
operator checks before and after a restore.

Float discipline (NOTES.md float traps): every fold over doubles is
either order-free (decimal sums) or an explicit left-to-right
``aggregate()`` over a day/key-sorted array mirrored by a DuckDB
``list_reduce`` over a ``list(... ORDER BY ...)`` — the established
kalman/markov pattern. Transcendental outputs (ln) ride the
floor-micro grid; pure-IEEE chains hash raw. Bare decimal literals
never enter oracle arithmetic uncast (the DuckDB DECIMAL-literal
trap): every float literal is CAST(... AS DOUBLE) on the DuckDB side
and ``F.lit(float)`` / ``...D`` on the Spark side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhousebackup_spark.exprs import DEC, dsum, gsum, gsum_dec, ogsum, ogsum_dec
from clickhousebackup_spark.registry import register
from clickhousebackup_spark.tables import load_table, parallelize

#: Order-free accumulator for sums of per-cell doubles (micro-grid keys).
DEC12 = "decimal(38,12)"


def _micro(col):
    """floor(1e6 * x) as BIGINT — the transcendental-safe grid."""
    return F.floor(F.lit(1000000.0) * col).cast("long")


@register(
    "ts_stl_decompose",
    oracle="""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS value
            FROM events GROUP BY event_type, day
        ), w AS (
            SELECT event_type, day, value,
                   SUM(value) OVER (PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS sum7,
                   COUNT(*) OVER (PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS cnt7
            FROM daily
        ), full_w AS (
            SELECT event_type, day, value, CAST(sum7 AS BIGINT) AS sum7,
                   CAST(7 * value - sum7 AS BIGINT) AS detr7,
                   CAST(((day - DATE '2024-01-01') % 7 + 7) % 7
                        AS BIGINT) AS dow_idx
            FROM w WHERE cnt7 = 7
        ), seas AS (
            SELECT event_type, dow_idx,
                   CAST(SUM(detr7) AS BIGINT) AS s_num,
                   CAST(COUNT(*) AS BIGINT) AS s_cnt
            FROM full_w GROUP BY event_type, dow_idx
        )
        SELECT f.event_type, strftime(f.day, '%Y-%m-%d') AS day,
               f.value, f.dow_idx,
               CAST(f.sum7 AS DOUBLE) / CAST(7 AS DOUBLE) AS trend,
               CAST(s.s_num AS DOUBLE)
                   / (CAST(s.s_cnt AS DOUBLE) * CAST(7 AS DOUBLE))
                   AS seasonal,
               CAST(f.detr7 AS DOUBLE) / CAST(7 AS DOUBLE)
                   - CAST(s.s_num AS DOUBLE)
                     / (CAST(s.s_cnt AS DOUBLE) * CAST(7 AS DOUBLE))
                   AS residual
        FROM full_w f JOIN seas s
          ON f.event_type = s.event_type AND f.dow_idx = s.dow_idx
    """,
    doc="Additive seasonal-trend decomposition of each event type's "
    "daily count series (ClickHouse `seriesDecomposeSTL`, simplified "
    "to the classical moving-average form): trend = centered 7-day "
    "mean (full windows only), seasonal = day-of-week mean of the "
    "detrended series, residual = value - trend - seasonal. All "
    "intermediates stay INTEGER (detrended7 = 7*value - sum7) until "
    "the final divisions, so every double is a pure-IEEE function of "
    "exact counts and hashes raw; dow is pmod(day - epoch_monday, 7) "
    "arithmetic, not an engine dayofweek(). Plan: one daily hash agg "
    "(map-side combined), a calendar-bounded partitioned window "
    "(days-per-type rows), a 5x7-row seasonal agg broadcast back — "
    "at 100 TB the only data-scale stage is the first agg.",
)
def ts_stl_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("value"))
    w7 = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    w = daily.select(
        "event_type",
        "day",
        "value",
        F.sum("value").over(w7).cast("long").alias("sum7"),
        F.count(F.lit(1)).over(w7).alias("cnt7"),
    )
    full_w = w.filter(F.col("cnt7") == 7).select(
        "event_type",
        "day",
        "value",
        "sum7",
        (F.lit(7) * F.col("value") - F.col("sum7"))
        .cast("long")
        .alias("detr7"),
        F.pmod(F.datediff("day", F.lit("2024-01-01")), F.lit(7))
        .cast("long")
        .alias("dow_idx"),
    )
    seas = full_w.groupBy("event_type", "dow_idx").agg(
        F.sum("detr7").cast("long").alias("s_num"),
        F.count(F.lit(1)).cast("long").alias("s_cnt"),
    )
    seven = F.lit(7.0)
    seasonal = F.col("s_num").cast("double") / (
        F.col("s_cnt").cast("double") * seven
    )
    return full_w.join(F.broadcast(seas), ["event_type", "dow_idx"]).select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "value",
        "dow_idx",
        (F.col("sum7").cast("double") / seven).alias("trend"),
        seasonal.alias("seasonal"),
        (F.col("detr7").cast("double") / seven - seasonal).alias(
            "residual"
        ),
    )


@register(
    "stats_anova_oneway",
    oracle=f"""
        WITH g AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_g,
                   {ogsum_dec('value')} AS s1d,
                   {ogsum_dec('value * value')} AS s2d
            FROM events GROUP BY event_type
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
               END AS f_stat
        FROM t
    """,
    doc="One-way ANOVA of events.value across event types (ClickHouse "
    "`analysisOfVariance`/anova): F = (SSB/(k-1))/(SSW/(n-k)). "
    "Per-group moment sums are exact DECIMAL(38,0) floor-grid "
    "integers end-to-end (exprs.gsum_dec — round-14 migration; the "
    "global s1/s2 are decimal sums of decimal partials, order-free, "
    "rendered to double through a VARCHAR), and the one genuinely "
    "order-sensitive reduction — summing the k per-group s1^2/n "
    "terms — is an explicit left-to-right fold over the "
    "event_type-sorted array, mirrored by DuckDB list_reduce "
    "over list(... ORDER BY event_type), so the F chain is pure IEEE "
    "and hashes raw (f_stat NULL-guarded on SSW=0). Plan: one "
    "map-side-combined moment agg to k rows, then a k-row collect — "
    "the classic mergeable-state shape; no second data pass.",
)
def stats_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    v = F.col("value")
    mio = F.lit(1000000.0)
    g = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        gsum_dec(v).alias("s1d"),
        gsum_dec(v * v).alias("s2d"),
    )
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
    f_stat = (ssb / (F.col("k") - F.lit(1)).cast("double")) / (
        ssw / (F.col("n") - F.col("k")).cast("double")
    )
    return t.select(
        "n",
        "k",
        ssb.alias("ss_between"),
        ssw.alias("ss_within"),
        F.when(ssw > F.lit(0.0), f_stat).alias("f_stat"),
    )


@register(
    "stats_jarque_bera",
    oracle=f"""
        WITH m AS (
            SELECT event_type,
                   CAST(COUNT(*) AS DOUBLE) AS n,
                   {ogsum('value')} AS s1,
                   {ogsum('value * value')} AS s2,
                   {ogsum('value * value * value')} AS s3,
                   {ogsum('value * value * value * value')} AS s4
            FROM events GROUP BY event_type
        ), c AS (
            SELECT event_type, CAST(n AS BIGINT) AS n_obs,
                   (s2 / n) - (s1 / n) * (s1 / n) AS m2,
                   (s3 / n) - CAST(3 AS DOUBLE) * (s1 / n) * (s2 / n)
                       + CAST(2 AS DOUBLE) * (s1 / n) * (s1 / n)
                         * (s1 / n) AS m3,
                   (s4 / n) - CAST(4 AS DOUBLE) * (s1 / n) * (s3 / n)
                       + CAST(6 AS DOUBLE) * (s1 / n) * (s1 / n)
                         * (s2 / n)
                       - CAST(3 AS DOUBLE) * (s1 / n) * (s1 / n)
                         * (s1 / n) * (s1 / n) AS m4,
                   n
            FROM m
        )
        SELECT event_type, n_obs,
               CASE WHEN m2 > CAST(0 AS DOUBLE)
                    THEN m3 / (m2 * sqrt(m2)) END AS skewness,
               CASE WHEN m2 > CAST(0 AS DOUBLE)
                    THEN (m4 / (m2 * m2)) - CAST(3 AS DOUBLE)
               END AS excess_kurtosis,
               CASE WHEN m2 > CAST(0 AS DOUBLE) THEN
                   (n / CAST(6 AS DOUBLE))
                   * ((m3 / (m2 * sqrt(m2))) * (m3 / (m2 * sqrt(m2)))
                      + ((m4 / (m2 * m2)) - CAST(3 AS DOUBLE))
                        * ((m4 / (m2 * m2)) - CAST(3 AS DOUBLE))
                        / CAST(4 AS DOUBLE))
               END AS jb_stat
        FROM c
    """,
    doc="Jarque-Bera normality statistic per event type: JB = n/6 * "
    "(S^2 + K^2/4) from population skewness S and excess kurtosis K "
    "— the composite ClickHouse users assemble from skewPop/kurtPop "
    "to flag non-Gaussian metric drift. Moment sums follow the "
    "agg_skew_kurtosis discipline exactly (round-14: ALL four on the "
    "exprs.gsum floor grid — exact DECIMAL(38,0) integers rendered "
    "to double through a VARCHAR, the exact-at-any-scale form), "
    "making the whole JB chain pure IEEE on deterministic doubles — "
    "hashed raw, NULL-guarded on zero variance. Plan: one "
    "map-side-combined moment agg; per-type state is five mergeable "
    "numbers at any scale.",
)
def stats_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    v = F.col("value")
    m = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        gsum(v).alias("s1"),
        gsum(v * v).alias("s2"),
        gsum(v * v * v).alias("s3"),
        gsum(v * v * v * v).alias("s4"),
    )
    n = F.col("n")
    mu = F.col("s1") / n
    m2 = (F.col("s2") / n) - mu * mu
    m3 = (
        (F.col("s3") / n)
        - F.lit(3.0) * mu * (F.col("s2") / n)
        + F.lit(2.0) * mu * mu * mu
    )
    m4 = (
        (F.col("s4") / n)
        - F.lit(4.0) * mu * (F.col("s3") / n)
        + F.lit(6.0) * mu * mu * (F.col("s2") / n)
        - F.lit(3.0) * mu * mu * mu * mu
    )
    skew = m3 / (m2 * F.sqrt(m2))
    kurt = (m4 / (m2 * m2)) - F.lit(3.0)
    jb = (n / F.lit(6.0)) * (skew * skew + kurt * kurt / F.lit(4.0))
    pos = m2 > F.lit(0.0)
    return m.select(
        "event_type",
        n.cast("long").alias("n_obs"),
        F.when(pos, skew).alias("skewness"),
        F.when(pos, kurt).alias("excess_kurtosis"),
        F.when(pos, jb).alias("jb_stat"),
    )


@register(
    "ts_cusum_alarm",
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
                   list_reduce(
                       list_transform(s, z -> struct_pack(
                           s1 := z, s2 := z * z)),
                       (acc, e) -> struct_pack(
                           s1 := acc.s1 + e.s1,
                           s2 := acc.s2 + e.s1 * e.s1)) AS f1
            FROM series
        ), param AS (
            SELECT event_type, s, n_days,
                   f1.s1 / CAST(n_days AS DOUBLE) AS mu,
                   sqrt(greatest(CAST(0 AS DOUBLE),
                       f1.s2 / CAST(n_days AS DOUBLE)
                       - (f1.s1 / CAST(n_days AS DOUBLE))
                         * (f1.s1 / CAST(n_days AS DOUBLE)))) AS sigma
            FROM mom
        ), fold AS (
            -- nal comes FIRST in both struct_packs: DuckDB v1.0.0
            -- evaluates struct_pack fields sequentially inside
            -- list_reduce lambdas and REBINDS acc.X to the freshly
            -- assigned X for later fields, so a field reading
            -- acc.pos/acc.neg must precede their reassignment (trap
            -- documented in NOTES.md; constants are captured outer
            -- columns, never acc fields, for the same reason).
            SELECT event_type, n_days, mu, sigma,
                   list_reduce(
                       list_transform(s, z -> struct_pack(
                           nal := CASE WHEN
                               greatest(CAST(0 AS DOUBLE),
                                   z - mu - CAST(0.5 AS DOUBLE) * sigma)
                                   > CAST(4 AS DOUBLE) * sigma
                               OR greatest(CAST(0 AS DOUBLE),
                                   mu - z - CAST(0.5 AS DOUBLE) * sigma)
                                   > CAST(4 AS DOUBLE) * sigma
                               THEN 1 ELSE 0 END,
                           z := z,
                           pos := greatest(CAST(0 AS DOUBLE),
                               z - mu - CAST(0.5 AS DOUBLE) * sigma),
                           neg := greatest(CAST(0 AS DOUBLE),
                               mu - z - CAST(0.5 AS DOUBLE) * sigma))),
                       (acc, e) -> struct_pack(
                           nal := acc.nal + CASE WHEN
                               greatest(CAST(0 AS DOUBLE),
                                   acc.pos + (e.z - mu
                                       - CAST(0.5 AS DOUBLE) * sigma))
                                   > CAST(4 AS DOUBLE) * sigma
                               OR greatest(CAST(0 AS DOUBLE),
                                   acc.neg + (mu - e.z
                                       - CAST(0.5 AS DOUBLE) * sigma))
                                   > CAST(4 AS DOUBLE) * sigma
                               THEN 1 ELSE 0 END,
                           z := e.z,
                           pos := greatest(CAST(0 AS DOUBLE),
                               acc.pos + (e.z - mu
                                   - CAST(0.5 AS DOUBLE) * sigma)),
                           neg := greatest(CAST(0 AS DOUBLE),
                               acc.neg + (mu - e.z
                                   - CAST(0.5 AS DOUBLE) * sigma)))) AS f
            FROM param
        )
        SELECT event_type, n_days, mu, sigma,
               f.pos AS cusum_pos, f.neg AS cusum_neg,
               CAST(f.nal AS BIGINT) AS n_alarms
        FROM fold
    """,
    doc="Two-sided CUSUM drift detector over each event type's daily "
    "means: S+ = max(0, S+ + (z - mu - k)), S- symmetric, allowance "
    "k = 0.5*sigma, decision limit h = 4*sigma (the textbook "
    "tabular-CUSUM tuning) — the sequential change detector paging "
    "pipelines run on noisy backup/ingest metrics where a Shewhart "
    "z-score misses slow drifts. Observations are decimal-exact "
    "daily means; both the moment fold (mu/sigma) and the CUSUM fold "
    "are explicit left-to-right reduces over the day-sorted array, "
    "mirrored in DuckDB via single-level list_reduce with constants "
    "captured from outer columns and the alarm counter ordered FIRST "
    "in the struct (DuckDB v1.0.0 rebinds acc.X to freshly assigned "
    "struct fields — the sequential-struct_pack trap). Alarm count "
    "is exact integer; level outputs hash raw. Series length is "
    "calendar-bounded; the data-scale work is one daily hash agg.",
)
def ts_cusum_alarm(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    f1 = F.aggregate(
        F.col("s"),
        F.struct(F.lit(0.0).alias("s1"), F.lit(0.0).alias("s2")),
        lambda acc, z: F.struct(
            (acc["s1"] + z).alias("s1"), (acc["s2"] + z * z).alias("s2")
        ),
    )
    nd = F.col("n_days").cast("double")
    param = series.select(
        "event_type",
        "s",
        "n_days",
        (f1["s1"] / nd).alias("mu"),
        F.sqrt(
            F.greatest(
                F.lit(0.0),
                f1["s2"] / nd - (f1["s1"] / nd) * (f1["s1"] / nd),
            )
        ).alias("sigma"),
    )
    mu, sig = F.col("mu"), F.col("sigma")
    kk = F.lit(0.5) * sig
    hh = F.lit(4.0) * sig
    z1 = F.element_at("s", 1)
    init = F.struct(
        F.greatest(F.lit(0.0), z1 - mu - kk).alias("pos"),
        F.greatest(F.lit(0.0), mu - z1 - kk).alias("neg"),
        F.when(
            (F.greatest(F.lit(0.0), z1 - mu - kk) > hh)
            | (F.greatest(F.lit(0.0), mu - z1 - kk) > hh),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("nal"),
    )

    def step(acc, z):
        pos2 = F.greatest(F.lit(0.0), acc["pos"] + (z - mu - kk))
        neg2 = F.greatest(F.lit(0.0), acc["neg"] + (mu - z - kk))
        return F.struct(
            pos2.alias("pos"),
            neg2.alias("neg"),
            (
                acc["nal"]
                + F.when((pos2 > hh) | (neg2 > hh), F.lit(1))
                .otherwise(F.lit(0))
                .cast("long")
            ).alias("nal"),
        )

    fold = F.aggregate(
        F.slice(F.col("s"), 2, F.size("s") - 1), init, step
    )
    return param.select(
        "event_type",
        "n_days",
        "mu",
        "sigma",
        fold["pos"].alias("cusum_pos"),
        fold["neg"].alias("cusum_neg"),
        fold["nal"].cast("long").alias("n_alarms"),
    )


@register(
    "token_bigram_entropy",
    oracle="""
        WITH toks AS (
            SELECT lang,
                   list_filter(string_split_regex(lower(text), '\\s+'),
                               x -> x <> '') AS ws
            FROM documents
        ), bg AS (
            SELECT lang, u.w1, u.w2
            FROM toks,
                 unnest(list_transform(
                     generate_series(1, len(ws) - 1),
                     i -> struct_pack(w1 := ws[i], w2 := ws[i + 1])))
                 AS t(u)
        ), cells AS (
            SELECT lang, w1, w2, CAST(COUNT(*) AS DOUBLE) AS c
            FROM bg GROUP BY lang, w1, w2
        ), ctx AS (
            SELECT lang, w1, CAST(SUM(CAST(c AS BIGINT)) AS DOUBLE) AS r,
                   CAST(COUNT(*) AS BIGINT) AS fanout
            FROM cells GROUP BY lang, w1
        ), agg AS (
            SELECT c.lang,
                   CAST(SUM(CAST(cc.c AS BIGINT)) AS BIGINT) AS n_bigrams,
                   CAST(COUNT(*) AS BIGINT) AS n_cells,
                   CAST(SUM(CAST(cc.c * ln(cc.c) AS DECIMAL(38,12)))
                        AS DOUBLE) AS slogc
            FROM cells cc JOIN ctx c
              ON cc.lang = c.lang AND cc.w1 = c.w1
            GROUP BY c.lang
        ), ragg AS (
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_contexts,
                   CAST(SUM(CAST(r * ln(r) AS DECIMAL(38,12)))
                        AS DOUBLE) AS slogr
            FROM ctx GROUP BY lang
        )
        SELECT a.lang, a.n_bigrams, a.n_cells, r.n_contexts,
               CAST(FLOOR(CAST(1000000 AS DOUBLE)
                    * ((r.slogr - a.slogc)
                       / CAST(a.n_bigrams AS DOUBLE))) AS BIGINT)
                   AS cond_entropy_micro
        FROM agg a JOIN ragg r ON a.lang = r.lang
    """,
    doc="Conditional bigram entropy H(next|prev) per language over "
    "whitespace tokens — the unsmoothed bigram language-model "
    "perplexity audit (in nats) a corpus curator uses to compare "
    "text predictability across languages/sources: H = (sum_ctx "
    "r*ln(r) - sum_cell c*ln(c)) / N. Tokenization matches "
    "text_top_terms (lower + \\s+ split, empties dropped); cell and "
    "context tables are vocabulary^2- / vocabulary-bounded, the "
    "c*ln(c) sums cross DECIMAL(38,12) so the fold is order-free, "
    "and the ln-dependent output rides the floor-micro grid. Plan: "
    "bigram explode -> (lang,w1,w2) hash agg (map-side combined, "
    "the data-scale stage) -> vocab-scale re-aggs and a tiny "
    "per-lang join.",
)
def token_bigram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = parallelize(load_table(spark, sf_dir, "documents"))
    ws = F.filter(
        F.split(F.lower("text"), r"\s+"), lambda x: x != F.lit("")
    )
    toks = d.select("lang", ws.alias("ws"))
    pairs = F.zip_with(
        F.slice(F.col("ws"), 1, F.size("ws") - 1),
        F.slice(F.col("ws"), 2, F.size("ws") - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bg = toks.select(
        "lang", F.explode(pairs).alias("p")
    ).select("lang", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    cells = bg.groupBy("lang", "w1", "w2").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    c = F.col("c")
    ctx = cells.groupBy("lang", "w1").agg(
        F.sum(c.cast("long")).cast("double").alias("r"),
        F.count(F.lit(1)).cast("long").alias("fanout"),
    )
    agg = cells.groupBy("lang").agg(
        F.sum(c.cast("long")).cast("long").alias("n_bigrams"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.sum((c * F.log(c)).cast(DEC12)).cast("double").alias("slogc"),
    )
    r = F.col("r")
    ragg = ctx.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_contexts"),
        F.sum((r * F.log(r)).cast(DEC12)).cast("double").alias("slogr"),
    )
    h = (F.col("slogr") - F.col("slogc")) / F.col("n_bigrams").cast(
        "double"
    )
    return agg.join(ragg, "lang").select(
        "lang",
        "n_bigrams",
        "n_cells",
        "n_contexts",
        _micro(h).alias("cond_entropy_micro"),
    )


@register(
    "stats_linregress_multi",
    oracle="""
        WITH grid AS (
            SELECT CAST(l_quantity AS BIGINT) AS q,
                   CAST(ROUND(l_discount * CAST(100 AS DOUBLE))
                        AS DECIMAL(19,0)) AS d,
                   CAST(ROUND(l_extendedprice * CAST(100 AS DOUBLE))
                        AS DECIMAL(19,0)) AS p
            FROM lineitem
        ), si AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                   CAST(SUM(q) AS DOUBLE) AS sq,
                   CAST(SUM(d) AS DOUBLE) AS sd,
                   CAST(SUM(p) AS DOUBLE) AS sp,
                   CAST(SUM(CAST(q AS DECIMAL(19,0))
                            * CAST(q AS DECIMAL(19,0))) AS DOUBLE) AS sqq,
                   CAST(SUM(CAST(q AS DECIMAL(19,0)) * d) AS DOUBLE)
                       AS sqd,
                   CAST(SUM(d * d) AS DOUBLE) AS sdd,
                   CAST(SUM(CAST(q AS DECIMAL(19,0)) * p) AS DOUBLE)
                       AS sqp,
                   CAST(SUM(d * p) AS DOUBLE) AS sdp,
                   CAST(SUM(p * p) AS DOUBLE) AS spp
            FROM grid
        ), s AS (
            SELECT n, sq AS sx1, sd / CAST(100 AS DOUBLE) AS sx2,
                   sp / CAST(100 AS DOUBLE) AS sy,
                   sqq AS sx1x1, sqd / CAST(100 AS DOUBLE) AS sx1x2,
                   sdd / CAST(10000 AS DOUBLE) AS sx2x2,
                   sqp / CAST(100 AS DOUBLE) AS sx1y,
                   sdp / CAST(10000 AS DOUBLE) AS sx2y,
                   spp / CAST(10000 AS DOUBLE) AS syy
            FROM si
        ), c AS (
            SELECT CAST(n AS BIGINT) AS n_obs,
                   sx1x1 - sx1 * sx1 / n AS cx1x1,
                   sx1x2 - sx1 * sx2 / n AS cx1x2,
                   sx2x2 - sx2 * sx2 / n AS cx2x2,
                   sx1y - sx1 * sy / n AS cx1y,
                   sx2y - sx2 * sy / n AS cx2y,
                   syy - sy * sy / n AS cyy,
                   sx1 / n AS mx1, sx2 / n AS mx2, sy / n AS my
            FROM s
        ), sol AS (
            SELECT c.*, cx1x1 * cx2x2 - cx1x2 * cx1x2 AS det
            FROM c
        )
        SELECT n_obs,
               CASE WHEN det <> CAST(0 AS DOUBLE) THEN
                   (cx1y * cx2x2 - cx2y * cx1x2) / det
               END AS beta_quantity,
               CASE WHEN det <> CAST(0 AS DOUBLE) THEN
                   (cx2y * cx1x1 - cx1y * cx1x2) / det
               END AS beta_discount,
               CASE WHEN det <> CAST(0 AS DOUBLE) THEN
                   my - ((cx1y * cx2x2 - cx2y * cx1x2) / det) * mx1
                      - ((cx2y * cx1x1 - cx1y * cx1x2) / det) * mx2
               END AS intercept,
               CASE WHEN det <> CAST(0 AS DOUBLE)
                    AND cyy > CAST(0 AS DOUBLE) THEN
                   CAST(CAST(
                       (((cx1y * cx2x2 - cx2y * cx1x2) / det) * cx1y
                        + ((cx2y * cx1x1 - cx1y * cx1x2) / det) * cx2y)
                       / cyy
                       AS DECIMAL(20,12)) AS DOUBLE)
               END AS r_squared
        FROM sol
    """,
    doc="Two-feature OLS l_extendedprice ~ l_quantity + l_discount "
    "via the closed-form normal equations (centered 2x2 Cramer "
    "solve) — the exact counterpart of ClickHouse's "
    "stochasticLinearRegression for two regressors, fit in ONE pass. "
    "Inputs are snapped to their native grids first (quantity is "
    "integral; discount/price are 2-decimal monetary values -> "
    "ROUND(x*100), boundary-free because the true values are exact "
    "cents), so all nine cross-moment sums are exact integers "
    "(DECIMAL(19,0) squares — p_cents^2 overflows int64 at scale, "
    "the burstiness-index lesson), and the rescale + Cramer chain "
    "is pure IEEE on identical doubles, hashed raw except r^2, "
    "which crosses agg_corr's DECIMAL(20,12) bridge (the b1*cx1y + "
    "b2*cx2y dot product FMA-groups differently at sf0.1 "
    "magnitudes). A DECIMAL(38,12) "
    "cast of the raw double products is NOT parity-safe here: at "
    "price^2 magnitude the two engines' double->decimal conversions "
    "disagree below the 12th fractional digit. Plan: a single "
    "map-side-combined aggregation to one row — mergeable-moment "
    "state, no second pass at any scale; det!=0 is guaranteed by "
    "data (quantity and discount are not collinear).",
)
def stats_linregress_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("long")
    d = F.round(F.col("l_discount") * F.lit(100.0)).cast("decimal(19,0)")
    p = F.round(F.col("l_extendedprice") * F.lit(100.0)).cast(
        "decimal(19,0)"
    )
    grid = li.select(q.alias("q"), d.alias("d"), p.alias("p"))
    qd = F.col("q").cast("decimal(19,0)")
    si = grid.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("q").cast("double").alias("sq"),
        F.sum("d").cast("double").alias("sd"),
        F.sum("p").cast("double").alias("sp"),
        F.sum(qd * qd).cast("double").alias("sqq"),
        F.sum(qd * F.col("d")).cast("double").alias("sqd"),
        F.sum(F.col("d") * F.col("d")).cast("double").alias("sdd"),
        F.sum(qd * F.col("p")).cast("double").alias("sqp"),
        F.sum(F.col("d") * F.col("p")).cast("double").alias("sdp"),
        F.sum(F.col("p") * F.col("p")).cast("double").alias("spp"),
    )
    h, hh = F.lit(100.0), F.lit(10000.0)
    s = si.select(
        "n",
        F.col("sq").alias("sx1"),
        (F.col("sd") / h).alias("sx2"),
        (F.col("sp") / h).alias("sy"),
        F.col("sqq").alias("sx1x1"),
        (F.col("sqd") / h).alias("sx1x2"),
        (F.col("sdd") / hh).alias("sx2x2"),
        (F.col("sqp") / h).alias("sx1y"),
        (F.col("sdp") / hh).alias("sx2y"),
        (F.col("spp") / hh).alias("syy"),
    )
    n = F.col("n")
    cx1x1 = F.col("sx1x1") - F.col("sx1") * F.col("sx1") / n
    cx1x2 = F.col("sx1x2") - F.col("sx1") * F.col("sx2") / n
    cx2x2 = F.col("sx2x2") - F.col("sx2") * F.col("sx2") / n
    cx1y = F.col("sx1y") - F.col("sx1") * F.col("sy") / n
    cx2y = F.col("sx2y") - F.col("sx2") * F.col("sy") / n
    cyy = F.col("syy") - F.col("sy") * F.col("sy") / n
    det = cx1x1 * cx2x2 - cx1x2 * cx1x2
    b1 = (cx1y * cx2x2 - cx2y * cx1x2) / det
    b2 = (cx2y * cx1x1 - cx1y * cx1x2) / det
    b0 = F.col("sy") / n - b1 * (F.col("sx1") / n) - b2 * (
        F.col("sx2") / n
    )
    ok = det != F.lit(0.0)
    return s.select(
        n.cast("long").alias("n_obs"),
        F.when(ok, b1).alias("beta_quantity"),
        F.when(ok, b2).alias("beta_discount"),
        F.when(ok, b0).alias("intercept"),
        F.when(
            ok & (cyy > F.lit(0.0)),
            ((b1 * cx1y + b2 * cx2y) / cyy)
            .cast("decimal(20,12)")
            .cast("double"),
        ).alias("r_squared"),
    )


#: (column, canonical-string SQL fragment) pairs for the orders
#: profile. Numerics ride a zero-padded fixed-width grid (so string
#: min/max = numeric min/max); the timestamp rides unix micros on the
#: same grid; doubles go through floor-micro (never str(double) — the
#: two engines format doubles differently).
_PROFILE_COLS = (
    ("o_orderkey", "LPAD(CAST(o_orderkey AS VARCHAR), 20, '0')"),
    ("o_custkey", "LPAD(CAST(o_custkey AS VARCHAR), 20, '0')"),
    ("o_orderstatus", "o_orderstatus"),
    (
        "o_totalprice",
        "LPAD(CAST(CAST(FLOOR(o_totalprice * CAST(1000000 AS DOUBLE)) "
        "AS BIGINT) AS VARCHAR), 20, '0')",
    ),
    (
        "o_orderdate",
        "LPAD(CAST(epoch_us(o_orderdate) AS VARCHAR), 20, '0')",
    ),
    ("o_orderpriority", "o_orderpriority"),
)


@register(
    "dq_schema_profile",
    oracle="""
        WITH cells AS (
            {unions}
        )
        SELECT col_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) - COUNT(sval) AS BIGINT) AS n_null,
               CAST(COUNT(DISTINCT sval) AS BIGINT) AS n_distinct,
               min(sval) AS min_val,
               max(sval) AS max_val,
               CAST(SUM(length(sval)) AS BIGINT) AS sum_len
        FROM cells GROUP BY col_name
    """.format(
        unions="\n            UNION ALL\n".join(
            f"            SELECT '{name}' AS col_name, {sql} AS sval "
            "FROM orders"
            for name, sql in _PROFILE_COLS
        )
    ),
    doc="Per-column profile of the orders table — row count, null "
    "count, exact distinct count, min/max, total value length — the "
    "system.columns + uniqExact audit a backup operator runs before "
    "and after a restore to prove the copy is faithful (the "
    "reference's `BACKUP DATABASE` at backup.sh:45 trusts ClickHouse; "
    "this is the independent check). Every value is canonicalized to "
    "a string FIRST: ints/micros on a zero-padded fixed-width grid "
    "(lexicographic = numeric order), doubles through floor-micro "
    "(str(double) formatting differs between engines — the "
    "established trap), so min/max/distinct compare bit-identically. "
    "Plan: ONE scan exploding each row into 6 (col, sval) cells -> "
    "one hash agg with a distinct expand; the oracle's UNION ALL of "
    "6 scans is the semantic mirror, not the plan.",
)
def dq_schema_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    pad = lambda c: F.lpad(c.cast("string"), 20, "0")  # noqa: E731
    svals = {
        "o_orderkey": pad(F.col("o_orderkey")),
        "o_custkey": pad(F.col("o_custkey")),
        "o_orderstatus": F.col("o_orderstatus"),
        "o_totalprice": pad(
            F.floor(F.col("o_totalprice") * F.lit(1000000.0)).cast(
                "long"
            )
        ),
        "o_orderdate": pad(F.unix_micros("o_orderdate")),
        "o_orderpriority": F.col("o_orderpriority"),
    }
    cells = o.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("col_name"),
                        sval.alias("sval"),
                    )
                    for name, sval in svals.items()
                ]
            )
        ).alias("cell")
    ).select("cell.col_name", "cell.sval")
    return cells.groupBy("col_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        (F.count(F.lit(1)) - F.count("sval")).cast("long").alias("n_null"),
        F.countDistinct("sval").cast("long").alias("n_distinct"),
        F.min("sval").alias("min_val"),
        F.max("sval").alias("max_val"),
        F.sum(F.length("sval")).cast("long").alias("sum_len"),
    )
