"""Round-10 additions: ClickHouse argMax/argMin parity, exact
covariance moments, the built-in session_window vs manual
sessionization, Gopher-style document quality rules, and canonical-URL
deduplication.

House conventions throughout: integer/decimal-exact checked columns
(exprs.py), selection-only doubles ordered under a total-order
tiebreak, `string_split_regex` ↔ `F.split` tokenization, epoch-µs
timestamps, every window partitioned by a row-scaled key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhousebackup_spark.registry import register
from clickhousebackup_spark.tables import load_table

#: 30-minute session gap in microseconds (matches sessionize_gap).
_GAP_US = 1_800_000_000


@register(
    "agg_argmax_argmin",
    oracle="""
        WITH ranked AS (
            SELECT event_type, user_id, event_id, value,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                       ORDER BY value DESC, user_id DESC, event_id DESC)
                       AS rx,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                       ORDER BY value ASC, user_id ASC, event_id ASC)
                       AS rn
            FROM events
        )
        SELECT event_type,
               MAX(CASE WHEN rx = 1 THEN user_id END) AS argmax_user,
               MAX(CASE WHEN rx = 1 THEN event_id END) AS argmax_event,
               MAX(CASE WHEN rn = 1 THEN user_id END) AS argmin_user,
               MAX(CASE WHEN rn = 1 THEN event_id END) AS argmin_event
        FROM ranked GROUP BY event_type
    """,
    doc="ClickHouse argMax/argMin parity (reference server ships the "
    "whole family): per event_type, the (user_id, event_id) carried "
    "by the extreme `value` row. Spark side uses max_by/min_by over "
    "a STRUCT ordering key — one hash aggregate with map-side "
    "combine, no window, no shuffle beyond the group-by — with the "
    "total-order tiebreak (value, user_id, event_id) that makes the "
    "selection deterministic under value ties; the oracle restates "
    "it as partitioned rank-1 windows. Selection-only doubles: the "
    "ordering compares the SAME IEEE values in both engines, and "
    "only integer columns are emitted.",
)
def agg_argmax_argmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    okey = F.struct(F.col("value"), F.col("user_id"), F.col("event_id"))
    return e.groupBy("event_type").agg(
        F.max_by("user_id", okey).alias("argmax_user"),
        F.max_by("event_id", okey).alias("argmax_event"),
        F.min_by("user_id", okey).alias("argmin_user"),
        F.min_by("event_id", okey).alias("argmin_event"),
    )


@register(
    "stats_covariance",
    oracle="""
        WITH g AS (
            SELECT l_returnflag,
                   CAST(FLOOR(1000.0 * l_quantity) AS HUGEINT) AS qg,
                   CAST(FLOOR(100.0 * l_extendedprice) AS HUGEINT) AS pg
            FROM lineitem
        ), m AS (
            SELECT l_returnflag,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(qg) AS sx,
                   SUM(pg) AS sy,
                   SUM(qg * pg) AS sxy
            FROM g GROUP BY l_returnflag
        )
        SELECT l_returnflag, n,
               CAST(sx AS VARCHAR) AS sx,
               CAST(sy AS VARCHAR) AS sy,
               CAST(sxy AS VARCHAR) AS sxy,
               (CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n) / n
                   AS cov_pop_grid
        FROM m
    """,
    doc="covarPop (ClickHouse covarPop/covarSamp family) made "
    "driver-hash exact: quantity and price are gridded once "
    "(floor(1e3·q), floor(1e2·p) — single double multiply, identical "
    "both engines), the three moments Σx, Σy, Σxy accumulate in "
    "DECIMAL(38,0)/HUGEINT (order-free), and the population "
    "covariance on the grid is one shared double expression tree "
    "over those exact integers (÷1e5 client-side recovers the "
    "natural units). All three moments are emitted as VARCHAR per "
    "the stats_mean_ci precedent: Σxy exceeds int64 at cluster "
    "scale, and Σx/Σy would too near ~1.8e14 rows/group — a "
    "decimal→long cast there would null (non-ANSI Spark) while the "
    "oracle's BIGINT cast errors, a silent divergence. One "
    "two-phase hash agg; map-side combined; no window.",
)
def stats_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    qg = F.floor(F.lit(1000.0) * F.col("l_quantity")).cast("decimal(38,0)")
    pg = F.floor(F.lit(100.0) * F.col("l_extendedprice")).cast("decimal(38,0)")
    m = li.select("l_returnflag", qg.alias("qg"), pg.alias("pg")).groupBy(
        "l_returnflag"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("qg").alias("sx_d"),
        F.sum("pg").alias("sy_d"),
        F.sum(F.col("qg") * F.col("pg")).alias("sxy_d"),
    )
    n = F.col("n")
    return m.select(
        "l_returnflag",
        n.alias("n"),
        F.col("sx_d").cast("decimal(38,0)").cast("string").alias("sx"),
        F.col("sy_d").cast("decimal(38,0)").cast("string").alias("sy"),
        F.col("sxy_d").cast("decimal(38,0)").cast("string").alias("sxy"),
        (
            (
                F.col("sxy_d").cast("double")
                - F.col("sx_d").cast("double")
                * F.col("sy_d").cast("double")
                / n
            )
            / n
        ).alias("cov_pop_grid"),
    )


@register(
    "win_session_window_builtin",
    oracle=f"""
        WITH e AS (
            SELECT user_id, event_id, epoch_us(ts) AS us FROM events
        ), f AS (
            SELECT user_id, event_id, us,
                   CASE WHEN LAG(us) OVER (PARTITION BY user_id
                                           ORDER BY us, event_id) IS NULL
                          OR us - LAG(us) OVER (PARTITION BY user_id
                                                ORDER BY us, event_id)
                             > {_GAP_US}
                        THEN 1 ELSE 0 END AS new_sess
            FROM e
        ), s AS (
            SELECT user_id, us,
                   CAST(SUM(new_sess) OVER (PARTITION BY user_id
                       ORDER BY us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS sid
            FROM f
        )
        SELECT user_id,
               CAST(MIN(us) AS BIGINT) AS start_us,
               CAST(MAX(us) + {_GAP_US} AS BIGINT) AS end_us,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM s GROUP BY user_id, sid
    """,
    doc="Spark's BUILT-IN session_window aggregation (the one the "
    "streaming engine uses for dynamic-gap sessions, run here in "
    "batch mode) pinned against the manual gaps-and-islands "
    "formulation the oracle states: a new session starts when the "
    "inter-event gap is STRICTLY greater than 30 min — an event at "
    "exactly last+gap still merges and extends the session "
    "(end-inclusive merge, proven by "
    "tests/test_determinism_r11.py's boundary fixture), matching "
    "sessionize_gap's manual convention. Emits [start, last+gap) in "
    "epoch-µs + event count per session. The aggregation shuffles "
    "once on user_id; session assembly is Spark's native "
    "UpdatingSessionsIterator, not a window over the full event "
    "order.",
)
def win_session_window_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("w")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("start_us"),
            F.unix_micros(F.col("w.end")).alias("end_us"),
            "n_events",
        )
    )


#: Gopher-rule stopword probe set (Rae et al. 2021 §A1.1 uses a
#: similar tiny English function-word list).
_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


@register(
    "text_quality_gopher",
    oracle=f"""
        WITH w AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '\\s+'),
                               x -> x <> '') AS words
            FROM documents
        ), m AS (
            SELECT doc_id,
                   CAST(len(words) AS BIGINT) AS n_words,
                   CAST(COALESCE(list_sum(list_transform(words,
                        x -> CAST(length(x) AS BIGINT))), 0) AS BIGINT)
                        AS n_word_chars,
                   CAST(len(list_filter(words,
                        x -> regexp_matches(x, '[a-z]'))) AS BIGINT)
                        AS n_alpha_words,
                   CAST(len(list_filter(words,
                        x -> list_contains({list(_STOPWORDS)}, x)))
                        AS BIGINT) AS n_stopwords
            FROM w
        )
        SELECT doc_id, n_words, n_word_chars, n_alpha_words, n_stopwords,
               CASE WHEN n_words = 0 THEN 0
                    ELSE n_word_chars * 1000 // n_words END
                    AS mean_word_len_permille,
               CASE WHEN n_words = 0 THEN 0
                    ELSE n_alpha_words * 1000 // n_words END
                    AS alpha_frac_permille,
               CAST(CASE WHEN n_words >= 50 AND n_words <= 100000
                          AND n_words > 0
                          AND n_word_chars * 1000 // n_words
                              BETWEEN 3000 AND 10000
                          AND n_alpha_words * 1000 // n_words >= 800
                          AND n_stopwords >= 2
                         THEN 1 ELSE 0 END AS BIGINT) AS gopher_pass
        FROM m
    """,
    doc="Gopher-style document quality rules (Rae et al. 2021 §A1.1, "
    "the standard pretraining-corpus filter): word count in "
    "[50, 100k], mean word length in [3, 10] chars, >=80% of words "
    "containing an alphabetic character, >=2 stopwords. All measures "
    "are INTEGER (permille grids via floor-division) so the driver "
    "hash is exact; thresholds land on the permille grid, never on "
    "a float. Tokenization is the house `string_split_regex` <-> "
    "F.split convention. Map-only (no shuffle); the word-soup "
    "fixture keeps some sub-rules dormant, so "
    "tests/test_determinism_r11.py fires each on a crafted corpus "
    "per the round-7 dormant-gate pattern.",
)
def text_quality_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    words = F.filter(
        F.split(F.lower("text"), r"\s+"), lambda x: x != F.lit("")
    )
    m = d.select(
        "doc_id",
        F.size(words).cast("long").alias("n_words"),
        F.coalesce(
            F.aggregate(
                words,
                F.lit(0).cast("long"),
                lambda acc, x: acc + F.length(x).cast("long"),
            ),
            F.lit(0),
        ).alias("n_word_chars"),
        F.size(
            F.filter(words, lambda x: x.rlike("[a-z]"))
        ).cast("long").alias("n_alpha_words"),
        F.size(
            F.filter(
                words,
                lambda x: F.array_contains(
                    F.array(*[F.lit(s) for s in _STOPWORDS]), x
                ),
            )
        ).cast("long").alias("n_stopwords"),
    )
    n = F.col("n_words")
    mean_len = F.when(n == 0, F.lit(0)).otherwise(
        F.floor(F.col("n_word_chars") * 1000 / n)
    ).cast("long")
    alpha_frac = F.when(n == 0, F.lit(0)).otherwise(
        F.floor(F.col("n_alpha_words") * 1000 / n)
    ).cast("long")
    gate = (
        (n >= 50)
        & (n <= 100000)
        & mean_len.between(3000, 10000)
        & (alpha_frac >= 800)
        & (F.col("n_stopwords") >= 2)
    )
    return m.select(
        "doc_id",
        "n_words",
        "n_word_chars",
        "n_alpha_words",
        "n_stopwords",
        mean_len.alias("mean_word_len_permille"),
        alpha_frac.alias("alpha_frac_permille"),
        gate.cast("long").alias("gopher_pass"),
    )


@register(
    "url_canonical_dedup",
    oracle="""
        WITH raw AS (
            SELECT doc_id,
                   concat(
                       CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END,
                       '://',
                       CASE WHEN doc_id % 3 = 0
                            THEN concat('WWW.', upper(source), '.Example.COM')
                            ELSE concat('www.', source, '.example.com') END,
                       CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END,
                       '/', lang, '/doc-', CAST(doc_id % 50 AS VARCHAR),
                       CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END,
                       CASE WHEN doc_id % 2 = 0
                            THEN '?b=2&utm_source=feed&a=1'
                            ELSE '?a=1&b=2' END
                   ) AS url
            FROM documents
        ), parts AS (
            SELECT doc_id, url,
                   lower(split_part(url, '://', 1)) AS scheme,
                   split_part(split_part(url, '://', 2), '/', 1) AS hostport,
                   split_part(url, '?', 2) AS query
            FROM raw
        ), canon AS (
            SELECT doc_id, url, scheme,
                   regexp_replace(lower(split_part(hostport, ':', 1)),
                                  '^www\\.', '') AS host,
                   regexp_replace(
                       split_part(
                           substr(split_part(url, '://', 2),
                                  length(hostport) + 1),
                           '?', 1),
                       '/$', '') AS path,
                   array_to_string(
                       list_sort(list_filter(string_split(query, '&'),
                                 p -> substr(p, 1, 4) <> 'utm_')),
                       '&') AS params
            FROM parts
        )
        SELECT concat(scheme, '://', host, path,
                      CASE WHEN params = '' THEN '' ELSE '?' END,
                      params) AS canonical_url,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT url) AS BIGINT) AS n_raw_variants,
               MIN(doc_id) AS keep_doc_id
        FROM canon
        GROUP BY 1
    """,
    doc="Canonical-URL deduplication — the first dedup pass of every "
    "web-crawl pipeline: URLs that differ only by scheme/host case, "
    "an explicit default port, a trailing slash, tracking params "
    "(utm_*), or query-param ORDER are one document. Raw URLs are "
    "synthesized deterministically from doc keys with all five "
    "variation axes (url_funcs convention — the fixtures carry no "
    "URL column); canonicalization is pure string algebra shared "
    "verbatim by both engines (lower, split_part, sort params, drop "
    "utm_*), so the group-by key is exact. Emits each canonical URL "
    "with its member count, raw-variant count, and the kept (min) "
    "doc_id. Map + one hash agg; no UDF, no window.",
)
def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.when(F.pmod("doc_id", F.lit(2)) == 0, F.lit("HTTPS")).otherwise(
            F.lit("https")
        ),
        F.lit("://"),
        F.when(
            F.pmod("doc_id", F.lit(3)) == 0,
            F.concat(F.lit("WWW."), F.upper("source"), F.lit(".Example.COM")),
        ).otherwise(
            F.concat(F.lit("www."), F.col("source"), F.lit(".example.com"))
        ),
        F.when(F.pmod("doc_id", F.lit(4)) == 0, F.lit(":443")).otherwise(
            F.lit("")
        ),
        F.lit("/"),
        F.col("lang"),
        F.lit("/doc-"),
        F.pmod("doc_id", F.lit(50)).cast("string"),
        F.when(F.pmod("doc_id", F.lit(5)) == 0, F.lit("/")).otherwise(
            F.lit("")
        ),
        F.when(
            F.pmod("doc_id", F.lit(2)) == 0,
            F.lit("?b=2&utm_source=feed&a=1"),
        ).otherwise(F.lit("?a=1&b=2")),
    )
    raw = d.select("doc_id", url.alias("url"))
    scheme = F.lower(F.split_part(F.col("url"), F.lit("://"), F.lit(1)))
    rest = F.split_part(F.col("url"), F.lit("://"), F.lit(2))
    hostport = F.split_part(rest, F.lit("/"), F.lit(1))
    host = F.regexp_replace(
        F.lower(F.split_part(hostport, F.lit(":"), F.lit(1))),
        r"^www\.",
        "",
    )
    path = F.regexp_replace(
        F.split_part(
            F.substring(rest, F.length(hostport) + 1, F.lit(1 << 20)),
            F.lit("?"),
            F.lit(1),
        ),
        r"/$",
        "",
    )
    query = F.split_part(F.col("url"), F.lit("?"), F.lit(2))
    params = F.array_join(
        F.array_sort(
            F.filter(
                F.split(query, "&"),
                lambda p: F.substring(p, 1, 4) != F.lit("utm_"),
            )
        ),
        "&",
    )
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(params == "", F.lit("")).otherwise(F.lit("?")),
        params,
    )
    return (
        raw.select("doc_id", "url", canon.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("url").alias("n_raw_variants"),
            F.min("doc_id").alias("keep_doc_id"),
        )
    )
