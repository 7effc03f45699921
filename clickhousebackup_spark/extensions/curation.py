"""Training-data curation operators (north-star extensions, the
pipeline stages that sit between raw documents and a training set):
repetition scoring, benchmark-contamination checks, deterministic
stratified sampling, token budgeting, and the end-to-end keep-set.

Scale design: everything is explode + two-phase hash aggregation or an
equi-key join — the same shapes as extensions/text.py and
extensions/dedup.py. No Python per row, no collects, no non-equi
joins. Word/gram skew is absorbed by map-side partial aggregation;
contamination joins prefilter frequent grams (a stopword bigram would
otherwise fan out quadratically).

Determinism: sampling uses md5 hex prefixes (bit-identical in Spark
and DuckDB) rather than engine RNGs; every keep-one carries a
total-order tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhousebackup_spark.registry import register
from clickhousebackup_spark.tables import load_table, parallelize

#: Bigram expression shared by repetition / contamination (the same
#: shingle family as extensions/dedup.py:_shingles with K=2).
def _bigrams(distinct: bool) -> F.Column:
    words = F.split(F.lower("text"), r"\s+")
    n = F.size(words)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - 1, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(words, i, 2)),
    )
    return F.array_distinct(grams) if distinct else grams


_BIGRAMS_SQL = (
    "list_transform(range(1, greatest(len(string_split_regex(lower(text), "
    "'\\s+')) - 1, 1) + 1), i -> concat_ws(' ', "
    "string_split_regex(lower(text), '\\s+')[i:i+1]))"
)


@register(
    "text_repetition_score",
    oracle=f"""
        WITH grams AS (
            SELECT doc_id, unnest({_BIGRAMS_SQL}) AS gram FROM documents
        ), per_gram AS (
            SELECT doc_id, gram, COUNT(*) AS n
            FROM grams GROUP BY doc_id, gram
        )
        SELECT doc_id,
               CAST(SUM(n) AS BIGINT) AS n_grams,
               CAST(MAX(n) AS BIGINT) AS top_gram_n,
               CAST(MAX(n) AS DOUBLE) / CAST(SUM(n) AS DOUBLE)
                   AS top_gram_frac,
               1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(n) AS DOUBLE)
                   AS dup_gram_frac
        FROM per_gram GROUP BY doc_id
    """,
    doc="Repetition signals per doc (the Gopher-style quality gates): "
    "most-frequent-bigram fraction and duplicate-bigram fraction. "
    "Two-phase agg on (doc_id, gram) then doc_id — map-side combine "
    "absorbs within-doc repetition itself.",
)
def text_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = parallelize(load_table(spark, sf_dir, "documents"))
    per_gram = (
        d.select("doc_id", F.explode(_bigrams(distinct=False)).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return per_gram.groupBy("doc_id").agg(
        F.sum("n").cast("long").alias("n_grams"),
        F.max("n").cast("long").alias("top_gram_n"),
        (F.max("n").cast("double") / F.sum("n").cast("double")).alias(
            "top_gram_frac"
        ),
        (
            F.lit(1.0)
            - F.count(F.lit(1)).cast("double") / F.sum("n").cast("double")
        ).alias("dup_gram_frac"),
    )


#: Benchmark membership + contamination thresholds.
_BENCH_MOD = 97
_MIN_SHARED = 3
#: Grams present in more than this many docs are dropped before the
#: contamination join — a stopword bigram ("of the") would otherwise
#: pair every doc with every benchmark doc (the quadratic blowup).
#: Exact for the ≥ _MIN_SHARED rare-gram definition used here; a real
#: pipeline tunes this df cap alongside its n-gram order (8-grams at
#: df≤10 in the usual decontamination setups).
_MAX_DF = 50


@register(
    "contamination_overlap",
    oracle=f"""
        WITH grams AS (
            SELECT doc_id, unnest(list_distinct({_BIGRAMS_SQL})) AS gram
            FROM documents
        ), rare AS (
            SELECT gram FROM grams GROUP BY gram
            HAVING COUNT(*) <= {_MAX_DF}
        ), g AS (
            SELECT grams.doc_id, grams.gram FROM grams
            JOIN rare ON grams.gram = rare.gram
        )
        SELECT t.doc_id, b.doc_id AS benchmark_id,
               CAST(COUNT(*) AS BIGINT) AS n_shared_grams
        FROM g t JOIN g b ON t.gram = b.gram
        WHERE b.doc_id % {_BENCH_MOD} = 0 AND t.doc_id % {_BENCH_MOD} <> 0
        GROUP BY t.doc_id, b.doc_id
        HAVING COUNT(*) >= {_MIN_SHARED}
    """,
    doc=f"Benchmark-contamination check: training docs sharing ≥ "
    f"{_MIN_SHARED} rare bigrams (df ≤ {_MAX_DF}) with a benchmark "
    f"doc (doc_id % {_BENCH_MOD} = 0 stands in for the eval set). "
    "Equi-key join on the gram with a frequency prefilter — the "
    "decontamination shape that survives 100 TB because common grams "
    "never enter the join.",
)
def contamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = parallelize(load_table(spark, sf_dir, "documents"))
    grams = d.select(
        "doc_id", F.explode(_bigrams(distinct=True)).alias("gram")
    )
    rare = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= _MAX_DF)
        .select("gram")
    )
    g = grams.join(rare, "gram")
    bench = g.filter(F.col("doc_id") % _BENCH_MOD == 0).select(
        F.col("doc_id").alias("benchmark_id"), "gram"
    )
    train = g.filter(F.col("doc_id") % _BENCH_MOD != 0)
    return (
        train.join(bench, "gram")
        .groupBy("doc_id", "benchmark_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_grams"))
        .filter(F.col("n_shared_grams") >= _MIN_SHARED)
    )


@register(
    "sample_stratified",
    oracle="""
        SELECT doc_id, lang, substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                   AS bucket
        FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
              <= CASE WHEN lang = 'en' THEN '3f' ELSE '19' END
    """,
    doc="Deterministic stratified sample: per-language keep rates "
    "(~25% en, ~10% other) decided by an md5 hex prefix of the key — "
    "bit-identical across engines and cluster sizes, unlike RNG-based "
    "Bernoulli sampling. Map-only (no shuffle); the idiom for "
    "rebalancing language mix in a training set.",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    keep_max = F.when(F.col("lang") == "en", F.lit("3f")).otherwise(
        F.lit("19")
    )
    return d.select("doc_id", "lang", bucket.alias("bucket")).filter(
        F.col("bucket") <= keep_max
    )


@register(
    "corpus_token_budget",
    oracle="""
        SELECT lang,
               CAST(SUM(len(string_split_regex(text, '\\s+'))) AS BIGINT)
                   AS ws_tokens,
               CAST(SUM(len(regexp_extract_all(
                   text, '[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\\s]'))) AS BIGINT)
                   AS bpe_ish_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY lang
    """,
    doc="Token budget per language: corpus-level sums of the "
    "text_token_count tokenizers — the number every dataset card "
    "quotes. Integer sums are order-independent, so no decimal bridge "
    "is needed.",
)
def corpus_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = parallelize(load_table(spark, sf_dir, "documents"))
    return d.groupBy("lang").agg(
        F.sum(F.size(F.split(F.col("text"), r"\s+")))
        .cast("long")
        .alias("ws_tokens"),
        F.sum(
            F.size(
                F.expr(
                    r"regexp_extract_all(text, '[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\\s]', 0)"
                )
            )
        )
        .cast("long")
        .alias("bpe_ish_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )


@register(
    "curation_keep_set",
    oracle="""
        WITH scored AS (
            SELECT doc_id, text, lang,
                   len(string_split_regex(text, '\\s+')) AS n_words,
                   ROW_NUMBER() OVER (PARTITION BY md5(text)
                                      ORDER BY doc_id) AS rn
            FROM documents
        )
        SELECT doc_id, lang, CAST(n_words AS BIGINT) AS n_words
        FROM scored
        WHERE rn = 1 AND n_words >= 10
    """,
    doc="End-to-end curation keep-set: exact dedup (md5 keep-lowest, "
    "the dedup_exact rule) composed with a minimum-length quality "
    "gate — the final SELECT of a data pipeline, one window + one "
    "filter, no extra shuffles beyond dedup itself.",
)
def curation_keep_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = parallelize(load_table(spark, sf_dir, "documents"))
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    return (
        d.select(
            "doc_id",
            "lang",
            F.size(F.split(F.col("text"), r"\s+")).cast("long").alias("n_words"),
            F.row_number().over(w).alias("rn"),
        )
        .filter((F.col("rn") == 1) & (F.col("n_words") >= 10))
        .select("doc_id", "lang", "n_words")
    )


#: Global token budget for the mix plan (tokens, ws-split).
_MIX_BUDGET = 100_000


@register(
    "corpus_mix_plan",
    oracle=f"""
        WITH per_lang AS (
            SELECT lang,
                   CAST(SUM(len(string_split_regex(lower(text), '\\s+')))
                        AS BIGINT) AS lang_tokens
            FROM documents GROUP BY lang
        ), k AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_langs FROM per_lang
        )
        SELECT lang, lang_tokens,
               least(1.0, (CAST({_MIX_BUDGET} AS DOUBLE) / n_langs)
                          / CAST(lang_tokens AS DOUBLE)) AS sample_rate,
               CAST(floor(CAST(lang_tokens AS DOUBLE)
                    * least(1.0, (CAST({_MIX_BUDGET} AS DOUBLE) / n_langs)
                            / CAST(lang_tokens AS DOUBLE))) AS BIGINT)
                   AS expected_tokens
        FROM per_lang, k
    """,
    doc=f"Corpus mix plan: given a global budget of {_MIX_BUDGET} "
    "tokens split equally across languages, compute each language's "
    "sampling rate (capped at 1.0 — you cannot upsample what you "
    "don't have) and the expected token yield. The planning step "
    "before sample_stratified executes a mix; all arithmetic is "
    "exact-IEEE on integer token counts so the plan is deterministic. "
    "Plan shape: one two-phase agg + a broadcast 1-row scalar "
    "(language count) — no driver round-trip at any corpus size.",
)
def corpus_mix_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = parallelize(load_table(spark, sf_dir, "documents"))
    n_tokens = F.size(F.split(F.lower("text"), r"\s+"))
    per_lang = d.groupBy("lang").agg(
        F.sum(n_tokens).cast("long").alias("lang_tokens")
    )
    k = per_lang.agg(F.count(F.lit(1)).cast("long").alias("n_langs"))
    rate = F.least(
        F.lit(1.0),
        (F.lit(float(_MIX_BUDGET)) / F.col("n_langs"))
        / F.col("lang_tokens").cast("double"),
    )
    return (
        per_lang.join(F.broadcast(k))
        .withColumn("sample_rate", rate)
        .select(
            "lang",
            "lang_tokens",
            "sample_rate",
            F.floor(F.col("lang_tokens").cast("double") * F.col("sample_rate"))
            .cast("long")
            .alias("expected_tokens"),
        )
    )


@register(
    "quality_linear_score",
    oracle="""
        WITH toks AS (
            SELECT doc_id,
                   unnest(string_split_regex(lower(text), '\\s+')) AS word
            FROM documents
        ), scored AS (
            SELECT doc_id,
                   (CAST(concat('0x', substr(md5(word), 1, 3)) AS INTEGER)
                    % 997) - 498 AS w
            FROM toks WHERE word <> ''
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(w) AS BIGINT) AS raw_score,
               (CAST(SUM(w) AS DOUBLE)
                / (997.0 * CAST(COUNT(*) AS DOUBLE))) AS score
        FROM scored
        GROUP BY doc_id
    """,
    doc="Hashing-trick linear-model inference at corpus scale (the "
    "fastText-style quality-classifier shape): tokens hash to one of "
    "4096 feature buckets (md5 hex prefix — bit-identical across "
    "engines), each bucket carries a deterministic weight on an "
    "integer grid ((bucket % 997) - 498), and a document's score is "
    "the mean bucket weight. The Spark plan materializes the weight "
    "VECTOR as a broadcast 4096-row table joined on bucket — the "
    "exact layout a real exported linear model uses — then one "
    "two-phase integer-sum agg per doc; the oracle computes the "
    "weight inline, proving the join carries the same function. "
    "Integer sums make the result exact; the only double math is one "
    "final division. At 100 TB: explode + broadcast-hash join + "
    "map-side-combined agg — no shuffle of the token stream beyond "
    "the doc_id re-agg, no Python.",
)
def quality_linear_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = parallelize(load_table(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("word"),
    ).filter(F.col("word") != "")
    bucket = F.conv(F.substring(F.md5(F.col("word")), 1, 3), 16, 10).cast("int")
    toks = toks.select("doc_id", bucket.alias("bucket"))
    weights = spark.range(4096).select(
        F.col("id").cast("int").alias("bucket"),
        (F.pmod(F.col("id"), F.lit(997)) - 498).cast("int").alias("w"),
    )
    return (
        toks.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("w").cast("long").alias("raw_score"),
            (
                F.sum("w").cast("double")
                / (F.lit(997.0) * F.count(F.lit(1)).cast("double"))
            ).alias("score"),
        )
    )


@register(
    "corpus_split_train_eval",
    oracle="""
        WITH assigned AS (
            SELECT doc_id, n_chars,
                   substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2)
                       AS bucket
            FROM documents
        )
        SELECT doc_id, n_chars, bucket,
               CASE WHEN bucket < '08' THEN 'test'
                    WHEN bucket < '10' THEN 'val'
                    ELSE 'train' END AS split
        FROM assigned
    """,
    doc="Deterministic train/val/test split — the first stage of "
    "every training-data pipeline: each document hashes (salted "
    "md5 of its id) into one of 256 hex buckets, and fixed bucket "
    "ranges give ~3.1% test / ~3.1% val / ~93.8% train. "
    "Hash-based assignment (never an RNG, never a global sort + "
    "row_number) is the only split that is (a) reproducible across "
    "engines and reruns, (b) STABLE under corpus growth — a doc's "
    "split never changes when neighbors are added or removed, so "
    "eval sets stay uncontaminated across dataset versions — and "
    "(c) embarrassingly parallel: a narrow map stage, no shuffle, "
    "no driver state, the same plan at 100 TB as at 1 MB. The salt "
    "decorrelates this split from every other md5-keyed decision "
    "in the pipeline (sampling, sharding), which all use distinct "
    "salts for exactly that reason.",
)
def corpus_split_train_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    bucket = F.substring(
        F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 2
    )
    return d.select(
        "doc_id",
        "n_chars",
        bucket.alias("bucket"),
        F.when(bucket < "08", F.lit("test"))
        .when(bucket < "10", F.lit("val"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


@register(
    "curation_funnel_report",
    oracle="""
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_total,
               CAST(COUNT(*) FILTER (WHERE n_chars >= 200) AS BIGINT)
                   AS n_len_pass,
               CAST(COUNT(*) FILTER (WHERE lang IN
                    ('en', 'de', 'fr', 'es')) AS BIGINT) AS n_lang_pass,
               CAST(COUNT(*) FILTER (WHERE n_chars >= 200 AND lang IN
                    ('en', 'de', 'fr', 'es')) AS BIGINT) AS n_both_pass,
               CAST(COUNT(DISTINCT CASE WHEN n_chars >= 200 AND lang IN
                    ('en', 'de', 'fr', 'es') THEN md5(text) END)
                   AS BIGINT) AS n_unique_pass
        FROM documents GROUP BY source
    """,
    doc="Curation funnel report: the per-source survival counts every "
    "training-data pipeline publishes alongside its corpus (RefinedWeb"
    "/Dolma-style processing reports) — total docs, length-gate "
    "survivors, language-gate survivors, both gates, and exact-unique "
    "texts among the survivors (md5 identity, the dedup_exact key). "
    "One two-phase hash agg with conditional counts plus one "
    "conditional distinct — no joins, no second scan; output is "
    "bounded by the source vocabulary. The at-scale version of 'how "
    "many docs did each gate remove', answered in one pass instead "
    "of one query per gate.",
)
def curation_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    len_ok = F.col("n_chars") >= 200
    lang_ok = F.col("lang").isin("en", "de", "fr", "es")
    return d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.count(F.when(len_ok, 1)).cast("long").alias("n_len_pass"),
        F.count(F.when(lang_ok, 1)).cast("long").alias("n_lang_pass"),
        F.count(F.when(len_ok & lang_ok, 1)).cast("long").alias(
            "n_both_pass"
        ),
        F.countDistinct(
            F.when(len_ok & lang_ok, F.md5("text"))
        ).cast("long").alias("n_unique_pass"),
    )


@register(
    "token_vocab_coverage",
    oracle="""
        WITH toks AS (
            SELECT source,
                   unnest(string_split_regex(lower(text), '\\s+')) AS word
            FROM documents
        ), tok AS (
            SELECT source, word FROM toks WHERE word <> ''
        ), cnt AS (
            SELECT word, COUNT(*) AS c FROM tok GROUP BY word
        ), vocab AS (
            SELECT word FROM cnt ORDER BY c DESC, word LIMIT 100
        )
        SELECT t.source,
               CAST(COUNT(*) AS BIGINT) AS total_tokens,
               CAST(COUNT(v.word) AS BIGINT) AS covered_tokens,
               CAST(COUNT(v.word) AS DOUBLE) / COUNT(*) AS coverage
        FROM tok t LEFT JOIN vocab v ON t.word = v.word
        GROUP BY t.source
    """,
    doc="Tokenizer vocabulary coverage: what fraction of the corpus "
    "token stream is covered by the top-100 most frequent tokens, "
    "per source — the first diagnostic run when sizing a tokenizer "
    "vocabulary (coverage vs vocab-size is the curve BPE training "
    "walks). Token counts are one word-keyed agg; the top-100 "
    "vocabulary is a total-ordered (count DESC, word) limit — "
    "deterministic at ties — and broadcasts back onto the token "
    "stream as a LEFT join so uncovered tokens count toward the "
    "denominator. Integer counts + one final division. At 100 TB "
    "the vocab stays driver-tiny while the token stream never "
    "leaves the executors — the same two-phase shape as "
    "corpus_token_budget.",
)
def token_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = parallelize(load_table(spark, sf_dir, "documents"))
    tok = (
        d.select(
            "source",
            F.explode(F.split(F.lower("text"), r"\s+")).alias("word"),
        )
        .filter(F.col("word") != "")
    )
    cnt = tok.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    vocab = (
        cnt.orderBy(F.col("c").desc(), F.col("word"))
        .limit(100)
        .select("word", F.lit(1).alias("in_vocab"))
    )
    j = tok.join(F.broadcast(vocab), "word", "left")
    return j.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("total_tokens"),
        F.count("in_vocab").cast("long").alias("covered_tokens"),
        (F.count("in_vocab").cast("double") / F.count(F.lit(1))).alias(
            "coverage"
        ),
    )


@register(
    "corpus_dup_ngrams",
    oracle="""
        WITH t AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '\\s+'),
                       x -> x <> '') AS toks
            FROM documents
        ), g AS (
            SELECT doc_id,
                   md5(array_to_string(toks[i:i+7], ' ')) AS gram_md5
            FROM t, unnest(range(1, greatest(len(toks) - 7, 0) + 1)) u(i)
            WHERE len(toks) >= 8
        ), c AS (
            SELECT gram_md5,
                   CAST(COUNT(*) AS BIGINT) AS n_occ,
                   CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
            FROM g GROUP BY gram_md5
        )
        SELECT gram_md5, n_docs, n_occ
        FROM c WHERE n_docs >= 2
        ORDER BY n_occ DESC, gram_md5 LIMIT 100
    """,
    doc="Cross-document repeated 8-gram mining — the substring-"
    "duplication census behind 'Deduplicating Training Data Makes "
    "Language Models Better' (Lee et al. 2022): which exact token "
    "spans recur across documents, how often, and in how many "
    "documents. Grams are md5-keyed (constant-width shuffle rows "
    "instead of 8-word strings), counted in ONE two-phase hash agg "
    "computing total occurrences and distinct docs together, "
    "filtered to cross-doc spans, and top-100'd under the "
    "(n_occ DESC, gram_md5) total order — Spark executes the limit "
    "as TakeOrderedAndProject (no global sort). At 100 TB this is "
    "the standard pre-pass that feeds span-removal: explode is "
    "map-side, the agg absorbs gram skew in partials, and the "
    "output is top-k-bounded.",
)
def corpus_dup_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = parallelize(load_table(spark, sf_dir, "documents"))
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "")
    t = d.select("doc_id", toks.alias("toks")).filter(F.size("toks") >= 8)
    grams = t.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 7),"
                " i -> md5(array_join(slice(toks, i, 8), ' ')))"
            )
        ).alias("gram_md5"),
    )
    c = grams.groupBy("gram_md5").agg(
        F.count(F.lit(1)).cast("long").alias("n_occ"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
    )
    return (
        c.filter(F.col("n_docs") >= 2)
        .select("gram_md5", "n_docs", "n_occ")
        .orderBy(F.col("n_occ").desc(), "gram_md5")
        .limit(100)
    )


@register(
    "corpus_length_histogram",
    oracle="""
        SELECT source,
               CAST(length(to_base(n_chars, 2)) AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(MIN(n_chars) AS BIGINT) AS min_chars,
               CAST(MAX(n_chars) AS BIGINT) AS max_chars,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents GROUP BY source, length(to_base(n_chars, 2))
    """,
    doc="Per-source document-length histogram on LOG2 buckets "
    "(bucket = bit length of n_chars) — the length-distribution "
    "profile every corpus report opens with and the input to "
    "length-balanced sampling. The log2 bucket is computed with "
    "PURE INTEGER machinery — the length of the base-2 string "
    "(Spark conv(n,10,2), DuckDB to_base(n,2)) — because "
    "floor(log2(x)) through doubles can mis-bucket exact powers of "
    "two per engine's libm. One two-phase hash agg; group count "
    "is sources × ~20 buckets regardless of corpus size.",
)
def corpus_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    bucket = F.length(F.conv(F.col("n_chars"), 10, 2)).cast("long")
    return (
        d.select("source", bucket.alias("bucket"), "n_chars")
        .groupBy("source", "bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("n_chars").cast("long").alias("min_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


#: Hashed-feature bucket count for corpus_dsir_features (DSIR uses
#: 10k buckets at corpus scale; 256 keeps every bucket populated at
#: fixture scale — the plan is identical at any width).
DSIR_BUCKETS = 256


@register(
    "corpus_dsir_features",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, lang,
                   string_split_regex(lower(text), '\\s+') AS toks
            FROM documents
        ), bg AS (
            -- NOTE: array_to_string, NOT concat_ws — DuckDB's
            -- concat_ws(' ', list) stringifies the list ('[a, b]')
            -- instead of joining it, which count-only keys never see
            -- but md5(gram) does.
            SELECT doc_id, lang,
                   array_to_string(toks[i:i+1], ' ') AS gram
            FROM t, unnest(range(1, greatest(len(toks) - 1, 1) + 1)) u(i)
        ), buck AS (
            SELECT doc_id, lang,
                   CAST(concat('0x', substr(md5(gram), 1, 15)) AS BIGINT)
                       % {DSIR_BUCKETS} AS bucket
            FROM bg
        ), profile AS (
            SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM buck WHERE lang = 'en' GROUP BY bucket
        )
        SELECT b.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(SUM(COALESCE(p.cnt, 0)) AS BIGINT) AS target_mass
        FROM buck b LEFT JOIN profile p ON b.bucket = p.bucket
        GROUP BY b.doc_id
    """,
    doc=f"DSIR-style hashed importance features (Xie et al. 2023, "
    "'Data Selection for Language Models via Importance Resampling'): "
    f"each document's bigrams hash into {DSIR_BUCKETS} buckets on the "
    "portable md5-grid, a TARGET-domain profile (here lang='en') "
    "counts bucket mass, and each document scores the total target "
    "mass its bigrams land on — the integer-exact numerator of the "
    "importance weight (the full DSIR weight adds log-ratios; the "
    "hashed-feature join IS the scale-critical part). The profile is "
    f"a {DSIR_BUCKETS}-row broadcast; the fact side is explode + one "
    "equi-join + one doc-keyed agg — map-side combine absorbs "
    "bigram skew, nothing collects. All outputs exact integers.",
)
def corpus_dsir_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = parallelize(load_table(spark, sf_dir, "documents"))
    bg = d.select(
        "doc_id", "lang", F.explode(_bigrams(distinct=False)).alias("gram")
    )
    buck = bg.select(
        "doc_id",
        "lang",
        (
            F.conv(F.substring(F.md5("gram"), 1, 15), 16, 10).cast("long")
            % DSIR_BUCKETS
        ).alias("bucket"),
    )
    profile = (
        buck.filter(F.col("lang") == "en")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    return (
        buck.join(F.broadcast(profile), "bucket", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum(F.coalesce("cnt", F.lit(0))).cast("long").alias(
                "target_mass"
            ),
        )
    )


#: ONE oracle object shared by the flat gate and its two-stage
#: sibling below — the skew-playbook convention (a shared constant
#: cannot drift the way a copied string can).
PERCENTILE_GATE_ORACLE = """
        WITH ranked AS (
            SELECT doc_id, lang, n_chars,
                   CAST(ROW_NUMBER() OVER (PARTITION BY lang
                       ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rn,
                   CAST(COUNT(*) OVER (PARTITION BY lang) AS BIGINT) AS n
            FROM documents
        )
        SELECT doc_id, lang, rn, n,
               CAST(CASE WHEN (rn - 1) * 100 <= (n - 1) * 60
                    THEN 1 ELSE 0 END AS BIGINT) AS keep
        FROM ranked
"""


@register(
    "curation_percentile_gate",
    oracle=PERCENTILE_GATE_ORACLE,
    doc="Percentile-based quality gate: keep the top 60% of each "
    "language by a quality proxy (n_chars here; production swaps in "
    "quality_linear_score — identical plan) — the per-stratum "
    "percentile cut every curation pipeline applies so low-resource "
    "languages aren't starved by a global threshold. The gate is "
    "PURE INTEGER: rank under the (proxy DESC, doc_id) total order, "
    "keep ⇔ (rn−1)·100 ≤ (n−1)·60 — no percent_rank doubles, no "
    "single-row 0/0 edge. One window + count over the same lang "
    "partitioning (one shuffle); at 100 TB the per-lang sort is the "
    "cost and an approximate-quantile threshold (agg_percentile_"
    "approx) replaces the full rank at identical semantics minus "
    "exactness.",
)
def curation_percentile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.col("n_chars").desc(), "doc_id")
    cw = Window.partitionBy("lang")
    ranked = d.select(
        "doc_id",
        "lang",
        F.row_number().over(w).cast("long").alias("rn"),
        F.count(F.lit(1)).over(cw).cast("long").alias("n"),
    )
    return ranked.select(
        "doc_id",
        "lang",
        "rn",
        "n",
        F.when((F.col("rn") - 1) * 100 <= (F.col("n") - 1) * 60, 1)
        .otherwise(0)
        .cast("long")
        .alias("keep"),
    )


#: Quality-proxy bucket width for the two-stage gate. n_chars spans
#: ~[44, 577] in every fixture arm, so 10 yields ~55 buckets per
#: language; exactness holds for ANY width (floor division is
#: monotone in the ranked value, so ties never straddle a bucket).
GATE_BUCKET_WIDTH = 10


@register(
    "curation_percentile_gate_twostage",
    oracle=PERCENTILE_GATE_ORACLE,
    doc="Skew-immune rewrite of curation_percentile_gate, "
    "oracle-identical to the flat key — the rank-window playbook "
    "(family five, win_rank_dense_twostage) transplanted off the "
    "TPC-H fixture onto the curation surface, where the straggler "
    "is STRUCTURAL: the flat gate ranks every document of a "
    "language in one task (5-value lang column — the audited "
    "low-cardinality window shape), which at 100 TB is a failed "
    "stage for the dominant language. Bucket by the ranked value "
    "itself (n_chars div 10 — monotone, ties never straddle): local "
    "rank inside (lang, bucket), per-bucket COUNT offsets cumulated "
    "over ≤ ~55 summary rows per language (bucket DESC = better "
    "first), rn = offset + local rank; n = per-lang total over the "
    "same summary; the keep flag replays the flat key's pure-integer "
    "arithmetic. No document-scale task holds more than one "
    "(lang, char-decade); every event-scale exchange is keyed "
    "(lang, bucket).",
)
def curation_percentile_gate_twostage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "n_chars",
        F.floor(F.col("n_chars") / F.lit(GATE_BUCKET_WIDTH))
        .cast("long")
        .alias("vbucket"),
    )

    # Stage 1: local rank inside (lang, value-bucket) under the same
    # (n_chars DESC, doc_id) total order.
    wloc = Window.partitionBy("lang", "vbucket").orderBy(
        F.col("n_chars").desc(), "doc_id"
    )
    local = d.withColumn("rn_loc", F.row_number().over(wloc))

    # Stage 2: per-bucket counts (map-side combinable) -> cumulative
    # strictly-better-bucket offsets + per-lang totals over summary
    # rows only.
    counts = local.groupBy("lang", "vbucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wseam = Window.partitionBy("lang").orderBy(F.col("vbucket").desc())
    wlang = Window.partitionBy("lang")
    offsets = counts.select(
        "lang",
        "vbucket",
        F.coalesce(
            F.sum("cnt").over(
                wseam.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("offset"),
        F.sum("cnt").over(wlang).alias("n_lang"),
    )

    # Stage 3: fold offsets back on the stage-1 keys; the gate
    # arithmetic replays the flat key's integer expression.
    folded = local.join(offsets, ["lang", "vbucket"])
    rn = (F.col("offset") + F.col("rn_loc")).cast("long")
    n = F.col("n_lang").cast("long")
    return folded.select(
        "doc_id",
        "lang",
        rn.alias("rn"),
        n.alias("n"),
        F.when((rn - 1) * 100 <= (n - 1) * 60, 1)
        .otherwise(0)
        .cast("long")
        .alias("keep"),
    )


@register(
    "decontam_span_stats",
    oracle="""
        WITH t AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '\\s+'),
                       x -> x <> '') AS toks
            FROM documents
        ), sh AS (
            SELECT DISTINCT doc_id,
                   array_to_string(toks[i:i+2], ' ') AS sh
            FROM t, unnest(range(1, greatest(len(toks) - 2, 0) + 1)) u(i)
            WHERE len(toks) >= 3
        ), bench AS (
            SELECT DISTINCT sh FROM sh WHERE doc_id < 10
        ), corpus AS (
            SELECT doc_id, sh FROM sh WHERE doc_id >= 10
        )
        SELECT c.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_shingles,
               CAST(COUNT(b.sh) AS BIGINT) AS n_contam,
               CAST(COUNT(*) - COUNT(b.sh) AS BIGINT) AS n_clean
        FROM corpus c LEFT JOIN bench b ON c.sh = b.sh
        GROUP BY c.doc_id
    """,
    doc="Decontamination span statistics: per corpus document, how "
    "many of its distinct word 3-shingles collide with a benchmark "
    "set (docs 0–9 stand in for the eval suite) — the span-level "
    "accounting that decides between dropping a document and "
    "surgically removing spans (the n_contam/n_shingles ratio is "
    "the drop-vs-clean decision every decontamination run makes; "
    "contamination_overlap reports the doc-level join, THIS key "
    "pins the span arithmetic). Benchmark shingle set is broadcast "
    "(eval suites are tiny vs the corpus); corpus side is explode + "
    "distinct + one LEFT equi-join + one doc agg. All integers.",
)
def decontam_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = parallelize(load_table(spark, sf_dir, "documents"))
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "")
    t = d.select("doc_id", toks.alias("toks")).filter(F.size("toks") >= 3)
    sh = t.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 2),"
                " i -> array_join(slice(toks, i, 3), ' '))"
            )
        ).alias("sh"),
    ).distinct()
    bench = (
        sh.filter(F.col("doc_id") < 10).select("sh").distinct()
        .withColumn("hit", F.lit(1))
    )
    corpus = sh.filter(F.col("doc_id") >= 10)
    return (
        corpus.join(F.broadcast(bench), "sh", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.count("hit").cast("long").alias("n_contam"),
            (F.count(F.lit(1)) - F.count("hit")).cast("long").alias("n_clean"),
        )
    )


# ---- round-7 additions: training-order + novelty + upsampling ----


@register(
    "corpus_global_shuffle",
    oracle="""
        WITH h AS (
            SELECT doc_id,
                   CAST(concat('0x', substr(md5(doc_id || ':epoch0'),
                       1, 15)) AS BIGINT) AS h
            FROM documents
        )
        SELECT doc_id, h % 64 AS shard,
               CAST(row_number() OVER (
                   PARTITION BY h % 64 ORDER BY h, doc_id
               ) AS BIGINT) AS pos
        FROM h
    """,
    doc="Deterministic global training-order shuffle — the epoch-"
    "seeded hash shuffle every LLM data loader needs (same docs + "
    "same seed ⇒ same order, any cluster size): shard = "
    "hash(doc_id, epoch) mod 64, position = rank of the hash inside "
    "the shard. Hash rides the portable md5-15-hex-digit grid "
    "(text_minhash_export convention) so the driver pins actual "
    "positions, not just counts. Spark plan: ONE hash exchange on "
    "shard + per-partition sort — there is deliberately NO global "
    "sort/range exchange: readers consume shards independently "
    "(shard files are the unit of data-parallel training), so a "
    "total order across shards would buy nothing and cost a 100 TB "
    "range repartition. Changing the epoch literal reshuffles "
    "everything, which is the feature.",
)
def corpus_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"),
                           F.lit(":epoch0"))),
            1, 15,
        ),
        16, 10,
    ).cast("long")
    hashed = d.select("doc_id", h.alias("h"))
    shard = F.pmod(F.col("h"), F.lit(64)).alias("shard")
    w = Window.partitionBy(F.pmod(F.col("h"), F.lit(64))).orderBy(
        "h", "doc_id"
    )
    return hashed.select(
        "doc_id",
        shard,
        F.row_number().over(w).cast("long").alias("pos"),
    )


@register(
    "text_ngram_novelty",
    oracle="""
        WITH t AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '\\s+'),
                       x -> x <> '') AS toks
            FROM documents
        ), g AS (
            SELECT DISTINCT doc_id,
                   md5(array_to_string(toks[i:i+2], ' ')) AS g
            FROM t, unnest(range(1, greatest(len(toks) - 2, 0) + 1)) u(i)
            WHERE len(toks) >= 3
        ), f AS (
            SELECT doc_id,
                   MIN(doc_id) OVER (PARTITION BY g) AS first_doc
            FROM g
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_grams,
               CAST(COUNT(*) FILTER (WHERE first_doc = doc_id)
                   AS BIGINT) AS n_novel,
               CAST(COUNT(*) FILTER (WHERE first_doc = doc_id) * 1000
                   // COUNT(*) AS BIGINT) AS novel_permille
        FROM f GROUP BY doc_id
    """,
    doc="Per-document n-gram NOVELTY against the corpus prefix — for "
    "each doc, the fraction of its distinct 3-grams whose FIRST "
    "corpus occurrence (min doc_id, the ingest order) is this doc. "
    "The incremental-crawl signal (how much genuinely new text does "
    "each batch add — the marginal-value curve behind data-buying "
    "decisions), complementing corpus_dup_ngrams (which mines the "
    "repeated spans themselves). Grams are md5-keyed constant-width "
    "rows; novelty is permille on the exact integer grid. Plan: "
    "per-doc distinct (one exchange), a min-window over the gram "
    "key (second exchange — this IS the corpus-wide first-"
    "occurrence join, no way below one gram-keyed exchange), then "
    "a doc_id re-agg; all three key widths are md5/int64, and the "
    "window needs no sort beyond the exchange's local ordering.",
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = parallelize(load_table(spark, sf_dir, "documents"))
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "")
    t = d.select("doc_id", toks.alias("toks")).filter(F.size("toks") >= 3)
    g = t.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 2),"
                " i -> md5(array_join(slice(toks, i, 3), ' ')))"
            )
        ).alias("g"),
    ).distinct()
    f = g.select(
        "doc_id",
        F.min("doc_id").over(Window.partitionBy("g")).alias("first_doc"),
    )
    novel = F.count(F.when(F.col("first_doc") == F.col("doc_id"), 1))
    return f.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_grams"),
        novel.cast("long").alias("n_novel"),
        F.expr(
            "CAST(count(CASE WHEN first_doc = doc_id THEN 1 END) * 1000"
            " div count(*) AS LONG)"
        ).alias("novel_permille"),
    )


@register(
    "corpus_upsample_repeat",
    oracle="""
        WITH w AS (
            SELECT doc_id, source,
                   CAST(concat('0x', substr(md5(source), 1, 15))
                       AS BIGINT) % 3 + 1 AS n_copies
            FROM documents
        )
        SELECT doc_id, source, n_copies,
               CAST(unnest(generate_series(1, n_copies)) AS BIGINT)
                   AS copy_idx
        FROM w
    """,
    doc="Epoch-repeat upsampling materialized — expand each document "
    "into its integer repeat count for the training mix (the "
    "Llama/Dolma recipe: high-quality sources sampled >1 epoch, "
    "commodity crawl <1; here the per-source factor 1–3 derives "
    "deterministically from the md5 grid so the driver can check "
    "actual expansion rows). Downstream of corpus_mix_plan (which "
    "COMPUTES target weights); this key is the operator that turns "
    "weights into the physical repeated dataset corpus_pack_"
    "sequences consumes. Plan: map-only — sequence()/explode inside "
    "one codegen stage, zero exchanges; at 100 TB the expansion "
    "never shuffles (each task expands its own rows) and the "
    "2x-average row growth is the intended output volume.",
)
def corpus_upsample_repeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    n_copies = (
        F.conv(F.substring(F.md5("source"), 1, 15), 16, 10).cast("long")
        % 3
        + 1
    )
    return d.select(
        "doc_id",
        "source",
        n_copies.alias("n_copies"),
        F.explode(
            F.sequence(F.lit(1).cast("long"), n_copies)
        ).alias("copy_idx"),
    )
