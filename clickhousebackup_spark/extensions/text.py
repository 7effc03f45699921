"""Text-analysis operators over documents (north-star extensions,
`BASELINE.json:6` — the text half of a training-data pipeline).

All hot paths are JVM built-ins (split/regexp/aggregate); no Python
in any per-row loop. At 100 TB: tokenization is map-only; the word
count shuffles once on the word key (classic skew candidate — top
words dominate — which partial aggregation absorbs: each partition
pre-counts before the shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhousebackup_spark.exprs import oavg
from clickhousebackup_spark.registry import register
from clickhousebackup_spark.tables import load_table, parallelize


@register(
    "text_tokenize_count",
    oracle="""
        SELECT word, n FROM (
            SELECT word, COUNT(*) AS n,
                   ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, word) AS rn
            FROM (
                SELECT unnest(string_split_regex(lower(text), '\\s+')) AS word
                FROM documents
            ) WHERE word <> ''
            GROUP BY word
        ) WHERE rn <= 50
    """,
    doc="Tokenize + word frequencies, top-50 with word tiebreak.",
)
def text_tokenize_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = parallelize(load_table(spark, sf_dir, "documents"))
    words = d.select(
        F.explode(F.split(F.lower("text"), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("word"))
        .limit(50)
    )


@register(
    "text_lang_stats",
    oracle=f"""
        SELECT lang,
               COUNT(*) AS n_docs,
               {oavg('n_chars')} AS avg_chars,
               COUNT(DISTINCT source) AS n_sources
        FROM documents GROUP BY lang
    """,
    doc="Per-language doc count, avg length, distinct sources.",
)
def text_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhousebackup_spark.exprs import davg

    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        davg("n_chars").alias("avg_chars"),
        F.countDistinct("source").alias("n_sources"),
    )


@register(
    "text_quality_score",
    oracle="""
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS len_chars,
               CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS BIGINT)
                   AS n_punct,
               CAST(len(list_filter(string_split(lower(text), ' '),
                    w -> w IN ('the','a','an','and','or','of','to','in','is','it')))
                   AS BIGINT) AS n_stopwords,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
               (CAST(len(list_filter(string_split(lower(text), ' '),
                    w -> w IN ('the','a','an','and','or','of','to','in','is','it')))
                   AS DOUBLE)
                / CAST(len(string_split(text, ' ')) AS DOUBLE)) AS stopword_ratio
        FROM documents
    """,
    doc="Quality-scoring signals: length, punctuation count, stopword "
    "ratio — the usual pre-training heuristics, all JVM-side.",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = parallelize(load_table(spark, sf_dir, "documents"))
    stop = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")
    words = F.split(F.col("text"), " ")
    lower_words = F.split(F.lower("text"), " ")
    stop_arr = F.array(*[F.lit(s) for s in stop])
    n_stop = F.size(
        F.filter(lower_words, lambda w: F.array_contains(stop_arr, w))
    ).cast("long")
    n_words = F.size(words).cast("long")
    return d.select(
        "doc_id",
        F.length("text").cast("long").alias("len_chars"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", r"[.,;:!?]", ""))
        ).cast("long").alias("n_punct"),
        n_stop.alias("n_stopwords"),
        n_words.alias("n_words"),
        (n_stop.cast("double") / n_words.cast("double")).alias("stopword_ratio"),
    )


@register(
    "text_lang_id",
    oracle="""
        SELECT doc_id, lang,
               CASE
                 WHEN len(list_filter(string_split(lower(text), ' '),
                      w -> w IN ('the','and','of','to','is'))) >=
                      len(list_filter(string_split(lower(text), ' '),
                      w -> w IN ('le','la','et','de','est')))
                 THEN 'en' ELSE 'fr' END AS lang_guess
        FROM documents
    """,
    doc="Language-ID heuristic: stopword-family vote (n-gram-free "
    "stand-in; a real pipeline would broadcast n-gram profiles and "
    "score with the same array primitives).",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = parallelize(load_table(spark, sf_dir, "documents"))
    lower_words = F.split(F.lower("text"), " ")

    def votes(markers):
        arr = F.array(*[F.lit(m) for m in markers])
        return F.size(F.filter(lower_words, lambda w: F.array_contains(arr, w)))

    en = votes(("the", "and", "of", "to", "is"))
    fr = votes(("le", "la", "et", "de", "est"))
    return d.select(
        "doc_id",
        "lang",
        F.when(en >= fr, "en").otherwise("fr").alias("lang_guess"),
    )


@register(
    "text_token_count",
    oracle="""
        SELECT doc_id,
               CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_ws_tokens,
               CAST(len(regexp_extract_all(
                   text, '[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\\s]')) AS BIGINT)
                   AS n_bpe_ish_tokens
        FROM documents
    """,
    doc="Token counting: whitespace + a BPE-ish regex (letter runs, "
    "short digit runs, single symbols) — the usual pre-tokenizer "
    "approximation for budget estimates.",
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = parallelize(load_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.size(F.split(F.col("text"), r"\s+")).cast("long").alias("n_ws_tokens"),
        F.size(
            F.expr(r"regexp_extract_all(text, '[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\\s]', 0)")
        ).cast("long").alias("n_bpe_ish_tokens"),
    )


@register(
    "text_fingerprint",
    oracle="""
        SELECT doc_id,
               list_reduce(
                   list_transform(
                       string_split_regex(lower(text), '\\s+'),
                       w -> CAST(concat('0x', substr(md5(w), 1, 15))
                                 AS BIGINT) % 1000000007),
                   (acc, h) -> (acc * 31 + h) % 1000000007
               ) AS fingerprint
        FROM documents
    """,
    doc="Document fingerprint: rolling hash (base-31 mod 1e9+7) over "
    "per-token hashes — order-sensitive near-identity for "
    "shingle-level dedup. Token hashes ride the portable "
    "md5-15-hex-digit grid (text_minhash_export convention, the r9 "
    "migration that made minhash/simhash exact-checkable) so the "
    "driver pins actual fingerprint VALUES, not just row counts — "
    "this closed the key's rows-only debt in round 15. The fold "
    "starts at 0, so both engines' reduce agrees on non-empty token "
    "lists (split of any string yields >= 1 token); all arithmetic "
    "stays < 2^35, far inside exact BIGINT.",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = parallelize(load_table(spark, sf_dir, "documents"))
    token_hashes = F.transform(
        F.split(F.lower("text"), r"\s+"),
        lambda w: F.conv(F.substring(F.md5(w), 1, 15), 16, 10).cast(
            "long"
        )
        % 1000000007,
    )
    return d.select(
        "doc_id",
        F.aggregate(
            token_hashes,
            F.lit(0).cast("long"),
            lambda acc, h: (acc * 31 + h) % 1000000007,
        ).alias("fingerprint"),
    )


@register(
    "text_pii_mask",
    oracle="""
        SELECT event_id,
               regexp_replace(props, '[0-9]+', '<NUM>', 'g') AS masked_props,
               regexp_replace(
                   concat('user', CAST(user_id AS VARCHAR), '@example.com'),
                   '[a-z0-9.]+@[a-z]+\\.[a-z]+', '<EMAIL>', 'g'
               ) AS masked_contact,
               CAST(length(regexp_extract_all(props, '[0-9]+'))
                    AS BIGINT) AS n_digit_runs
        FROM events
    """,
    doc="Training-data PII scrub: mask digit runs and email-shaped "
    "tokens via regexp_replace, count the masked spans. Pure JVM "
    "regex per row — embarrassingly parallel, no shuffle; the regex "
    "subset used ([0-9]+, char-class email) behaves identically in "
    "Java regex and RE2 so the oracle is exact. The contact column is "
    "synthesized from user_id so the fixture exercises the email path.",
)
def text_pii_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    contact = F.concat(F.lit("user"), F.col("user_id").cast("string"), F.lit("@example.com"))
    return ev.select(
        "event_id",
        F.regexp_replace("props", "[0-9]+", "<NUM>").alias("masked_props"),
        F.regexp_replace(contact, r"[a-z0-9.]+@[a-z]+\.[a-z]+", "<EMAIL>").alias(
            "masked_contact"
        ),
        F.size(F.expr("regexp_extract_all(props, '[0-9]+', 0)"))
        .cast("long")
        .alias("n_digit_runs"),
    )


@register(
    "text_rarity_score",
    oracle="""
        WITH grams AS (
            SELECT doc_id,
                   unnest(list_distinct(list_transform(
                       range(1, greatest(len(string_split_regex(lower(text), '\\s+')) - 1, 1) + 1),
                       i -> array_to_string(
                            string_split_regex(lower(text), '\\s+')[i:i+1], ' '))))
                       AS gram
            FROM documents
        ), freq AS (
            SELECT gram, COUNT(*) AS df FROM grams GROUP BY gram
        )
        SELECT g.doc_id,
               CAST(SUM(CAST(1000000 // f.df AS BIGINT)) AS BIGINT) AS rarity_raw,
               CAST(SUM(CAST(1000000 // f.df AS BIGINT)) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS rarity_score
        FROM grams g JOIN freq f ON g.gram = f.gram
        GROUP BY g.doc_id
    """,
    doc="Per-document rarity score: mean inverse document frequency of "
    "the doc's distinct bigrams, on an integer-scaled grid "
    "(floor(1e6/df) — integer sums are order-free, so the score is "
    "deterministic where a float idf sum would wobble; a log-idf "
    "variant would hit cross-engine libm last-ulp differences). High "
    "scores flag novel/rare content, low scores boilerplate — the "
    "third curation axis next to quality (surface stats) and "
    "repetition (self-similarity). Plan: explode + two-phase df "
    "count + one groupBy — the standard sketch shape.",
)
def text_rarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = parallelize(load_table(spark, sf_dir, "documents"))
    words = F.split(F.lower("text"), r"\s+")
    n = F.size(words)
    grams_arr = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n - 1, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(words, i, 2)),
        )
    )
    grams = d.select("doc_id", F.explode(grams_arr).alias("gram"))
    freq = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    scaled = F.floor(F.lit(1000000) / F.col("df")).cast("long")
    return (
        grams.join(freq, "gram")
        .groupBy("doc_id")
        .agg(
            F.sum(scaled).cast("long").alias("rarity_raw"),
            (F.sum(scaled).cast("double") / F.count(F.lit(1)).cast("double")).alias(
                "rarity_score"
            ),
        )
    )


@register(
    "text_chunk_passages",
    oracle="""
        WITH w AS (
            SELECT doc_id,
                   string_split_regex(lower(text), '\\s+') AS words
            FROM documents
        ), s AS (
            SELECT doc_id, words, len(words) AS n FROM w
        ), g AS (
            SELECT doc_id, words,
                   unnest(generate_series(0,
                       CAST(greatest(floor((n - 17) / 16.0), 0)
                            AS BIGINT))) AS chunk_idx
            FROM s
        )
        SELECT doc_id,
               CAST(chunk_idx AS BIGINT) AS chunk_idx,
               CAST(chunk_idx * 16 AS BIGINT) AS start_word,
               CAST(len(list_slice(words, chunk_idx * 16 + 1,
                                   chunk_idx * 16 + 32)) AS BIGINT)
                   AS chunk_len,
               md5(array_to_string(
                   list_slice(words, chunk_idx * 16 + 1,
                              chunk_idx * 16 + 32), ' ')) AS chunk_md5
        FROM g
    """,
    doc="RAG-style passage chunking: split each document into "
    "32-word chunks with 16-word stride (50% overlap); emit "
    "(doc_id, chunk_idx, start_word, chunk_len, md5(chunk)). The "
    "chunk starts are a sequence+posexplode over a computed index "
    "bound — every word lands in >=1 chunk, the final chunk may be "
    "short, and a doc shorter than one chunk still yields chunk 0. "
    "Map-side explode only (no shuffle, no UDF): at 100 TB chunking "
    "runs at scan speed and the 2x row amplification streams "
    "straight into the downstream writer; pairs with dedup_passage "
    "for chunk-level dedup.",
)
def text_chunk_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = parallelize(load_table(spark, sf_dir, "documents"))
    words = F.split(F.lower(F.col("text")), r"\s+")
    n = F.size(words)
    idx_max = (
        F.greatest(F.floor((n - F.lit(17)) / F.lit(16)), F.lit(0)).cast("int")
    )
    d = d.select(
        "doc_id",
        words.alias("words"),
        F.sequence(F.lit(0), idx_max).alias("starts"),
    )
    d = d.select("doc_id", "words", F.posexplode("starts").alias("chunk_idx", "_i"))
    chunk = F.slice(F.col("words"), F.col("chunk_idx") * 16 + 1, 32)
    return d.select(
        F.col("doc_id"),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        (F.col("chunk_idx") * 16).cast("long").alias("start_word"),
        F.size(chunk).cast("long").alias("chunk_len"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
    )


@register(
    "text_top_terms",
    oracle="""
        WITH toks AS (
            SELECT doc_id,
                   unnest(string_split_regex(lower(text), '\\s+')) AS word
            FROM documents
        ), tf AS (
            SELECT doc_id, word, COUNT(*) AS tf
            FROM toks WHERE word <> '' GROUP BY doc_id, word
        ), df AS (
            SELECT word, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY word
        ), scored AS (
            SELECT t.doc_id, t.word,
                   CAST(t.tf * (1000000 // df.df) AS BIGINT) AS weight,
                   ROW_NUMBER() OVER (
                       PARTITION BY t.doc_id
                       ORDER BY t.tf * (1000000 // df.df) DESC, t.word)
                       AS rn
            FROM tf t JOIN df df ON t.word = df.word
        )
        SELECT doc_id, word, weight FROM scored WHERE rn <= 3
    """,
    doc="Keyword extraction: top-3 terms per doc by tf x rarity, "
    "where rarity is the integer grid floor(1e6/df) — the log-free "
    "TF-IDF variant that stays bit-exact across engines (ln differs "
    "by ulps between libms, so a real IDF could flip ranks at ties). "
    "Plan: token explode -> (doc,word) tf agg -> word df agg -> "
    "equi join back -> per-doc top-k window; every stage map-side "
    "combines and the join key is the word, exactly the "
    "text_tokenize_count shuffle pattern. Word tiebreak makes the "
    "top-3 total-ordered.",
)
def text_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = parallelize(load_table(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    tf = toks.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    weight = (F.col("tf") * F.floor(F.lit(1000000) / F.col("df"))).cast("long")
    w = Window.partitionBy("doc_id").orderBy(
        F.col("weight").desc(), F.col("word")
    )
    return (
        tf.join(df, "word")
        .select("doc_id", "word", weight.alias("weight"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "word", "weight")
    )


@register(
    "token_fertility_stats",
    oracle="""
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len(string_split_regex(text, '\\s+')))
                   AS BIGINT) AS n_ws_tokens,
               CAST(SUM(len(regexp_extract_all(
                   text, '[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\\s]')))
                   AS BIGINT) AS n_bpe_tokens,
               CAST(CAST(SUM(len(regexp_extract_all(
                        text, '[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\\s]')))
                        AS BIGINT) AS DOUBLE)
                   / CAST(SUM(len(string_split_regex(text, '\\s+')))
                          AS BIGINT) AS fertility
        FROM documents GROUP BY lang
    """,
    doc="Tokenizer fertility per language: BPE-ish tokens divided by "
    "whitespace words — the standard tokenizer-equity metric "
    "(fertility ≫ 1 for a language means the tokenizer fragments it, "
    "inflating training cost and hurting quality; every multilingual "
    "tokenizer eval reports it). Token counts reuse the "
    "text_token_count regex family; both counts are exact integer "
    "sums (one two-phase agg, language-bounded state) and fertility "
    "is one identical int→double division in both engines. Explode-"
    "free: the regex counts run map-side inside codegen.",
)
def token_fertility_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = parallelize(load_table(spark, sf_dir, "documents"))
    ws = F.size(F.split(F.col("text"), r"\s+")).cast("long")
    bpe = F.size(
        F.expr(
            r"regexp_extract_all(text, '[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\\s]', 0)"
        )
    ).cast("long")
    agg = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(ws).cast("long").alias("n_ws_tokens"),
        F.sum(bpe).cast("long").alias("n_bpe_tokens"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "n_ws_tokens",
        "n_bpe_tokens",
        (F.col("n_bpe_tokens").cast("double") / F.col("n_ws_tokens")).alias(
            "fertility"
        ),
    )


@register(
    "text_c4_gates",
    oracle="""
        WITH t AS (
            SELECT doc_id, text, n_chars,
                   list_filter(string_split_regex(lower(text), '\\s+'),
                       x -> x <> '') AS toks
            FROM documents
        )
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_words,
               CAST(list_aggregate(list_transform(toks, x -> length(x)),
                   'max') AS BIGINT) AS max_word_len,
               CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                   AS BIGINT) AS n_alpha,
               CAST(length(regexp_replace(text, '[^0-9]', '', 'g'))
                   AS BIGINT) AS n_digit,
               CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                   * 1000 // n_chars AS BIGINT) AS alpha_permille,
               CAST(length(regexp_replace(text, '[^0-9]', '', 'g'))
                   * 1000 // n_chars AS BIGINT) AS digit_permille,
               CAST(CASE WHEN list_aggregate(list_transform(toks,
                       x -> length(x)), 'max') > 20
                    THEN 1 ELSE 0 END AS BIGINT) AS flag_long_word,
               CAST(CASE WHEN len(toks) < 20 THEN 1 ELSE 0 END
                   AS BIGINT) AS flag_short_doc,
               CAST(CASE WHEN contains(lower(text), 'lorem ipsum')
                    THEN 1 ELSE 0 END AS BIGINT) AS flag_lorem,
               CAST(CASE WHEN contains(text, '{') THEN 1 ELSE 0 END
                   AS BIGINT) AS flag_curly,
               CAST(CASE WHEN regexp_matches(substring(text,
                        length(text), 1), '[.!?]')
                    THEN 1 ELSE 0 END AS BIGINT) AS flag_terminal_punct
        FROM t
    """,
    doc="C4/Gopher-style heuristic quality gates per document "
    "(Raffel et al. C4 §2.2 + Rae et al. Gopher A.1.1): word count, "
    "max word length (>20 ⇒ likely boilerplate/URL soup), "
    "alpha/digit character ratios on an exact integer permille grid "
    "(no float division — (count·1000)//n_chars), the 'lorem ipsum' "
    "placeholder flag, the curly-brace code flag, the short-doc "
    "gate, and the terminal-punctuation line gate — the standard "
    "pre-filter battery that runs BEFORE expensive dedup/LM scoring "
    "in every web-corpus pipeline. Map-only (no shuffle at all): "
    "every gate is regexp/array arithmetic inside one codegen "
    "stage. Complements text_quality_score (stopword/punct ratios) "
    "and text_repetition_score (dup-gram gates).",
)
def text_c4_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = parallelize(load_table(spark, sf_dir, "documents"))
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "")
    n_alpha = F.length(F.regexp_replace("text", "[^A-Za-z]", "")).cast("long")
    n_digit = F.length(F.regexp_replace("text", "[^0-9]", "")).cast("long")
    max_wl = F.array_max(F.transform(toks, F.length)).cast("long")
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_words"),
        max_wl.alias("max_word_len"),
        n_alpha.alias("n_alpha"),
        n_digit.alias("n_digit"),
        F.expr(
            "CAST(length(regexp_replace(text, '[^A-Za-z]', '')) * 1000"
            " div n_chars AS LONG)"
        ).alias("alpha_permille"),
        F.expr(
            "CAST(length(regexp_replace(text, '[^0-9]', '')) * 1000"
            " div n_chars AS LONG)"
        ).alias("digit_permille"),
        F.when(max_wl > 20, 1).otherwise(0).cast("long").alias(
            "flag_long_word"
        ),
        F.when(F.size(toks) < 20, 1).otherwise(0).cast("long").alias(
            "flag_short_doc"
        ),
        F.when(F.lower("text").contains("lorem ipsum"), 1)
        .otherwise(0)
        .cast("long")
        .alias("flag_lorem"),
        F.when(F.col("text").contains("{"), 1).otherwise(0).cast("long")
        .alias("flag_curly"),
        F.when(
            F.substring(F.col("text"), -1, 1).rlike("[.!?]"), 1
        )
        .otherwise(0)
        .cast("long")
        .alias("flag_terminal_punct"),
    )


@register(
    "text_langid_confusion",
    oracle="""
        WITH votes AS (
            SELECT doc_id, lang,
                   len(list_filter(string_split(lower(text), ' '),
                       w -> w IN ('the','and','of','to','is'))) AS v_en,
                   len(list_filter(string_split(lower(text), ' '),
                       w -> w IN ('le','la','et','de','est'))) AS v_fr,
                   len(list_filter(string_split(lower(text), ' '),
                       w -> w IN ('el','los','y','en','es'))) AS v_es,
                   len(list_filter(string_split(lower(text), ' '),
                       w -> w IN ('der','die','und','zu','ist'))) AS v_de
            FROM documents
        ), pred AS (
            SELECT lang,
                   CASE WHEN v_en >= v_fr AND v_en >= v_es AND v_en >= v_de
                            THEN 'en'
                        WHEN v_fr >= v_es AND v_fr >= v_de THEN 'fr'
                        WHEN v_es >= v_de THEN 'es'
                        ELSE 'de' END AS lang_guess
            FROM votes
        ), cells AS (
            SELECT lang, lang_guess, CAST(COUNT(*) AS BIGINT) AS n
            FROM pred GROUP BY lang, lang_guess
        )
        SELECT lang, lang_guess, n,
               CAST(SUM(n) OVER (PARTITION BY lang) AS BIGINT)
                   AS lang_total,
               CAST(n * 1000 // SUM(n) OVER (PARTITION BY lang)
                   AS BIGINT) AS recall_permille
        FROM cells
    """,
    doc="Language-ID confusion matrix: the stopword-family classifier "
    "(text_lang_id's 4-way extension — en/fr/es/de marker votes with "
    "a deterministic argmax CASE chain; zh has no Latin stopwords so "
    "its row shows where a Latin-marker classifier dumps it) "
    "evaluated against the labeled lang column — per (true, "
    "predicted) counts plus integer-permille recall. This is the "
    "EVAL step of a curation pipeline: before trusting a lang-id "
    "gate at 100 TB you measure its confusion on labeled data, and "
    "the per-row permille IS the per-language recall diagonal. "
    "Map-only voting + one (true×pred ≤ 25 cells) agg + one window "
    "over the cell table. All integers.",
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = parallelize(load_table(spark, sf_dir, "documents"))
    lower_words = F.split(F.lower("text"), " ")

    def votes(markers):
        arr = F.array(*[F.lit(m) for m in markers])
        return F.size(F.filter(lower_words, lambda w: F.array_contains(arr, w)))

    v_en = votes(("the", "and", "of", "to", "is"))
    v_fr = votes(("le", "la", "et", "de", "est"))
    v_es = votes(("el", "los", "y", "en", "es"))
    v_de = votes(("der", "die", "und", "zu", "ist"))
    pred = d.select(
        "lang",
        F.when((v_en >= v_fr) & (v_en >= v_es) & (v_en >= v_de), "en")
        .when((v_fr >= v_es) & (v_fr >= v_de), "fr")
        .when(v_es >= v_de, "es")
        .otherwise("de")
        .alias("lang_guess"),
    )
    cells = pred.groupBy("lang", "lang_guess").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w = Window.partitionBy("lang")
    return cells.select(
        "lang",
        "lang_guess",
        "n",
        F.sum("n").over(w).cast("long").alias("lang_total"),
        F.expr("CAST(n * 1000 div SUM(n) OVER (PARTITION BY lang) AS LONG)")
        .alias("recall_permille"),
    )


@register(
    "text_boilerplate_prefix",
    oracle="""
        WITH p AS (
            SELECT doc_id, source,
                   md5(array_to_string(
                       list_filter(string_split_regex(lower(text),
                           '\\s+'), x -> x <> '')[1:8], ' '))
                       AS prefix_md5
            FROM documents
        )
        SELECT prefix_md5,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
               CAST(MIN(doc_id) AS BIGINT) AS first_doc_id
        FROM p GROUP BY prefix_md5
        HAVING COUNT(*) >= 2
    """,
    doc="Boilerplate-prefix detection: documents sharing their first "
    "8 words (md5 of the normalized prefix) grouped and counted — "
    "the header/template detector web pipelines run before dedup "
    "(shared navigation headers and legal boilerplate produce "
    "near-dups that per-doc quality gates miss; CCNet/Dolma strip "
    "repeated line-level prefixes the same way). n_sources "
    "distinguishes within-site templates (1 source) from syndicated "
    "content (many). One hash-groupBy on the 16-byte prefix key "
    "with min-id as the exemplar pointer — exactly the dedup_exact "
    "shape, never pairwise. Map-side prefix extraction inside "
    "codegen.",
)
def text_boilerplate_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = parallelize(load_table(spark, sf_dir, "documents"))
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "")
    prefix = F.md5(F.array_join(F.slice(toks, 1, 8), " "))
    return (
        d.select("doc_id", "source", prefix.alias("prefix_md5"))
        .groupBy("prefix_md5")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("source").cast("long").alias("n_sources"),
            F.min("doc_id").cast("long").alias("first_doc_id"),
        )
        .filter(F.col("n_docs") >= 2)
    )


@register(
    "text_inverted_index",
    oracle="""
        WITH t AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '\\s+'),
                       x -> x <> '') AS toks
            FROM documents
        ), tok AS (
            SELECT DISTINCT doc_id,
                   array_to_string(toks[i:i+1], ' ') AS term
            FROM t, unnest(range(1, greatest(len(toks) - 1, 1) + 1)) u(i)
        ), df AS (
            SELECT term, CAST(COUNT(*) AS BIGINT) AS df
            FROM tok GROUP BY term
        )
        SELECT t.term, d.df,
               string_agg(CAST(t.doc_id AS VARCHAR), ','
                   ORDER BY t.doc_id) AS postings
        FROM tok t JOIN df d ON t.term = d.term
        WHERE d.df BETWEEN 2 AND 16
        GROUP BY t.term, d.df
    """,
    doc="Inverted-index build (the experimental CH full-text index / "
    "every search engine's core artifact): BIGRAM term → sorted "
    "posting list of doc_ids, restricted to the useful document-"
    "frequency band (2 ≤ df ≤ 16 — df=1 postings are pointless, "
    "high-df terms belong in stopword skip-lists, and the band "
    "keeps posting lists bounded so the CSV contract stays "
    "hash-checkable). Bigram terms, not unigrams: the fixture's "
    "unigram vocabulary is 31 words all with df in the hundreds — "
    "a unigram band would be empty at every SF (0-row results are "
    "vacuous evidence), while phrase terms give a real selective "
    "index (phrase indexing is also what CH's ngrambf skip indexes "
    "do). Tokenize → per-doc DISTINCT → df count → band filter "
    "BEFORE the posting-list aggregation, so frequent terms never "
    "materialize lists at all — the order every real index build "
    "uses. Two aggs + one term-keyed join, skew absorbed by the df "
    "prefilter.",
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = parallelize(load_table(spark, sf_dir, "documents"))
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "")
    t = d.select("doc_id", toks.alias("toks"))
    terms = F.expr(
        "transform(sequence(1, greatest(size(toks) - 1, 1)),"
        " i -> array_join(slice(toks, i, 2), ' '))"
    )
    tok = t.select("doc_id", F.explode(terms).alias("term")).distinct()
    df_t = tok.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    band = df_t.filter((F.col("df") >= 2) & (F.col("df") <= 16))
    return (
        tok.join(band, "term")
        .groupBy("term", "df")
        .agg(
            F.array_join(
                F.sort_array(F.collect_list(F.col("doc_id"))), ","
            ).alias("postings")
        )
    )


#: Blocklist stand-in (the C4/Dolma badwords-gate shape): a real
#: deployment swaps in its policy list; these three terms exercise
#: a rare hit ('dup': ~0.5% of docs), a common hit ('slow'), and a
#: never-hit ('forbidden') against the fixture vocabulary so every
#: branch is non-vacuous at sf0.01. ONE shared constant feeds both
#: engines.
BLOCKLIST = ("dup", "forbidden", "slow")


@register(
    "text_blocklist_filter",
    oracle=f"""
        WITH w AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '\\s+'),
                               x -> x <> '') AS words
            FROM documents
        )
        SELECT doc_id,
               CAST(len(list_filter(words,
                    x -> list_contains({list(BLOCKLIST)}, x)))
                    AS BIGINT) AS n_blocked_hits,
               CAST(len(list_distinct(list_filter(words,
                    x -> list_contains({list(BLOCKLIST)}, x))))
                    AS BIGINT) AS n_blocked_terms,
               COALESCE(list_min(list_filter(words,
                    x -> list_contains({list(BLOCKLIST)}, x))), '')
                    AS first_blocked,
               CAST(CASE WHEN len(list_filter(words,
                    x -> list_contains({list(BLOCKLIST)}, x))) > 0
                    THEN 1 ELSE 0 END AS BIGINT) AS blocked
        FROM w
    """,
    doc="Blocklist/badwords document gate (the C4 §2.2 'dirty word' "
    "filter every public pretraining corpus applies): per doc, the "
    "total blocked-token occurrences, distinct blocked terms, the "
    "alphabetically-first hit (deterministic representative for "
    "audit samples), and the drop flag. Token-grain exact membership "
    "against ONE shared blocklist constant — not substring matching, "
    "which is the documented Scunthorpe failure mode of naive "
    "implementations. Map-only (no shuffle, no UDF): at 100 TB this "
    "runs at parquet-scan speed and composes with the Gopher gate in "
    "the same pass. A real deployment swaps BLOCKLIST for its policy "
    "list; the stand-in terms exercise rare/common/absent branches "
    "on the fixture vocabulary.",
)
def text_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    words = F.filter(
        F.split(F.lower("text"), r"\s+"), lambda x: x != F.lit("")
    )
    blocked_arr = F.filter(
        words,
        lambda x: F.array_contains(
            F.array(*[F.lit(t) for t in BLOCKLIST]), x
        ),
    )
    return d.select(
        "doc_id",
        F.size(blocked_arr).cast("long").alias("n_blocked_hits"),
        F.size(F.array_distinct(blocked_arr)).cast("long").alias(
            "n_blocked_terms"
        ),
        F.coalesce(F.array_min(blocked_arr), F.lit("")).alias(
            "first_blocked"
        ),
        (F.size(blocked_arr) > 0).cast("long").alias("blocked"),
    )
