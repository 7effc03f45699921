"""Training-set assembly operators — the stages that turn a curated
corpus into model-ready input: GPT-style sequence packing, corpus
n-gram LM scoring, SemDeDup-style semantic dedup, and content-defined
chunking.

These extend the curation family (extensions/curation.py) toward the
last mile of an LLM data pipeline. Everything is explode + two-phase
hash aggregation, per-stream window cumsums, or equi-key joins — the
shapes that survive 100 TB:

- ``corpus_pack_sequences`` packs per (lang, shard) streams; the
  shard key (an md5 hex prefix — deterministic, engine-portable)
  bounds every window partition to 1/16th of a language, exactly how
  production packers shard the token stream per writer task.
- ``text_ngram_lm_score`` joins doc bigrams against corpus-level
  count tables — vocabulary-sized aggregates a real deployment would
  broadcast; the fact-table side never collects.
- ``dedup_semantic`` scopes the quadratic verify to within-cluster
  pairs (the SemDeDup trick: k-means first, all-pairs only inside a
  cluster), expressed as a pure equi-key self-join on the cluster id.
- ``text_cdc_chunks`` is FastCDC re-expressed: hash-gated boundaries
  make chunk edges content-defined, so an inserted sentence shifts
  only its own chunk — per-doc window cumsum, one shuffle on doc_id.

Determinism: no RNG anywhere — shard keys and chunk boundaries come
from md5 hex prefixes (bit-identical in Spark and DuckDB); per-doc
probability sums go through the floor-grid (floor(p·1e6) as BIGINT)
so no computed double is ever decimal-rounded (NOTES.md float traps);
keep-one rules are min-id-wins total orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhousebackup_spark.registry import register
from clickhousebackup_spark.tables import load_table, parallelize

#: Context length for corpus_pack_sequences. Production values are
#: 2048–8192; 128 keeps multi-sequence docs present at fixture scale.
#: The plan is identical at any L.
PACK_L = 128

#: SemDeDup within-cluster threshold. The synthetic embeddings are
#: near-orthogonal Gaussians (within-label max cosine ≈ 0.45), so the
#: demonstration threshold sits below that; production near-dup
#: pruning runs the same plan at τ ≈ 0.95.
SEM_TAU = 0.35


_WORDS_SQL = "string_split_regex(lower(text), '\\s+')"


@register(
    "corpus_pack_sequences",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, lang,
                   substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
                   CAST(len({_WORDS_SQL}) AS BIGINT) AS n_tokens
            FROM documents
        ), packed AS (
            SELECT doc_id, lang, shard, n_tokens,
                   SUM(n_tokens) OVER (
                       PARTITION BY lang, shard ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - n_tokens AS tok_start
            FROM toks
        )
        -- DuckDB types integer window SUMs as HUGEINT, which pandas
        -- renders as float64 and breaks the driver's value hash
        -- ("123.0" vs "123"); CAST every cumsum-derived column back
        -- to BIGINT (round-5 driver hash-FAIL root cause).
        SELECT doc_id, lang, shard, n_tokens,
               CAST(tok_start AS BIGINT) AS tok_start,
               CAST(tok_start // {PACK_L} AS BIGINT) AS seq_first,
               CAST((tok_start + n_tokens - 1) // {PACK_L} AS BIGINT)
                   AS seq_last,
               CAST((tok_start + n_tokens - 1) // {PACK_L}
                   - tok_start // {PACK_L} + 1 AS BIGINT) AS n_seqs
        FROM packed
    """,
    doc="GPT-style sequence packing with document concatenation: each "
    "(lang, shard) stream concatenates its docs in doc_id order and "
    "slices the token stream into fixed-L training sequences; a doc "
    "then spans seq_first..seq_last. The shard key is an md5 hex "
    "prefix of doc_id (16 deterministic shards — no RNG), so every "
    "window partition is bounded at 1/16th of a language: this is how "
    "production packers parallelize — one writer per shard — and why "
    "the plan has no global sort and no single-partition window. All "
    "output columns are integers (token counts, prefix sums, integer "
    "division): nothing to float-trap. One shuffle on (lang, shard).",
)
def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = parallelize(load_table(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id",
        "lang",
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).alias("shard"),
        F.size(F.split(F.lower("text"), r"\s+")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = toks.withColumn(
        "tok_start", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    seq_first = F.expr(f"tok_start div {PACK_L}")
    seq_last = F.expr(f"(tok_start + n_tokens - 1) div {PACK_L}")
    return packed.select(
        "doc_id",
        "lang",
        "shard",
        "n_tokens",
        "tok_start",
        seq_first.alias("seq_first"),
        seq_last.alias("seq_last"),
        (seq_last - seq_first + 1).alias("n_seqs"),
    )


@register(
    "text_ngram_lm_score",
    oracle=f"""
        WITH grams AS (
            SELECT doc_id,
                   w[i] AS w1, w[i + 1] AS w2
            FROM (SELECT doc_id, {_WORDS_SQL} AS w FROM documents),
                 unnest(generate_series(1, len(w) - 1)) AS t(i)
            WHERE len(w) >= 2
        ), c2 AS (
            SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n2
            FROM grams GROUP BY w1, w2
        ), c1 AS (
            SELECT w1, CAST(COUNT(*) AS BIGINT) AS n1
            FROM grams GROUP BY w1
        )
        SELECT g.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(SUM(CAST(floor(1000000.0 * (CAST(n2 AS DOUBLE)
                    / CAST(n1 AS DOUBLE))) AS BIGINT)) AS BIGINT)
                   AS sum_prob_micro,
               CAST(SUM(CAST(floor(1000000.0 * (CAST(n2 AS DOUBLE)
                    / CAST(n1 AS DOUBLE))) AS BIGINT)) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS avg_prob_micro
        FROM grams g
        JOIN c2 ON g.w1 = c2.w1 AND g.w2 = c2.w2
        JOIN c1 ON g.w1 = c1.w1
        GROUP BY g.doc_id
    """,
    doc="Corpus bigram-LM fluency score (the KenLM-filter shape from "
    "CCNet/RefinedWeb): P(w2|w1) = c(w1,w2)/c(w1·) estimated from the "
    "corpus itself, and each doc scores the mean conditional "
    "probability of its own bigram instances. High avg ⇒ the doc "
    "looks like the corpus; low ⇒ boilerplate/noise. Probabilities "
    "go through the floor-grid (floor(p·1e6) as BIGINT — NOTES.md "
    "float traps: never ln/log in a checked column, and integer sums "
    "are order-free). Scale: the count tables are vocabulary-sized "
    "(broadcast candidates at any corpus size); the doc-gram side is "
    "explode + two equi-key joins + one two-phase agg — word skew on "
    "the join keys is absorbed by AQE skew split, and nothing ever "
    "collects. Docs with <2 tokens have no bigrams and drop out.",
)
def text_ngram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = parallelize(load_table(spark, sf_dir, "documents"))
    words = F.split(F.lower("text"), r"\s+")
    grams = (
        d.select("doc_id", words.alias("w"))
        .filter(F.size("w") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(w) - 1),"
                    " i -> struct(w[i - 1] AS w1, w[i] AS w2))"
                )
            ).alias("g"),
        )
        .select("doc_id", F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))
    )
    c2 = grams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n2"))
    c1 = grams.groupBy("w1").agg(F.count(F.lit(1)).alias("n1"))
    p_micro = F.floor(
        1000000.0 * (F.col("n2").cast("double") / F.col("n1").cast("double"))
    ).cast("long")
    return (
        grams.join(c2, ["w1", "w2"])
        .join(c1, ["w1"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(p_micro).alias("sum_prob_micro"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "sum_prob_micro",
            (
                F.col("sum_prob_micro").cast("double")
                / F.col("n_bigrams").cast("double")
            ).alias("avg_prob_micro"),
        )
    )


_COSINE_SQL = """
    list_reduce(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2]),
                (x, y) -> x + y) / (a.nrm * b.nrm)
"""


@register(
    "dedup_semantic",
    oracle=f"""
        WITH normed AS (
            SELECT vec_id, label,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
                   sqrt(list_reduce(list_transform(embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                        (a, b) -> a + b)) AS nrm
            FROM embeddings
        ), removed AS (
            SELECT DISTINCT b.vec_id
            FROM normed a JOIN normed b
              ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE {_COSINE_SQL} >= {SEM_TAU}
        )
        SELECT n.vec_id, n.label
        FROM normed n
        WHERE n.vec_id NOT IN (SELECT vec_id FROM removed)
    """,
    doc="SemDeDup (Abbas et al. 2023): cluster the embedding space "
    "first, then prune near-duplicates ONLY within a cluster — the "
    "quadratic verify is bounded by cluster size, never corpus size. "
    "The cluster id here is the fixture's k-means label column (the "
    "emb_kmeans operator produces it from raw vectors); the "
    "within-cluster sweep is a pure equi-key self-join on label, "
    "exact left-fold cosine, and a deterministic min-id-wins keep "
    "rule (the paper keeps a random representative; a hash-checked "
    "engine pins the choice). Survivors = vectors with no "
    "higher-similarity neighbor of lower id. At 100 TB: one shuffle "
    "on label for the join, one anti-join on vec_id — the same "
    "equi-key-only discipline as the rest of the dedup family.",
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = parallelize(load_table(spark, sf_dir, "embeddings"))
    v = F.transform("embedding", lambda x: x.cast("double"))
    nrm = F.sqrt(
        F.aggregate(
            "embedding",
            F.lit(0.0),
            lambda a, x: a + x.cast("double") * x.cast("double"),
        )
    )
    normed = e.select("vec_id", "label", v.alias("v"), nrm.alias("nrm"))
    a = normed.select(
        F.col("label"),
        F.col("vec_id").alias("a_id"),
        F.col("v").alias("v_a"),
        F.col("nrm").alias("nrm_a"),
    )
    b = normed.select(
        F.col("label"),
        F.col("vec_id").alias("b_id"),
        F.col("v").alias("v_b"),
        F.col("nrm").alias("nrm_b"),
    )
    dot = F.aggregate(
        F.zip_with("v_a", "v_b", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    removed = (
        a.join(b, "label")
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("cosine", dot / (F.col("nrm_a") * F.col("nrm_b")))
        .filter(F.col("cosine") >= SEM_TAU)
        .select(F.col("b_id").alias("vec_id"))
        .distinct()
    )
    return normed.join(removed, "vec_id", "left_anti").select("vec_id", "label")


@register(
    "text_cdc_chunks",
    oracle=f"""
        WITH words AS (
            SELECT doc_id, w[i] AS word, CAST(i AS BIGINT) AS pos,
                   CASE WHEN substring(md5(w[i]), 1, 1) = '0'
                        THEN 1 ELSE 0 END AS boundary
            FROM (SELECT doc_id, {_WORDS_SQL} AS w FROM documents),
                 unnest(generate_series(1, len(w))) AS t(i)
        ), chunked AS (
            SELECT doc_id, word, pos,
                   SUM(boundary) OVER (
                       PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - boundary AS chunk_id
            FROM words
        )
        -- chunk_id is a window SUM → HUGEINT in DuckDB → float64 via
        -- pandas; CAST back to BIGINT for driver-hash parity.
        SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
               CAST(COUNT(*) AS BIGINT) AS n_words,
               md5(string_agg(word, ' ' ORDER BY pos)) AS chunk_fp
        FROM chunked
        GROUP BY doc_id, chunk_id
    """,
    doc="Content-defined chunking (the FastCDC/rsync shape): a chunk "
    "boundary falls AFTER any word whose md5 starts with hex '0' "
    "(p = 1/16 ⇒ ~16-word expected chunks). Because boundaries "
    "depend only on local content, inserting a sentence re-chunks "
    "ONLY the chunk it lands in — the property that makes CDC the "
    "standard prefilter for incremental dedup/backup of mutable "
    "corpora (fixed-width chunks would shift every later boundary). "
    "Chunk ids are a per-doc window cumsum over word positions (one "
    "shuffle on doc_id, window state O(1)); the chunk fingerprint is "
    "md5 of the position-ordered words, so downstream exact dedup on "
    "chunk_fp is a plain hash-groupBy. No RNG, no float columns.",
)
def text_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = parallelize(load_table(spark, sf_dir, "documents"))
    words = (
        d.select(
            "doc_id", F.posexplode(F.split(F.lower("text"), r"\s+"))
        )
        .select(
            "doc_id",
            (F.col("pos") + 1).cast("long").alias("pos"),
            F.col("col").alias("word"),
        )
        .withColumn(
            "boundary",
            F.when(F.substring(F.md5("word"), 1, 1) == "0", 1).otherwise(0),
        )
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    chunked = words.withColumn(
        "chunk_id", (F.sum("boundary").over(w) - F.col("boundary")).cast("long")
    )
    return (
        chunked.groupBy("doc_id", "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.sort_array(F.collect_list(F.struct("pos", "word"))),
                        lambda s: s["word"],
                    ),
                )
            ).alias("chunk_fp"),
        )
    )


@register(
    "bpe_merge_candidates",
    oracle=r"""
        WITH words AS (
            SELECT unnest(string_split_regex(lower(text), '\s+')) AS w
            FROM documents
        ), idx AS (
            SELECT w, unnest(range(1, length(w))) AS i
            FROM words WHERE length(w) >= 2
        )
        SELECT substr(w, CAST(i AS INT), 2) AS pair,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM idx
        GROUP BY pair
        ORDER BY n DESC, pair
        LIMIT 20
    """,
    doc="BPE tokenizer training, iteration one: the 20 most frequent "
    "adjacent character pairs inside words across the corpus — "
    "exactly the statistic a byte-pair-encoding trainer maximizes "
    "at every merge step (Sennrich et al. 2016). Plan: explode "
    "words, explode each word's length-2 windows (bounded by word "
    "length, no cross-word pairs), then ONE two-phase hash "
    "aggregation whose map-side combine absorbs the Zipf skew of "
    "frequent pairs, finished by TakeOrderedAndProject over the "
    "(count DESC, pair ASC) total order — top-k never global-sorts. "
    "A full BPE trainer is this statistic in a driver loop: merge "
    "the winner, re-pair, repeat; each iteration stays this same "
    "one-shuffle aggregate, which is why corpus-scale tokenizer "
    "training is feasible on Spark at all.",
)
def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = parallelize(load_table(spark, sf_dir, "documents"))
    w = d.select(
        F.explode(F.split(F.lower("text"), r"\s+")).alias("w")
    ).filter(F.length("w") >= 2)
    pairs = w.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(w) - 1),"
                " i -> substring(w, i, 2))"
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair"))
        .limit(20)
    )


def interleave_positions(df: DataFrame) -> DataFrame:
    """Round-robin interleave order WITHOUT a global sort/window.

    Input: any DataFrame with ``doc_id`` and ``source`` columns.
    Output adds ``rank_in_source`` (row_number per source by doc_id)
    and ``global_pos`` — the 1-based position the row would get under
    ``ORDER BY (rank_in_source, source)``, i.e. round-robin across
    sources with lexicographic source order inside each round and
    shorter sources dropping out as they exhaust.

    The global position is computed ANALYTICALLY from the per-source
    size vector instead of a single-partition global window (the
    sort_multi lesson): for a row at (s, r),

        pos = 1 + SUM_s' min(r - 1, m_s') + |{s' < s : m_s' >= r}|

    — the first term counts all rows from earlier rounds (every
    source contributes its rows with rank < r, capped by its size),
    the second counts same-round rows from lexicographically earlier
    sources still alive at round r. The size vector is a
    vocabulary-sized 1-row broadcast; every row's position is a
    map-side array fold. No shuffle beyond the per-source rank
    window.
    """
    w = Window.partitionBy("source").orderBy("doc_id")
    r = df.select("doc_id", "source").withColumn(
        "rank_in_source", F.row_number().over(w).cast("long")
    )
    sizes = (
        df.groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("m"))
        .agg(
            F.array_sort(
                F.collect_list(F.struct("source", "m"))
            ).alias("sz")
        )
    )
    rk = F.col("rank_in_source")
    before_rounds = F.aggregate(
        F.col("sz"),
        F.lit(0).cast("long"),
        lambda acc, s: acc + F.least(rk - 1, s["m"]),
    )
    same_round_prior = F.aggregate(
        F.col("sz"),
        F.lit(0).cast("long"),
        lambda acc, s: acc
        + F.when(
            (s["source"] < F.col("source")) & (s["m"] >= rk), 1
        )
        .otherwise(0)
        .cast("long"),
    )
    return r.join(F.broadcast(sizes)).select(
        "doc_id",
        "source",
        "rank_in_source",
        (1 + before_rounds + same_round_prior).alias("global_pos"),
    )


@register(
    "corpus_interleave_round_robin",
    oracle="""
        WITH r AS (
            SELECT doc_id, source,
                   CAST(ROW_NUMBER() OVER (PARTITION BY source
                       ORDER BY doc_id) AS BIGINT) AS rank_in_source
            FROM documents
        )
        SELECT doc_id, source, rank_in_source,
               CAST(ROW_NUMBER() OVER (ORDER BY rank_in_source, source)
                   AS BIGINT) AS global_pos
        FROM r
    """,
    doc="Deterministic multi-source round-robin interleave — the "
    "training-data ordering step that stripes heterogeneous sources "
    "evenly through a run so no data-mixture drift hits early "
    "optimization (the fixed-ratio sibling of corpus_mix_plan's "
    "budgets; corpus_global_shuffle is the keyless cousin). The "
    "oracle states it as a GLOBAL row_number over (rank, source) — "
    "exactly the single-partition bottleneck you cannot run at "
    "100 TB; the engine computes the identical position "
    "analytically from the per-source size vector (see "
    "interleave_positions): one per-source rank window + a "
    "vocabulary-sized broadcast + a map-side fold, no global sort. "
    "The hash gate proves the closed form IS the global sort. The "
    "equal-sized fixture keeps min(r-1, m) on its r-1 branch; the "
    "unequal-sources branch (short sources exhausting mid-stream) "
    "is pinned by a crafted-fixture unit test.",
)
def corpus_interleave_round_robin(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return interleave_positions(load_table(spark, sf_dir, "documents"))


@register(
    "corpus_shard_manifest",
    oracle="""
        WITH sharded AS (
            SELECT doc_id,
                   CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
                        1, 15)) AS BIGINT) % 8 AS shard,
                   CAST(len(string_split_regex(lower(text), '\\s+'))
                        AS BIGINT) AS n_tokens,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
            FROM documents
        )
        SELECT shard,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
               CAST(SUM(n_bytes) AS BIGINT) AS n_bytes,
               CAST(MIN(doc_id) AS BIGINT) AS min_doc,
               CAST(MAX(doc_id) AS BIGINT) AS max_doc
        FROM sharded GROUP BY shard
    """,
    doc="Corpus export shard manifest — the write plan a 100 TB "
    "training-data export is driven by: docs assigned to 8 output "
    "shards on the portable md5-hex-prefix grid (the same "
    "exact-checkable hash lattice text_minhash_export pinned; a "
    "production run would swap in xxhash64 and partitionBy(shard)), "
    "and per shard the doc count, token count, byte size and id "
    "range — what the downstream loader reads to plan epochs "
    "without touching the data. One hash agg over the scan; the "
    "manifest is |shards| rows at any scale and doubles as the "
    "skew check before the actual write (uniform hash => balanced "
    "shards).",
)
def corpus_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = parallelize(load_table(spark, sf_dir, "documents"))
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        % 8
    )
    return (
        d.select(
            "doc_id",
            shard.alias("shard"),
            F.size(F.split(F.lower("text"), r"\s+")).cast("long").alias(
                "n_tokens"
            ),
            F.octet_length("text").cast("long").alias("n_bytes"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.sum("n_bytes").cast("long").alias("n_bytes"),
            F.min("doc_id").cast("long").alias("min_doc"),
            F.max("doc_id").cast("long").alias("max_doc"),
        )
    )
