"""Array function family over embeddings (SURVEY.md §2.B).

Float arrays are cast to double element-wise before any arithmetic on
both engines (float→double is exact), and folds run left-to-right in
both (Spark ``aggregate`` starts at 0.0 — IEEE 0+x = x — DuckDB
``list_reduce`` seeds with the first element), so doubles match
bitwise.

Scale note: higher-order functions evaluate inside whole-stage
codegen on the JVM — no Python boundary; a 64-dim fold is ~64 fused
instructions per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhousebackup_spark.registry import register
from clickhousebackup_spark.tables import load_table


@register(
    "array_funcs",
    oracle="""
        SELECT vec_id,
               CAST(len(embedding) AS BIGINT) AS n_dims,
               CAST(embedding[1] AS DOUBLE) AS first_dim,
               CAST(embedding[2] AS DOUBLE) AS second_dim,
               CAST(embedding[3] AS DOUBLE) AS third_dim,
               CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS max_dim,
               CAST(list_aggregate(embedding, 'min') AS DOUBLE) AS min_dim
        FROM embeddings
    """,
    doc="size / element_at / array_max / array_min (scalar projections "
    "of the first three dims — driver hashes scalar cells only).",
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("n_dims"),
        F.element_at("embedding", 1).cast("double").alias("first_dim"),
        F.element_at("embedding", 2).cast("double").alias("second_dim"),
        F.element_at("embedding", 3).cast("double").alias("third_dim"),
        F.array_max("embedding").cast("double").alias("max_dim"),
        F.array_min("embedding").cast("double").alias("min_dim"),
    )


#: Left-fold sum-of-squares over a float array, as double — Spark side.
def l2_norm_expr(col: str):
    return F.sqrt(
        F.aggregate(
            F.col(col),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


@register(
    "array_higher_order",
    oracle="""
        SELECT vec_id, label,
               sqrt(list_reduce(
                   list_transform(embedding,
                                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                   (a, b) -> a + b)) AS l2_norm,
               list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                           (a, b) -> a + b) AS dim_sum,
               CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_positive
        FROM embeddings
    """,
    doc="transform/filter/aggregate lambdas: L2 norm, sum, positive "
    "count — deterministic left folds in both engines.",
)
def array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        "label",
        l2_norm_expr("embedding").alias("l2_norm"),
        F.aggregate(
            "embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double")
        ).alias("dim_sum"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("long").alias(
            "n_positive"
        ),
    )


@register(
    "array_cumsum",
    oracle="""
        WITH ex AS (
            SELECT vec_id,
                   unnest(list_transform(embedding[1:8],
                          x -> CAST(x AS DOUBLE))) AS x,
                   unnest(range(1, len(embedding[1:8]) + 1)) AS i
            FROM embeddings
        ), s AS (
            SELECT vec_id, i,
                   SUM(x) OVER (PARTITION BY vec_id ORDER BY i
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS cs
            FROM ex
        )
        SELECT vec_id,
               array_to_string(list_transform(list(cs ORDER BY i),
                   x -> CAST(CAST(floor(x * 1000000.0) AS BIGINT) AS VARCHAR)),
                   ',') AS cums_csv
        FROM s GROUP BY vec_id
    """,
    doc="ClickHouse arrayCumSum: per-vector running sum over the "
    "first 8 embedding dims. Spark side is a pure higher-order fold "
    "(aggregate with an array accumulator — no explode, no shuffle); "
    "the oracle unnests positionally and re-lists a window running "
    "sum. Both are strict left-to-right double additions, so the "
    "doubles are bit-identical; the checked output floor-grids each "
    "cumsum to a micro-integer and joins to CSV, because the driver "
    "canonicalizer handles scalar cells only (r4 ERR fix — the "
    "emb_normalize_quantize convention). Map-only in Spark: at any "
    "scale this runs at scan speed inside codegen'd whole-stage eval.",
)
def array_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    head = F.transform(F.slice("embedding", 1, 8), lambda x: x.cast("double"))
    cums = F.aggregate(
        head,
        F.expr("CAST(array() AS ARRAY<DOUBLE>)"),
        lambda acc, x: F.concat(
            acc, F.array(F.coalesce(F.try_element_at(acc, F.lit(-1)), F.lit(0.0)) + x)
        ),
    )
    csv = F.array_join(
        F.transform(
            cums,
            lambda x: F.floor(x * F.lit(1000000.0)).cast("long").cast("string"),
        ),
        ",",
    )
    return e.select("vec_id", csv.alias("cums_csv"))


@register(
    "array_difference",
    oracle="""
        WITH ex AS (
            SELECT vec_id,
                   unnest(list_transform(embedding[1:8],
                          x -> CAST(x AS DOUBLE))) AS x,
                   unnest(range(1, len(embedding[1:8]) + 1)) AS i
            FROM embeddings
        ), s AS (
            SELECT vec_id, i,
                   COALESCE(x - lag(x) OVER (PARTITION BY vec_id ORDER BY i),
                            0.0) AS d
            FROM ex
        )
        SELECT vec_id,
               array_to_string(list_transform(list(d ORDER BY i),
                   x -> CAST(CAST(floor(x * 1000000.0) AS BIGINT) AS VARCHAR)),
                   ',') AS deltas_csv
        FROM s GROUP BY vec_id
    """,
    doc="ClickHouse arrayDifference: per-position deltas within an "
    "array (first element 0, matching ClickHouse). Spark side is an "
    "index-aware transform (no explode, no shuffle); the oracle "
    "re-lists a lag window. Each delta is ONE IEEE subtraction of "
    "identical inputs — bit-identical across engines; the checked "
    "output floor-grids each delta to a micro-integer and joins to "
    "CSV because the driver canonicalizer handles scalar cells only "
    "(r4 ERR fix — the emb_normalize_quantize convention).",
)
def array_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    head = F.transform(F.slice("embedding", 1, 8), lambda x: x.cast("double"))
    e = e.select("vec_id", head.alias("h"))
    deltas = F.transform(
        F.col("h"),
        lambda x, i: F.when(i == 0, F.lit(0.0)).otherwise(
            x - F.element_at(F.col("h"), i)
        ),
    )
    csv = F.array_join(
        F.transform(
            deltas,
            lambda x: F.floor(x * F.lit(1000000.0)).cast("long").cast("string"),
        ),
        ",",
    )
    return e.select("vec_id", csv.alias("deltas_csv"))


@register(
    "array_enumerate_uniq",
    oracle=r"""
        WITH words AS (
            SELECT doc_id, w, i
            FROM (
                SELECT doc_id,
                       unnest(string_split_regex(lower(text), '\s+')[1:12])
                           AS w,
                       unnest(range(1, least(len(string_split_regex(
                           lower(text), '\s+')), 12) + 1)) AS i
                FROM documents
            )
        )
        SELECT doc_id, CAST(i AS BIGINT) AS pos, w AS word,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY doc_id, w ORDER BY i) AS BIGINT) AS occ
        FROM words
    """,
    doc="ClickHouse arrayEnumerateUniq: per-element occurrence index "
    "within an array (1 for the first time a value appears, 2 for "
    "its second appearance, ...), over each document's first 12 "
    "words. ClickHouse evaluates this inside the array cell; the "
    "Spark-idiomatic form is RELATIONAL — posexplode then ONE "
    "row_number window on (doc_id, word) ordered by position — "
    "because a per-cell O(n²) higher-order scan (count matches in "
    "every prefix) loses whole-stage codegen, while the window is a "
    "single shuffle partitioned by (doc, word) that AQE sizes like "
    "any other. The 12-word cap bounds fanout per doc; positions "
    "make the output deterministic.",
)
def array_enumerate_uniq(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        F.posexplode(
            F.slice(F.split(F.lower("text"), r"\s+"), 1, 12)
        ).alias("idx", "word"),
    ).select("doc_id", (F.col("idx") + 1).alias("pos"), "word")
    w = Window.partitionBy("doc_id", "word").orderBy("pos")
    return words.select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        "word",
        F.row_number().over(w).cast("long").alias("occ"),
    )


@register(
    "array_join_parallel",
    oracle="""
        WITH arrs AS (
            SELECT vec_id,
                   list_transform(embedding[1:4], x -> CAST(x AS DOUBLE))
                       AS vals
            FROM embeddings
        )
        SELECT vec_id,
               CAST(u.i AS BIGINT) AS pos,
               vals[u.i] AS val,
               vals[u.i] * vals[u.i] AS sq
        FROM arrs, LATERAL (SELECT unnest(range(1, len(vals) + 1)) AS i) u
    """,
    doc="Multi-array ARRAY JOIN (ClickHouse `ARRAY JOIN a, b`): "
    "explode PARALLEL arrays keeping positional alignment — here the "
    "leading embedding dims alongside their squares. The Spark "
    "idiom is posexplode of ONE zipped array (arrays_zip fuses the "
    "parallel arrays into structs before the Generate), which "
    "guarantees alignment by construction instead of joining two "
    "independent explodes back together on position — the latter is "
    "an extra shuffle and a correctness trap under duplicate "
    "values. Generate is map-side: no exchange anywhere in the "
    "plan; each product is one IEEE multiply of identical doubles.",
)
def array_join_parallel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    vals = F.transform(F.slice("embedding", 1, 4), lambda x: x.cast("double"))
    sqs = F.transform(vals, lambda x: x * x)
    zipped = F.arrays_zip(vals.alias("val"), sqs.alias("sq"))
    return e.select(
        "vec_id", F.posexplode(zipped).alias("idx", "z")
    ).select(
        "vec_id",
        (F.col("idx") + 1).cast("long").alias("pos"),
        F.col("z.val").alias("val"),
        F.col("z.sq").alias("sq"),
    )


@register(
    "array_fill_forward",
    oracle="""
        WITH ex AS (
            SELECT vec_id,
                   unnest(list_transform(embedding[1:8],
                          x -> CAST(x AS DOUBLE))) AS x,
                   unnest(range(1, len(embedding[1:8]) + 1)) AS i
            FROM embeddings
        ), f AS (
            SELECT vec_id, i,
                   COALESCE(last_value(CASE WHEN x > 0 THEN x END
                                       IGNORE NULLS)
                            OVER (PARTITION BY vec_id ORDER BY i
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND CURRENT ROW),
                            x) AS filled
            FROM ex
        )
        SELECT vec_id,
               array_to_string(list_transform(list(filled ORDER BY i),
                   x -> CAST(CAST(floor(x * 1000000.0) AS BIGINT)
                        AS VARCHAR)), ',') AS filled_csv
        FROM f GROUP BY vec_id
    """,
    doc="ClickHouse arrayFill(x -> x > 0, arr): forward-fill — each "
    "non-positive element is replaced by the nearest positive "
    "element to its left; a leading run with no positive "
    "predecessor keeps its original values (the CH contract). Spark "
    "side is one higher-order fold whose accumulator is a "
    "(built-array, last-positive) struct — map-only, no explode, no "
    "shuffle, runs inside whole-stage codegen at scan speed. The "
    "oracle states the same semantics positionally with an "
    "IGNORE NULLS running last_value. Fill decisions are "
    "comparisons and copies of identical doubles (no arithmetic), "
    "so results are bit-identical; checked output is the floor-grid "
    "CSV per the array-serialization convention (r4 ERR lesson).",
)
def array_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    head = F.transform(F.slice("embedding", 1, 8), lambda x: x.cast("double"))
    init = F.expr(
        "named_struct('arr', CAST(array() AS ARRAY<DOUBLE>), "
        "'last', CAST(NULL AS DOUBLE))"
    )
    filled = F.aggregate(
        head,
        init,
        lambda acc, x: F.struct(
            F.concat(
                acc["arr"],
                F.array(
                    F.when(x > 0, x).otherwise(F.coalesce(acc["last"], x))
                ),
            ).alias("arr"),
            F.when(x > 0, x).otherwise(acc["last"]).alias("last"),
        ),
        lambda acc: acc["arr"],
    )
    csv = F.array_join(
        F.transform(
            filled,
            lambda x: F.floor(x * F.lit(1000000.0)).cast("long").cast("string"),
        ),
        ",",
    )
    return e.select("vec_id", csv.alias("filled_csv"))


@register(
    "array_compact_dedup",
    oracle="""
        WITH ex AS (
            SELECT vec_id,
                   unnest(list_transform(embedding[1:8],
                          x -> CASE WHEN x > 0 THEN 1
                               WHEN x < 0 THEN -1 ELSE 0 END)) AS s,
                   unnest(range(1, len(embedding[1:8]) + 1)) AS i
            FROM embeddings
        ), marked AS (
            SELECT vec_id, i, s,
                   CASE WHEN s = lag(s) OVER (PARTITION BY vec_id
                                              ORDER BY i)
                        THEN 0 ELSE 1 END AS keep
            FROM ex
        )
        SELECT vec_id,
               array_to_string(list_transform(
                   list(s ORDER BY i) FILTER (WHERE keep = 1),
                   x -> CAST(x AS VARCHAR)), ',') AS runs_csv,
               CAST(SUM(keep) AS BIGINT) AS n_runs
        FROM marked GROUP BY vec_id
    """,
    doc="ClickHouse arrayCompact: collapse CONSECUTIVE equal elements "
    "to one (run-length heads), applied to the sign pattern of the "
    "leading embedding dims so the fixture actually produces runs. "
    "Spark side is a single index-aware filter lambda (keep element "
    "i iff it differs from element i-1) — map-only, no explode, no "
    "shuffle, codegen'd; the oracle states the same rule with a lag "
    "window over the unnested positions. Pure integer comparisons "
    "of identical inputs; output CSV-serialized per the array "
    "convention. The run count doubles as a free signal (sign-"
    "change count) used by change-point heuristics.",
)
def array_compact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    signs = F.transform(
        F.slice("embedding", 1, 8),
        lambda x: F.when(x > 0, 1).when(x < 0, -1).otherwise(0),
    )
    e = e.select("vec_id", signs.alias("s"))
    compacted = F.filter(
        F.col("s"),
        lambda x, i: (i == 0)
        | (x != F.coalesce(F.try_element_at(F.col("s"), i), F.lit(-999))),
    )
    return e.select(
        "vec_id",
        F.array_join(
            F.transform(compacted, lambda x: x.cast("string")), ","
        ).alias("runs_csv"),
        F.size(compacted).cast("long").alias("n_runs"),
    )


@register(
    "array_rotate_zip",
    oracle="""
        WITH g AS (
            SELECT user_id,
                   list(CAST(FLOOR(value * 1e6) AS BIGINT)
                        ORDER BY ts, event_id) AS vals
            FROM events GROUP BY user_id
        ), p AS (
            SELECT user_id, vals, len(vals) AS n,
                   2 % len(vals) AS k
            FROM g
        ), r AS (
            SELECT user_id, vals, n,
                   list_concat(list_slice(vals, k + 1, n),
                               list_slice(vals, 1, k)) AS rot,
                   list_concat(
                       list_transform(range(1, least(2, n) + 1),
                           i -> CAST(0 AS BIGINT)),
                       list_slice(vals, 1, greatest(n - 2, 0))) AS shr
            FROM p
        )
        SELECT user_id, CAST(n AS BIGINT) AS n,
               array_to_string(list_transform(rot,
                   x -> CAST(x AS VARCHAR)), ',') AS rot2_csv,
               array_to_string(list_transform(shr,
                   x -> CAST(x AS VARCHAR)), ',') AS shr2_csv,
               array_to_string(list_transform(range(1, n + 1),
                   i -> CAST(vals[i] + rot[i] AS VARCHAR)), ',')
                   AS zsum_csv
        FROM r
    """,
    doc="ClickHouse arrayRotateLeft / arrayShiftRight / arrayZip "
    "composition over the per-user value series: rotate-left-2 "
    "(modulo length), shift-right-2 with zero fill, and the "
    "element-wise sum of the series with its own rotation (the "
    "wrap-around pairwise combine). All slicing/concat/zip_with "
    "runs as JVM higher-order functions over grid-integer arrays — "
    "no UDF, exact values, CSV-serialized (driver scalar-cell "
    "convention). One shuffle (the per-user collect); per-user "
    "arrays are session-sized, the same state the CH array "
    "functions hold per row.",
)
def array_rotate_zip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("value") * F.lit(1e6)).cast("long").alias("v6"),
    )
    g = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "v6"))
        ).alias("pairs")
    )
    g = g.withColumn("vals", F.expr("transform(pairs, p -> p.v6)"))
    g = g.withColumn("n", F.size("vals")).withColumn(
        "k", F.pmod(F.lit(2), F.col("n"))
    )
    g = g.withColumn(
        "rot",
        F.concat(
            F.slice(F.col("vals"), F.col("k") + 1, F.col("n") - F.col("k")),
            F.slice(F.col("vals"), 1, F.col("k")),
        ),
    ).withColumn(
        "shr",
        F.concat(
            F.expr("array_repeat(cast(0 as bigint), least(2, n))"),
            F.slice(F.col("vals"), 1, F.greatest(F.col("n") - 2, F.lit(0))),
        ),
    )
    csv = lambda c: F.array_join(  # noqa: E731
        F.transform(c, lambda x: x.cast("string")), ","
    )
    return g.select(
        "user_id",
        F.col("n").cast("long").alias("n"),
        csv(F.col("rot")).alias("rot2_csv"),
        csv(F.col("shr")).alias("shr2_csv"),
        csv(F.zip_with("vals", "rot", lambda a, b: a + b)).alias("zsum_csv"),
    )


@register(
    "array_search_funcs",
    oracle="""
        WITH w AS (
            SELECT doc_id,
                   string_split_regex(lower(text), '\\s+')[1:8] AS ws
            FROM documents
        )
        SELECT doc_id,
               CAST(COALESCE(list_position(ws, 'value'), 0) AS BIGINT)
                   AS idx_value,
               CAST(CASE WHEN list_contains(ws, 'table') THEN 1 ELSE 0 END
                   AS BIGINT) AS has_table,
               CAST(CASE WHEN list_has_all(ws, ['value', 'table'])
                    THEN 1 ELSE 0 END AS BIGINT) AS has_all_vt,
               CAST(CASE WHEN list_has_any(ws, ['key', 'row'])
                    THEN 1 ELSE 0 END AS BIGINT) AS has_any_kr,
               CAST(len(list_filter(ws, x -> x = 'part')) AS BIGINT)
                   AS n_eq_part,
               CAST(COALESCE(list_aggregate(
                        list_transform(list_zip(ws,
                            range(1, len(ws) + 1)),
                            p -> CASE WHEN length(p[1]) > 4
                                 THEN p[2] END),
                        'min'), 0) AS BIGINT) AS first_long_idx
        FROM w
    """,
    doc="ClickHouse array search family — indexOf (1-based, 0 when "
    "absent: COALESCE'd over DuckDB's NULL-on-miss list_position), "
    "has / hasAll / hasAny (arrays_overlap), countEqual "
    "(size∘filter), and arrayFirstIndex by predicate (index-aware "
    "transform + null-skipping array_min) — over each doc's first 8 "
    "tokens. All outputs are small integers; predicates and index "
    "arithmetic are exact. Map-only: no shuffle, no join — the "
    "whole battery rides the document scan's projection at any "
    "scale.",
)
def array_search_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    ws = F.slice(F.split(F.lower("text"), r"\s+"), 1, 8)
    first_long = F.array_min(
        F.zip_with(
            ws,
            F.sequence(F.lit(1), F.size(ws)),
            lambda x, i: F.when(F.length(x) > 4, i),
        )
    )
    return d.select(
        "doc_id",
        F.array_position(ws, "value").cast("long").alias("idx_value"),
        F.array_contains(ws, "table").cast("long").alias("has_table"),
        F.forall(
            F.array(F.lit("value"), F.lit("table")),
            lambda x: F.array_contains(ws, x),
        )
        .cast("long")
        .alias("has_all_vt"),
        F.arrays_overlap(ws, F.array(F.lit("key"), F.lit("row")))
        .cast("long")
        .alias("has_any_kr"),
        F.size(F.filter(ws, lambda x: x == "part"))
        .cast("long")
        .alias("n_eq_part"),
        F.coalesce(first_long, F.lit(0)).cast("long").alias("first_long_idx"),
    )


@register(
    "array_sort_funcs",
    oracle="""
        WITH w AS (
            SELECT doc_id,
                   string_split_regex(lower(text), '\\s+')[1:6] AS ws
            FROM documents
        )
        SELECT doc_id,
               COALESCE(array_to_string(list_sort(ws), ','), '')
                   AS sorted_csv,
               COALESCE(array_to_string(list_reverse_sort(ws), ','), '')
                   AS rsorted_csv,
               COALESCE(array_to_string(list_transform(
                   list_sort(list_transform(ws,
                       x -> struct_pack(l := length(x), w := x))),
                   s -> s.w), ','), '') AS bylen_csv,
               COALESCE(array_to_string(list_sort(ws)[1:3], ','), '')
                   AS top3_csv
        FROM w
    """,
    doc="ClickHouse arraySort / arrayReverseSort / arraySort(lambda) "
    "/ arrayPartialSort parity over each doc's first 6 tokens: "
    "lexicographic sort, reverse sort, sort BY A KEY FUNCTION "
    "((length, word) via the sort-structs trick — Spark's comparator "
    "lambda and DuckDB's field-order struct sort express the same "
    "key), and partial top-3 (sort-then-slice; CH's arrayPartialSort "
    "saves the tail sort, the sliced result is identical). CSV "
    "rendering via array_to_string with the empty-list COALESCE "
    "(the round-5 dialect trap). Map-only at any scale — per-row "
    "arrays never shuffle.",
)
def array_sort_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    ws = F.slice(F.split(F.lower("text"), r"\s+"), 1, 6)
    bylen = F.transform(
        F.array_sort(
            F.transform(
                ws, lambda x: F.struct(F.length(x).alias("l"), x.alias("w"))
            )
        ),
        lambda s: s["w"],
    )
    return d.select(
        "doc_id",
        F.array_join(F.array_sort(ws), ",").alias("sorted_csv"),
        F.array_join(F.reverse(F.array_sort(ws)), ",").alias("rsorted_csv"),
        F.array_join(bylen, ",").alias("bylen_csv"),
        F.array_join(F.slice(F.array_sort(ws), 1, 3), ",").alias(
            "top3_csv"
        ),
    )
