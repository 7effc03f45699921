"""Round-7 operator additions (batch 2): modern Spark SQL surface —
pipe syntax, parameterized SQL, try_* arithmetic, VARIANT ops,
join-strategy hints, and observed metrics.

These keys pin the ENGINE surface a user migrating from the
reference's ClickHouse server would reach for next: CH's own pipe-ish
chaining (`sql_pipe_syntax` — Spark 4 SQL pipe operator `|>`),
server-side query parameters (`sql_parameterized` — CH `{param:T}`
binds ↔ Spark named-parameter SQL), NULL-on-error arithmetic
(`func_try_arith` — CH's default wraparound vs ANSI throw vs `try_*`
as the explicit middle road), semi-structured VARIANT extraction
(`json_variant_ops` — CH JSON type ↔ Spark 4 VARIANT), explicit join
algorithm selection (`join_hint_merge` — CH `join_algorithm` setting
↔ Spark MERGE hint), and in-flight pipeline metrics
(`scan_observed_metrics` — CH query_log counters ↔ Spark
``Observation``).

Reference mapping: backup.sh:38-45 delegates SQL to the server;
env.sh:19-24 wires credentials/params into those statements — the
parameterized-SQL key is the engine-side equivalent of that binding.

Oracle discipline: every checked column is an integer, a string, or a
double produced by ONE identical expression in both engines; the
VARIANT key compares extracted VALUES (each engine parses the JSON it
built itself, so text formatting never crosses engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhousebackup_spark.registry import register
from clickhousebackup_spark.tables import load_table

BIG = 9_223_372_036_854_775_807  # int64 max


@register(
    "sql_pipe_syntax",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT) AS qty_cents
        FROM lineitem
        WHERE l_quantity > 25.0
        GROUP BY l_returnflag, l_linestatus
    """,
    doc="Spark 4 SQL pipe syntax (`FROM t |> WHERE ... |> AGGREGATE "
    "... GROUP BY ...`) — the linear query-building style ClickHouse "
    "users chain WITH clauses for. The pipe form must be PLAN-"
    "identical to the ANSI form (it is pure syntax), so the oracle "
    "is the ANSI rendering and the hash gate proves the equivalence "
    "on real data. Quantities travel on the integer cent grid. One "
    "scan + one 6-cell two-phase aggregate.",
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_pipe_v"
    )
    return spark.sql(
        """
        FROM lineitem_pipe_v
        |> WHERE l_quantity > 25.0
        |> AGGREGATE CAST(COUNT(*) AS LONG) AS n,
                     CAST(SUM(CAST(floor(l_quantity * 100.0 + 0.5) AS LONG))
                          AS LONG) AS qty_cents
           GROUP BY l_returnflag, l_linestatus
        """
    )


@register(
    "sql_parameterized",
    oracle="""
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(floor(o_totalprice * 100.0) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders
        WHERE o_orderstatus = 'F' AND o_totalprice >= 1000.0
        GROUP BY o_orderpriority
    """,
    doc="Named-parameter SQL (spark.sql(..., args={...}) — Spark's "
    "server-side binding, the injection-safe equivalent of "
    "ClickHouse's {param:Type} placeholders and of the env-var "
    "splicing the reference does in shell (env.sh:19-24, "
    "backup.sh:38-45 — THE dangerous pattern this key retires). "
    "Parameters bind as typed literals before analysis, so the "
    "plan is identical to the literal form the oracle runs. "
    "One scan + 5-cell aggregate.",
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "orders_param_v"
    )
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS LONG) AS n,
               CAST(SUM(CAST(floor(o_totalprice * 100.0) AS LONG))
                    AS LONG) AS cents
        FROM orders_param_v
        WHERE o_orderstatus = :status AND o_totalprice >= :min_price
        GROUP BY o_orderpriority
        """,
        args={"status": "F", "min_price": 1000.0},
    )


@register(
    "func_try_arith",
    oracle=f"""
        SELECT o_orderkey,
               COALESCE(CASE WHEN o_orderkey % 7 <= o_orderkey % 5
                             THEN ({BIG} - o_orderkey % 5)
                                  + o_orderkey % 7 END,
                        -1) AS add_or_null,
               COALESCE(CASE WHEN o_orderkey % 2 = 0
                             THEN ({BIG} // 2 + o_orderkey % 2) * 2 END,
                        -1) AS mul_or_null,
               CASE WHEN o_orderkey % 11 = 0 THEN -1.0
                    ELSE CAST((o_orderkey % 100) * 1000 AS DOUBLE)
                         / CAST(o_orderkey % 11 AS DOUBLE)
               END AS div_or_null,
               COALESCE(CASE WHEN o_orderkey % 13 <> 0
                             THEN (o_orderkey % 100) % (o_orderkey % 13) END,
                        -1) AS mod_or_null
        FROM orders
    """,
    doc="try_add / try_multiply / try_divide / try_mod — ANSI Spark "
    "throws on int64 overflow and division by zero (the mode this "
    "whole repo runs in, because silent wraparound corrupts "
    "retention arithmetic); try_* returns NULL instead, the "
    "explicit per-expression opt-out. Edge rows are manufactured "
    "from o_orderkey so overflow/zero-denominator cases actually "
    "occur (add overflows when key%7 > key%5; multiply overflows "
    "for odd keys; divide/mod hit zero at key%11/key%13). DuckDB "
    "has no try_* — the oracle proves the SEMANTICS with CASE "
    "guards computing the same values on the non-error rows. "
    "COALESCE(-1) sentinels keep outputs NULL-free ints. Map-only.",
)
def func_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        F.coalesce(
            F.expr(f"try_add({BIG} - o_orderkey % 5, o_orderkey % 7)"),
            F.lit(-1),
        ).alias("add_or_null"),
        F.coalesce(
            F.expr(f"try_multiply({BIG} div 2 + o_orderkey % 2, 2)"),
            F.lit(-1),
        ).alias("mul_or_null"),
        F.coalesce(
            F.expr(
                "try_divide(CAST((o_orderkey % 100) * 1000 AS DOUBLE),"
                " CAST(o_orderkey % 11 AS DOUBLE))"
            ),
            F.lit(-1.0),
        ).alias("div_or_null"),
        F.coalesce(
            F.expr("try_mod(o_orderkey % 100, o_orderkey % 13)"), F.lit(-1)
        ).alias("mod_or_null"),
    )


@register(
    "json_variant_ops",
    oracle="""
        WITH j AS (
            SELECT event_id,
                   to_json(struct_pack(
                       u := user_id,
                       tags := [event_type, 'evt'],
                       m := struct_pack(
                           cents := CAST(floor(value * 100.0 + 0.5)
                                         AS BIGINT),
                           k := CAST(json_extract(props, '$.k') AS BIGINT)
                       )
                   )) AS doc
            FROM events
        )
        SELECT event_id,
               CAST(json_extract(doc, '$.u') AS BIGINT) AS u,
               json_extract_string(doc, '$.tags[0]') AS tag0,
               CAST(json_extract(doc, '$.m.cents') AS BIGINT) AS cents,
               CAST(json_extract(doc, '$.m.k') AS BIGINT) AS k
        FROM j
    """,
    doc="Spark 4 VARIANT end-to-end: build a nested JSON document "
    "(struct + array + sub-struct) per event, parse_json it into a "
    "VARIANT, and extract typed values by path — object field, "
    "array index, nested field — the shredded-JSON access pattern "
    "ClickHouse's JSON column type serves. Each engine parses the "
    "JSON it built ITSELF, so only extracted VALUES cross the "
    "compare (whitespace/key-order never do). The inner k comes "
    "from the real events.props payload, so extraction is "
    "data-driven, not constant. Map-only, one scan; VARIANT "
    "decode stays in the JVM (no Python round-trip).",
)
def json_variant_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    doc = F.to_json(
        F.struct(
            F.col("user_id").alias("u"),
            F.array(F.col("event_type"), F.lit("evt")).alias("tags"),
            F.struct(
                F.floor(F.col("value") * 100.0 + 0.5)
                .cast("long")
                .alias("cents"),
                F.get_json_object("props", "$.k").cast("long").alias("k"),
            ).alias("m"),
        )
    )
    v = e.select("event_id", F.parse_json(doc).alias("var"))
    return v.select(
        "event_id",
        F.expr("variant_get(var, '$.u', 'long')").alias("u"),
        F.expr("variant_get(var, '$.tags[0]', 'string')").alias("tag0"),
        F.expr("variant_get(var, '$.m.cents', 'long')").alias("cents"),
        F.expr("variant_get(var, '$.m.k', 'long')").alias("k"),
    )


@register(
    "join_hint_merge",
    oracle="""
        SELECT c.c_nationkey,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(floor(o.o_totalprice * 100.0) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_nationkey
    """,
    doc="Join strategy hints: the MERGE hint forces a sort-merge join "
    "where the optimizer would pick broadcast-hash — ClickHouse's "
    "join_algorithm='full_sorting_merge' setting. Results are "
    "hint-invariant (the oracle runs the plain join); the plan "
    "assertion (tests/test_plan_shapes.py) pins that the hint "
    "actually took (SortMergeJoin in the physical plan). The "
    "legitimate 100 TB use: both sides already sorted/bucketed on "
    "the key, where SMJ avoids the broadcast memory ceiling and "
    "the shuffle-hash build.",
)
def join_hint_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").hint("merge")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.floor(F.col("o_totalprice") * 100.0).cast("long"))
            .cast("long")
            .alias("cents"),
        )
    )


@register(
    "scan_observed_metrics",
    oracle="""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT) AS sum_cents,
               CAST(MAX(event_id) AS BIGINT) AS max_event_id,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_errors
        FROM events
    """,
    doc="Observed metrics (pyspark Observation / df.observe): "
    "accumulator-style counters collected DURING a pass instead of "
    "by a second scan — Spark's equivalent of the ClickHouse "
    "query_log row counters the reference's healthcheck reads "
    "(hooks/00-webhook:6-65 reports the same shape). The key runs "
    "one observed pass over events and returns the metrics row; "
    "the oracle recomputes the four counters declaratively. At "
    "100 TB this is THE way to get row/error/byte counts out of an "
    "ETL write without paying a second scan. (Construction "
    "executes the observed action eagerly — declared side-effecting "
    "for the analysis-only lint.)",
)
def scan_observed_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Observation

    e = load_table(spark, sf_dir, "events")
    obs = Observation("scan_metrics")
    observed = e.observe(
        obs,
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.floor(F.col("value") * 100.0 + 0.5).cast("long"))
        .cast("long")
        .alias("sum_cents"),
        F.max("event_id").cast("long").alias("max_event_id"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("n_errors"),
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["sum_cents"], m["max_event_id"], m["n_errors"])],
        "n_rows long, sum_cents long, max_event_id long, n_errors long",
    )


# ---- round-7 batch 5: declarative SQL surface, second helping ----
# LATERAL joins, GROUP/ORDER BY ALL, QUALIFY parity, star modifiers
# (CH `SELECT * EXCEPT/REPLACE`), aggregate FILTER clauses, and CH
# `ORDER BY .. WITH FILL` gap injection.


@register(
    "join_lateral_topn",
    oracle="""
        SELECT n.n_name, l.c_custkey, l.acctbal_cents
        FROM nation n, LATERAL (
            SELECT c_custkey,
                   CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT)
                       AS acctbal_cents
            FROM customer c
            WHERE c.c_nationkey = n.n_nationkey
            ORDER BY c.c_acctbal DESC, c.c_custkey
            LIMIT 2
        ) l
    """,
    doc="Correlated LATERAL subquery with ORDER BY + LIMIT — top-2 "
    "customers by balance per nation, the per-group-top-n written the "
    "declarative way (ClickHouse models this as LIMIT BY after a "
    "join; ANSI/DuckDB spell it LATERAL — the oracle runs the "
    "genuine lateral form). The engine deliberately DESUGARS the "
    "lateral to a partitioned rank filter + broadcast dim join: "
    "Spark 4 parses the same LATERAL text, but its decorrelation "
    "materializes the subquery ORDER BY as a redundant GLOBAL "
    "range-partitioned sort of the whole fact table before the "
    "per-key window (measured, plan dump in PLANS_r07.md) — a "
    "full-corpus sort at 100 TB where one hash exchange suffices. "
    "The desugared form is the plan a lateral SHOULD compile to: "
    "one c_nationkey exchange, WindowGroupLimit pruning to 2 rows "
    "per key before the rank filter, nation broadcast. Balance is "
    "selection-only (raw double order, c_custkey tiebreak), emitted "
    "on the cent grid; the hash gate proves desugared ≡ lateral.",
)
def join_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    top = (
        c.select(
            "c_custkey",
            "c_nationkey",
            "c_acctbal",
            F.floor(F.col("c_acctbal") * 100.0 + 0.5)
            .cast("long")
            .alias("acctbal_cents"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
    )
    return top.join(
        F.broadcast(n), top.c_nationkey == n.n_nationkey
    ).select("n_name", "c_custkey", "acctbal_cents")


@register(
    "sql_group_order_by_all",
    oracle="""
        SELECT strftime(o_orderdate, '%Y-%m') AS month, o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(floor(o_totalprice * 100.0) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders
        GROUP BY ALL
        ORDER BY ALL
    """,
    doc="GROUP BY ALL + ORDER BY ALL — the analyst shorthand (every "
    "non-aggregate select item is a grouping key; sort by the full "
    "select list) that Spark 3.4+/DuckDB/ClickHouse all adopted. "
    "Both engines run the same shorthand text, proving the implicit "
    "key inference matches the explicit form. Calendar key emitted "
    "as a formatted STRING (date-through-pandas trap); money on the "
    "cent grid. One two-phase hash agg; the global sort is "
    "presentation-only (the driver re-sorts anyway) and would be "
    "dropped in a pipeline context.",
)
def sql_group_order_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "orders_gba_v"
    )
    return spark.sql(
        """
        SELECT date_format(o_orderdate, 'yyyy-MM') AS month, o_orderstatus,
               CAST(COUNT(*) AS LONG) AS n,
               CAST(SUM(CAST(floor(o_totalprice * 100.0) AS LONG))
                    AS LONG) AS cents
        FROM orders_gba_v
        GROUP BY ALL
        ORDER BY ALL
        """
    )


@register(
    "sql_qualify_topk",
    oracle="""
        SELECT l_returnflag, l_orderkey, l_linenumber,
               CAST(floor(l_extendedprice * 100.0) AS BIGINT) AS cents
        FROM lineitem
        QUALIFY row_number() OVER (
            PARTITION BY l_returnflag
            ORDER BY floor(l_extendedprice * 100.0) DESC,
                     l_orderkey, l_linenumber
        ) <= 3
    """,
    doc="QUALIFY-clause parity: DuckDB/ClickHouse/Snowflake filter "
    "window results inline with QUALIFY; Spark has no QUALIFY "
    "keyword, so the engine provides the canonical desugaring — "
    "rank in a subquery, filter, project the rank away. The hash "
    "gate proves the desugared Spark form IS the QUALIFY the oracle "
    "runs. Ordering key is the integer cent grid with a full "
    "(orderkey, linenumber) tiebreak. Spark plan: one exchange on "
    "l_returnflag with WindowGroupLimit pruning rows before the "
    "final rank filter — QUALIFY costs exactly a topk_per_group.",
)
def sql_qualify_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_qual_v"
    )
    return spark.sql(
        """
        SELECT l_returnflag, l_orderkey, l_linenumber, cents
        FROM (
            SELECT l_returnflag, l_orderkey, l_linenumber,
                   CAST(floor(l_extendedprice * 100.0) AS LONG) AS cents,
                   row_number() OVER (
                       PARTITION BY l_returnflag
                       ORDER BY floor(l_extendedprice * 100.0) DESC,
                                l_orderkey, l_linenumber
                   ) AS rn
            FROM lineitem_qual_v
        ) WHERE rn <= 3
        """
    )


@register(
    "sql_select_modifiers",
    oracle="""
        SELECT * EXCLUDE (c_name, c_acctbal),
               CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT)
                   AS acctbal_cents
        FROM customer
    """,
    doc="Star modifiers — ClickHouse `SELECT * EXCEPT(..) REPLACE(..)`"
    ", Spark `* EXCEPT (..)`, DuckDB `* EXCLUDE (..)`: project "
    "everything but the dropped columns, with the REPLACE expressed "
    "as a computed sibling (the only portable spelling — Spark has "
    "no REPLACE modifier). Pure projection: map-only, no exchange; "
    "at 100 TB this is the column-pruned scan itself — ReadSchema "
    "drops c_name at the parquet footer, so the 'wide table, narrow "
    "read' promise is structural, not optimizer luck.",
)
def sql_select_modifiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "customer_mod_v"
    )
    return spark.sql(
        """
        SELECT * EXCEPT (c_name, c_acctbal),
               CAST(floor(c_acctbal * 100.0 + 0.5) AS LONG)
                   AS acctbal_cents
        FROM customer_mod_v
        """
    )


@register(
    "agg_filter_where",
    oracle="""
        SELECT l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n_all,
               CAST(COUNT(*) FILTER (WHERE l_quantity > 25.0) AS BIGINT)
                   AS n_bulk,
               CAST(COUNT(*) FILTER (WHERE l_discount >= 0.05) AS BIGINT)
                   AS n_disc,
               CAST(COALESCE(SUM(CAST(floor(l_extendedprice * 100.0)
                        AS BIGINT)) FILTER (WHERE l_tax > 0.03), 0)
                    AS BIGINT) AS taxed_cents
        FROM lineitem GROUP BY l_linestatus
    """,
    doc="Aggregate FILTER (WHERE ..) clauses — the ANSI form of "
    "ClickHouse's -If combinators (countIf/sumIf), run as the SAME "
    "text in both engines: four conditional aggregates over one "
    "scan, one two-phase hash agg, no self-joins (the anti-pattern "
    "FILTER exists to kill: 4 filtered subqueries re-scanning 100 TB "
    "vs 4 counters in one pass). The sibling of agg_combinators "
    "(DataFrame spelling); money on the cent grid, empty-filter sums "
    "pinned to 0 with COALESCE in both engines.",
)
def agg_filter_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_fw_v"
    )
    return spark.sql(
        """
        SELECT l_linestatus,
               CAST(COUNT(*) AS LONG) AS n_all,
               CAST(COUNT(*) FILTER (WHERE l_quantity > 25.0) AS LONG)
                   AS n_bulk,
               CAST(COUNT(*) FILTER (WHERE l_discount >= 0.05) AS LONG)
                   AS n_disc,
               CAST(COALESCE(SUM(CAST(floor(l_extendedprice * 100.0)
                        AS LONG)) FILTER (WHERE l_tax > 0.03), 0)
                    AS LONG) AS taxed_cents
        FROM lineitem_fw_v GROUP BY l_linestatus
        """
    )


@register(
    "orderby_with_fill",
    oracle="""
        WITH e AS (
            SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
                   CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
            FROM events WHERE event_id % 293 = 0
        ), agg AS (
            SELECT hr, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(cents) AS BIGINT) AS cents
            FROM e GROUP BY hr
        ), b AS (
            SELECT min(hr) AS h0, max(hr) AS h1 FROM e
        ), grid AS (
            SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr
            FROM b
        )
        SELECT strftime(g.hr, '%Y-%m-%d %H:00') AS hour,
               COALESCE(a.n, 0) AS n,
               COALESCE(a.cents, 0) AS cents,
               CAST(CASE WHEN a.hr IS NULL THEN 1 ELSE 0 END AS BIGINT)
                   AS filled
        FROM grid g LEFT JOIN agg a ON g.hr = a.hr
    """,
    doc="ClickHouse `ORDER BY .. WITH FILL STEP` — emit a dense "
    "time-series with explicit zero rows for empty buckets, the "
    "monitoring-dashboard contract (a missing hour must PLOT as 0, "
    "not vanish). Engine form: hourly aggregate over a deterministic "
    "sparse event subset (id % 293 — sparse enough that empty hours exist at EVERY fixture scale; the sf0.1 audit caught % 97 covering all 720 hours), a global [min,max] hour bound "
    "(1-row agg), the dense grid via sequence()/explode, and a "
    "left join marking injected rows with filled=1. Hours emitted "
    "as formatted strings, money on the cent grid, fill values "
    "COALESCEd to exact 0 in both engines. Plan: fact agg is one "
    "exchange; the grid side is O(hours) rows built from a 1-row "
    "bound — Spark broadcasts the AGGREGATE side (bounded by "
    "distinct hours), so the fact table never re-shuffles; at 100 "
    "TB the grid join costs nothing.",
)
def orderby_with_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") % 293 == 0)
        .select(
            F.date_trunc("hour", "ts").alias("hr"),
            F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias(
                "cents"
            ),
        )
    )
    agg = e.groupBy("hr").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("cents"),
    )
    bounds = e.agg(
        F.min("hr").alias("h0"), F.max("hr").alias("h1")
    )
    grid = bounds.select(
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("hr")
    )
    joined = grid.join(F.broadcast(agg), "hr", "left")
    return joined.select(
        F.date_format("hr", "yyyy-MM-dd HH:00").alias("hour"),
        F.coalesce(F.col("n"), F.lit(0).cast("long")).alias("n"),
        F.coalesce(F.col("cents"), F.lit(0).cast("long")).alias("cents"),
        F.when(F.col("n").isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("filled"),
    )


# ---- round-7 batch 10: recursion, time-range frames, precision ----


@register(
    "sql_recursive_cte",
    oracle="""
        WITH RECURSIVE r(doc_id, node, depth) AS (
            SELECT doc_id, doc_id, 0 FROM documents
            UNION ALL
            SELECT doc_id, node // 2, depth + 1 FROM r WHERE node > 1
        )
        SELECT doc_id,
               CAST(MAX(depth) AS BIGINT) AS depth,
               CAST(COUNT(*) AS BIGINT) AS chain_len,
               CAST(SUM(node) AS BIGINT) AS chain_sum
        FROM r GROUP BY doc_id
    """,
    doc="WITH RECURSIVE — the iterative-closure surface Spark "
    "finally shipped in 4.0 (SPARK-24497) and ClickHouse 24.4 "
    "added: every document walks its deterministic ancestor chain "
    "(node → node div 2, the implicit binary hierarchy) to the "
    "root, emitting per-doc depth, chain length, and exact chain "
    "sum. Both engines execute the IDENTICAL recursive text, so the "
    "hash gate proves fixpoint semantics (not just syntax) agree — "
    "this is the declarative sibling of the engine's hand-rolled "
    "iterative operators (dict_hierarchy_flatten, graph_bfs_hops, "
    "dedup cluster propagation), which remain the 100 TB path "
    "(driver-controlled loops with localCheckpoint cut lineage; a "
    "recursive CTE's depth is optimizer-managed). Depth is "
    "O(log max_id) ~ 13-17 at fixture scales; each iteration is "
    "one map-side projection, the final agg one exchange.",
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark's cteRecursionRowLimit (default 1e6 rows) is a runaway-
    # fixpoint rail, not a semantics knob: this closure is provably
    # bounded at n_docs * ceil(log2 max_id) <= n_docs * 64 rows
    # (~13.5M at the sf1 arm, where the default rail fired). The
    # engine raises the rail to exactly that provable bound — a
    # dataset-proportional guard, never a blanket 2e9 that would
    # disarm the rail for other recursive queries in the session
    # (session-global conf; it only ever RAISES to the largest bound
    # proven so far, and the per-level rail — the real runaway guard,
    # depth <= 64 by construction — stays at its default). The
    # parquet-footer count() is metadata-cheap; the eager-probe
    # precedent is the memoized adaptive hot-share key.
    docs = load_table(spark, sf_dir, "documents")
    bound = max(1_000_000, min(2_147_483_647, docs.count() * 64))
    prior = int(spark.conf.get("spark.sql.cteRecursionRowLimit"))
    if bound > prior:
        spark.conf.set("spark.sql.cteRecursionRowLimit", str(bound))
    docs.createOrReplaceTempView("documents_rec_v")
    return spark.sql(
        """
        WITH RECURSIVE r(doc_id, node, depth) AS (
            SELECT doc_id, doc_id, 0 FROM documents_rec_v
            UNION ALL
            SELECT doc_id, node div 2, depth + 1 FROM r WHERE node > 1
        )
        SELECT doc_id,
               CAST(MAX(depth) AS LONG) AS depth,
               CAST(COUNT(*) AS LONG) AS chain_len,
               CAST(SUM(node) AS LONG) AS chain_sum
        FROM r GROUP BY doc_id
        """
    )


@register(
    "win_range_interval_frame",
    oracle="""
        WITH t AS (
            SELECT event_id, event_type,
                   CAST(ts AS TIMESTAMP) AS ts,
                   CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
            FROM events
        )
        SELECT event_id, event_type,
               CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
               CAST(SUM(cents) OVER w AS BIGINT) AS cents_1h
        FROM t
        WINDOW w AS (PARTITION BY event_type ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                               AND CURRENT ROW)
    """,
    doc="Time-valued RANGE window frame — `RANGE BETWEEN INTERVAL 1 "
    "HOUR PRECEDING AND CURRENT ROW` over the event-time order: the "
    "per-event trailing-hour count and cent volume, the "
    "rate-limiter/monitoring primitive written as ONE window instead "
    "of a self-join (the O(n²) anti-pattern a time-range frame "
    "exists to kill). RANGE (not ROWS) makes simultaneous events "
    "peers, so no tiebreak can perturb the result. Same frame text "
    "in both engines; money on the cent grid; the window SUM is "
    "CAST BIGINT on the oracle side (HUGEINT trap). One event_type "
    "exchange + one ts sort serves both frame aggregates; at 100 TB "
    "the frame state is the sliding hour's rows per partition, "
    "evicted monotonically as the frame head advances.",
)
def win_range_interval_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "events_rif_v"
    )
    return spark.sql(
        """
        WITH t AS (
            SELECT event_id, event_type, ts,
                   CAST(floor(value * 100.0 + 0.5) AS LONG) AS cents
            FROM events_rif_v
        )
        SELECT event_id, event_type,
               CAST(COUNT(*) OVER w AS LONG) AS n_1h,
               CAST(SUM(cents) OVER w AS LONG) AS cents_1h
        FROM t
        WINDOW w AS (PARTITION BY event_type ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                               AND CURRENT ROW)
        """
    )


@register(
    "func_datetime64_precision",
    oracle="""
        WITH t AS (
            SELECT event_type, epoch_us(ts) AS us,
                   CASE WHEN strptime(strftime(CAST(ts AS TIMESTAMP),
                            '%Y-%m-%d %H:%M:%S.%f'),
                            '%Y-%m-%d %H:%M:%S.%f')
                         = CAST(ts AS TIMESTAMP)
                        THEN 1 ELSE 0 END AS rt_ok
            FROM events
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(rt_ok) AS BIGINT) AS n_roundtrip_ok,
               CAST(SUM(us % 1000000) AS BIGINT) AS subsec_micro_sum,
               CAST(COUNT(DISTINCT us // 1000) AS BIGINT) AS n_ms_buckets,
               CAST(MIN(us) AS BIGINT) AS min_us,
               CAST(MAX(us) AS BIGINT) AS max_us
        FROM t GROUP BY event_type
    """,
    doc="DateTime64 sub-second precision battery — ClickHouse's "
    "DateTime64(6) contract on Spark timestamps: microsecond epoch "
    "extraction, sub-second component arithmetic (us mod 1e6 — "
    "summed exactly), millisecond bucketing cardinality, and the "
    "format→parse ROUNDTRIP check (format with 6 fractional "
    "digits, parse back, compare to the original instant — "
    "n_roundtrip_ok must equal n, proving no precision loss through "
    "text). The fixture's TIMESTAMP(NANOS) parquet arrives at "
    "micro precision via load_table, so every count is exact "
    "integer arithmetic; text formats never cross engines (each "
    "side roundtrips its own). Map-only expressions into one "
    "two-phase agg (plus the count-distinct expand exchange).",
)
def func_datetime64_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    rt_ok = F.when(
        F.to_timestamp(F.date_format("ts", fmt), fmt) == F.col("ts"), 1
    ).otherwise(0)
    t = e.select(
        "event_type", us.alias("us"), rt_ok.alias("rt_ok")
    )
    return t.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rt_ok").cast("long").alias("n_roundtrip_ok"),
        F.sum(F.col("us") % 1000000).cast("long").alias(
            "subsec_micro_sum"
        ),
        F.countDistinct(F.expr("us div 1000")).cast("long").alias(
            "n_ms_buckets"
        ),
        F.min("us").cast("long").alias("min_us"),
        F.max("us").cast("long").alias("max_us"),
    )
