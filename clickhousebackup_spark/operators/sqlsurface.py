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
