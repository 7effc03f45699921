"""Join operators (SURVEY.md §2.B "Joins").

``join_anti`` is the reference's delete-set idiom (`backup.sh:119-122`:
rows on disk minus rows to keep); ``join_asof`` generalizes its
`-latest`-pointer-at-time-T maintenance (`backup.sh:99-115`).

Scale notes:
- Equi joins are left to Catalyst (sort-merge vs shuffled-hash vs
  broadcast, switched at runtime by AQE). ``join_broadcast`` pins the
  dim chain with explicit ``broadcast()`` hints — at 100 TB the fact
  side must never shuffle for a kB-sized dim.
- ``join_range`` keeps the band predicate *with* an equi key
  (user_id), so it runs as a shuffled equi join + residual filter,
  not a broadcast-nested-loop over the whole table.
- ``join_asof`` deliberately avoids the O(n·m) "join then keep rn=1"
  plan: it unions both sides, sorts within (user) partitions once,
  and propagates the last right-side row with
  ``last(ignorenulls=True)`` — linear work, one shuffle, the same
  plan shape merge_asof would use on a sorted bucketed table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhousebackup_spark.exprs import dsum, osum
from clickhousebackup_spark.registry import register
from clickhousebackup_spark.tables import load_table


@register(
    "join_inner",
    oracle="""
        SELECT o_orderkey, o_totalprice, c_custkey, c_name, c_mktsegment
        FROM orders JOIN customer ON o_custkey = c_custkey
    """,
    doc="Equi inner join; strategy picked by Catalyst/AQE.",
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "join_left",
    oracle="""
        SELECT c_custkey, c_name, o_orderkey, o_totalprice
        FROM customer LEFT JOIN orders
          ON o_custkey = c_custkey AND o_totalprice > 150000
    """,
    doc="Left outer join with null extension (non-matching customers kept).",
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    cond = (o.o_custkey == c.c_custkey) & (o.o_totalprice > 150000)
    return c.join(o, cond, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@register(
    "join_full",
    oracle="""
        SELECT a.o_custkey AS cust_o, a.n_open, b.o_custkey AS cust_f, b.n_closed
        FROM (SELECT o_custkey, COUNT(*) AS n_open FROM orders
              WHERE o_orderstatus = 'O' GROUP BY o_custkey) a
        FULL JOIN (SELECT o_custkey, COUNT(*) AS n_closed FROM orders
                   WHERE o_orderstatus = 'F' GROUP BY o_custkey) b
          ON a.o_custkey = b.o_custkey
    """,
    doc="Full outer join of two aggregated slices (nulls on both sides).",
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    a = (
        o.filter(F.col("o_orderstatus") == "O")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_open"))
        .withColumnRenamed("o_custkey", "cust_o")
    )
    b = (
        o.filter(F.col("o_orderstatus") == "F")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_closed"))
        .withColumnRenamed("o_custkey", "cust_f")
    )
    return a.join(b, a.cust_o == b.cust_f, "full").select(
        "cust_o", "n_open", "cust_f", "n_closed"
    )


@register(
    "join_semi",
    oracle="""
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders
                            WHERE o_totalprice > 150000)
    """,
    doc="Left semi join: customers having a large order.",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 150000
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > 150000)
    """,
    doc="Delete-set idiom (backup.sh:119-122): rows NOT in the keep set.",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 150000
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_broadcast",
    oracle=f"""
        SELECT r_name, COUNT(*) AS n_orders, {osum('o_totalprice')} AS total_price
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    doc="Fact ⋈ broadcast(dim chain): the fact side never shuffles for "
    "the join — mandatory shape at 100 TB.",
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    dim = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "r_name")
    )
    return (
        o.join(F.broadcast(dim), o.o_custkey == dim.c_custkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
        )
    )


@register(
    "join_cross",
    oracle="SELECT r_name, n_name FROM region CROSS JOIN nation",
    doc="Bounded cartesian product (5 × 25 rows).",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region").select("r_name")
    n = load_table(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n)


@register(
    "join_range",
    oracle="""
        SELECT e1.event_id AS a_id, e2.event_id AS b_id, e1.user_id
        FROM events e1 JOIN events e2
          ON e1.user_id = e2.user_id
         AND e2.ts > e1.ts
         AND e2.ts <= e1.ts + INTERVAL 1 HOUR
    """,
    doc="Band/range self-join: pairs of same-user events within 1 h. "
    "Keeps the equi key in the join so it shuffles, not BNLJ.",
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    e1 = ev.alias("e1")
    e2 = ev.alias("e2")
    cond = (
        (F.col("e1.user_id") == F.col("e2.user_id"))
        & (F.col("e2.ts") > F.col("e1.ts"))
        & (F.col("e2.ts") <= F.col("e1.ts") + F.expr("INTERVAL 1 HOUR"))
    )
    return e1.join(e2, cond).select(
        F.col("e1.event_id").alias("a_id"),
        F.col("e2.event_id").alias("b_id"),
        F.col("e1.user_id").alias("user_id"),
    )


@register(
    "join_asof",
    oracle="""
        WITH clicks AS (
            SELECT user_id, ts, event_id FROM (
                SELECT user_id, ts, event_id,
                       ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                          ORDER BY event_id DESC) AS rn
                FROM events WHERE event_type = 'click'
            ) WHERE rn = 1
        ),
        purchases AS (
            SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'purchase'
        )
        SELECT p.event_id AS p_id, p.user_id, p.ts AS p_ts,
               c.event_id AS c_id, c.ts AS c_ts
        FROM purchases p
        ASOF LEFT JOIN clicks c
          ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    doc="As-of join: for each purchase, the latest click of the same "
    "user at-or-before it (the `-latest` pointer of backup.sh:99-115 "
    "generalized to 'latest at time T'). Implemented as union + "
    "sort-within-user + last(ignorenulls) — linear, one shuffle.",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # The oracle dedups clicks to the newest event_id per (user, ts) so
    # DuckDB's ASOF sees one candidate at equal ts. Here that dedup is
    # FOLDED INTO THE MAIN WINDOW'S ORDER instead of a separate
    # row_number window partitioned by (user_id, ts): ordering clicks
    # ascending by c_event_id makes the running last() at any given ts
    # resolve to the max event_id — the same single candidate — while
    # every window in the plan is now partitioned by user_id alone, so
    # the whole query runs on ONE exchange instead of two (guide §2.4:
    # same-keyed operations share the partitioning; 2 Exchange → 1,
    # plan diff in plans/r16/join_asof_*.txt).
    #
    # At equal ts the right rows sort first (is_left=0) → "at-or-before"
    # includes them, matching ASOF's p.ts >= c.ts; among equal-ts clicks
    # the ascending c_event_id puts the max last, so last() picks it —
    # exactly the oracle's ROW_NUMBER ... ORDER BY event_id DESC dedup.
    #
    # Built as ONE parsed spark.sql statement (round-17 construction
    # lever): construct wall 121 → 36 ms, optimized plan EXACTLY equal
    # to the former Column build modulo expression ids (pinned in
    # tests/test_optimizations_r17.py), values verified identical.
    return spark.sql(
        """
        WITH u AS (
            SELECT user_id, ts, CAST(NULL AS BIGINT) AS p_event_id,
                   event_id AS c_event_id, 0 AS is_left
            FROM {ev} WHERE event_type = 'click'
            UNION ALL
            SELECT user_id, ts, event_id AS p_event_id,
                   CAST(NULL AS BIGINT) AS c_event_id, 1 AS is_left
            FROM {ev} WHERE event_type = 'purchase'
        ), m AS (
            SELECT user_id, ts, p_event_id, is_left,
                   last(c_event_id, true) OVER w AS c_id,
                   last(CASE WHEN c_event_id IS NOT NULL THEN ts END, true)
                       OVER w AS c_ts
            FROM u
            WINDOW w AS (PARTITION BY user_id
                         ORDER BY ts, is_left, c_event_id ASC NULLS FIRST
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        )
        SELECT p_event_id AS p_id, user_id, ts AS p_ts, c_id, c_ts
        FROM m WHERE is_left = 1
        """,
        ev=ev,
    )


@register(
    "join_asof_forward",
    oracle="""
        WITH clicks AS (
            SELECT user_id, ts, event_id FROM (
                SELECT user_id, ts, event_id,
                       ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                          ORDER BY event_id) AS rn
                FROM events WHERE event_type = 'click'
            ) WHERE rn = 1
        ),
        purchases AS (
            SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'purchase'
        ),
        cand AS (
            SELECT p.event_id AS p_id, c.event_id AS c_id, c.ts AS c_ts,
                   ROW_NUMBER() OVER (PARTITION BY p.event_id
                                      ORDER BY c.ts, c.event_id) AS rn
            FROM purchases p JOIN clicks c
              ON p.user_id = c.user_id AND c.ts >= p.ts
        )
        SELECT p.event_id AS p_id, p.user_id, p.ts AS p_ts,
               cand.c_id, cand.c_ts
        FROM purchases p
        LEFT JOIN (SELECT * FROM cand WHERE rn = 1) cand
          ON p.event_id = cand.p_id
    """,
    doc="Forward as-of join: for each purchase, the EARLIEST click of "
    "the same user at-or-after it (next-event attribution). Same "
    "linear union + sorted-scan plan as join_asof, mirrored: first("
    "ignorenulls) over the FOLLOWING frame — one shuffle on user_id, "
    "never the O(n·m) join-then-filter.",
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # dedup clicks to LOWEST event_id per (user, ts): the tie rule the
    # oracle's (c.ts, c.event_id) ordering applies
    w_dedup = Window.partitionBy("user_id", "ts").orderBy("event_id")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .withColumn("rn", F.row_number().over(w_dedup))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "ts",
            F.col("event_id").alias("c_event_id"),
            F.lit(1).alias("is_click"),
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("p_event_id"),
        F.lit(0).alias("is_click"),
    )
    rows = clicks.unionByName(purchases, allowMissingColumns=True)
    # sort purchases BEFORE clicks at equal ts (is_click asc) so an
    # at-the-same-instant click is inside the purchase's FOLLOWING frame
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_click", "c_event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return (
        rows.withColumn(
            "c_id", F.first("c_event_id", ignorenulls=True).over(w)
        )
        .withColumn("c_ts", F.first(F.when(F.col("is_click") == 1, F.col("ts")), ignorenulls=True).over(w))
        .filter(F.col("p_event_id").isNotNull())
        .select(
            F.col("p_event_id").alias("p_id"),
            "user_id",
            F.col("ts").alias("p_ts"),
            "c_id",
            "c_ts",
        )
    )


@register(
    "join_null_safe",
    oracle="""
        WITH keyed AS (
            SELECT event_id, nullif(event_type, 'view') AS k FROM events
        ), dim AS (
            SELECT k, CAST(ROW_NUMBER() OVER (
                       ORDER BY k NULLS FIRST) AS BIGINT) AS code
            FROM (SELECT DISTINCT nullif(event_type, 'view') AS k
                  FROM events)
        )
        SELECT e.event_id, e.k, d.code
        FROM keyed e JOIN dim d ON e.k IS NOT DISTINCT FROM d.k
    """,
    doc="Null-safe equality join (Spark `<=>` / ANSI IS NOT DISTINCT "
    "FROM): the fact side derives a NULLABLE key (nullif turns one "
    "category into NULL — the 'unknown bucket' every star schema "
    "has), the dim side carries one row per key INCLUDING the NULL "
    "row, and `<=>` matches NULL to NULL where plain `=` would drop "
    "those rows. Catalyst plans `<=>` as a proper hash-join key "
    "(EqualNullSafe is an equi-join expression — check the plan: "
    "no BroadcastNestedLoop), so the null bucket hashes and "
    "shuffles like any other value; a skewed null bucket is an AQE "
    "skew-split case, same as any hot key. Dim is vocabulary-sized "
    "→ broadcast; codes are assigned in NULLS FIRST value order "
    "(deterministic, not first-seen).",
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    keyed = ev.select(
        "event_id", F.nullif(F.col("event_type"), F.lit("view")).alias("k")
    )
    dim = (
        keyed.select("k")
        .distinct()
        .withColumn(
            "code",
            F.row_number()
            .over(Window.orderBy(F.col("k").asc_nulls_first()))
            .cast("long"),
        )
    )
    return (
        keyed.alias("e")
        .join(F.broadcast(dim).alias("d"), F.col("e.k").eqNullSafe(F.col("d.k")))
        .select("e.event_id", "e.k", "d.code")
    )


@register(
    "join_asof_tolerance",
    oracle="""
        WITH clicks AS (
            SELECT user_id, ts, event_id FROM (
                SELECT user_id, ts, event_id,
                       ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                          ORDER BY event_id DESC) AS rn
                FROM events WHERE event_type = 'click'
            ) WHERE rn = 1
        ),
        purchases AS (
            SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'purchase'
        )
        SELECT p.event_id AS p_id, p.user_id, p.ts AS p_ts,
               CASE WHEN epoch_us(p.ts) - epoch_us(c.ts) <= 3600000000
                    THEN c.event_id END AS c_id,
               CASE WHEN epoch_us(p.ts) - epoch_us(c.ts) <= 3600000000
                    THEN c.ts END AS c_ts
        FROM purchases p
        ASOF LEFT JOIN clicks c
          ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    doc="As-of join WITH TOLERANCE (pandas merge_asof(tolerance=1h)): "
    "each purchase takes the latest same-user click at-or-before it "
    "ONLY if that click is within one hour — staler matches become "
    "NULL, exactly the attribution-window rule of marketing "
    "pipelines. Same linear union + sort-within-user + "
    "last(ignorenulls) plan as join_asof (one shuffle, never the "
    "O(n*m) join-then-rank), with the tolerance applied as an "
    "epoch-microsecond integer comparison AFTER the match — integer "
    "µs, so the cutoff is bit-identical across engines.",
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w_dedup = Window.partitionBy("user_id", "ts").orderBy(
        F.col("event_id").desc()
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .withColumn("rn", F.row_number().over(w_dedup))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "ts",
            F.col("event_id").alias("c_event_id"),
            F.lit(1).alias("is_click"),
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("p_event_id"),
        F.lit(0).alias("is_click"),
    )
    rows = clicks.unionByName(purchases, allowMissingColumns=True)
    # clicks BEFORE purchases at equal ts (is_click desc) so an
    # at-the-same-instant click is visible to the purchase's frame
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.col("is_click").desc(), "c_event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        rows.withColumn(
            "c_id", F.last("c_event_id", ignorenulls=True).over(w)
        )
        .withColumn(
            "c_ts",
            F.last(
                F.when(F.col("is_click") == 1, F.col("ts")),
                ignorenulls=True,
            ).over(w),
        )
        .filter(F.col("p_event_id").isNotNull())
    )
    within = (
        F.unix_micros(F.col("ts")) - F.unix_micros(F.col("c_ts"))
    ) <= 3600000000
    return matched.select(
        F.col("p_event_id").alias("p_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        F.when(within, F.col("c_id")).alias("c_id"),
        F.when(within, F.col("c_ts")).alias("c_ts"),
    )


@register(
    "merge_upsert_cow",
    oracle="""
        WITH delta AS (
            SELECT o_orderkey AS k, o_totalprice + 1000.0 AS price,
                   'U' AS status
            FROM orders WHERE o_orderkey % 7 = 0
            UNION ALL
            SELECT o_orderkey + 100000000 AS k, o_totalprice AS price,
                   'N' AS status
            FROM orders WHERE o_orderkey % 7 = 0
        ), target AS (
            SELECT o_orderkey AS k, o_totalprice AS price,
                   o_orderstatus AS status
            FROM orders
        )
        SELECT COALESCE(t.k, d.k) AS o_orderkey,
               COALESCE(d.price, t.price) AS o_totalprice,
               COALESCE(d.status, t.status) AS o_orderstatus
        FROM target t FULL JOIN delta d ON t.k = d.k
    """,
    doc="MERGE INTO (upsert) semantics without a table format: WHEN "
    "MATCHED THEN UPDATE, WHEN NOT MATCHED THEN INSERT, re-expressed "
    "as ONE full-outer equi-join with source-wins coalesce — the "
    "copy-on-write rewrite Delta/Iceberg MERGE performs under the "
    "hood, minus their file-level pruning. The delta here updates "
    "every 7th order (+1000 price, status U) and inserts a shifted "
    "copy (status N). One shuffle on the merge key; at 100 TB the "
    "production variant prunes the target scan to files whose key "
    "envelope intersects the delta (see mutation_delete_update) and "
    "broadcasts the delta when it is dimension-sized. Deterministic: "
    "pure coalesce per key, no ordering dependence.",
)
def merge_upsert_cow(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    target = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderstatus").alias("status"),
    )
    changed = o.filter(F.col("o_orderkey") % 7 == 0)
    delta = changed.select(
        F.col("o_orderkey").alias("k"),
        (F.col("o_totalprice") + 1000.0).alias("d_price"),
        F.lit("U").alias("d_status"),
    ).unionByName(
        changed.select(
            (F.col("o_orderkey") + 100000000).alias("k"),
            F.col("o_totalprice").alias("d_price"),
            F.lit("N").alias("d_status"),
        )
    )
    return (
        target.alias("t")
        .join(delta.alias("d"), "k", "full_outer")
        .select(
            F.col("k").alias("o_orderkey"),
            F.coalesce("d_price", "price").alias("o_totalprice"),
            F.coalesce("d_status", "status").alias("o_orderstatus"),
        )
    )


@register(
    "join_any_left",
    oracle="""
        WITH best AS (
            SELECT o_custkey, o_orderkey, o_totalprice FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       ROW_NUMBER() OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderkey) AS rn
                FROM orders
            ) WHERE rn = 1
        )
        SELECT c.c_custkey, c.c_name, b.o_orderkey, b.o_totalprice
        FROM customer c LEFT JOIN best b ON c.c_custkey = b.o_custkey
    """,
    doc="ClickHouse LEFT ANY JOIN: at most ONE right-side row per "
    "left row — CH picks an arbitrary match, which can never "
    "hash-match, so this engine pins the deterministic choice "
    "(lowest o_orderkey) the way every keep-one operator here does. "
    "Plan: dedupe the right side FIRST (rank-limit window — Spark's "
    "WindowGroupLimit prunes it map-side before the exchange), then "
    "a plain left equi-join; deduping before the join is also the "
    "scale-correct order, since it shrinks the build/shuffle side "
    "and caps the join's output at |left| rows — the entire point "
    "of ANY JOIN versus a fanning left join.",
)
def join_any_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    best = (
        o.select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return cust.join(
        best, cust.c_custkey == best.o_custkey, "left"
    ).select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@register(
    "join_asof_nearest",
    oracle="""
        WITH clicks AS (
            SELECT user_id, ts, event_id FROM (
                SELECT user_id, ts, event_id,
                       ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                          ORDER BY event_id DESC) AS rn
                FROM events WHERE event_type = 'click'
            ) WHERE rn = 1
        ), purch AS (
            SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'purchase'
        ), u AS (
            SELECT user_id, ts, CAST(NULL AS BIGINT) AS p_id,
                   event_id AS c_id, 0 AS is_left
            FROM clicks
            UNION ALL
            SELECT user_id, ts, event_id AS p_id,
                   CAST(NULL AS BIGINT) AS c_id, 1 AS is_left
            FROM purch
        ), w AS (
            SELECT user_id, ts, p_id,
                   last_value(c_id IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY ts, is_left
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS b_id,
                   last_value(CASE WHEN c_id IS NOT NULL THEN ts END
                       IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY ts, is_left
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS b_ts,
                   first_value(c_id IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY ts, is_left
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                       AS f_id,
                   first_value(CASE WHEN c_id IS NOT NULL THEN ts END
                       IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY ts, is_left
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                       AS f_ts
            FROM u
        )
        SELECT p_id, user_id, ts AS p_ts,
               CAST(COALESCE(CASE
                    WHEN b_id IS NULL THEN f_id
                    WHEN f_id IS NULL THEN b_id
                    WHEN epoch_us(ts) - epoch_us(b_ts)
                         <= epoch_us(f_ts) - epoch_us(ts) THEN b_id
                    ELSE f_id END, -1) AS BIGINT) AS c_id,
               CAST(COALESCE(CASE
                    WHEN b_id IS NULL AND f_id IS NULL THEN NULL
                    WHEN b_id IS NULL THEN epoch_us(f_ts) - epoch_us(ts)
                    WHEN f_id IS NULL THEN epoch_us(ts) - epoch_us(b_ts)
                    WHEN epoch_us(ts) - epoch_us(b_ts)
                         <= epoch_us(f_ts) - epoch_us(ts)
                         THEN epoch_us(ts) - epoch_us(b_ts)
                    ELSE epoch_us(f_ts) - epoch_us(ts) END, -1)
                   AS BIGINT) AS gap_us
        FROM w WHERE p_id IS NOT NULL
    """,
    doc="NEAREST as-of join (pandas merge_asof direction='nearest'): "
    "for each purchase, the click of the same user closest in time — "
    "either direction, ties to the backward (at-or-before) side, the "
    "attribution mode for 'which interaction does this conversion "
    "belong to' when sessions straddle the purchase. Same linear "
    "union + one-partitioning trick as join_asof, but BOTH frames in "
    "one window pass: last(click, ignorenulls) over the preceding "
    "frame gives the backward candidate, first(...) over the "
    "following frame the forward one, and the pick is integer-µs "
    "arithmetic. No-match rows carry the -1 sentinel (never a "
    "nullable int column — the pandas float64 coercion trap). One "
    "shuffle on user_id; both frames reuse the same sort.",
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w_dedup = Window.partitionBy("user_id", "ts").orderBy(
        F.col("event_id").desc()
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .withColumn("rn", F.row_number().over(w_dedup))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "ts",
            F.lit(None).cast("long").alias("p_id"),
            F.col("event_id").alias("c_id"),
            F.lit(0).alias("is_left"),
        )
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("p_id"),
        F.lit(None).cast("long").alias("c_id"),
        F.lit(1).alias("is_left"),
    )
    u = clicks.unionByName(purch)
    back = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_left")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    c_ts = F.when(F.col("c_id").isNotNull(), F.col("ts"))
    w = u.select(
        "user_id",
        "ts",
        "p_id",
        F.last("c_id", ignorenulls=True).over(back).alias("b_id"),
        F.last(c_ts, ignorenulls=True).over(back).alias("b_ts"),
        F.first("c_id", ignorenulls=True).over(fwd).alias("f_id"),
        F.first(c_ts, ignorenulls=True).over(fwd).alias("f_ts"),
    )
    db = F.unix_micros("ts") - F.unix_micros("b_ts")
    df_ = F.unix_micros("f_ts") - F.unix_micros("ts")
    pick_b = (
        F.col("f_id").isNull()
        | (F.col("b_id").isNotNull() & (db <= df_))
    )
    return w.filter(F.col("p_id").isNotNull()).select(
        "p_id",
        "user_id",
        F.col("ts").alias("p_ts"),
        F.coalesce(
            F.when(F.col("b_id").isNull(), F.col("f_id"))
            .when(pick_b, F.col("b_id"))
            .otherwise(F.col("f_id")),
            F.lit(-1),
        )
        .cast("long")
        .alias("c_id"),
        F.coalesce(
            F.when(F.col("b_id").isNull() & F.col("f_id").isNull(), None)
            .when(F.col("b_id").isNull(), df_)
            .when(pick_b, db)
            .otherwise(df_),
            F.lit(-1),
        )
        .cast("long")
        .alias("gap_us"),
    )
