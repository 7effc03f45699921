"""URL and IP function families (ClickHouse parity surface).

ClickHouse ships large URL- and IP-manipulation function families
(``domain``, ``path``, ``extractURLParameter``, ``IPv4NumToString``,
``IPv4StringToNum``, CIDR tests ...) that its analytics users lean on
constantly; the reference server image (`/root/reference/Dockerfile:2`)
carries all of them. This module re-expresses the load-bearing subset
with Spark built-ins — ``parse_url`` (JVM-side, codegen'd) for URLs
and pure 64-bit integer bit arithmetic for IPv4 — so the whole family
stays inside whole-stage codegen with zero Python in the hot path.

The fixtures carry no URL/IP columns, so both operators first
*synthesize* them deterministically from fixture keys (documents /
events) and then parse them back; the oracle re-derives everything
with portable string/bit SQL, pinning the extraction semantics, not
just the synthesis.

Scale: both are map-only column expressions — no shuffle, no UDF;
at 100 TB they run at parquet-scan speed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhousebackup_spark.registry import register
from clickhousebackup_spark.tables import load_table


@register(
    "url_funcs",
    oracle="""
        WITH u AS (
            SELECT doc_id,
                   concat('https://www.', source, '.example.com/', lang,
                          '/doc-', CAST(doc_id AS VARCHAR),
                          '?ref=', source,
                          '&p=', CAST(doc_id % 7 AS VARCHAR)) AS url
            FROM documents
        ), parts AS (
            SELECT doc_id, url,
                   split_part(url, '://', 1) AS protocol,
                   split_part(split_part(url, '://', 2), '/', 1) AS host,
                   split_part(url, '?', 2) AS query_string
            FROM u
        )
        SELECT doc_id, url, protocol, host,
               substr(split_part(url, '?', 1),
                      length(protocol) + 3 + length(host) + 1) AS url_path,
               query_string,
               regexp_extract(query_string, 'ref=([^&]*)', 1) AS ref_param,
               regexp_extract(host, '\\.([^.]+)$', 1) AS tld,
               regexp_replace(host, '^www\\.', '') AS domain_no_www
        FROM parts
    """,
    doc="ClickHouse URL function family (protocol/domain/path/"
    "queryString/extractURLParameter/topLevelDomain/"
    "cutWWW) via Spark's parse_url + regexp — all JVM-side "
    "codegen'd expressions. URLs are synthesized deterministically "
    "from documents keys; the oracle re-parses them with portable "
    "string SQL so the extraction semantics (not just the synthesis) "
    "are pinned. Map-only, no shuffle.",
)
def url_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://www."),
        F.col("source"),
        F.lit(".example.com/"),
        F.col("lang"),
        F.lit("/doc-"),
        F.col("doc_id").cast("string"),
        F.lit("?ref="),
        F.col("source"),
        F.lit("&p="),
        F.pmod(F.col("doc_id"), F.lit(7)).cast("string"),
    )
    d = d.select("doc_id", url.alias("url"))
    host = F.parse_url(F.col("url"), F.lit("HOST"))
    return d.select(
        "doc_id",
        "url",
        F.parse_url(F.col("url"), F.lit("PROTOCOL")).alias("protocol"),
        host.alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("url_path"),
        F.parse_url(F.col("url"), F.lit("QUERY")).alias("query_string"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("ref")).alias("ref_param"),
        F.regexp_extract(host, r"\.([^.]+)$", 1).alias("tld"),
        F.regexp_replace(host, r"^www\.", "").alias("domain_no_www"),
    )


@register(
    "ip_funcs",
    oracle="""
        WITH ips AS (
            SELECT DISTINCT user_id,
                   ((user_id % 65536) * 2654435761) % 4294967296 AS ip_num
            FROM events
        ), oct AS (
            SELECT user_id, ip_num,
                   (ip_num >> 24) & 255 AS o1, (ip_num >> 16) & 255 AS o2,
                   (ip_num >> 8) & 255 AS o3, ip_num & 255 AS o4
            FROM ips
        )
        SELECT user_id, CAST(ip_num AS BIGINT) AS ip_num,
               concat(CAST(o1 AS VARCHAR), '.', CAST(o2 AS VARCHAR), '.',
                      CAST(o3 AS VARCHAR), '.', CAST(o4 AS VARCHAR)) AS ip_str,
               CAST(o1 * 16777216 + o2 * 65536 + o3 * 256 + o4
                    AS BIGINT) AS ip_roundtrip,
               concat(CAST(o1 AS VARCHAR), '.', CAST(o2 AS VARCHAR), '.',
                      CAST(o3 AS VARCHAR), '.0/24') AS net24,
               CAST(CASE WHEN o1 = 10 OR (o1 = 192 AND o2 = 168)
                              OR (o1 = 172 AND o2 BETWEEN 16 AND 31)
                         THEN 1 ELSE 0 END AS BIGINT) AS is_private
        FROM oct
    """,
    doc="ClickHouse IPv4 function family (IPv4NumToString / "
    "IPv4StringToNum roundtrip, /24 CIDR network, RFC-1918 private-"
    "range test) as pure 64-bit shift/mask arithmetic — identical "
    "integer semantics in Spark and DuckDB, fully codegen'd, "
    "map-only. IPs are synthesized per user via a Knuth "
    "multiplicative hash of user_id, so the distribution exercises "
    "all octet boundaries deterministically.",
)
def ip_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    users = load_table(spark, sf_dir, "events").select("user_id").distinct()
    ip = F.pmod(
        F.pmod(F.col("user_id"), F.lit(65536)) * F.lit(2654435761),
        F.lit(4294967296),
    )
    d = users.select("user_id", ip.alias("ip_num"))
    o = [
        (F.shiftrightunsigned(F.col("ip_num"), b) % 256).alias(f"o{i}")
        for i, b in ((1, 24), (2, 16), (3, 8))
    ] + [(F.col("ip_num") % 256).alias("o4")]
    d = d.select("user_id", "ip_num", *o)
    o1, o2, o3, o4 = (F.col(f"o{i}") for i in (1, 2, 3, 4))
    return d.select(
        "user_id",
        F.col("ip_num").cast("long").alias("ip_num"),
        F.concat_ws(
            ".",
            o1.cast("string"),
            o2.cast("string"),
            o3.cast("string"),
            o4.cast("string"),
        ).alias("ip_str"),
        (o1 * 16777216 + o2 * 65536 + o3 * 256 + o4)
        .cast("long")
        .alias("ip_roundtrip"),
        F.concat(
            o1.cast("string"),
            F.lit("."),
            o2.cast("string"),
            F.lit("."),
            o3.cast("string"),
            F.lit(".0/24"),
        ).alias("net24"),
        F.when(
            (o1 == 10)
            | ((o1 == 192) & (o2 == 168))
            | ((o1 == 172) & o2.between(16, 31)),
            1,
        )
        .otherwise(0)
        .cast("long")
        .alias("is_private"),
    )


@register(
    "dedup_url_normalize",
    oracle="""
        WITH u AS (
            SELECT doc_id,
                   concat(CASE WHEN doc_id % 2 = 0 THEN 'https://www.'
                               ELSE 'HTTPS://' END,
                          source, '.example.com/', lang, '/page-',
                          CAST(doc_id % 40 AS VARCHAR),
                          CASE WHEN doc_id % 3 = 0
                               THEN concat('?utm_source=', lang,
                                           '&ref=', source)
                               WHEN doc_id % 3 = 1 THEN '?ref=feed'
                               ELSE '' END) AS url
            FROM documents
        ), norm AS (
            SELECT doc_id,
                   regexp_replace(regexp_replace(lower(
                       split_part(url, '?', 1)), '^https?://', ''),
                       '^www\\.', '') AS norm_url
            FROM u
        )
        SELECT norm_url,
               CAST(min(doc_id) AS BIGINT) AS keep_doc_id,
               CAST(COUNT(*) - 1 AS BIGINT) AS n_dups
        FROM norm GROUP BY norm_url
    """,
    doc="URL-canonicalization dedup — the web-crawl preprocessing "
    "step: synthesize messy URLs (mixed case scheme, optional www, "
    "tracking query params), normalize (lowercase, strip scheme/www/"
    "query), and dedup by canonical URL keeping the lowest doc_id. "
    "The same page reached via http/https, with or without www or "
    "utm tags, collapses to one representative — pure string "
    "expressions + one hash agg; at crawl scale this runs before "
    "any content dedup and removes the cheapest duplicate class "
    "first.",
)
def dedup_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.when(F.col("doc_id") % 2 == 0, F.lit("https://www.")).otherwise(
            F.lit("HTTPS://")
        ),
        F.col("source"),
        F.lit(".example.com/"),
        F.col("lang"),
        F.lit("/page-"),
        F.pmod(F.col("doc_id"), F.lit(40)).cast("string"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit("?utm_source="), F.col("lang"), F.lit("&ref="), F.col("source")
            ),
        )
        .when(F.col("doc_id") % 3 == 1, F.lit("?ref=feed"))
        .otherwise(F.lit("")),
    )
    norm = F.regexp_replace(
        F.regexp_replace(
            F.lower(F.substring_index(url, "?", 1)), r"^https?://", ""
        ),
        r"^www\.",
        "",
    )
    return (
        d.select(norm.alias("norm_url"), "doc_id")
        .groupBy("norm_url")
        .agg(
            F.min("doc_id").cast("long").alias("keep_doc_id"),
            (F.count(F.lit(1)) - 1).cast("long").alias("n_dups"),
        )
    )


#: CIDR table for ip_cidr_join: 32 deterministic /16 networks.
CIDR_N = 32


@register(
    "ip_cidr_join",
    oracle=f"""
        WITH ips AS (
            SELECT DISTINCT user_id,
                   ((user_id % 65536) * 2654435761) % 4294967296 AS ip_num
            FROM events
        ), cidrs AS (
            SELECT r.range AS cidr_id,
                   (((r.range * 40503) % 65536) * 65536) AS net_lo,
                   (((r.range * 40503) % 65536) * 65536) + 65535 AS net_hi
            FROM range(0, {CIDR_N}) r
        )
        SELECT c.cidr_id, i.user_id, CAST(i.ip_num AS BIGINT) AS ip_num
        FROM ips i JOIN cidrs c
          ON i.ip_num // 65536 = c.net_lo // 65536
        WHERE i.ip_num >= c.net_lo AND i.ip_num <= c.net_hi
    """,
    doc="CIDR-range membership join (CH IPv4CIDRToRange + dictGet "
    "ip_trie): which /16 network does each client IP fall in — the "
    "geo-IP / allowlist join every clickstream pipeline runs. "
    "Executed as a PREFIX-BUCKET equi-join, not a range theta-join: "
    "a /16 network has one 16-bit prefix, an IP has one prefix, so "
    "the join key is ip >> 16 (integer division — all values "
    "non-negative) with the range check as residual — the 1-D "
    "special case of the geo_grid_bbox_join reduction, and exactly "
    "how ip_trie dictionaries bucket at CH scale (longest-prefix "
    "generalizes by exploding each CIDR into its covering /16s). "
    "IPs are the ip_funcs multiplicative-hash synthetics; networks "
    "are 32 deterministic /16s. Integer-only outputs.",
)
def ip_cidr_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ips = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .select(
            "user_id",
            (((F.col("user_id") % 65536) * 2654435761) % 4294967296).alias(
                "ip_num"
            ),
        )
    )
    cidrs = spark.range(CIDR_N).select(
        F.col("id").alias("cidr_id"),
        (((F.col("id") * 40503) % 65536) * 65536).alias("net_lo"),
        ((((F.col("id") * 40503) % 65536) * 65536) + 65535).alias("net_hi"),
    )
    return (
        ips.join(
            F.broadcast(cidrs),
            F.expr("ip_num div 65536") == F.expr("net_lo div 65536"),
        )
        .filter(
            (F.col("ip_num") >= F.col("net_lo"))
            & (F.col("ip_num") <= F.col("net_hi"))
        )
        .select("cidr_id", "user_id", F.col("ip_num").cast("long").alias("ip_num"))
    )


@register(
    "ip_prefix_rollup",
    oracle="""
        WITH ev AS (
            SELECT user_id, event_id,
                   ((user_id % 65536) * 2654435761) % 4294967296 AS ip
            FROM events
        )
        SELECT CAST(level AS BIGINT) AS level, net,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM (
            SELECT user_id, event_id, 16 AS level,
                   concat(CAST((ip >> 24) & 255 AS VARCHAR), '.',
                          CAST((ip >> 16) & 255 AS VARCHAR), '.0.0/16')
                       AS net
            FROM ev
            UNION ALL
            SELECT user_id, event_id, 24 AS level,
                   concat(CAST((ip >> 24) & 255 AS VARCHAR), '.',
                          CAST((ip >> 16) & 255 AS VARCHAR), '.',
                          CAST((ip >> 8) & 255 AS VARCHAR), '.0/24') AS net
            FROM ev
        )
        GROUP BY level, net
    """,
    doc="CIDR prefix rollup — the telemetry aggregation ClickHouse "
    "deployments build on IPv4CIDRToRange/IPv4NumToString: event and "
    "distinct-user counts per /16 and per /24 network, both levels "
    "in one result (the drill-down a NOC dashboard pages through). "
    "IPs are the same deterministic Knuth-hash synthesis ip_funcs "
    "established; prefixes are pure 64-bit shift/mask arithmetic "
    "identical in both engines. Plan: the two levels are a "
    "projection union over ONE scan followed by one hash agg — at "
    "100 TB you'd trade the union for GROUPING SETS on the octet "
    "columns (same single-shuffle shape, half the scan bytes); "
    "COUNT(DISTINCT user) is the two-phase expand Spark plans "
    "natively.",
)
def ip_prefix_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        (((F.col("user_id") % 65536) * 2654435761) % 4294967296).alias(
            "ip"
        ),
    )
    o1 = F.shiftright("ip", 24).bitwiseAND(F.lit(255)).cast("string")
    o2 = F.shiftright("ip", 16).bitwiseAND(F.lit(255)).cast("string")
    o3 = F.shiftright("ip", 8).bitwiseAND(F.lit(255)).cast("string")
    l16 = ev.select(
        "user_id",
        "event_id",
        F.lit(16).cast("long").alias("level"),
        F.concat(o1, F.lit("."), o2, F.lit(".0.0/16")).alias("net"),
    )
    l24 = ev.select(
        "user_id",
        "event_id",
        F.lit(24).cast("long").alias("level"),
        F.concat(o1, F.lit("."), o2, F.lit("."), o3, F.lit(".0/24")).alias(
            "net"
        ),
    )
    return (
        l16.unionByName(l24)
        .groupBy("level", "net")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
    )
