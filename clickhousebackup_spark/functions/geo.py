"""Geo function family — geohash encoding (ClickHouse parity).

ClickHouse ships `geohashEncode`; the encoding is trig-free — scale
lat/lon to 20-bit grid cells, bit-interleave (lon first) into a
40-bit Morton code, and emit 8 base32 characters — so unlike
haversine-style functions it is EXACTLY portable across engines (no
libm divergence risk). The whole operator is one generated SQL
expression valid in both Spark SQL and DuckDB: floor/substring/
concat plus `>>`/`&`, evaluated inside whole-stage codegen, map-only.

Coordinates are synthesized deterministically from user_id (fixtures
carry no geo columns) on a 1e-6-degree integer grid; the oracle
re-derives them with the same arithmetic, so the driver pins the
ENCODER, not just the synthesis.

Scale: zero shuffles; and because geohash IS a Morton code, sorting
by it is the geo variant of `zorder_layout` — writes clustered by
geohash give parquet files tight lat/lon min-max envelopes for
2-D pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhousebackup_spark.registry import register
from clickhousebackup_spark.tables import load_table

_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"

#: 20-bit x 20-bit interleave, lon (a) in the odd (higher) positions —
#: geohash bit order. Shared verbatim by Spark SQL and DuckDB.
_Z20 = " + ".join(
    f"(((a >> {i}) & 1) * {1 << (2 * i + 1)})"
    f" + (((b >> {i}) & 1) * {1 << (2 * i)})"
    for i in range(20)
)

#: base32 chars, 5 bits each, MSB-first.
_GEOHASH8 = "concat(" + ", ".join(
    f"substring('{_B32}', CAST(((z >> {5 * k}) & 31) AS INT) + 1, 1)"
    for k in range(7, -1, -1)
) + ")"

_COORD_CTE = """
    SELECT user_id,
           (CAST((user_id * 2654435761) % 180000000 AS DOUBLE)
            / 1000000.0) - 90.0 AS lat,
           (CAST((user_id * 1779033703) % 360000000 AS DOUBLE)
            / 1000000.0) - 180.0 AS lon
    FROM (SELECT DISTINCT user_id FROM events)
"""


@register(
    "geo_geohash",
    oracle=f"""
        WITH coords AS ({_COORD_CTE}),
        cells AS (
            SELECT user_id, lat, lon,
                   CAST(floor((lon + 180.0) / 360.0 * 1048576.0)
                        AS BIGINT) AS a,
                   CAST(floor((lat + 90.0) / 180.0 * 1048576.0)
                        AS BIGINT) AS b
            FROM coords
        ), z AS (
            SELECT user_id, lat, lon, CAST({_Z20} AS BIGINT) AS z
            FROM cells
        )
        SELECT user_id, lat, lon, {_GEOHASH8} AS geohash8
        FROM z
    """,
    doc="geohashEncode: 8-character geohash from (lat, lon) — 20-bit "
    "grid scaling, lon-first Morton interleave, base32 emission, all "
    "as one shared SQL expression (identical integer/IEEE semantics "
    "in both engines). Map-only; doubles as the geo clustering key "
    "(see zorder_layout).",
)
def geo_geohash(spark: SparkSession, sf_dir: str) -> DataFrame:
    users = load_table(spark, sf_dir, "events").select("user_id").distinct()
    lat = (
        F.pmod(F.col("user_id") * F.lit(2654435761), F.lit(180000000)).cast("double")
        / F.lit(1000000.0)
        - F.lit(90.0)
    )
    lon = (
        F.pmod(F.col("user_id") * F.lit(1779033703), F.lit(360000000)).cast("double")
        / F.lit(1000000.0)
        - F.lit(180.0)
    )
    d = users.select("user_id", lat.alias("lat"), lon.alias("lon"))
    d = d.withColumn(
        "a", F.floor((F.col("lon") + 180.0) / 360.0 * 1048576.0).cast("long")
    ).withColumn(
        "b", F.floor((F.col("lat") + 90.0) / 180.0 * 1048576.0).cast("long")
    )
    d = d.withColumn("z", F.expr(_Z20).cast("long"))
    return d.select("user_id", "lat", "lon", F.expr(_GEOHASH8).alias("geohash8"))
