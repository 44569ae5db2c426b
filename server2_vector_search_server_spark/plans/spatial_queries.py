"""Geospatial query surface: grid-bucketed radius joins and nearest-neighbor
assignment over synthetic-but-deterministic coordinates.

The reference engine has no spatial operators (its nearest-neighbor surface
is the embedding-space kNN, vector_store.py:139-214); a training-data /
analytics platform at 100 TB needs the geo twins of those shapes — "which
points fall within R of each site" and "which site is nearest to each
point" — and the scalable form of both is the SAME pattern the engine's
banded-LSH dedup uses: bucket both sides into grid cells sized so every
true match lands in the 3x3 cell neighborhood, equi-join on the cell key,
then verify with the exact distance. Shuffle is row-proportional on a
bounded key; the quadratic cross-join only ever appears in the DuckDB
oracle at test scale.

Coordinates are derived from md5 of the row key (the registry's portable
hash arithmetic, operators/text_analysis.md5_bucket pattern) and are EXACT
doubles by construction: lat = lo + (span * u16) / 65536 where u16 is a
16-bit integer — the quotient's denominator is a power of two, so Spark and
DuckDB compute bit-identical values with no rounding step. The haversine
formula is shared as ONE SQL string (sin/cos/asin/sqrt/radians parse in
both dialects), so op order is identical by construction; threshold
comparisons go through round(.,9) to kill last-ulp libm seams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from server2_vector_search_server_spark.plans.registry import (
    exact_sum,
    query,
    sql_exact_sum,
    tbl,
)

_EARTH_KM = 6371.0
_RADIUS_KM = 70.0          # must stay below the min cell width, see below
_CELL_DEG = 1.0
# Domain: lat in [30, 50), lon in [-10, 30). At |lat| <= 50 a 1-degree lon
# cell is >= 111.195 * cos(50 deg) = 71.47 km wide and a lat cell is
# 111.195 km tall, so any pair within 70 km differs by < 1 cell index in
# each axis and the 3x3 neighborhood join is lossless (no false negatives).
_LAT_LO, _LAT_SPAN = 30.0, 20.0
_LON_LO, _LON_SPAN = -10.0, 40.0


def _sql_u16(key_sql: str, offset: int) -> str:
    """DuckDB: hex digits [offset, offset+3] of md5(key) as a 0..65535 int
    (digit-wise strpos arithmetic — the registry's portable-hash rule;
    DuckDB has no conv())."""
    digits = []
    for i in range(4):
        digits.append(
            f"(strpos('0123456789abcdef', "
            f"substr(md5({key_sql}), {offset + i}, 1)) - 1) "
            f"* {16 ** (3 - i)}")
    return "(" + " + ".join(digits) + ")"


def _sql_coords(key_sql: str, lat_alias: str, lon_alias: str) -> str:
    """lat/lon projection: exact doubles (power-of-two denominator)."""
    return (f"{_LAT_LO} + ({_LAT_SPAN} * {_sql_u16(key_sql, 1)}) / 65536.0 "
            f"AS {lat_alias}, "
            f"{_LON_LO} + ({_LON_SPAN} * {_sql_u16(key_sql, 5)}) / 65536.0 "
            f"AS {lon_alias}")


def _spark_coords(df: DataFrame, key, lat: str, lon: str) -> DataFrame:
    h = F.md5(key)
    ulat = F.conv(F.substring(h, 1, 4), 16, 10).cast("double")
    ulon = F.conv(F.substring(h, 5, 4), 16, 10).cast("double")
    return (df
            .withColumn(lat, F.lit(_LAT_LO)
                        + (F.lit(_LAT_SPAN) * ulat) / F.lit(65536.0))
            .withColumn(lon, F.lit(_LON_LO)
                        + (F.lit(_LON_SPAN) * ulon) / F.lit(65536.0)))


# ONE haversine text, parsed by both engines -> identical op order.
def _haversine(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    return (f"2.0 * {_EARTH_KM} * asin(sqrt("
            f"sin(radians(({lat2} - {lat1})) / 2.0) "
            f"* sin(radians(({lat2} - {lat1})) / 2.0) "
            f"+ cos(radians({lat1})) * cos(radians({lat2})) "
            f"* sin(radians(({lon2} - {lon1})) / 2.0) "
            f"* sin(radians(({lon2} - {lon1})) / 2.0)))")


_CUST_KEY_SQL = "CAST(c_custkey AS VARCHAR) || 'c'"
_SUPP_KEY_SQL = "CAST(s_suppkey AS VARCHAR) || 's'"
_SQL_CUST_PTS = (f"SELECT c_custkey, "
                 f"{_sql_coords(_CUST_KEY_SQL, 'lat', 'lon')} "
                 f"FROM customer")
_SQL_SUPP_PTS = (f"SELECT s_suppkey, "
                 f"{_sql_coords(_SUPP_KEY_SQL, 'lat', 'lon')} "
                 f"FROM supplier")
_SQL_DIST = _haversine("s.lat", "s.lon", "c.lat", "c.lon")


def _candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-bucketed (customer, supplier) candidates with exact distance —
    shared by both spatial queries.

    Scale shape: points get a 1-degree cell key; the site side (small here
    -> broadcast; cell-key equi-join with an exchange when both sides are
    large) is expanded to its 3x3 neighborhood so the join on (glat, glon)
    finds every pair within the radius. Work is candidates-proportional
    (cell occupancy x 9), never |A| x |B|; a skewed cell is an AQE skew
    split, not a plan change. The exact haversine verify runs only on
    candidates — the LSH band-join / verify split the dedup family uses."""
    cust = _spark_coords(
        tbl(spark, sf_dir, "customer").select("c_custkey"),
        F.concat(F.col("c_custkey").cast("string"), F.lit("c")),
        "lat", "lon")
    supp = _spark_coords(
        tbl(spark, sf_dir, "supplier").select("s_suppkey"),
        F.concat(F.col("s_suppkey").cast("string"), F.lit("s")),
        "lat", "lon")
    cust = (cust.withColumn("glat", F.floor(F.col("lat") / _CELL_DEG))
            .withColumn("glon", F.floor(F.col("lon") / _CELL_DEG)))
    supp9 = (supp
             .withColumnRenamed("lat", "s_lat")
             .withColumnRenamed("lon", "s_lon")
             .withColumn("glat", F.explode(F.sequence(
                 F.floor(F.col("s_lat") / _CELL_DEG) - 1,
                 F.floor(F.col("s_lat") / _CELL_DEG) + 1)))
             .withColumn("glon", F.explode(F.sequence(
                 F.floor(F.col("s_lon") / _CELL_DEG) - 1,
                 F.floor(F.col("s_lon") / _CELL_DEG) + 1))))
    dist = F.expr(_haversine("s_lat", "s_lon", "lat", "lon"))
    return (cust.join(F.broadcast(supp9), ["glat", "glon"])
            .withColumn("dist_km", dist)
            .filter(F.round("dist_km", 9) < _RADIUS_KM))


@query(
    "geo_radius_supplier_coverage",
    survey="spatial extension(radius join: customers within 70 km of each "
           "supplier site via 1-degree grid-cell bucketing + 3x3 neighbor "
           "equi-join + exact haversine verify — the banded-LSH "
           "candidate/verify shape applied to geography)",
    oracle=f"""
    WITH c AS ({_SQL_CUST_PTS}), s AS ({_SQL_SUPP_PTS}),
    pairs AS (
      SELECT s.s_suppkey,
             CAST(ROUND(ROUND({_SQL_DIST}, 9) * 1000000) AS BIGINT)
               AS dist_micro
      FROM c, s
      WHERE ROUND({_SQL_DIST}, 9) < {_RADIUS_KM})
    SELECT s_suppkey, COUNT(*) AS n_customers,
           ROUND(SUM(dist_micro) / 1000000.0, 6) AS sum_dist_km
    FROM pairs GROUP BY s_suppkey
    ORDER BY n_customers DESC, s_suppkey
    """,
)
def geo_radius_supplier_coverage(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Per-site radius coverage: how many customers sit within 70 km of
    each supplier, plus the exact summed distance (integer micro-units so
    the fold is shuffle-order independent). The oracle is the quadratic
    cross-join ground truth — proving the grid join drops no pair."""
    cand = _candidate_pairs(spark, sf_dir)
    return (cand
            .select("s_suppkey",
                    F.round(F.round("dist_km", 9) * 1_000_000)
                    .cast("long").alias("dist_micro"))
            .groupBy("s_suppkey")
            .agg(F.count(F.lit(1)).alias("n_customers"),
                 F.round(F.sum("dist_micro") / 1_000_000.0, 6)
                 .alias("sum_dist_km"))
            .orderBy(F.col("n_customers").desc(), "s_suppkey"))


@query(
    "geo_nearest_supplier",
    survey="spatial extension(nearest-site assignment: argmin-by-distance "
           "per customer over grid-cell candidates, deterministic "
           "micro-unit + key tie-break; geography's top-1 kNN)",
    oracle=f"""
    WITH c AS ({_SQL_CUST_PTS}), s AS ({_SQL_SUPP_PTS}),
    pairs AS (
      SELECT c.c_custkey, s.s_suppkey,
             CAST(ROUND(ROUND({_SQL_DIST}, 9) * 1000000) AS BIGINT)
               AS dist_micro
      FROM c, s
      WHERE ROUND({_SQL_DIST}, 9) < {_RADIUS_KM}),
    ranked AS (
      SELECT c_custkey, s_suppkey, dist_micro,
             row_number() OVER (PARTITION BY c_custkey
                                ORDER BY dist_micro, s_suppkey) AS rn
      FROM pairs)
    SELECT c_custkey, s_suppkey AS nearest_suppkey,
           ROUND(dist_micro / 1000000.0, 6) AS dist_km
    FROM ranked WHERE rn = 1
    ORDER BY c_custkey
    """,
)
def geo_nearest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-site assignment (the geo twin of the engine's top-1 kNN):
    for every customer with a supplier inside the 70 km search ring, the
    closest one. The argmin folds as min(struct(dist_micro, key)) — a
    partial-aggregable reduction, cheaper than a row_number window because
    it combines map-side and never materializes the loser rows."""
    cand = _candidate_pairs(spark, sf_dir)
    best = (cand
            .select("c_custkey",
                    F.struct(
                        F.round(F.round("dist_km", 9) * 1_000_000)
                        .cast("long").alias("dist_micro"),
                        F.col("s_suppkey").alias("sk")).alias("cand"))
            .groupBy("c_custkey").agg(F.min("cand").alias("best")))
    return (best.select(
        "c_custkey",
        F.col("best.sk").alias("nearest_suppkey"),
        F.round(F.col("best.dist_micro") / 1_000_000.0, 6).alias("dist_km"))
        .orderBy("c_custkey"))


# ---------------------------------------------------------------------------
# Geohash encoding + hierarchical prefix rollup

_GH_BITS_PER_AXIS = 10          # 20-bit code -> 4 base-32 characters
_GH_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _sql_geohash4(lat: str, lon: str) -> str:
    """4-char geohash (PUBLIC algorithm, Niemeyer 2008): quantize each
    axis to 10 bits, interleave starting with LONGITUDE, base-32 encode.
    Pure integer/arithmetic SQL that parses in both engines; validated
    against the canonical test vector (57.64911, 10.40744) -> 'u4pr'."""
    latq = f"CAST(FLOOR(({lat} + 90.0) / 180.0 * 1024.0) AS BIGINT)"
    lonq = f"CAST(FLOOR(({lon} + 180.0) / 360.0 * 1024.0) AS BIGINT)"
    terms = []
    for b in range(_GH_BITS_PER_AXIS):
        terms.append(f"(({lonq} // {1 << (9 - b)}) % 2) * {1 << (19 - 2 * b)}")
        terms.append(f"(({latq} // {1 << (9 - b)}) % 2) * {1 << (18 - 2 * b)}")
    code = "(" + " + ".join(terms) + ")"
    chars = [f"substr('{_GH_B32}', CAST(({code} // {1 << (15 - 5 * i)}) % 32 "
             f"AS INTEGER) + 1, 1)" for i in range(4)]
    return " || ".join(chars)


def _spark_geohash4(lat: str, lon: str):
    # Spark has no // operator: translate to floor-div via CAST after /,
    # keeping the quantizer text identical (FLOOR then integer ops).
    latq = f"CAST(FLOOR(({lat} + 90.0) / 180.0 * 1024.0) AS BIGINT)"
    lonq = f"CAST(FLOOR(({lon} + 180.0) / 360.0 * 1024.0) AS BIGINT)"
    terms = []
    for b in range(_GH_BITS_PER_AXIS):
        terms.append(f"(CAST({lonq} / {1 << (9 - b)} AS BIGINT) % 2) "
                     f"* {1 << (19 - 2 * b)}")
        terms.append(f"(CAST({latq} / {1 << (9 - b)} AS BIGINT) % 2) "
                     f"* {1 << (18 - 2 * b)}")
    code = "(" + " + ".join(terms) + ")"
    chars = [f"substr('{_GH_B32}', CAST({code} / {1 << (15 - 5 * i)} "
             f"AS INT) % 32 + 1, 1)" for i in range(4)]
    return F.expr(" || ".join(chars))


@query(
    "geo_geohash_rollup",
    survey="spatial extension(geohash encoding + hierarchical prefix "
           "rollup: 20-bit interleaved quantization to base-32 cells, "
           "counts at 4-char cells with 3-char parent totals — the "
           "multi-resolution spatial index key)",
    oracle=f"""
    WITH c AS ({_SQL_CUST_PTS}),
    cells AS (
      SELECT {_sql_geohash4('lat', 'lon')} AS gh4 FROM c),
    g4 AS (
      SELECT gh4, CAST(COUNT(*) AS BIGINT) AS n_customers
      FROM cells GROUP BY gh4)
    SELECT substr(gh4, 1, 3) AS gh3, gh4, n_customers,
           CAST(SUM(n_customers) OVER (PARTITION BY substr(gh4, 1, 3))
                AS BIGINT) AS n_in_parent
    FROM g4 ORDER BY gh3, gh4
    """,
)
def geo_geohash_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash-keyed spatial rollup: every customer point encodes to a
    4-char geohash (integer bit-interleave — no UDF, pure column
    arithmetic identical on both engines), counts aggregate per cell, and
    each cell carries its 3-char parent total — the prefix property that
    makes geohash THE layout key for spatial data at scale: coarser cells
    are substrings, so a prefix range scan IS the spatial filter, and the
    hierarchy needs no second aggregation pass (a window over the cell
    table, bounded by distinct cells, not points)."""
    cust = _spark_coords(
        tbl(spark, sf_dir, "customer").select("c_custkey"),
        F.concat(F.col("c_custkey").cast("string"), F.lit("c")),
        "lat", "lon")
    from pyspark.sql import Window
    g4 = (cust.select(_spark_geohash4("lat", "lon").alias("gh4"))
          .groupBy("gh4").agg(F.count(F.lit(1)).cast("long")
                              .alias("n_customers")))
    w = Window.partitionBy(F.substring("gh4", 1, 3))
    return (g4.select(F.substring("gh4", 1, 3).alias("gh3"), "gh4",
                      "n_customers",
                      F.sum("n_customers").over(w).cast("long")
                      .alias("n_in_parent"))
            .orderBy("gh3", "gh4"))


# ---------------------------------------------------------------------------
# Self-join proximity pairs (both sides large — the exchange path)

@query(
    "geo_customer_pairs_within_radius",
    survey="spatial extension(self-join proximity: customer pairs within "
           "70 km via cell-keyed equi-join with one-sided 3x3 expansion "
           "and a < b dedup — the BIG-BIG regime where neither side "
           "broadcasts and the cell key carries the exchange)",
    oracle=f"""
    WITH c AS ({_SQL_CUST_PTS}),
    pairs AS (
      SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
             CAST(ROUND(ROUND(
               {_haversine('a.lat', 'a.lon', 'b.lat', 'b.lon')}, 9)
               * 1000000) AS BIGINT) AS dist_micro
      FROM c a JOIN c b ON a.c_custkey < b.c_custkey
      WHERE ROUND({_haversine('a.lat', 'a.lon', 'b.lat', 'b.lon')}, 9)
            < {_RADIUS_KM})
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(SUM(dist_micro) / 1000000.0, 6) AS sum_dist_km,
           ROUND(MIN(dist_micro) / 1000000.0, 6) AS min_dist_km
    FROM pairs
    """,
)
def geo_customer_pairs_within_radius(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """Proximity self-join over ONE large point set — the regime where
    the radius join cannot broadcast either side: every point gets its
    exact cell key, ONE side expands to the 3x3 neighborhood, and the
    equi-join on (glat, glon) carries a data-proportional exchange
    (candidates = cell co-occupancy x 9, the same lossless-blocking
    geometry the supplier join proves against its quadratic oracle).
    a < b on the key dedups the symmetric pair and drops self-pairs.

    Scale shape: two shuffles keyed by cell (hash-partitioned — a dense
    city cell is an AQE skew split); the quadratic form exists only in
    the oracle."""
    cust = _spark_coords(
        tbl(spark, sf_dir, "customer").select("c_custkey"),
        F.concat(F.col("c_custkey").cast("string"), F.lit("c")),
        "lat", "lon")
    a = (cust.withColumn("glat", F.floor(F.col("lat") / _CELL_DEG))
         .withColumn("glon", F.floor(F.col("lon") / _CELL_DEG)))
    b = (cust.select(F.col("c_custkey").alias("b_key"),
                     F.col("lat").alias("b_lat"),
                     F.col("lon").alias("b_lon"))
         .withColumn("glat", F.explode(F.sequence(
             F.floor(F.col("b_lat") / _CELL_DEG) - 1,
             F.floor(F.col("b_lat") / _CELL_DEG) + 1)))
         .withColumn("glon", F.explode(F.sequence(
             F.floor(F.col("b_lon") / _CELL_DEG) - 1,
             F.floor(F.col("b_lon") / _CELL_DEG) + 1))))
    dist = F.expr(_haversine("lat", "lon", "b_lat", "b_lon"))
    pairs = (a.join(b, ["glat", "glon"])
             .filter(F.col("c_custkey") < F.col("b_key"))
             .withColumn("dist_km", dist)
             .filter(F.round("dist_km", 9) < _RADIUS_KM)
             .select(F.round(F.round("dist_km", 9) * 1_000_000)
                     .cast("long").alias("dist_micro")))
    return pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(F.sum("dist_micro") / 1_000_000.0, 6).alias("sum_dist_km"),
        F.round(F.min("dist_micro") / 1_000_000.0, 6).alias("min_dist_km"))


# ---------------------------------------------------------------------------
# Raptor-style zonal statistics: raster x vector without rasterizing zones
# per pixel (PAPERS.md: "Raptor: Large Scale Analysis of Big Raster and
# Vector Data", VLDB 2019 — its core idea is to turn the raster-polygon
# intersection into scanline/tile-local work instead of a per-(pixel, zone)
# cross test; the Spark-first analog below expands each ZONE into the
# bounded set of 1-degree tiles it overlaps and equi-joins tiles, so the
# exact containment test only ever runs on tile-local candidates).

_ZS_ROWS, _ZS_COLS = 256, 512          # raster grid (power-of-two pitch)
_ZS_PITCH_LAT = _LAT_SPAN / _ZS_ROWS   # 0.078125  — exact binary fraction
_ZS_PITCH_LON = _LON_SPAN / _ZS_COLS   # 0.078125  — exact binary fraction
_ZS_ZONES = 20                         # suppliers 0..19 become zones


@query(
    "geo_zonal_raster_stats",
    survey="spatial extension(Raptor-style zonal statistics: a 256x512 "
           "deterministic raster aggregated per vector zone via "
           "zone->tile expansion + tile equi-join — the exact "
           "point-in-rect test runs only on tile-local candidates, "
           "never pixels x zones)",
    oracle=f"""
    WITH cells AS (
      SELECT CAST(i // {_ZS_COLS} AS BIGINT) AS ri,
             CAST(i % {_ZS_COLS} AS BIGINT) AS cj,
             {_LAT_LO} + (2 * (i // {_ZS_COLS}) + 1)
               * {_ZS_PITCH_LAT / 2!r} AS cell_lat,
             {_LON_LO} + (2 * (i % {_ZS_COLS}) + 1)
               * {_ZS_PITCH_LON / 2!r} AS cell_lon
      FROM range({_ZS_ROWS * _ZS_COLS}) t(i)),
    vals AS (
      SELECT ri, cj, cell_lat, cell_lon,
             CAST((ri * 31 + cj * 17) % 1024 AS BIGINT) AS v
      FROM cells),
    zones AS (
      SELECT s_suppkey AS zone_id,
             {_sql_coords(_SUPP_KEY_SQL, 'zlat', 'zlon')},
             0.5 + 0.25 * (s_suppkey % 4) AS half_lat,
             1.0 + 0.5 * (s_suppkey % 3) AS half_lon
      FROM supplier WHERE s_suppkey < {_ZS_ZONES})
    SELECT z.zone_id,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(SUM(c.v) AS BIGINT) AS sum_v,
           ROUND(CAST(SUM(c.v) AS DOUBLE) / COUNT(*), 6) AS mean_v
    FROM zones z JOIN vals c
      ON abs(c.cell_lat - z.zlat) <= z.half_lat
     AND abs(c.cell_lon - z.zlon) <= z.half_lon
    GROUP BY z.zone_id
    ORDER BY z.zone_id
    """,
)
def geo_zonal_raster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zonal statistics of a deterministic raster over vector zones.

    Raster: 256x512 cells over the module's lat/lon domain; cell centers
    are exact doubles (odd-integer x power-of-two pitch), values are the
    integer fold ``(ri*31 + cj*17) % 1024`` — both engines reproduce the
    grid from nothing but integers, so the aggregate is hash-exact with
    no rounding seam (the one ROUND is display-only on identical
    operands). Zones: axis-aligned rectangles centered on the supplier
    md5-lattice points with key-derived half-extents (exact binary
    fractions).

    The scalable shape (Raptor's point, re-expressed in DataFrame algebra):
    each zone explodes into the 1-degree tiles its rectangle overlaps
    (bounded by zone area / tile area — never corpus-sized), each cell
    carries its tile id from plain floor arithmetic, and the join is an
    EQUI-join on the tile key; the exact containment predicate then
    filters tile-local candidates only. At 100 TB of raster the same
    plan holds: tiles are the shuffle key, pixels never pair with
    non-overlapping zones, and a CartesianProduct appears nowhere
    (the oracle keeps the quadratic form — 20 zones x 131k cells is
    test-scale only)."""
    cells = (spark.range(_ZS_ROWS * _ZS_COLS)
             .select((F.col("id") / _ZS_COLS).cast("long").alias("ri"),
                     (F.col("id") % _ZS_COLS).cast("long").alias("cj"))
             .withColumn("cell_lat",
                         F.lit(_LAT_LO) + (2 * F.col("ri") + 1)
                         * F.lit(_ZS_PITCH_LAT / 2))
             .withColumn("cell_lon",
                         F.lit(_LON_LO) + (2 * F.col("cj") + 1)
                         * F.lit(_ZS_PITCH_LON / 2))
             .withColumn("v", ((F.col("ri") * 31 + F.col("cj") * 17)
                               % 1024).cast("long"))
             .withColumn("tlat", F.floor("cell_lat"))
             .withColumn("tlon", F.floor("cell_lon")))
    supp = (tbl(spark, sf_dir, "supplier")
            .filter(F.col("s_suppkey") < _ZS_ZONES)
            .select(F.col("s_suppkey").alias("zone_id"),
                    F.concat(F.col("s_suppkey").cast("string"),
                             F.lit("s")).alias("_k")))
    zones = (_spark_coords(supp, F.col("_k"), "zlat", "zlon")
             .withColumn("half_lat",
                         F.lit(0.5) + F.lit(0.25) * (F.col("zone_id") % 4))
             .withColumn("half_lon",
                         F.lit(1.0) + F.lit(0.5) * (F.col("zone_id") % 3))
             .drop("_k"))
    ztiles = (zones
              .withColumn("tlat", F.explode(F.sequence(
                  F.floor(F.col("zlat") - F.col("half_lat")),
                  F.floor(F.col("zlat") + F.col("half_lat")))))
              .withColumn("tlon", F.explode(F.sequence(
                  F.floor(F.col("zlon") - F.col("half_lon")),
                  F.floor(F.col("zlon") + F.col("half_lon"))))))
    hit = (ztiles.join(cells, ["tlat", "tlon"])
           .filter((F.abs(F.col("cell_lat") - F.col("zlat"))
                    <= F.col("half_lat"))
                   & (F.abs(F.col("cell_lon") - F.col("zlon"))
                      <= F.col("half_lon"))))
    return (hit.groupBy("zone_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_cells"),
                 F.sum("v").cast("long").alias("sum_v"),
                 F.round(F.sum("v").cast("double")
                         / F.count(F.lit(1)), 6).alias("mean_v"))
            .orderBy("zone_id"))


# ---------------------------------------------------------------------------
# REPOSE-style trajectory similarity search (PAPERS.md: "REPOSE:
# Distributed Top-k Trajectory Similarity Search with Local Reference
# Point Tries", ICDE 2021 — its core idea is reference-point pruning:
# candidates come from trajectories sharing spatial reference cells, and
# the expensive exact trajectory distance runs only on those).

_TJ_USERS = 60      # bounded user slice (exists from sf0.001 up)
_TJ_QID = 7         # query user
_TJ_LEN = 24        # per-trajectory point cap (first 24 by event time)
_TJ_TOPK = 5

_TJ_PT_KEY = "'e' || CAST(event_id AS VARCHAR)"


def _tj_dist2(x: str, y: str) -> str:
    """Squared planar distance in degree units — one text, both engines,
    multiplication (not pow) so op order is pinned."""
    return (f"({x}.lat - {y}.lat) * ({x}.lat - {y}.lat) "
            f"+ ({x}.lon - {y}.lon) * ({x}.lon - {y}.lon)")


@query(
    "geo_trajectory_hausdorff_topk",
    survey="spatial extension(REPOSE-style top-k trajectory similarity: "
           "per-user event trajectories on the md5 lattice, candidates "
           "from shared 1-degree reference cells, exact symmetric "
           "Hausdorff distance only on cell-local candidates — never "
           "all trajectory pairs)",
    oracle=f"""
    WITH pts AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
             {_sql_coords(_TJ_PT_KEY, 'lat', 'lon')}
      FROM events WHERE user_id < {_TJ_USERS}),
    traj AS (
      SELECT user_id,
             list_slice(
               list(struct_pack(lat := lat, lon := lon)
                    ORDER BY ts, event_id), 1, {_TJ_LEN}) AS tr
      FROM pts GROUP BY user_id),
    cells AS (
      SELECT DISTINCT t.user_id,
             FLOOR(p.lat) AS tlat, FLOOR(p.lon) AS tlon
      FROM traj t, UNNEST(t.tr) AS u(p)),
    qcells AS (SELECT tlat, tlon FROM cells WHERE user_id = {_TJ_QID}),
    cand AS (
      SELECT DISTINCT c.user_id FROM cells c
      JOIN qcells q ON c.tlat = q.tlat AND c.tlon = q.tlon
      WHERE c.user_id <> {_TJ_QID}),
    q AS (SELECT tr AS qtr FROM traj WHERE user_id = {_TJ_QID}),
    scored AS (
      SELECT t.user_id, len(t.tr) AS n_points,
             GREATEST(
               list_max(list_transform(t.tr, x ->
                 list_min(list_transform(q.qtr, y ->
                   {_tj_dist2('x', 'y')})))),
               list_max(list_transform(q.qtr, x ->
                 list_min(list_transform(t.tr, y ->
                   {_tj_dist2('x', 'y')}))))) AS h2
      FROM traj t JOIN cand USING (user_id) CROSS JOIN q)
    SELECT user_id, CAST(n_points AS INTEGER) AS n_points,
           CAST(ROUND(ROUND(h2, 9) * 1000000) AS BIGINT) AS hausdorff2_micro
    FROM scored
    ORDER BY hausdorff2_micro ASC, user_id ASC LIMIT {_TJ_TOPK}
    """,
)
def geo_trajectory_hausdorff_topk(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Top-k most-similar trajectories to a query user's trajectory.

    Trajectories: each user's first 24 events (_TJ_LEN) ordered by (ts,
    event_id), each event projected to the module's exact md5 lattice —
    both engines rebuild identical point lists from integers. Similarity:
    symmetric Hausdorff on squared planar distance (max over one
    trajectory of the min distance to the other, both directions) —
    computed entirely with nested array higher-order functions over the
    two bounded point arrays, no explode of the pair space.

    The scalable shape is REPOSE's: candidate trajectories must share a
    1-degree REFERENCE CELL with the query (an equi-join on the cell
    key over the exploded-once cell sets), so the exact O(len²) distance
    runs only on cell-local candidates — trajectory count never pairs
    quadratically. The pruning is part of the checked contract (the
    oracle replicates it verbatim, the df-cap convention), and cells
    derive from the TRUNCATED trajectory on both sides so candidate sets
    cannot drift. At 100 TB: cells are the shuffle key, per-cell
    candidate lists are bounded by locality, and the per-pair work is a
    constant-bounded array fold inside codegen."""
    ev = (tbl(spark, sf_dir, "events")
          .filter(F.col("user_id") < _TJ_USERS)
          .select("user_id", "ts", "event_id"))
    pts = _spark_coords(
        ev.withColumn("_k", F.concat(F.lit("e"),
                                     F.col("event_id").cast("string"))),
        F.col("_k"), "lat", "lon")
    traj = (pts.groupBy("user_id")
            .agg(F.slice(F.array_sort(F.collect_list(
                F.struct("ts", "event_id", "lat", "lon"))),
                1, _TJ_LEN).alias("_tr"))
            .select("user_id",
                    F.transform("_tr", lambda s: F.struct(
                        s.lat.alias("lat"), s.lon.alias("lon")))
                    .alias("tr")))
    cells = (traj.select("user_id", F.explode("tr").alias("p"))
             .select("user_id", F.floor(F.col("p.lat")).alias("tlat"),
                     F.floor(F.col("p.lon")).alias("tlon"))
             .distinct())
    qcells = (cells.filter(F.col("user_id") == _TJ_QID)
              .select("tlat", "tlon"))
    cand = (cells.filter(F.col("user_id") != _TJ_QID)
            .join(F.broadcast(qcells), ["tlat", "tlon"])
            .select("user_id").distinct())
    qtr = (traj.filter(F.col("user_id") == _TJ_QID)
           .select(F.col("tr").alias("qtr")))

    def directed(a, b):
        return F.array_max(F.transform(a, lambda x: F.array_min(
            F.transform(b, lambda y:
                        (x.lat - y.lat) * (x.lat - y.lat)
                        + (x.lon - y.lon) * (x.lon - y.lon)))))

    scored = (traj.join(cand, "user_id")
              .crossJoin(F.broadcast(qtr))     # 1-row query side
              .withColumn("h2", F.greatest(
                  directed(F.col("tr"), F.col("qtr")),
                  directed(F.col("qtr"), F.col("tr")))))
    return (scored.select(
                "user_id",
                F.size("tr").cast("int").alias("n_points"),
                F.round(F.round("h2", 9) * 1_000_000)
                .cast("long").alias("hausdorff2_micro"))
            .orderBy(F.col("hausdorff2_micro").asc(),
                     F.col("user_id").asc())
            .limit(_TJ_TOPK))


# ---------------------------------------------------------------------------
# point-in-polygon containment join (exact integer ray casting)

_PIP_POLYGONS: "dict[int, list[tuple[int, int]]]" = {
    # convex triangle
    1: [(5000, 5000), (30000, 8000), (12000, 30000)],
    # NON-convex L-shape — exercises the multi-crossing ray case
    2: [(35000, 35000), (60000, 35000), (60000, 45000),
        (45000, 45000), (45000, 60000), (35000, 60000)],
    # skewed quad
    3: [(10000, 40000), (25000, 38000), (28000, 58000), (8000, 55000)],
}


def _pip_edges() -> "list[tuple[int, int, int, int, int]]":
    rows = []
    for pid, verts in _PIP_POLYGONS.items():
        for a, b in zip(verts, verts[1:] + verts[:1]):
            rows.append((pid, a[0], a[1], b[0], b[1]))
    return rows


_PIP_EDGE_VALUES = ", ".join(f"({p}, {x1}, {y1}, {x2}, {y2})"
                             for p, x1, y1, x2, y2 in _pip_edges())

# ONE crossing predicate text parsed by both engines: the upward ray from
# (px,py) crosses edge (x1,y1)-(x2,y2) iff the edge straddles py and the
# point lies strictly left of the edge's x at py — cleared of division by
# cross-multiplying with a sign flip when the edge points downward.
_PIP_CROSSING = (
    "((y1 > py) != (y2 > py)) AND ("
    "  (y2 > y1 AND (py - y1) * (x2 - x1) - (px - x1) * (y2 - y1) > 0)"
    "  OR "
    "  (y2 < y1 AND (py - y1) * (x2 - x1) - (px - x1) * (y2 - y1) < 0))")


@query(
    "geo_point_in_polygon_join",
    survey="geospatial extension(point-in-polygon containment join by "
           "exact integer ray casting — odd crossing parity per "
           "(point, polygon), non-convex shapes included; the zone/"
           "geofence assignment primitive next to the radius join)",
    oracle=f"""
    WITH pts AS (
        SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS bal,
               CAST({_sql_u16(_CUST_KEY_SQL, 1)} AS BIGINT) AS px,
               CAST({_sql_u16(_CUST_KEY_SQL, 5)} AS BIGINT) AS py
        FROM customer),
    edges AS (
        SELECT * FROM (VALUES {_PIP_EDGE_VALUES})
            AS t(poly_id, x1, y1, x2, y2)),
    crossings AS (
        SELECT p.c_custkey, p.bal, e.poly_id,
               SUM(CASE WHEN {_PIP_CROSSING} THEN 1 ELSE 0 END)
                   AS n_cross
        FROM pts p CROSS JOIN edges e
        GROUP BY p.c_custkey, p.bal, e.poly_id)
    SELECT CAST(poly_id AS BIGINT) AS poly_id,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           {sql_exact_sum('bal', 2)} AS total_acctbal
    FROM crossings WHERE n_cross % 2 = 1
    GROUP BY poly_id ORDER BY poly_id
    """,
)
def geo_point_in_polygon_join(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Assign customers (hash-projected onto the 0..65535 integer grid)
    to literal polygon zones by ray casting: count edges an upward ray
    crosses, odd parity ⇒ inside.  The crossing test is EXACT — the
    division in 'x of the edge at height py' is cleared by
    cross-multiplying (sign-flipped for downward edges), so every
    comparison is on BIGINTs (|product| ≤ 65535² ≈ 4.3e9) and both
    engines agree even for points arbitrarily close to an edge.  The
    L-shaped zone pins the non-convex multi-crossing case the bbox-only
    shortcut would get wrong.  Scale: the edge table is O(polygons) and
    broadcasts; work is points × edges with map-side crossing partial
    aggregation — linear in points.  At large polygon counts the same
    plan runs behind a grid-cell candidate join (the §45 radius-join
    valve): bucket polygon bboxes and points to cells first, ray-cast
    only co-located pairs."""
    pts = _spark_u16_points(
        tbl(spark, sf_dir, "customer"), F.concat(
            F.col("c_custkey").cast("string"), F.lit("c")))
    edges = spark.createDataFrame(
        _pip_edges(), "poly_id int, x1 int, y1 int, x2 int, y2 int")
    crossing = F.expr(_PIP_CROSSING)
    crossings = (pts.crossJoin(F.broadcast(edges))
                 .groupBy("c_custkey", "bal", "poly_id")
                 .agg(F.sum(F.when(crossing, 1).otherwise(0))
                      .alias("n_cross")))
    return (crossings.filter(F.col("n_cross") % 2 == 1)
            .groupBy(F.col("poly_id").cast("long").alias("poly_id"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_customers"),
                 exact_sum(F.col("bal"), 2).alias("total_acctbal"))
            .orderBy("poly_id"))


def _spark_u16_points(df: DataFrame, key) -> DataFrame:
    """(px, py) as exact BIGINTs on the 0..65535 grid — the integer twin
    of _spark_coords (same md5 hex windows, no float projection)."""
    h = F.md5(key)
    return df.select(
        "c_custkey", F.col("c_acctbal").cast("double").alias("bal"),
        F.conv(F.substring(h, 1, 4), 16, 10).cast("long").alias("px"),
        F.conv(F.substring(h, 5, 4), 16, 10).cast("long").alias("py"))
