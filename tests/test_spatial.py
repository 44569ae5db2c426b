"""Spatial grid-join contract tests.

The radius join's correctness rests on a geometry claim — every pair within
R km lands in the 3x3 cell neighborhood — proven here by exhaustive
comparison against the quadratic scan (the same check SCALE §45 runs at
sf0.1; the oracle parity tests additionally pin values at two SFs).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from server2_vector_search_server_spark.plans.spatial_queries import (
    _RADIUS_KM,
    _candidate_pairs,
    _haversine,
    _spark_coords,
)
from tests.conftest import SF_SMOKE


def _points(spark):
    cust = _spark_coords(
        spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
        .select("c_custkey"),
        F.concat(F.col("c_custkey").cast("string"), F.lit("c")),
        "lat", "lon")
    supp = _spark_coords(
        spark.read.parquet(f"{SF_SMOKE}/supplier.parquet")
        .select("s_suppkey"),
        F.concat(F.col("s_suppkey").cast("string"), F.lit("s")),
        "lat", "lon")
    return cust, supp.withColumnRenamed("lat", "s_lat") \
        .withColumnRenamed("lon", "s_lon")


def test_grid_join_finds_exactly_the_quadratic_pairs(spark):
    cust, supp = _points(spark)
    dist = F.expr(_haversine("s_lat", "s_lon", "lat", "lon"))
    quad = (cust.crossJoin(supp).withColumn("d", dist)
            .filter(F.round("d", 9) < _RADIUS_KM)
            .select("c_custkey", "s_suppkey"))
    grid = _candidate_pairs(spark, SF_SMOKE).select("c_custkey", "s_suppkey")
    assert quad.exceptAll(grid).count() == 0      # no false negatives
    assert grid.exceptAll(quad).count() == 0      # verify filtered all FPs
    assert grid.count() > 0                        # non-vacuous


def test_coordinates_stay_inside_lossless_domain(spark):
    # the 3x3 neighborhood proof requires |lat| <= 50 (min cell width
    # 71.47 km > 70 km radius) — the generator must respect the domain
    cust, supp = _points(spark)
    bad = (cust.filter((F.col("lat") < 30) | (F.col("lat") >= 50)
                       | (F.col("lon") < -10) | (F.col("lon") >= 30))
           .count())
    bad += (supp.filter((F.col("s_lat") < 30) | (F.col("s_lat") >= 50))
            .count())
    assert bad == 0
