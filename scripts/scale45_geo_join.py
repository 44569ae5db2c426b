"""SCALE §45 — grid-cell spatial join vs the quadratic distance scan.

Measures `geo_radius_supplier_coverage`'s candidate strategy at sf0.1
(15k customers x 1k suppliers = 15M potential pairs):

  * quadratic: crossJoin + haversine filter — the oracle's shape, O(|C|x|S|);
  * grid join: 1-degree cell keys, 3x3 supplier expansion, equi-join +
    exact verify — candidates bounded by cell co-occupancy.

Also reports candidate-row counts (the quantity that actually scales) and
verifies both strategies return identical pair sets.

Run:  python scripts/scale45_geo_join.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from server2_vector_search_server_spark.plans.spatial_queries import (  # noqa: E402
    _RADIUS_KM,
    _candidate_pairs,
    _haversine,
    _spark_coords,
)
from server2_vector_search_server_spark.session import (  # noqa: E402
    get_spark,
    read_table,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def bench(label, df, runs=3):
    best = None
    for _ in range(runs):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"  {label:<46} {best:6.2f} s (best of {runs})")
    return best


def main() -> None:
    spark = get_spark()
    cust = _spark_coords(
        read_table(spark, SF_DIR, "customer").select("c_custkey"),
        F.concat(F.col("c_custkey").cast("string"), F.lit("c")),
        "lat", "lon")
    supp = _spark_coords(
        read_table(spark, SF_DIR, "supplier").select("s_suppkey"),
        F.concat(F.col("s_suppkey").cast("string"), F.lit("s")),
        "lat", "lon").withColumnRenamed("lat", "s_lat") \
        .withColumnRenamed("lon", "s_lon")
    nc, ns = cust.count(), supp.count()
    print(f"points: {nc} customers x {ns} suppliers "
          f"({nc * ns / 1e6:.1f}M potential pairs)")

    dist = F.expr(_haversine("s_lat", "s_lon", "lat", "lon"))
    quad = (cust.crossJoin(supp).withColumn("d", dist)
            .filter(F.round("d", 9) < _RADIUS_KM)
            .select("c_custkey", "s_suppkey"))
    grid = _candidate_pairs(spark, SF_DIR).select("c_custkey", "s_suppkey")

    n_quad = quad.count()
    n_grid = grid.count()
    print(f"matching pairs: quadratic={n_quad} grid={n_grid} "
          f"(equal: {n_quad == n_grid})")
    sym_diff = quad.exceptAll(grid).count() + grid.exceptAll(quad).count()
    print(f"pair-set symmetric difference: {sym_diff}")

    bench("quadratic crossJoin + haversine", quad)
    bench("grid 3x3 equi-join + verify", grid)


if __name__ == "__main__":
    main()
