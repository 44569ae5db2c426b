"""SCALE.md §54: where graph_pagerank's wall actually goes (VERDICT r5/r6).

The pillar has sat at ~1.2× its r2 baseline for three rounds with the
docstring claiming "round-count is the floor". This experiment proves or
refutes that by decomposing the pillar's wall into its serialized phases,
each timed in isolation on a quiet machine:

  P1  edge build + eager localCheckpoint (lineitem⋈orders, distinct)
  P2  nodes.count() (the driver-side n for the base rank)
  P3  the 3 power-iteration rounds + top-20 (the final action: nested
      broadcast builds serialize — round i's contribs must materialize
      before round i+1's broadcast)
  P4  the same final action with iterations=1 and iterations=5 — the
      marginal cost per round, separating fixed job overhead from
      per-round work

Run:  python scripts/scale54_pagerank_floor.py [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPEATS = 5


def main() -> None:
    from pyspark.sql import functions as F

    from server2_vector_search_server_spark.operators.graph import pagerank
    from server2_vector_search_server_spark.plans.graph_queries import (
        _edges,
        _rank_top20,
    )
    from server2_vector_search_server_spark.session import get_spark

    spark = get_spark("scale54")
    spark.sparkContext.setLogLevel("ERROR")

    # warm
    warm = spark.read.parquet(f"{SF}/region.parquet")
    warm.crossJoin(warm.selectExpr("r_regionkey k")).count()

    def med(fn):
        walls = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            fn()
            walls.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        return round(statistics.median(walls), 3)

    # P1: edge build + checkpoint
    p1 = med(lambda: _edges(spark, SF).localCheckpoint(eager=True))

    # P2: nodes.count on a prebuilt checkpoint
    e0 = _edges(spark, SF).localCheckpoint(eager=True)
    p2 = med(lambda: e0.select(F.col("src").alias("node"))
             .union(e0.select(F.col("dst").alias("node")))
             .distinct().count())

    # P3: full pillar (what bench times)
    def full(iters):
        def run():
            ranks = pagerank(_edges(spark, SF), iterations=iters,
                             damping=0.85, scale=12)
            _rank_top20(ranks).write.format("noop") \
                .mode("overwrite").save()
        return run

    p3 = med(full(3))
    p3_1 = med(full(1))
    p3_5 = med(full(5))
    per_round = (p3_5 - p3_1) / 4.0

    print(f"sf_dir={SF} repeats={REPEATS} (medians, quiet machine)")
    print(f"P1 edge build+checkpoint : {p1}s")
    print(f"P2 nodes distinct+count  : {p2}s")
    print(f"P3 full pillar (3 rounds): {p3}s")
    print(f"   1-round pillar        : {p3_1}s")
    print(f"   5-round pillar        : {p3_5}s")
    print(f"   marginal cost / round : {per_round:.3f}s")
    fixed = p3_1 - per_round
    print(f"   fixed (build+n+rank+top20 at 0 marginal rounds): "
          f"{fixed:.3f}s")
    print(f"decomposition: fixed {fixed:.2f}s + 3 x {per_round:.2f}s "
          f"= {fixed + 3 * per_round:.2f}s vs measured {p3}s")


if __name__ == "__main__":
    main()
