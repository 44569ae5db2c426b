"""Round-11 A/B #3: graph iterative operators — lazy-checkpoint+count
barrier (one job/round) vs r10 eager-checkpoint+isEmpty/count (two).

Old arms call the r10 ``operators/graph.py`` loaded side-by-side via
importlib from an old checkout (its hot functions are pyspark-only);
new arms are the working-tree registry fns.

Usage: PYTHONPATH=/root/repo OLD_REPO=/tmp/r11_old \
       python scripts/r11_ab3.py [passes]
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OLD_REPO = os.environ.get("OLD_REPO", "/tmp/r11_old")
PASSES = int(sys.argv[1]) if len(sys.argv) > 1 else 7

from pyspark.sql import functions as F  # noqa: E402

from server2_vector_search_server_spark.plans.registry import tbl  # noqa: E402

spec = importlib.util.spec_from_file_location(
    "old_graph", os.path.join(
        OLD_REPO, "server2_vector_search_server_spark/operators/graph.py"))
old_graph = importlib.util.module_from_spec(spec)
spec.loader.exec_module(old_graph)


def old_betweenness(spark, sf_dir):
    from server2_vector_search_server_spark.plans.quality_queries import (
        _BC_HOPS,
    )
    part = tbl(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    e1 = part.select(F.col("p_partkey").alias("src"),
                     ((F.col("p_partkey") * 7 + 13) % 200).alias("dst"))
    e2 = part.select(F.col("p_partkey").alias("src"),
                     ((F.col("p_partkey") * 3 + 41) % 200).alias("dst"))
    edges = e1.unionByName(e2)
    nodes = (edges.select(F.col("src").alias("v"))
             .union(edges.select(F.col("dst").alias("v"))).distinct())
    return (old_graph.betweenness_centrality(edges, nodes,
                                             max_hops=_BC_HOPS)
            .orderBy("node"))


def old_components(spark, sf_dir):
    from server2_vector_search_server_spark.plans.dedup_queries import (
        _cosine_pairs,
    )
    comps = old_graph.connected_components(
        _cosine_pairs(spark, sf_dir).select("id_a", "id_b"), "id_a", "id_b")
    return old_graph.component_summary(comps)


def old_kcore(spark, sf_dir):
    from server2_vector_search_server_spark.plans.quality_queries import (
        _IC_K, _IC_N, _IC_TOP,
    )
    p = (tbl(spark, sf_dir, "part")
         .filter(F.col("p_partkey") < _IC_N)
         .select(F.col("p_partkey").alias("v")))
    e1 = p.select(F.col("v").alias("src"),
                  ((F.col("v") * 7 + 13) % _IC_N).alias("dst"))
    e2 = p.select(F.col("v").alias("src"),
                  ((F.col("v") * 3 + 41) % _IC_N).alias("dst"))
    core = old_graph.k_core(e1.unionByName(e2), _IC_K)
    comps = old_graph.connected_components(core, "a", "b")
    return (comps
            .withColumn("influence", (F.col("node") * 37) % 100)
            .groupBy(F.col("component").alias("community"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"),
                 F.min("influence").cast("long").alias("influence"))
            .orderBy(F.col("influence").desc(), F.col("community").asc())
            .limit(_IC_TOP))


def main() -> None:
    from server2_vector_search_server_spark.plans import load_registry
    from server2_vector_search_server_spark.session import get_spark

    spark = get_spark("r11_ab3")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_registry()

    pairs = {
        "betweenness": (old_betweenness,
                        registry["graph_betweenness_centrality"].fn),
        "components": (old_components,
                       registry["dedup_component_groups"].fn),
        "kcore": (old_kcore,
                  registry["graph_kcore_influential_communities"].fn),
    }
    for key, (old, new) in pairs.items():
        o = [tuple(r) for r in old(spark, SF_DIR).collect()]
        n = [tuple(r) for r in new(spark, SF_DIR).collect()]
        assert o == n, f"{key}: results differ!"
        print(f"identity OK: {key} ({len(n)} rows)", file=sys.stderr)

    times: dict[str, list[float]] = {}
    for p in range(PASSES):
        for key, (old, new) in pairs.items():
            arms = [("old", old), ("new", new)]
            if p % 2:
                arms.reverse()
            for arm, fn in arms:
                k = f"{key}:{arm}"
                spark.sparkContext.setJobDescription(f"r11ab3 {k} p{p}")
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop") \
                    .mode("overwrite").save()
                times.setdefault(k, []).append(time.perf_counter() - t0)
                spark.catalog.clearCache()
    out = {}
    for key in pairs:
        o = times[f"{key}:old"]
        n = times[f"{key}:new"]
        mo = sorted(o)[len(o) // 2]
        mn = sorted(n)[len(n) // 2]
        out[key] = {"old": round(mo, 3), "new": round(mn, 3),
                    "delta_pct": round(100 * (mn - mo) / mo, 1),
                    "old_runs": [round(r, 3) for r in o],
                    "new_runs": [round(r, 3) for r in n]}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
