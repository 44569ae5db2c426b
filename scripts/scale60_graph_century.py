"""SCALE.md §60: the graph family's missing 100× decade (VERDICT r8 #5).

§56 measured graph_pagerank (broadcast branch) and the stream-stream join
at 1×/10×/100×; this experiment completes the family:

- ``graph_kcore_peeling``  — iterative degree peel over the SHIPMENT graph
  (grows with the corpus: 587k → 5.9M → 59M distinct edges);
- ``graph_pagerank_shuffle`` — the BIG-GRAPH branch (co-partitioned
  shuffle joins, no node-sized broadcast): §56 only measured the
  broadcast branch, but the shuffle branch is the 1000-executor strategy,
  so its decade curve is the one that matters at 100 TB;
- ``graph_betweenness_centrality`` — the registry pillar runs on a FIXED
  200-node deterministic subgraph (sampled-source Brandes-Pich form), so
  its decade curve isolates the scan term; the OPERATOR-level measurement
  below is the scale evidence;
- ``operator_betweenness`` — betweenness_centrality on the bidirected
  shipment graph itself, 4 deterministic sources, 3 BFS levels — frontier
  joins proportional to edges per level, the shape that must stay linear.

Methodology = §53/§56: same corpora (/tmp/sf1_synth, /tmp/sf2_century —
nested key-consistent replicas), fresh JVM per scale, medians of
SCALE53_REPEATS, wall + shuffle read/write from the status REST API,
spark.driver.memory=12g (ROUND_NOTES: 1g default OOMs materializing graph
checkpoints at the 10× corpus).

Run:   PYTHONPATH=/root/repo python scripts/scale60_graph_century.py
       ... --measure <sf_dir> --out <json>     (single scale, fresh JVM)
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

_spec = importlib.util.spec_from_file_location(
    "scale53", os.path.join(HERE, "scale53_decade.py"))
s53 = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(s53)

PILLARS = ["graph_kcore_peeling", "graph_pagerank_shuffle",
           "graph_betweenness_centrality"]


_BC_SOURCES = [("s1",), ("s250",)]
_BC_HOPS = 2


def _operator_betweenness(spark, sf_dir: str):
    """betweenness_centrality on the (bidirected) shipment graph: 2
    deterministic supplier sources, 2 BFS levels — the sampled-source
    Brandes-Pich form a production pipeline runs at corpus scale.
    SOURCES are the cost lever (work is Θ(sources × edges)): a first
    attempt at 4 sources × 3 hops on the 100× graph (117M bidirected
    edges) exhausted a 40g single-JVM heap on the level checkpoints —
    the configuration below completes at every scale on this box, and on
    a real cluster you'd raise sources, not hops."""
    from pyspark.sql import functions as F

    from server2_vector_search_server_spark.operators.graph import (
        betweenness_centrality,
    )
    from server2_vector_search_server_spark.plans.graph_queries import (
        _edges,
    )

    edges = _edges(spark, sf_dir)
    bidir = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    sources = spark.createDataFrame(_BC_SOURCES, "node string")
    return betweenness_centrality(bidir, sources, max_hops=_BC_HOPS)


def measure(sf_dir: str, out_path: str) -> None:
    from server2_vector_search_server_spark.plans import load_registry

    spark = s53._spark(ui=True)
    registry = load_registry()
    warm = spark.read.parquet(f"{sf_dir}/region.parquet")
    warm.crossJoin(warm.selectExpr("r_regionkey k")).groupBy("r_name") \
        .count().write.format("noop").mode("overwrite").save()

    only = os.environ.get("SCALE60_ONLY", "")
    runners = {name: registry[name].fn for name in PILLARS}
    runners["operator_betweenness"] = _operator_betweenness
    if only:
        runners = {n: f for n, f in runners.items() if n in only.split(",")}
    results = {}
    for name, fn in runners.items():
        walls, reads, writes = [], [], []
        for _ in range(s53.REPEATS):
            r0, w0 = s53.shuffle_totals()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            walls.append(time.perf_counter() - t0)
            r1, w1 = s53.shuffle_totals()
            reads.append(r1 - r0)
            writes.append(w1 - w0)
            spark.catalog.clearCache()
        mid = len(walls) // 2
        results[name] = {
            "wall_s": round(sorted(walls)[mid], 3),
            "shuffle_read_mb": round(sorted(reads)[mid] / 1e6, 2),
            "shuffle_write_mb": round(sorted(writes)[mid] / 1e6, 2),
        }
        print(f"  {name}: {results[name]}", flush=True)
    with open(out_path, "w") as fh:
        json.dump({"sf_dir": sf_dir, "repeats": s53.REPEATS,
                   "pillars": results}, fh, indent=1)
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--measure")
    ap.add_argument("--out", default="/tmp/scale60_measure.json")
    args = ap.parse_args()
    if args.measure:
        measure(args.measure, args.out)
        return
    import subprocess
    for sf_dir, tag in (("/root/testdata/sf0.1", "1x"),
                        (os.environ.get("SPARK_GRAFT_SF10_DIR",
                                        "/tmp/sf1_synth"), "10x"),
                        (os.environ.get("SPARK_GRAFT_SF100_DIR",
                                        "/tmp/sf2_century"), "100x")):
        out = f"/tmp/scale60_{tag}.json"
        subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--measure", sf_dir, "--out", out],
            check=True, env={**os.environ,
                             "PYTHONPATH": os.path.dirname(HERE)})
        print(json.dumps(json.load(open(out)), indent=1), flush=True)


if __name__ == "__main__":
    main()
