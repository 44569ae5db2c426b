"""SCALE.md §68: k-core node-state peel vs edge re-materializing peel
across the decades (VERDICT r9 #6 / SCALE §61.1).

§61 showed graph_kcore's 100× wall (190 s) is checkpoint-bound: the peel
localCheckpoints ~117M bidirected edge rows per round.  The
``k_core_degree_state`` operator pins the adjacency ONCE and iterates only
the node-sized degree table (Batagelj-Zaveršnik decrements), so per-round
checkpoint state shrinks from edges to nodes.  This experiment runs BOTH
operators to full fixpoint (same k, same shipment graph) at 1×/10×/100×,
fresh JVM per scale, medians of SCALE53_REPEATS, wall + shuffle deltas
from the status REST API.

Run:   PYTHONPATH=/root/repo python scripts/scale68_kcore_state.py
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

K = 3   # the registry pillar's k (_KCORE_K)


def measure(sf_dir: str, out_path: str) -> None:
    from server2_vector_search_server_spark.operators.graph import (
        k_core, k_core_degree_state)
    from server2_vector_search_server_spark.plans.graph_queries import _edges

    spark = s53._spark(ui=True)
    warm = spark.read.parquet(f"{sf_dir}/region.parquet")
    warm.crossJoin(warm.selectExpr("r_regionkey k")).groupBy("r_name") \
        .count().write.format("noop").mode("overwrite").save()

    results = {}
    for name, fn in (("kcore_peel_edges", k_core),
                     ("kcore_node_state", k_core_degree_state)):
        walls, reads, writes, cores = [], [], [], []
        for _ in range(s53.REPEATS):
            edges = _edges(spark, sf_dir)
            r0, w0 = s53.shuffle_totals()
            t0 = time.perf_counter()
            cores.append(fn(edges, K).count())
            walls.append(time.perf_counter() - t0)
            r1, w1 = s53.shuffle_totals()
            reads.append(r1 - r0)
            writes.append(w1 - w0)
            spark.catalog.clearCache()
        assert len(set(cores)) == 1, cores
        mid = len(walls) // 2
        results[name] = {
            "wall_s": round(sorted(walls)[mid], 3),
            "core_edges": cores[0],
            "shuffle_read_mb": round(sorted(reads)[mid] / 1e6, 2),
            "shuffle_write_mb": round(sorted(writes)[mid] / 1e6, 2),
        }
        print(f"  {name}: {results[name]}", flush=True)
    # cross-operator equivalence at every scale, not just in unit tests
    assert (results["kcore_peel_edges"]["core_edges"]
            == results["kcore_node_state"]["core_edges"]), results
    with open(out_path, "w") as fh:
        json.dump({"sf_dir": sf_dir, "repeats": s53.REPEATS, "k": K,
                   "pillars": results}, fh, indent=1)
    spark.stop()


def measure_deep(out_path: str) -> None:
    """The regime the node-state design exists for: a dense ring-lattice
    core (degree 40, survives k=2) with 500 pendant chains of length 40 —
    the peel removes ONE node per chain per round, so fixpoint takes 40
    rounds and the edge-rematerializing peel checkpoints the ~4M-edge
    core every round while the node-state variant checkpoints ~220k node
    rows.  (The shipment graph peels in 1-2 rounds at every decade, so
    the decades alone cannot show this.)"""
    import time as _t

    from pyspark.sql import functions as F

    from server2_vector_search_server_spark.operators.graph import (
        k_core, k_core_degree_state)

    spark = s53._spark(ui=True)
    n_core, deg_half, n_chain, chain_len = 200_000, 20, 500, 40
    core_ids = spark.range(n_core)
    parts = [core_ids.select(F.col("id").alias("src"),
                             ((F.col("id") + j) % n_core).alias("dst"))
             for j in range(1, deg_half + 1)]
    lattice = parts[0]
    for p in parts[1:]:
        lattice = lattice.unionAll(p)
    chain_ids = spark.range(n_chain * chain_len)
    cid = (F.col("id") / chain_len).cast("long")
    pos = F.col("id") % chain_len
    node = F.lit(n_core) + F.col("id")
    chains = chain_ids.select(
        F.when(pos == 0, cid).otherwise(node - 1).alias("src"),
        node.alias("dst"))
    edges = lattice.unionAll(chains).localCheckpoint(eager=True)
    results = {"n_edges": edges.count(), "peel_rounds": chain_len}
    for name, fn in (("kcore_peel_edges", k_core),
                     ("kcore_node_state", k_core_degree_state)):
        walls, cores = [], []
        for _ in range(s53.REPEATS):
            t0 = _t.perf_counter()
            cores.append(fn(edges, 2).count())
            walls.append(_t.perf_counter() - t0)
        assert len(set(cores)) == 1, cores
        results[name] = {"wall_s": round(sorted(walls)[len(walls) // 2], 3),
                         "core_edges": cores[0]}
        print(f"  deep {name}: {results[name]}", flush=True)
    assert (results["kcore_peel_edges"]["core_edges"]
            == results["kcore_node_state"]["core_edges"]), results
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--measure")
    ap.add_argument("--deep", action="store_true")
    ap.add_argument("--out", default="/tmp/scale68_measure.json")
    args = ap.parse_args()
    if args.deep:
        measure_deep(args.out)
        return
    if args.measure:
        measure(args.measure, args.out)
        return
    import subprocess
    for sf_dir, tag in (("/root/testdata/sf0.1", "1x"),
                        (os.environ.get("SPARK_GRAFT_SF10_DIR",
                                        "/tmp/sf1_synth"), "10x"),
                        (os.environ.get("SPARK_GRAFT_SF100_DIR",
                                        "/tmp/sf2_century"), "100x")):
        out = f"/tmp/scale68_{tag}.json"
        subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--measure", sf_dir, "--out", out],
            check=True, env={**os.environ,
                             "PYTHONPATH": os.path.dirname(HERE)})
        print(json.dumps(json.load(open(out)), indent=1), flush=True)


if __name__ == "__main__":
    main()
