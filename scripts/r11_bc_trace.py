"""Per-phase job trace of graph_betweenness_centrality (VERDICT r10 #7).

Reimplements the operator's exact loop inline with one job group per phase
(e0/frontier init, each forward hop's checkpoint + isEmpty, the single
backward action) and dumps jobs/stages/tasks per phase — the evidence for
where the pillar's ~84 jobs come from and why they are the floor of the
13-round recursion at AQE stage-materialization granularity.

Usage: PYTHONPATH=/root/repo python scripts/r11_bc_trace.py
Writes plans/r11/betweenness_job_trace.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import functions as F

    from server2_vector_search_server_spark.plans.quality_queries import (
        _BC_HOPS,
    )
    from server2_vector_search_server_spark.plans.registry import tbl
    from server2_vector_search_server_spark.session import get_spark

    spark = get_spark("r11_bc_trace")
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    tracker = sc.statusTracker()
    trace: list[dict] = []

    def phase(label):
        class _P:
            def __enter__(self):
                sc.setJobGroup(f"bc_{label}", label)
                self.t0 = time.perf_counter()
                return self

            def __exit__(self, *a):
                wall = time.perf_counter() - self.t0
                sc.setJobGroup(None, None)
                jobs = tracker.getJobIdsForGroup(f"bc_{label}")
                n_stages = n_tasks = 0
                for j in jobs:
                    ji = tracker.getJobInfo(j)
                    if ji is None:
                        continue
                    for s in ji.stageIds:
                        si = tracker.getStageInfo(s)
                        if si is not None:
                            n_stages += 1
                            n_tasks += si.numTasks
                trace.append({"phase": label, "wall": round(wall, 3),
                              "jobs": len(jobs), "stages": n_stages,
                              "tasks": n_tasks})
        return _P()

    # pillar inputs (plans/quality_queries.py)
    part = tbl(spark, SF_DIR, "part").filter(F.col("p_partkey") < 200)
    e1 = part.select(F.col("p_partkey").alias("src"),
                     ((F.col("p_partkey") * 7 + 13) % 200).alias("dst"))
    e2 = part.select(F.col("p_partkey").alias("src"),
                     ((F.col("p_partkey") * 3 + 41) % 200).alias("dst"))
    edges = e1.unionByName(e2)
    sources = (edges.select(F.col("src").alias("v"))
               .union(edges.select(F.col("dst").alias("v"))).distinct())

    # --- operator loop, verbatim from operators/graph.py, with phases ---
    src, dst, max_hops, scale = "src", "dst", _BC_HOPS, 6
    factor = 10 ** scale
    with phase("init_e0"):
        e0 = edges.select(src, dst).distinct().localCheckpoint(eager=True)
    with phase("init_frontier"):
        frontier = (sources.select(F.col(sources.columns[0]).alias("s"))
                    .distinct()
                    .select("s", F.col("s").alias("node"),
                            F.lit(0).cast("long").alias("d"),
                            F.lit(1).cast("long").alias("sigma"))
                    .localCheckpoint(eager=True))
    levels = [frontier]
    settled = frontier
    for hop in range(1, max_hops + 1):
        grown = (frontier.join(e0, frontier["node"] == e0[src])
                 .groupBy("s", F.col(dst).alias("node"))
                 .agg(F.sum("sigma").alias("sigma")))
        k = settled.select(F.col("s").alias("_ks"),
                           F.col("node").alias("_kn"))
        with phase(f"fwd_hop{hop}_ckpt"):
            frontier = (grown.join(k, (grown["s"] == k["_ks"])
                                   & (grown["node"] == k["_kn"]),
                                   "left_anti")
                        .select("s", "node",
                                F.lit(hop).cast("long").alias("d"), "sigma")
                        .localCheckpoint(eager=True))
        with phase(f"fwd_hop{hop}_isempty"):
            empty = frontier.isEmpty()
        if empty:
            break
        levels.append(frontier)
        settled = settled.unionByName(frontier)
    deltas = {len(levels) - 1:
              levels[-1].select("s", "node",
                                F.lit(0).cast("long").alias("dm"))}
    for lev in range(len(levels) - 2, -1, -1):
        a = levels[lev].select("s", F.col("node").alias("v"),
                               F.col("sigma").alias("sv"))
        b = levels[lev + 1].select(F.col("s").alias("_bs"),
                                   F.col("node").alias("w"),
                                   F.col("sigma").alias("sw"))
        dag = (a.join(e0, a["v"] == e0[src])
               .join(b, (a["s"] == b["_bs"]) & (e0[dst] == b["w"])))
        dw = deltas[lev + 1].select(F.col("s").alias("_ds"),
                                    F.col("node").alias("_dn"),
                                    F.col("dm").alias("dm_w"))
        contrib = (dag.join(dw, (dag["s"] == dw["_ds"])
                            & (dag["w"] == dw["_dn"]))
                   .select("s", "v",
                           F.round((F.col("sv").cast("double")
                                    / F.col("sw").cast("double"))
                                   * (F.lit(1.0)
                                      + F.col("dm_w") / float(factor))
                                   * factor).cast("long").alias("c"))
                   .groupBy("s", "v").agg(F.sum("c").alias("dm_sum")))
        deltas[lev] = (levels[lev]
                       .join(contrib.select(F.col("s").alias("_cs"),
                                            F.col("v").alias("_cv"),
                                            "dm_sum"),
                             (levels[lev]["s"] == F.col("_cs"))
                             & (levels[lev]["node"] == F.col("_cv")),
                             "left")
                       .select("s", "node",
                               F.coalesce("dm_sum", F.lit(0))
                               .cast("long").alias("dm")))
    interior = None
    for lev in range(1, len(levels)):
        interior = (deltas[lev] if interior is None
                    else interior.unionByName(deltas[lev]))
    result = (interior.groupBy("node")
              .agg(F.sum("dm").cast("long").alias("betweenness_micro"))
              .orderBy("node"))
    with phase("backward_and_final_action"):
        result.write.format("noop").mode("overwrite").save()

    total = {"jobs": sum(p["jobs"] for p in trace),
             "stages": sum(p["stages"] for p in trace),
             "wall": round(sum(p["wall"] for p in trace), 3)}
    out = {"pillar": "graph_betweenness_centrality", "sf_dir": SF_DIR,
           "phases": trace, "total": total}
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, "plans", "r11", "betweenness_job_trace.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
