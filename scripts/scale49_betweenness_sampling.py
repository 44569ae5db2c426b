"""SCALE experiment 49: sampled-source Brandes (Brandes & Pich 2007).

Exact betweenness is Theta(sources x edges); the operator takes sources
as an input precisely so corpus scale can SAMPLE them. Question: on a
2,000-node two-successor graph, how fast does the sampled ranking
converge to the all-sources reference (top-20 overlap + wall)?

Run when the machine is quiet:
PYTHONPATH=/root/repo python scripts/scale49_betweenness_sampling.py
"""

import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from server2_vector_search_server_spark.operators.graph import (
    betweenness_centrality,
)

N = 2000
HOPS = 6

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

part = (spark.read.parquet("/root/testdata/sf0.1/part.parquet")
        .filter(F.col("p_partkey") < N))
e1 = part.select(F.col("p_partkey").alias("src"),
                 ((F.col("p_partkey") * 7 + 13) % N).alias("dst"))
e2 = part.select(F.col("p_partkey").alias("src"),
                 ((F.col("p_partkey") * 3 + 41) % N).alias("dst"))
edges = e1.unionByName(e2).localCheckpoint(eager=True)
nodes = (edges.select(F.col("src").alias("v"))
         .union(edges.select(F.col("dst").alias("v"))).distinct()
         .localCheckpoint(eager=True))
n_nodes = nodes.count()


def run(sources):
    t0 = time.time()
    bc = betweenness_centrality(edges, sources, max_hops=HOPS)
    vals = {r["node"]: r["betweenness_micro"] for r in bc.collect()}
    return vals, time.time() - t0


# NOTE (first attempt, kept for the record): top-20 identity is the WRONG
# metric on this near-regular graph — the exact spectrum is nearly flat
# (std/mean ~ 0.12, exact ties at the max), so sampled top-20 overlap is
# 0.00 by tie noise while the VALUES are estimated well. Report value
# estimation quality instead: Pearson r + mean relative error of the
# (n/k)-rescaled sample estimate, over all nodes.
ref, ref_wall = run(nodes)
print(f"sources={n_nodes:>5} (all)  wall={ref_wall:6.1f}s  [reference]")
for k in (500, 200, 100, 50):
    # LCG-hash sampling, deterministic but unstructured (modular strides
    # correlate with the graph's own successor arithmetic)
    stride = n_nodes // k
    smp = nodes.filter(
        ((F.col("v") * 1103515245 + 12345) % 2147483647) % stride == 0)
    n_smp = smp.count()
    vals, wall = run(smp)
    scale = n_nodes / n_smp
    import math
    xs, ys = [], []
    rel = []
    for node, exact in ref.items():
        est = vals.get(node, 0) * scale
        xs.append(exact); ys.append(est)
        if exact > 0:
            rel.append(abs(est - exact) / exact)
    mx, my = sum(xs)/len(xs), sum(ys)/len(ys)
    cov = sum((a-mx)*(b-my) for a, b in zip(xs, ys))
    vx = sum((a-mx)**2 for a in xs); vy = sum((b-my)**2 for b in ys)
    r = cov / math.sqrt(vx*vy) if vx*vy > 0 else float("nan")
    mre = sum(rel)/len(rel)
    print(f"sources={n_smp:>5}        wall={wall:6.1f}s  "
          f"pearson_r={r:.3f}  mean_rel_err={mre:.3f}")
