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


def run(sources, label):
    t0 = time.time()
    bc = betweenness_centrality(edges, sources, max_hops=HOPS)
    top = [r["node"] for r in
           bc.orderBy(F.col("betweenness_micro").desc(), "node")
           .limit(20).collect()]
    return top, time.time() - t0


ref_top, ref_wall = run(nodes, "all")
print(f"sources={n_nodes:>5} (all)  wall={ref_wall:6.1f}s  [reference]")
for k in (500, 200, 100, 50):
    smp = nodes.filter(F.col("v") % (n_nodes // k) == 0)
    n_smp = smp.count()
    top, wall = run(smp, str(k))
    ov = len(set(top) & set(ref_top)) / 20.0
    print(f"sources={n_smp:>5}        wall={wall:6.1f}s  "
          f"top20_overlap={ov:.2f}")
