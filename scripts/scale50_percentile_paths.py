"""SCALE experiment 50: exact percentiles — two-phase histogram+refine
vs the global-sort order statistic, at a size where the sort hurts.

20M synthetic BIGINT values (deterministic LCG spread). Both paths
compute the exact k-th order statistic for p = 0.5, 0.95, 0.99.

Run: PYTHONPATH=/root/repo python scripts/scale50_percentile_paths.py
"""

import math
import time

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

N = 20_000_000
BUCKET = 1_000_000
PS = (0.5, 0.95, 0.99)

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", "48g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

vals = (spark.range(N)
        .select(((F.col("id") * 1103515245 + 12345) % 1_000_000_000)
                .alias("v"))
        .localCheckpoint(eager=True))          # exclude generation cost


def two_phase():
    t0 = time.time()
    hist = (vals.groupBy(F.floor(F.col("v") / BUCKET).alias("b"))
            .agg(F.count(F.lit(1)).alias("cnt")).orderBy("b").collect())
    n = sum(r["cnt"] for r in hist)
    targets = []
    for p in PS:
        k = int(math.ceil(p * n))
        cum = 0
        for r in hist:
            if cum + r["cnt"] >= k:
                targets.append((float(p), int(k), int(r["b"]),
                                int(k - cum)))
                break
            cum += r["cnt"]
    tdf = spark.createDataFrame(
        targets, "p double, k long, b long, local_rank long")
    buckets = sorted({t[2] for t in targets})
    phase2 = (vals.filter(F.floor(F.col("v") / BUCKET).isin(buckets))
              .withColumn("b", F.floor(F.col("v") / BUCKET))
              .withColumn("rn", F.row_number().over(
                  Window.partitionBy("b").orderBy("v"))))
    out = (phase2.join(F.broadcast(tdf),
                       (phase2["b"] == tdf["b"])
                       & (phase2["rn"] == tdf["local_rank"]))
           .select("p", F.col("v").alias("val")).collect())
    return sorted((r["p"], r["val"]) for r in out), time.time() - t0


def global_sort():
    t0 = time.time()
    n = vals.count()
    ks = {int(math.ceil(p * n)): p for p in PS}
    r = (vals.withColumn(
            "rn", F.row_number().over(Window.orderBy("v")))
         .filter(F.col("rn").isin(list(ks))).collect())
    return sorted((ks[row["rn"]], row["v"]) for row in r), time.time() - t0


tp, tp_wall = two_phase()
gs, gs_wall = global_sort()
assert tp == gs, (tp, gs)
print(f"two_phase  : {tp_wall:6.1f}s   {tp}")
print(f"global_sort: {gs_wall:6.1f}s   (identical values)")
print(f"speedup: {gs_wall / tp_wall:.1f}x")
