"""SCALE.md §39 experiment: incremental SCD2 upkeep — does the per-batch
rewrite really cost touched buckets, not history size?

Build a 1 M-row SCD2 state table partitioned into 64 buckets; apply update
batches that touch 1 / 4 / 16 / 64 buckets; measure the close-and-append
rewrite wall against the full-history rewrite (the naive window rebuild).

Run: python scripts/scale39_scd2_upkeep.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_KEYS = 1_000_000
N_BUCKETS = 64
KEYS_PER_BATCH = 2_000


def main() -> None:
    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    spark = (SparkSession.builder.master("local[32]")
             .appName("scale39")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="scale39_")
    state = os.path.join(root, "state")
    (spark.range(N_KEYS).select(
        F.col("id").alias("doc_id"),
        F.lit(0).cast("long").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
        F.md5(F.col("id").cast("string")).alias("content_hash"),
        (F.col("id") % N_BUCKETS).cast("int").alias("bucket"))
     .repartition("bucket")
     .write.partitionBy("bucket").parquet(state))
    print(f"state rows: {N_KEYS}, buckets: {N_BUCKETS}")

    results = []
    for ts, n_touch in [(1, 1), (2, 4), (3, 16), (4, 64)]:
        # batch keys spread across exactly n_touch buckets
        # doc_id = id*64 + (id % n_touch): distinct keys whose bucket
        # (doc_id % 64) cycles through exactly the first n_touch buckets
        batch = (spark.range(KEYS_PER_BATCH).select(
            (F.col("id") * N_BUCKETS + (F.col("id") % n_touch))
            .alias("doc_id"))
            .select("doc_id",
                    F.lit(ts).cast("long").alias("valid_from"),
                    F.lit(None).cast("long").alias("valid_to"),
                    F.md5(F.concat(F.col("doc_id").cast("string"),
                                   F.lit(f"@{ts}"))).alias("content_hash"))
            .localCheckpoint(eager=True))
        touched = sorted({r["b"] for r in batch.select(
            (F.col("doc_id") % N_BUCKETS).cast("int").alias("b"))
            .distinct().collect()})
        cur = spark.read.parquet(state)
        t0 = time.time()
        affected = cur.filter(F.col("bucket").isin(touched))
        keys = batch.select("doc_id").distinct()
        closed = (affected.join(
            F.broadcast(keys.withColumnRenamed("doc_id", "_k")),
            (F.col("doc_id") == F.col("_k")) & F.col("valid_to").isNull(),
            "left")
            .withColumn("valid_to", F.when(
                F.col("_k").isNotNull(), F.lit(ts).cast("long"))
                .otherwise(F.col("valid_to")))
            .drop("_k"))
        (closed.unionByName(
            batch.withColumn("bucket",
                             (F.col("doc_id") % N_BUCKETS).cast("int")))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("bucket").parquet(state))
        wall = time.time() - t0
        results.append({"batch_ts": ts, "touched_buckets": len(touched),
                        "rewrite_s": round(wall, 2)})
        print(json.dumps(results[-1]))

    # naive baseline: full-history window rebuild
    allv = spark.read.parquet(state).drop("valid_to")
    t0 = time.time()
    w = Window.partitionBy("doc_id").orderBy("valid_from")
    (allv.withColumn("valid_to", F.lead("valid_from").over(w))
     .write.mode("overwrite").parquet(os.path.join(root, "rebuilt")))
    full = time.time() - t0
    print(json.dumps({"full_window_rebuild_s": round(full, 2),
                      "per_batch": results}))
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
