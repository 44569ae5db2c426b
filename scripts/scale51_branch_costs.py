"""SCALE experiment 51: branch-store commit vs merge cost profile.

Claim under test: with immutable files + manifest refs, branch MERGE cost
is O(manifest) — file-list arithmetic + one JSON write — independent of
how much DATA the branch carries; fast-forward is a pure pointer move.

Run: PYTHONPATH=/root/repo python scripts/scale51_branch_costs.py
"""

import os
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from server2_vector_search_server_spark.sources.snapshots import (
    BranchedSnapshotStore,
)

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")


def chunks(lo, hi):
    d = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
    name = F.concat(F.lit("doc_"), F.col("doc_id"))
    return d.select(
        F.md5(name).alias("chunk_id"), F.md5(name).alias("doc_id"),
        name.alias("doc_name"), F.lit(0).alias("chunk_index"),
        F.lit("col_a").alias("original_collection"),
        F.col("text").alias("content"),
        F.create_map(F.lit("source"), name).alias("metadata"),
        F.array(F.lit(0.1), F.lit(0.2)).cast("array<float>")
        .alias("embedding"),
        F.lit("col_a").alias("collection"))


for n_rows, lo, hi in ((100, 0, 100), (1000, 1000, 2000),
                       (4000, 0, 4000)):
    root = f"/tmp/scale51_{n_rows}"
    import shutil
    shutil.rmtree(root, ignore_errors=True)
    store = BranchedSnapshotStore(spark, root)
    store.commit_on("main", chunks(4000, 4100))        # base
    store.create_branch("feat")
    t0 = time.time()
    store.commit_on("feat", chunks(lo, hi))
    commit_w = time.time() - t0
    store.commit_on("main", chunks(4100, 4200))        # diverge main
    t0 = time.time()
    outcome, _ = store.merge("feat")
    merge_w = time.time() - t0
    # fast-forward: fork again from the merged head, commit, merge clean
    store.create_branch("ff")
    store.commit_on("ff", chunks(4200, 4300))
    t0 = time.time()
    ff_outcome, _ = store.merge("ff")
    ff_w = time.time() - t0
    print(f"branch rows={n_rows:>5}: commit={commit_w:5.2f}s  "
          f"merge[{outcome}]={merge_w:5.2f}s  "
          f"ff[{ff_outcome}]={ff_w:6.4f}s")
