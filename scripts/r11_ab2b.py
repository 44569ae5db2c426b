"""Round-11 A/B #2b: wal_replay build/trigger geometry, 3 arms.

  a8t8: r10 form — 8 build files, maxFilesPerTrigger=8 (1 micro-batch)
  a4t2: 4 build files, trigger 2 (2 batches)  [batch-1 form]
  a2t1: 2 build files, trigger 1 (2 batches, half the build writes)

Usage: PYTHONPATH=/root/repo python scripts/r11_ab2b.py [passes]
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = int(sys.argv[1]) if len(sys.argv) > 1 else 7

from pyspark.sql import functions as F  # noqa: E402

from server2_vector_search_server_spark.plans.registry import tbl  # noqa: E402
from server2_vector_search_server_spark.plans.streaming_queries import (  # noqa: E402
    scratch_dir, state_partitions,
)
from server2_vector_search_server_spark.streaming.wal import (  # noqa: E402
    OP_DELETE, OP_UPSERT, WAL_SCHEMA, WalLog, start_wal_stream,
)


def wal_arm(n_files: int, trigger: int):
    def run(spark, sf_dir):
        work = scratch_dir(f"wal_ab_{n_files}_{trigger}_")
        wal_dir = os.path.join(work, "wal")
        docs = tbl(spark, sf_dir, "documents").select("doc_id", "text")
        common = [F.col("doc_id").cast("string").alias("chunk_id"),
                  F.col("doc_id").cast("string").alias("doc_id"),
                  F.concat(F.lit("doc_"), F.col("doc_id")).alias("doc_name"),
                  F.lit(0).alias("chunk_index"),
                  F.lit("master").alias("collection")]
        v1 = docs.select(
            (F.col("doc_id") * 3).alias("seq_id"),
            F.lit(OP_UPSERT).alias("operation"), *common,
            F.col("text").alias("content"),
            F.lit(None).cast("array<float>").alias("embedding"))
        dels = docs.filter(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") * 3 + 1).alias("seq_id"),
            F.lit(OP_DELETE).alias("operation"), *common,
            F.lit(None).cast("string").alias("content"),
            F.lit(None).cast("array<float>").alias("embedding"))
        v2 = docs.filter(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") * 3 + 2).alias("seq_id"),
            F.lit(OP_UPSERT).alias("operation"), *common,
            F.concat(F.lit("v2:"), F.col("text")).alias("content"),
            F.lit(None).cast("array<float>").alias("embedding"))
        wal_df = v1.unionByName(dels).unionByName(v2).select(
            [f.name for f in WAL_SCHEMA.fields])
        wal_df.repartition(n_files).write.mode("overwrite").parquet(wal_dir)
        log = WalLog(spark, os.path.join(work, "store"))
        with state_partitions(spark):
            q = start_wal_stream(
                spark, wal_dir, log,
                checkpoint_dir=os.path.join(work, "ckpt"),
                max_files_per_trigger=trigger)
            q.awaitTermination()
        return (log.current_state()
                .select(F.col("doc_id").cast("long").alias("doc_id"),
                        "content")
                .orderBy("doc_id"))
    return run


def main() -> None:
    from server2_vector_search_server_spark.session import get_spark

    spark = get_spark("r11_ab2b")
    spark.sparkContext.setLogLevel("ERROR")
    arms = {"a8t8": wal_arm(8, 8), "a4t2": wal_arm(4, 2),
            "a2t1": wal_arm(2, 1)}
    ref = None
    for key, fn in arms.items():
        rows = [tuple(r) for r in fn(spark, SF_DIR).collect()]
        if ref is None:
            ref = rows
        assert rows == ref, f"{key}: results differ!"
        print(f"identity OK: {key} ({len(rows)} rows)", file=sys.stderr)

    times: dict[str, list[float]] = {}
    order = list(arms)
    for p in range(PASSES):
        rot = order[p % 3:] + order[:p % 3]
        for key in rot:
            spark.sparkContext.setJobDescription(f"r11ab2b {key} p{p}")
            t0 = time.perf_counter()
            arms[key](spark, SF_DIR).write.format("noop") \
                .mode("overwrite").save()
            times.setdefault(key, []).append(time.perf_counter() - t0)
            spark.catalog.clearCache()
    out = {}
    for key in arms:
        runs = times[key]
        out[key] = {"median": round(sorted(runs)[len(runs) // 2], 3),
                    "runs": [round(r, 3) for r in runs]}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
