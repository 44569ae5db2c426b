"""SCALE.md §27 experiment: snapshot-store commit cost tracks TOUCHED files.

`SnapshotChunkStore.upsert` rewrites only the data files that contain the
affected doc_ids; every other file carries into the new manifest by
reference. The scale claim: updating one document in an N-file table costs
O(files-containing-that-doc), not O(table). This measures a 1-doc upsert
against the same corpus stored as (a) the snapshot store with doc-clustered
files (each doc's chunks land in few files) vs (b) the in-place
`ChunkStore`, whose dynamic-partition overwrite rewrites the WHOLE affected
partition (here: one `collection=` partition holding everything).

Interleaved repeats, medians (SCALE §22's lesson). The absolute numbers are
local-SSD small; the FILE COUNT columns are the scale-invariant part.

Run: python scripts/scale27_snapshot_commit_cost.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = 2000
CHUNKS_PER_DOC = 40


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from server2_vector_search_server_spark.sources.snapshots import (
        SnapshotChunkStore,
    )
    from server2_vector_search_server_spark.sources.store import ChunkStore

    spark = (SparkSession.builder.master("local[32]")
             .appName("scale27")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    def chunks(doc_lo: int, doc_hi: int, tag: str):
        docs = spark.range(doc_lo, doc_hi).select(
            F.concat(F.lit("doc_"), F.col("id")).alias("doc_name"),
            F.col("id"))
        c = docs.withColumn("chunk_index", F.explode(
            F.sequence(F.lit(0), F.lit(CHUNKS_PER_DOC - 1))))
        name = F.col("doc_name")
        return c.select(
            F.md5(F.concat_ws("#", name, F.col("chunk_index")
                              .cast("string"))).alias("chunk_id"),
            F.md5(name).alias("doc_id"), name.alias("doc_name"),
            F.col("chunk_index").cast("int"),
            F.lit("collection_a").alias("original_collection"),
            F.concat(F.lit(tag), F.lit(" content for "), name,
                     F.lit(" chunk "), F.col("chunk_index")).alias("content"),
            F.create_map(F.lit("source"), name).alias("metadata"),
            F.array(*[F.rand(seed=i) for i in range(8)])
            .cast("array<float>").alias("embedding"),
            F.lit("collection_a").alias("collection"))

    # snapshot store: doc-range-clustered files (each doc in ~1 file)
    snap_root = tempfile.mkdtemp(prefix="snap27_")
    snap = SnapshotChunkStore(spark, snap_root)
    snap.append(chunks(0, N_DOCS, "v1").repartitionByRange(64, "doc_name")
                .sortWithinPartitions("doc_name"))

    # in-place store: same rows, one collection partition
    flat_root = tempfile.mkdtemp(prefix="flat27_")
    flat = ChunkStore(spark, flat_root)
    flat.append(chunks(0, N_DOCS, "v1").repartition(64))

    one_doc = chunks(7, 8, "v2").localCheckpoint(eager=True)

    def run_snap() -> tuple[float, int]:
        before = set(snap._live_files())
        t0 = time.time()
        snap.upsert(one_doc)
        wall = round(time.time() - t0, 2)
        after = set(snap._live_files())
        return wall, len(after - before)      # files newly written

    def run_flat() -> float:
        t0 = time.time()
        flat.upsert(one_doc)
        return round(time.time() - t0, 2)

    walls = {"snapshot": [], "inplace": []}
    new_files = []
    for _ in range(4):
        w, nf = run_snap()
        walls["snapshot"].append(w)
        new_files.append(nf)
        walls["inplace"].append(run_flat())

    n_flat_files = len([f for f in os.listdir(
        os.path.join(flat_root, "collection=collection_a"))
        if f.endswith(".parquet")])
    out = {
        "table_rows": N_DOCS * CHUNKS_PER_DOC,
        "snapshot_total_files": len(snap._live_files()),
        "snapshot_files_written_per_upsert": new_files,
        "inplace_partition_files_rewritten": n_flat_files,
        "snapshot_median_s": statistics.median(walls["snapshot"][1:]),
        "inplace_median_s": statistics.median(walls["inplace"][1:]),
        "runs": walls,
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
