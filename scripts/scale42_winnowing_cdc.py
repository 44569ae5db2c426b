"""SCALE.md §42 experiment: winnowing fingerprint join vs full k-gram
join, and CDC chunk dedup linearity.

Corpus: base documents each paired with a PREFIX-edited twin, replicated
1x/4x/16x with disjoint ids (240 -> 3 840 docs).

  * winnowing: overlap pairs via the SELECTED-fingerprint equi-join
    (density ~2/(w+1)) vs the same join over ALL positional k-gram
    hashes — identical >= w+k-1-token guarantee, very different shuffle.
  * CDC: content-defined chunk + digest groupBy; realigned chunk fraction
    (the dedup payoff) and wall vs corpus size (expected linear).

Run: python scripts/scale42_winnowing_cdc.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K, W = 3, 4
MIN_SHARED = 3


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from server2_vector_search_server_spark.operators import (
        dedup,
        text_analysis as ta,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (SparkSession.builder.master("local[32]")
             .appName("scale42")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    base = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .filter(F.col("doc_id") < 120).select("doc_id", "text"))

    results = []
    for rep in (1, 4, 16):
        reps = (base.withColumn("r", F.explode(
                    F.array(*[F.lit(i) for i in range(rep)])))
                .select((F.col("doc_id") + F.col("r") * 100000)
                        .alias("doc_id"),
                        F.concat(F.col("text"), F.lit(" r"),
                                 F.col("r").cast("string")).alias("text")))
        docs = (reps.select(
            F.explode(F.array(
                F.struct(F.col("doc_id"), F.col("text")),
                F.struct((F.col("doc_id") + 50000).alias("doc_id"),
                         F.concat(F.lit("qq ww "), F.col("text"))
                         .alias("text")))).alias("v"))
            .select("v.doc_id", "v.text").localCheckpoint(eager=True))
        n_docs = docs.count()

        hashed = docs.withColumn(
            "_h", ta.positional_kgram_hashes(F.col("text"), k=K))

        def overlap_pairs(fp_rows):
            a, b = fp_rows.alias("a"), fp_rows.alias("b")
            return (a.join(b, (F.col("a.fp") == F.col("b.fp"))
                           & (F.col("a.doc_id") < F.col("b.doc_id")))
                    .groupBy(F.col("a.doc_id"), F.col("b.doc_id"))
                    .agg(F.count(F.lit(1)).alias("shared"))
                    .filter(F.col("shared") >= MIN_SHARED))

        # winnowing-selected fingerprints
        t0 = time.time()
        sel = (hashed.select("doc_id", F.explode(
                   ta.winnow_select(F.col("_h"), w=W)).alias("s"))
               .select("doc_id", F.col("s.fp").alias("fp")).distinct()
               .localCheckpoint(eager=True))
        n_sel = sel.count()
        pairs_sel = overlap_pairs(sel).count()
        t_sel = time.time() - t0

        # full k-gram stream join (same guarantee, no selection)
        t0 = time.time()
        full = (hashed.select("doc_id", F.explode("_h").alias("fp"))
                .distinct().localCheckpoint(eager=True))
        n_full = full.count()
        pairs_full = overlap_pairs(full).count()
        t_full = time.time() - t0

        # CDC chunk dedup
        t0 = time.time()
        chunks = (dedup.cdc_chunks(docs, k=4, divisor=8)
                  .withColumn("digest", F.md5("chunk_text"))
                  .select("doc_id", "digest"))
        stats = chunks.agg(
            F.count(F.lit(1)).alias("total"),
            F.count_distinct("digest").alias("distinct")).collect()[0]
        t_cdc = time.time() - t0

        row = {"n_docs": n_docs,
               "win_selected_rows": n_sel, "win_full_rows": n_full,
               "density": round(n_sel / n_full, 4),
               "pairs_selected": pairs_sel, "pairs_full": pairs_full,
               "t_winnow_join_s": round(t_sel, 2),
               "t_full_join_s": round(t_full, 2),
               "cdc_total_chunks": stats["total"],
               "cdc_distinct": stats["distinct"],
               "cdc_dedup_ratio": round(
                   1 - stats["distinct"] / stats["total"], 4),
               "t_cdc_s": round(t_cdc, 2)}
        results.append(row)
        print(json.dumps(row))

    print(json.dumps({"experiment": "scale42", "rows": results}))


if __name__ == "__main__":
    main()
