"""SCALE.md §40 experiment: three routes to threshold-Jaccard pairs.

Same task (word-3-gram Jaccard ≥ 0.5 pairs over a corpus with planted
near-dups), three physics:

  * quadratic: cross join + exact verify (`ngram_jaccard_pairs`)
  * LSH: MinHash band candidates + signature verify (lossy, recall <= 1)
  * prefix: AllPairs rare-token prefix equi-join + exact verify
    (`prefix_filter_jaccard_pairs` — lossless)

Measure wall and candidate-pair counts at 1x/4x/16x corpus (360 -> 5 760
docs), replicated with id-suffixed near-identical texts so duplicate
structure survives replication.

Run: python scripts/scale40_set_join_paths.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

THRESHOLD = 0.5


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from server2_vector_search_server_spark.operators import dedup

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (SparkSession.builder.master("local[32]")
             .appName("scale40")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    base = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .filter(F.col("doc_id") < 120).select("doc_id", "text"))

    results = []
    for rep in (1, 4, 16):
        # near-dup pair per replica: (text, text + ' zz yy'), ids disjoint
        reps = (base.withColumn("r", F.explode(
                    F.sequence(F.lit(0), F.lit(rep - 1))))
                .withColumn(
                    "text",
                    F.concat(F.col("text"), F.lit(" r"),
                             F.col("r").cast("string"))))
        docs = (reps.select(
            F.explode(F.array(
                F.struct((F.col("doc_id") + F.col("r") * 100000)
                         .alias("doc_id"), F.col("text")),
                F.struct((F.col("doc_id") + F.col("r") * 100000 + 50000)
                         .alias("doc_id"),
                         F.concat(F.col("text"), F.lit(" zz yy"))
                         .alias("text")))).alias("v"))
            .select("v.doc_id", "v.text")
            .repartition(64).localCheckpoint(eager=True))
        n = docs.count()

        t0 = time.time()
        quad = dedup.ngram_jaccard_pairs(docs, threshold=THRESHOLD)
        n_quad = quad.count()
        t_quad = time.time() - t0

        t0 = time.time()
        lsh = dedup.minhash_near_duplicates(docs, threshold=THRESHOLD)
        n_lsh = lsh.count()
        t_lsh = time.time() - t0

        t0 = time.time()
        pref = dedup.prefix_filter_jaccard_pairs(docs, threshold=THRESHOLD)
        n_pref = pref.count()
        t_pref = time.time() - t0

        results.append({
            "docs": n,
            "quadratic": {"wall_s": round(t_quad, 2), "pairs": n_quad},
            "lsh": {"wall_s": round(t_lsh, 2), "pairs": n_lsh},
            "prefix": {"wall_s": round(t_pref, 2), "pairs": n_pref},
        })
        print(json.dumps(results[-1]))
    print(json.dumps({"summary": results}))
    spark.stop()


if __name__ == "__main__":
    main()
