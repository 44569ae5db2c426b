"""SCALE.md §41 experiment: two routes to threshold-cosine near-dup pairs.

Same task (cosine ≥ 0.9 pairs over an embedding corpus with planted exact
duplicates), two physics:

  * quadratic: normalize-once + cross join exact verify
    (`cosine_near_duplicates` — the bounded verification primitive)
  * sign-LSH: multi-table hyperplane bucket equi-join candidates + exact
    verify (`cosine_lsh_near_duplicates` — the r5 bench pillar)

Measure wall, candidate-pair count (the quantity LSH actually bounds), and
result-pair parity at 1x/4x/16x corpus (400 → 6 400 vectors; copies get a
per-replica deterministic perturbation so duplicate structure survives
replication without making every replica identical).

Run: python scripts/scale41_cosine_lsh.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

THRESHOLD = 0.9
TABLES, BITS = 4, 8


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from server2_vector_search_server_spark.operators import dedup

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (SparkSession.builder.master("local[32]")
             .appName("scale41")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .filter(F.col("vec_id") < 200).select("vec_id", "embedding"))
    planes = [r["embedding"] for r in
              emb.filter(F.col("vec_id") < TABLES * BITS)
              .orderBy("vec_id").collect()]

    results = []
    for rep in (1, 4, 16):
        # each replica r: original + exact copy, ids disjoint; rotate one
        # coordinate by a replica-dependent epsilon so replicas are not
        # global duplicates of each other (only the planted pairs are)
        reps = (emb.withColumn("r", F.explode(
                    F.sequence(F.lit(0), F.lit(rep - 1))))
                .withColumn(
                    "embedding",
                    F.transform(
                        "embedding",
                        lambda x, i: x + F.when(
                            i == 0, F.col("r").cast("float") * 0.001)
                        .otherwise(F.lit(0.0)))))
        docs = (reps.select(F.explode(F.array(
                    F.struct((F.col("vec_id") + F.col("r") * 100000)
                             .alias("vec_id"), F.col("embedding")),
                    F.struct((F.col("vec_id") + F.col("r") * 100000 + 50000)
                             .alias("vec_id"), F.col("embedding"))))
                .alias("v"))
                .select("v.vec_id", "v.embedding")
                .localCheckpoint(eager=True))
        n_docs = docs.count()
        row = {"replicas": rep, "n_vectors": n_docs}

        t0 = time.perf_counter()
        exact = dedup.cosine_near_duplicates(docs, threshold=THRESHOLD)
        n_exact = exact.count()
        row["quadratic_sec"] = round(time.perf_counter() - t0, 2)
        row["n_pairs_exact"] = n_exact

        t0 = time.perf_counter()
        lsh = dedup.cosine_lsh_near_duplicates(
            docs, planes, threshold=THRESHOLD, tables=TABLES, bits=BITS)
        n_lsh = lsh.count()
        row["lsh_sec"] = round(time.perf_counter() - t0, 2)
        row["n_pairs_lsh"] = n_lsh
        row["recall"] = round(n_lsh / n_exact, 4) if n_exact else None

        # candidate volume: what the bucket join generates pre-verify —
        # the quantity that must stay << n^2/2
        from server2_vector_search_server_spark.operators.ann import (
            hyperplane_bucket,
        )
        keyed = docs.select(
            "vec_id",
            *[hyperplane_bucket(F.col("embedding"),
                                planes[t * BITS:(t + 1) * BITS])
              .alias(f"b{t}") for t in range(TABLES)])
        buckets = keyed.select(
            "vec_id",
            F.posexplode(F.array(*[F.col(f"b{t}") for t in range(TABLES)]))
            .alias("tbl", "bucket"))
        sizes = buckets.groupBy("tbl", "bucket").count()
        n_cand = sizes.agg(F.sum(F.col("count") * (F.col("count") - 1) / 2)
                           .cast("long")).collect()[0][0]
        row["n_candidates"] = n_cand
        row["all_pairs"] = n_docs * (n_docs - 1) // 2
        results.append(row)
        print(json.dumps(row))
        spark.catalog.clearCache()

    print(json.dumps({"experiment": "cosine_lsh_vs_quadratic",
                      "threshold": THRESHOLD,
                      "tables": TABLES, "bits": BITS,
                      "results": results}))


if __name__ == "__main__":
    main()
