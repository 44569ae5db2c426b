"""SCALE.md §34 experiment: SimHash pair generation — Manku segment
blocking vs the all-pairs cross join.

The claim in operators/dedup.simhash_near_duplicates is that segment
blocking turns the candidate step into an equi-join whose shuffle is
∝ docs × (max_hamming+1) block keys, while the cross join is docs² no
matter what — with IDENTICAL output (pigeonhole recall 1.0). This runs
both shapes over growing document counts and reports wall time, pair
counts, and the equality check.

Run: python scripts/scale34_simhash_blocking.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES = [500, 1000, 2000, 4000]


def _cross_join_pairs(dedup, F, docs, max_hamming=3):
    """The pre-round-4 shape, reproduced here for the comparison."""
    s = (docs.select(F.col("doc_id").alias("id"),
                     dedup.simhash(F.col("text")).alias("sh"))
         .localCheckpoint(eager=True))
    a = s.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = s.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    return (a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
            .withColumn("hamming",
                        F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from server2_vector_search_server_spark.operators import dedup

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (SparkSession.builder.master("local[32]")
             .appName("scale34")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    results = []
    for n in SIZES:
        docs = base.filter(F.col("doc_id") < n).select("doc_id", "text")

        t0 = time.perf_counter()
        blocked = dedup.simhash_near_duplicates(docs, max_hamming=3)
        blocked_rows = blocked.count()
        t_blocked = time.perf_counter() - t0

        t0 = time.perf_counter()
        crossed = _cross_join_pairs(dedup, F, docs)
        crossed_rows = crossed.count()
        t_cross = time.perf_counter() - t0

        same = (blocked.exceptAll(crossed).isEmpty()
                and crossed.exceptAll(blocked).isEmpty())
        results.append({"n_docs": n, "pairs": blocked_rows,
                        "blocked_sec": round(t_blocked, 3),
                        "cross_sec": round(t_cross, 3),
                        "identical": same and blocked_rows == crossed_rows})
        print(json.dumps(results[-1]))

    print(json.dumps({"experiment": "simhash_blocking", "runs": results}))
    spark.stop()




def sparse_experiment() -> None:
    """The realistic regime: a mostly-UNIQUE corpus with a few planted
    near-dups (web-crawl shape after exact dedup). Here the answer is
    sparse, so candidate volume — not output — dominates, and blocking's
    advantage is visible in wall time, not just shuffle accounting.

    Run: python scripts/scale34_simhash_blocking.py --sparse [n_docs]
    """
    import random

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from server2_vector_search_server_spark.operators import dedup

    n = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
    spark = (SparkSession.builder.master("local[32]")
             .appName("scale34_sparse")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import hashlib

    rng = random.Random(42)
    # md5-derived words: a sequential "wNNNN" vocabulary is adversarial
    # for the 31-poly token hash (only low bits vary -> bit votes
    # correlate -> fingerprints cluster and the corpus isn't sparse at
    # all); hex-diverse words give near-uniform hash bits like real text
    vocab = [hashlib.md5(str(i).encode()).hexdigest()[:8]
             for i in range(5000)]
    rows = []
    for i in range(n):
        words = [vocab[rng.randrange(len(vocab))] for _ in range(40)]
        rows.append((i, " ".join(words)))
        if i % 200 == 0:                       # ~0.5% planted near-dups
            mutated = list(words)
            mutated[3] = vocab[rng.randrange(len(vocab))]
            rows.append((i + n, " ".join(mutated)))
    docs = spark.createDataFrame(rows, "doc_id long, text string") \
        .repartition(32).localCheckpoint(eager=True)

    t0 = time.perf_counter()
    blocked = dedup.simhash_near_duplicates(docs, max_hamming=3)
    blocked_rows = blocked.count()
    t_blocked = time.perf_counter() - t0

    t0 = time.perf_counter()
    crossed = _cross_join_pairs(dedup, F, docs)
    crossed_rows = crossed.count()
    t_cross = time.perf_counter() - t0

    same = (blocked.exceptAll(crossed).isEmpty()
            and crossed.exceptAll(blocked).isEmpty())
    print(json.dumps({
        "experiment": "simhash_blocking_sparse", "n_docs": len(rows),
        "pairs": blocked_rows, "blocked_sec": round(t_blocked, 3),
        "cross_sec": round(t_cross, 3),
        "identical": same and blocked_rows == crossed_rows}))
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--sparse":
        sparse_experiment()
    else:
        main()
