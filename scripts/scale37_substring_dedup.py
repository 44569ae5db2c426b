"""SCALE §37 experiment: windowed ExactSubstr dedup cost vs corpus size.

A mostly-unique corpus (hex-diverse vocabulary, like scale34's sparse mode)
with ~1% planted partial copies (each copy shares a 40-token run with its
source — the "quoted paragraph" shape substring dedup exists to catch and
document-level MinHash misses when the rest of the doc differs).

Run: python scripts/scale37_substring_dedup.py [n_docs ...]
Prints one JSON line per corpus size: window count, duplicated-window
groups, pair/span wall seconds.
"""

from __future__ import annotations

import hashlib
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import SparkSession

    from server2_vector_search_server_spark.operators import dedup

    sizes = [int(a) for a in sys.argv[1:]] or [20000, 80000]
    spark = (SparkSession.builder.master("local[32]")
             .appName("scale37_substring")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    vocab = [hashlib.md5(str(i).encode()).hexdigest()[:8]
             for i in range(5000)]

    for n in sizes:
        rng = random.Random(42)
        rows = []
        for i in range(n):
            words = [vocab[rng.randrange(len(vocab))] for _ in range(120)]
            rows.append((i, " ".join(words)))
            if i % 100 == 0:
                # partial copy: 40 shared tokens inside otherwise-new text
                shared = words[30:70]
                fresh = [vocab[rng.randrange(len(vocab))] for _ in range(80)]
                rows.append((i + n, " ".join(fresh[:40] + shared
                                             + fresh[40:])))
        docs = (spark.createDataFrame(rows, "doc_id long, text string")
                .repartition(32).localCheckpoint(eager=True))

        t0 = time.perf_counter()
        pairs = dedup.substring_duplicate_pairs(docs, window_tokens=8)
        n_pairs = pairs.count()
        t_pairs = time.perf_counter() - t0

        t0 = time.perf_counter()
        spans = dedup.substring_duplicate_spans(docs, window_tokens=8)
        n_spans = spans.count()
        t_spans = time.perf_counter() - t0

        # positioning vs document-level MinHash: a 40-of-120-token shared
        # run is Jaccard ~0.2 at the document level — below any sane
        # near-dup threshold — so the planted partial copies are invisible
        # to whole-document fuzzy dedup by construction. Count what each
        # method finds.
        t0 = time.perf_counter()
        mh = dedup.minhash_near_duplicates(docs, threshold=0.5)
        n_minhash = mh.count()
        t_minhash = time.perf_counter() - t0

        print(json.dumps({
            "experiment": "substring_dedup", "n_docs": len(rows),
            "pairs": n_pairs, "spans": n_spans,
            "minhash_pairs_at_0.5": n_minhash,
            "pairs_sec": round(t_pairs, 3),
            "spans_sec": round(t_spans, 3),
            "minhash_sec": round(t_minhash, 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
