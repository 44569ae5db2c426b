"""SCALE.md §22 experiment: end-to-end curation pipeline at 1×/10×/100×.

Composes the real operators (no test doubles) into the canonical
training-data curation pipeline

    lang-ID + quality/Gopher filter
      → exact dedup (hash groupBy)
      → fuzzy dedup (MinHash LSH, pairs-free bucket-min)
      → sequence packing (two-pass distributed prefix sum)

over the sf0.1 documents corpus replicated N× with planted duplicates
(per source doc and replica r>0: even r = byte-identical copy caught by
exact dedup, odd r = perturbed near-copy caught by fuzzy dedup), and
measures, per stage and per N: wall time, surviving rows, and shuffle
read/write bytes from the Spark status REST API.

The claim under test: NO stage goes quadratic in N — wall time and
shuffle volume must grow ~linearly even though the duplicate-cluster
size (the adversarial quantity for LSH) grows linearly with N. The
pairs-based LSH shape is measured alongside as the contrast: its
candidate volume is Σ bucket² and does go quadratic.

Run:  python scripts/scale22_curation_pipeline.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from server2_vector_search_server_spark.operators import dedup
from server2_vector_search_server_spark.operators.text_analysis import (
    detect_language,
    gopher_rule_columns,
    pack_sequences,
    quality_score,
)
from server2_vector_search_server_spark.functions.text import tokens

UI_PORT = 4049


def shuffle_totals() -> tuple[int, int]:
    """Total shuffle (read, write) bytes across all completed stages."""
    base = f"http://localhost:{UI_PORT}/api/v1"
    with urllib.request.urlopen(f"{base}/applications") as r:
        app_id = json.load(r)[0]["id"]
    with urllib.request.urlopen(f"{base}/applications/{app_id}/stages"
                                f"?status=complete") as r:
        stages = json.load(r)
    return (sum(s.get("shuffleReadBytes", 0) for s in stages),
            sum(s.get("shuffleWriteBytes", 0) for s in stages))


def replicate(docs, n: int):
    """N× corpus with planted duplicates: replica 0 original, even
    replicas exact copies, odd replicas near-copies (unique suffix)."""
    base_n = docs.count()
    reps = docs.withColumn("replica",
                           F.explode(F.sequence(F.lit(0), F.lit(n - 1))))
    out = reps.select(
        (F.col("doc_id") + F.col("replica") * base_n).alias("doc_id"),
        F.when(F.col("replica") % 2 == 1,
               F.concat("text", F.lit(" rr"),
                        F.col("replica").cast("string")))
        .otherwise(F.col("text")).alias("text"))
    # The sf0.1 fixture is ONE parquet file -> one input split; without this
    # the whole narrow pipeline (explode -> filter -> broadcast semi-join)
    # runs on a single core (first measured run: N=10 fuzzy dedup SLOWER
    # than N=100, because only N=100 tipped a join into a shuffle that
    # re-parallelized it). A real 100 TB corpus arrives as tens of
    # thousands of splits; model that explicitly.
    return out.repartition(64, "doc_id")


def run_pipeline(spark, docs, *, measure_pairs: bool):
    out = {}

    def stage(name, df):
        t0 = time.time()
        r0, w0 = shuffle_totals()
        df = df.persist()
        rows = df.count()
        r1, w1 = shuffle_totals()
        out[name] = {"rows": rows, "wall_s": round(time.time() - t0, 2),
                     "shuffle_read_mb": round((r1 - r0) / 1e6, 1),
                     "shuffle_write_mb": round((w1 - w0) / 1e6, 1)}
        return df

    corpus = stage("replicate", docs)

    gopher_keep = gopher_rule_columns(F.col("text"))[-1]  # 'keep' verdict
    filtered = stage("filter", corpus.filter(
        (detect_language(F.col("text")) == "en")
        & (quality_score(F.col("text")) > 0.2)
        & gopher_keep))

    exact = stage("exact_dedup", dedup.drop_exact_duplicates(filtered))

    fuzzy = stage("fuzzy_dedup",
                  dedup.drop_minhash_near_duplicates(exact))

    toks = fuzzy.select("doc_id", F.size(tokens(F.col("text")))
                        .cast("long").alias("n_tokens"))
    packed = pack_sequences(toks, budget=512, distributed=True)
    t0 = time.time()
    n_seqs = packed.select("seq_id").distinct().count()
    out["pack"] = {"rows": n_seqs,
                   "wall_s": round(time.time() - t0, 2)}

    if measure_pairs:
        t0 = time.time()
        sigs = dedup.add_minhash(exact).select("doc_id", "minhash").persist()
        n_pairs = dedup.minhash_candidate_pairs(sigs).count()
        out["CONTRAST_pair_candidates"] = {
            "rows": n_pairs, "wall_s": round(time.time() - t0, 2)}
        sigs.unpersist()

    for df in (corpus, filtered, exact, fuzzy):
        df.unpersist()
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (SparkSession.builder.master("local[32]")
             .appName("scale22")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.driver.memory", "48g")
             .config("spark.ui.port", str(UI_PORT))
             .config("spark.ui.enabled", "true")
             .config("spark.ui.retainedStages", "5000")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text"))

    results = {}
    for n in (1, 10, 100):
        t0 = time.time()
        results[n] = run_pipeline(spark, replicate(docs, n),
                                  measure_pairs=(n <= 100))
        results[n]["TOTAL_wall_s"] = round(time.time() - t0, 2)
        print(f"\n=== N={n} ===")
        print(json.dumps(results[n], indent=2))

    print("\n=== summary (linearity check) ===")
    for metric in ("TOTAL_wall_s",):
        vals = {n: results[n][metric] for n in results}
        print(metric, vals)
    spark.stop()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
