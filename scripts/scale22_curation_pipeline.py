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

Methodology: each (N, repeat) runs in a FRESH python/JVM process
(cross-run JVM state — caches, JIT, heap shape — produced 10-40 s
one-off outliers when all Ns shared a session), and the reported
number is the MEDIAN of 3 repeats, same policy as bench.py.

Run:  python scripts/scale22_curation_pipeline.py [sf_dir]
      python scripts/scale22_curation_pipeline.py --single N [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

UI_PORT = 4049
REPEATS = 3
NS = (1, 10, 100)


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
    from pyspark.sql import functions as F

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
    from pyspark.sql import functions as F

    from server2_vector_search_server_spark.operators import dedup
    from server2_vector_search_server_spark.operators.text_analysis import (
        detect_language,
        gopher_rule_columns,
        pack_sequences,
        quality_score,
    )
    from server2_vector_search_server_spark.functions.text import tokens

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


def run_single(n: int, sf_dir: str) -> None:
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[32]")
             .appName(f"scale22-N{n}")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.driver.memory", "48g")
             .config("spark.ui.port", str(UI_PORT))
             .config("spark.ui.enabled", "true")
             .config("spark.ui.retainedStages", "5000")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text"))
    t0 = time.time()
    result = run_pipeline(spark, replicate(docs, n), measure_pairs=True)
    result["TOTAL_wall_s"] = round(time.time() - t0, 2)
    spark.stop()
    print("SCALE22_RESULT " + json.dumps(result))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    if args and args[0] == "--single":
        run_single(int(args[1]), args[2] if len(args) > 2
                   else "/root/testdata/sf0.1")
        return

    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    here = os.path.abspath(__file__)
    runs: dict[int, list[dict]] = {n: [] for n in NS}
    for rep in range(REPEATS):
        for n in NS:
            proc = subprocess.run(
                [sys.executable, here, "--single", str(n), sf_dir],
                capture_output=True, text=True, timeout=1800)
            lines = [ln for ln in proc.stdout.splitlines()
                     if ln.startswith("SCALE22_RESULT ")]
            if not lines:
                sys.stderr.write(proc.stderr[-2000:])
                raise RuntimeError(f"run N={n} rep={rep} produced no result")
            line = lines[-1]
            runs[n].append(json.loads(line.split(" ", 1)[1]))
            print(f"rep {rep} N={n}: "
                  f"{runs[n][-1]['TOTAL_wall_s']}s", flush=True)

    # median across repeats, per stage/metric; rows must agree exactly
    summary: dict[int, dict] = {}
    for n in NS:
        stages = runs[n][0].keys()
        summary[n] = {}
        for st in stages:
            if st == "TOTAL_wall_s":
                summary[n][st] = statistics.median(
                    r[st] for r in runs[n])
                continue
            rows = {r[st]["rows"] for r in runs[n]}
            assert len(rows) == 1, (n, st, rows)
            summary[n][st] = {
                k: (rows.pop() if k == "rows"
                    else statistics.median(r[st][k] for r in runs[n]))
                for k in runs[n][0][st]}
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
