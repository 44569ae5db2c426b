"""SCALE.md §23 experiment: Python DataSource throughput vs JVM generation.

Same corpus (the synthetic_docs row contract), two producers:

  * the Python DataSource (sources/synthetic.py) — rows generated in Python
    worker processes, Arrow-batched back to the JVM;
  * the pure-JVM equivalent — spark.range + the identical text construction
    as codegen'd expressions (concat / transform / sequence).

Measures end-to-end wall for a full-corpus aggregate at increasing N in a
fresh process per (variant, N, repeat); prints medians. The point is a
COST MODEL for Python sources: what per-row tax you pay for the
connectivity convenience, and when to promote a source to JVM expressions.

Run: python scripts/scale23_python_source.py
     python scripts/scale23_python_source.py --single <variant> <n>
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NS = (100_000, 1_000_000)
REPEATS = 3


def jvm_corpus(spark, n: int):
    from pyspark.sql import functions as F

    d = F.col("id")
    k = (F.lit(5) + d % 10).cast("int")
    words = F.transform(
        F.sequence(F.lit(0), k - 1),
        lambda i: F.concat(F.lit("w"), ((d * 31 + i * 7) % 97)
                           .cast("string")))
    text = F.concat(F.lit("doc "), d.cast("string"), F.lit(" "),
                    F.array_join(words, " "))
    return (spark.range(0, n, 1, 64)
            .select(d.alias("doc_id"), text.alias("text"))
            .select("doc_id", "text", F.length("text").alias("n_chars")))


def py_corpus(spark, n: int):
    from server2_vector_search_server_spark.sources import synthetic

    synthetic.register(spark)
    return (spark.read.format("synthetic_docs")
            .option("n", str(n)).option("parts", "64").load()
            .select("doc_id", "text", "n_chars"))


def run_single(variant: str, n: int) -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (SparkSession.builder.master("local[32]")
             .appName(f"scale23-{variant}-{n}")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    df = (py_corpus if variant == "py" else jvm_corpus)(spark, n)
    t0 = time.time()
    out = df.agg(F.count(F.lit(1)).alias("n"),
                 F.sum("n_chars").alias("chars"),
                 F.sum(F.length("text")).alias("chars2")).collect()[0]
    wall = time.time() - t0
    assert out["n"] == n and out["chars"] == out["chars2"]
    spark.stop()
    print(f"SCALE23_RESULT {json.dumps({'wall_s': round(wall, 2)})}")


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--single":
        run_single(sys.argv[2], int(sys.argv[3]))
        return
    here = os.path.abspath(__file__)
    out: dict[str, dict[int, float]] = {}
    for variant in ("py", "jvm"):
        out[variant] = {}
        for n in NS:
            walls = []
            for _ in range(REPEATS):
                proc = subprocess.run(
                    [sys.executable, here, "--single", variant, str(n)],
                    capture_output=True, text=True, timeout=900)
                line = [ln for ln in proc.stdout.splitlines()
                        if ln.startswith("SCALE23_RESULT ")]
                if not line:
                    sys.stderr.write(proc.stderr[-1500:])
                    raise RuntimeError(f"{variant} n={n} failed")
                walls.append(json.loads(line[-1].split(" ", 1)[1])["wall_s"])
            out[variant][n] = statistics.median(walls)
            print(f"{variant} n={n}: median {out[variant][n]}s "
                  f"(runs {walls})", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
