"""SCALE experiment 48: the df-cap valve in shingle-containment dedup.

Question: candidate generation joins the rare-shingle inverted index with
itself — shuffle is sum(df^2) over shingles below the cap. How does the
cap trade candidate volume (the scale cost) against recall of true
high-containment pairs (the quality cost) on the sf0.1 corpus (5,000
docs)? And what does the UNCAPPED join cost?

Run: PYTHONPATH=/root/repo python scripts/scale48_containment_valve.py
"""

import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

GRAM = 8
MIN_SHARED = 3
THRESHOLD = 0.9

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", "48g")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

docs = (spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        .select("doc_id", F.lower(F.col("text")).alias("t")))
sh = (docs.select(
          "doc_id",
          F.when(F.length("t") >= GRAM,
                 F.expr(f"transform(sequence(1, length(t) - {GRAM - 1}), "
                        f"i -> substring(t, i, {GRAM}))"))
          .otherwise(F.array()).alias("gs"))
      .select("doc_id", F.explode("gs").alias("g"))
      .distinct().localCheckpoint(eager=True))
n_postings = sh.count()
df_ = sh.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
df_ = df_.localCheckpoint(eager=True)
print(f"postings={n_postings}  distinct shingles={df_.count()}")

sz = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
sz = sz.localCheckpoint(eager=True)


def run(cap):
    t0 = time.time()
    rare = (sh.join(df_.filter(F.col("df") <= cap), "g")
            .select("doc_id", "g")) if cap else sh
    ra = rare.select(F.col("doc_id").alias("a"), "g")
    rb = rare.select(F.col("doc_id").alias("b"), "g")
    cand = (ra.join(rb, "g").filter(F.col("a") != F.col("b"))
            .groupBy("a", "b").agg(F.count(F.lit(1)).alias("ns"))
            .filter(F.col("ns") >= MIN_SHARED).select("a", "b"))
    cand = cand.localCheckpoint(eager=True)
    n_cand = cand.count()
    sa = sh.select(F.col("doc_id").alias("a"), "g")
    sb = sh.select(F.col("doc_id").alias("b"), "g")
    shared = (cand.join(sa, "a").join(sb, ["b", "g"])
              .groupBy("a", "b").agg(F.count(F.lit(1)).alias("n_shared")))
    za = sz.select(F.col("doc_id").alias("a"), F.col("n").alias("na"))
    hits = (shared.join(za, "a")
            .filter(F.col("n_shared").cast("double")
                    / F.col("na").cast("double") >= THRESHOLD))
    pairs = {(r["a"], r["b"]) for r in hits.collect()}
    wall = time.time() - t0
    return n_cand, pairs, wall


# sum(df^2) — the predicted candidate-join volume per cap — and why the
# UNCAPPED join is never run: common shingles ("the ", "tion ") have
# df ~ corpus size, so no-cap volume is ~n^2 x shingle overlap (measured
# >10^9 rows here; the first attempt at an uncapped ground truth blew the
# 10-minute budget). Ground truth for recall = the largest practical cap.
for cap in (200, 50, 20, 10, 5):
    vol = (df_.filter(F.col("df") <= cap)
           .agg(F.sum(F.col("df") * F.col("df"))).first()[0])
    print(f"cap={cap:>4}  predicted join rows sum(df^2) = {vol:,}")
vol_all = df_.agg(F.sum(F.col("df") * F.col("df"))).first()[0]
print(f"cap=NONE  predicted join rows sum(df^2) = {vol_all:,}")

base_cand, base_pairs, base_wall = run(200)
print(f"cap= 200  candidates={base_cand:>8}  hits={len(base_pairs):>4}  "
      f"wall={base_wall:6.1f}s  (recall reference)")
for cap in (50, 20, 10, 5):
    n_cand, pairs, wall = run(cap)
    rec = len(pairs & base_pairs) / max(1, len(base_pairs))
    print(f"cap={cap:>4}  candidates={n_cand:>8}  hits={len(pairs):>4}  "
          f"recall={rec:.3f}  wall={wall:6.1f}s")
