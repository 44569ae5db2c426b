"""SCALE.md §31 experiment: distinct counting at 10 M rows — exact
count_distinct vs HLL sketch, and the rollup reaggregation trade.

Two claims to measure on a 100×-replicated events table (10 M rows,
150 k distinct users after replication-salting):

  1. A single global COUNT(DISTINCT) shuffles every distinct value to one
     aggregation; hll_sketch_agg shuffles one ~KB sketch per partition.
  2. Rollup reuse: with per-(event_type) sketches STORED, any coarser grain
     (global) is a sketch merge — no rescan. The exact path must rescan the
     raw table per grain.

Run: python scripts/scale31_sketch_rollup.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REP = 100


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (SparkSession.builder.master("local[32]")
             .appName("scale31")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # salt users per replica so cardinality scales with the data (100×
    # rows of the SAME 1 500 users would flatter the sketch)
    big = (ev.withColumn("rep", F.explode(F.sequence(F.lit(0),
                                                     F.lit(REP - 1))))
           .select((F.col("user_id") + F.col("rep") * 1_000_000)
                   .alias("user_id"), "event_type")
           .repartition(64)
           .localCheckpoint(eager=True))
    n = big.count()

    def timed(fn, reps=3):
        walls = []
        for _ in range(reps):
            t = time.time()
            fn()
            walls.append(round(time.time() - t, 2))
        return statistics.median(walls), walls

    exact_med, exact_runs = timed(
        lambda: big.agg(F.count_distinct("user_id")).collect())
    hll_med, hll_runs = timed(
        lambda: big.agg(F.hll_sketch_estimate(
            F.hll_sketch_agg("user_id"))).collect())

    # rollup: per-type sketches materialized once, then the global grain is
    # a 5-row merge vs the exact path's full second scan
    per_type = (big.groupBy("event_type")
                .agg(F.hll_sketch_agg("user_id").alias("sk"))
                .localCheckpoint(eager=True))
    merge_med, merge_runs = timed(
        lambda: per_type.agg(F.hll_sketch_estimate(
            F.hll_union_agg("sk"))).collect())
    exact2_med, exact2_runs = timed(
        lambda: big.agg(F.count_distinct("user_id")).collect())

    est = big.agg(F.hll_sketch_estimate(
        F.hll_sketch_agg("user_id")).alias("e")).collect()[0]["e"]
    exact = big.agg(F.count_distinct("user_id").alias("e")
                    ).collect()[0]["e"]
    print(json.dumps({
        "rows": n,
        "exact_distinct": int(exact),
        "hll_estimate": int(est),
        "rel_error": round(abs(est - exact) / exact, 4),
        "exact_scan_median_s": exact_med,
        "hll_scan_median_s": hll_med,
        "rollup_merge_median_s": merge_med,
        "exact_rescan_median_s": exact2_med,
        "runs": {"exact": exact_runs, "hll": hll_runs,
                 "merge": merge_runs, "exact2": exact2_runs},
    }, indent=2))


if __name__ == "__main__":
    main()
