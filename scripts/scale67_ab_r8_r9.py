"""SCALE §67 runner: alternating fresh-JVM A/B of the r8-final checkout vs
the current tree over the round-9 worst bench movers (VERDICT r9 #1b).

One invocation = ONE variant ONE pass: a fresh JVM runs every pillar once
and prints a JSON line of walls.  The driver loop (scale67_ab_driver.sh
inline below in SCALE.md) alternates variants so ambient co-tenant load
lands on both equally, then medians across passes — the §59 admissible
method; raw BENCH ratios across rounds are not evidence on this fleet.

Usage: PYTHONPATH=<tree> python scripts/scale67_ab_r8_r9.py <label>
"""

import json
import os
import sys
import time

PILLARS = [
    "events_cohort_retention",
    "text_bm25_topk",
    "events_session_window",
    "events_funnel_conversion",
    "customer_order_distribution",
    "search_score_topk",          # control: untouched zero-exchange scan
]

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    label = sys.argv[1] if len(sys.argv) > 1 else "unlabeled"
    from pyspark.sql import SparkSession, functions as F

    from server2_vector_search_server_spark.plans import load_registry

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_registry()

    warm = spark.read.parquet(os.path.join(SF_DIR, "region.parquet"))
    warm.join(warm.selectExpr("r_regionkey as k"),
              warm.r_regionkey == F.col("k")) \
        .groupBy("r_name").count() \
        .write.format("noop").mode("overwrite").save()

    walls = {}
    for name in PILLARS:
        rq = registry.get(name)
        if rq is None:
            continue
        t0 = time.perf_counter()
        rq.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        walls[name] = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
    print(json.dumps({"label": label, "loadavg": round(os.getloadavg()[0], 2),
                      "walls": walls}))
    spark.stop()


if __name__ == "__main__":
    main()
