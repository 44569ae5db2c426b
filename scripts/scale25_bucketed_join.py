"""SCALE.md §25 experiment: bucketed co-located join vs shuffle join.

`tests/test_bucketing.py` proves the PLAN claim (bucketed tables join with
zero Exchange); this measures the runtime claim at a size where the
exchange matters: lineitem replicated 8× (4.8 M rows) joined to orders
(150 k) on the order key, as

  * plain parquet  → sort-merge join with BOTH sides exchanged
  * bucketed tables (16 buckets on the key, sorted) → zero-exchange join

Interleaved repeats (warm cache), medians reported — §22's lesson: never
trust a first-run delta.

Run: python scripts/scale25_bucketed_join.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (SparkSession.builder.master("local[32]")
             .appName("scale25")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "16g")
             .config("spark.sql.autoBroadcastJoinThreshold", "-1")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.warehouse.dir",
                     tempfile.mkdtemp(prefix="wh_"))
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    li = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
          .withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(7))))
          .drop("rep"))
    od = spark.read.parquet(f"{sf_dir}/orders.parquet")

    plain_li = tempfile.mkdtemp(prefix="plain_li_")
    plain_od = tempfile.mkdtemp(prefix="plain_od_")
    li.write.mode("overwrite").parquet(plain_li)
    od.write.mode("overwrite").parquet(plain_od)
    (li.write.mode("overwrite").bucketBy(16, "l_orderkey")
     .sortBy("l_orderkey").saveAsTable("li_b"))
    (od.write.mode("overwrite").bucketBy(16, "o_orderkey")
     .sortBy("o_orderkey").saveAsTable("od_b"))

    def join_agg(l, o):
        return (l.join(o, l["l_orderkey"] == o["o_orderkey"])
                .groupBy("o_orderpriority")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.sum("l_quantity").alias("q")))

    def run(variant: str) -> float:
        if variant == "plain":
            l = spark.read.parquet(plain_li)
            o = spark.read.parquet(plain_od)
        else:
            l, o = spark.table("li_b"), spark.table("od_b")
        t0 = time.time()
        join_agg(l, o).collect()
        return round(time.time() - t0, 2)

    # plan check: bucketed variant must have no Exchange before the join
    plan = (join_agg(spark.table("li_b"), spark.table("od_b"))
            ._jdf.queryExecution().executedPlan().toString())
    n_exchange = plan.count("Exchange hashpartitioning(l_orderkey") + \
        plan.count("Exchange hashpartitioning(o_orderkey")
    walls = {"plain": [], "bucketed": []}
    for _ in range(4):                      # interleaved, §22 lesson
        walls["plain"].append(run("plain"))
        walls["bucketed"].append(run("bucketed"))
    out = {
        "join_side_exchanges_bucketed": n_exchange,
        "plain_median_s": statistics.median(walls["plain"][1:]),
        "bucketed_median_s": statistics.median(walls["bucketed"][1:]),
        "runs": walls,
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
