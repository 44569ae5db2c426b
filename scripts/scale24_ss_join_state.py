"""SCALE.md §24 experiment: stream-stream join state under eviction.

The interval join (`streaming_stream_stream_join`) is the most expensive
bench pillar; its defense is that the watermark + time-range condition lets
Spark EVICT both join states. This measures that claim directly: the sf0.1
events table is re-written as 20 time-ordered files and streamed 2 files
per micro-batch through

  * BOUNDED:   watermark 1 h  +  p_ts in [c_ts, c_ts + 30 min]   (the shipped shape)
  * UNBOUNDED: same watermark, same user-equality join, NO time-range bound

recording per-batch join-state rows (stateOperators.numRowsTotal) from the
streaming progress. Bounded must plateau at the watermark window; unbounded
must grow monotonically with every batch — the difference IS the reason the
range condition ships.

Run: python scripts/scale24_ss_join_state.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from server2_vector_search_server_spark.session import read_table

    spark = (SparkSession.builder.master("local[32]")
             .appName("scale24")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import Window

    src = tempfile.mkdtemp(prefix="ss_state_")
    # 20 time-ordered files => 10 micro-batches whose watermark advances
    (read_table(spark, sf_dir, "events")
     .withColumn("bucket", F.ntile(20).over(Window.orderBy("ts")))
     .write.partitionBy("bucket").mode("overwrite").parquet(src))
    # rename bucket dirs to plain sequential files for the file stream
    import glob
    import shutil
    flat = tempfile.mkdtemp(prefix="ss_state_flat_")
    for i, d in enumerate(sorted(glob.glob(f"{src}/bucket=*"),
                                 key=lambda p: int(p.split("=")[1]))):
        parts = sorted(glob.glob(f"{d}/*.parquet"))
        for j, p in enumerate(parts):
            shutil.copy(p, f"{flat}/{i:03d}_{j}.parquet")
        time.sleep(0.05)

    def run(bounded: bool):
        schema = ("event_id long, ts timestamp, user_id long, "
                  "event_type string, value double, props string, "
                  "bucket int")
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 2).parquet(flat))
        clicks = (stream.filter(F.col("event_type") == "click")
                  .select(F.col("user_id").alias("c_user"),
                          F.col("ts").alias("c_ts"))
                  .withWatermark("c_ts", "1 hour"))
        purchases = (stream.filter(F.col("event_type") == "purchase")
                     .select(F.col("user_id").alias("p_user"),
                             F.col("ts").alias("p_ts"))
                     .withWatermark("p_ts", "1 hour"))
        cond = "c_user = p_user AND p_ts >= c_ts"
        if bounded:
            cond += " AND p_ts <= c_ts + INTERVAL 30 MINUTES"
        joined = clicks.join(purchases, F.expr(cond))
        name = f"ss_state_{'b' if bounded else 'u'}_{int(time.time()*1e3)}"
        t0 = time.time()
        q = (joined.writeStream.format("memory").queryName(name)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()
        wall = round(time.time() - t0, 2)
        state = [
            {"batch": p["batchId"],
             "state_rows": p["stateOperators"][0]["numRowsTotal"],
             "evicted": p["stateOperators"][0]["numRowsRemoved"]}
            for p in q.recentProgress if p["stateOperators"]]
        pairs = spark.table(name).count()
        return {"wall_s": wall, "pairs": pairs, "state": state}

    out = {"bounded": run(True), "unbounded": run(False)}
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
