"""SCALE.md §66: the round-9-continuation family at 1× (sf0.1) vs 10×
(§53 synthetic corpus) — experimentation stats, governance screen,
ray-cast zone join, bucketed co-located join, dialect rollups.

All of these reduce onto DOMAIN-bounded tables (2 groups, ≤120 cells,
QI×7 cells, 3 polygons, 5 priorities, 6 buckets), so the prediction is
scan-bound ~linear walls with constant-size reduce sides; the bucketed
join additionally pays its one-time layout write (memoized out of the
timed runs, as in the bench).

Usage: PYTHONPATH=/root/repo python scripts/scale66_experiment_family.py
Writes /tmp/scale66.json and prints one summary line per query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from server2_vector_search_server_spark.plans import load_registry  # noqa: E402

QUERIES = [
    "events_welch_ttest",
    "events_fdr_bh_adjust",
    "events_cuped_variance_reduction",
    "documents_t_closeness_screen",
    "geo_point_in_polygon_join",
    "store_bucketed_join_colocation",
    "sql_pipe_syntax",
    "sql_udf_functions",
    "multimodal_audio_resample",
]

SFS = [("1x", os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")),
       ("10x", os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/sf1_synth"))]


def main() -> None:
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.driver.memory", "12g")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_registry()
    out: dict[str, dict[str, float]] = {}
    for name in QUERIES:
        rq = reg[name]
        out[name] = {}
        for label, sf in SFS:
            if not os.path.isdir(sf) and not os.path.exists(sf):
                continue
            # warm-up builds memoized artifacts (bucketed layout) untimed
            rq.fn(spark, sf).write.format("noop").mode("overwrite").save()
            walls = []
            for _ in range(2):
                t0 = time.time()
                rq.fn(spark, sf).write.format("noop").mode("overwrite").save()
                walls.append(time.time() - t0)
            out[name][label] = round(min(walls), 3)
        r1, r10 = out[name].get("1x"), out[name].get("10x")
        ratio = round(r10 / r1, 2) if r1 and r10 else None
        print(f"{name}: 1x={r1}s 10x={r10}s ratio={ratio}", flush=True)
    with open("/tmp/scale66.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote /tmp/scale66.json")


if __name__ == "__main__":
    main()
