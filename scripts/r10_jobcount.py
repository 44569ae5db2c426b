"""Round-10 structural profile: jobs/stages/tasks per pillar.

Sets a job group per query, runs it once to the noop sink, and reports how
many Spark jobs/stages it scheduled — multi-action pillars (collect loops,
eager checkpoints) show up as high job counts; deep-DAG pillars as high
stage counts. Wall is single-shot (indicative only).

Usage: PYTHONPATH=/root/repo python scripts/r10_jobcount.py name [name...]
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    from pyspark.sql import functions as F

    from server2_vector_search_server_spark.plans import load_registry
    from server2_vector_search_server_spark.session import get_spark

    spark = get_spark("r10_jobcount")
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    reg = load_registry()

    warm = spark.read.parquet(os.path.join(SF_DIR, "region.parquet"))
    warm.groupBy("r_name").count() \
        .write.format("noop").mode("overwrite").save()
    from server2_vector_search_server_spark.plans.graph_queries import (
        shipment_silver,
    )
    shipment_silver(spark, SF_DIR)

    tracker = sc.statusTracker()
    out = {}
    for name in names:
        rq = reg.get(name)
        if rq is None:
            continue
        group = f"prof_{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        rq.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 3)
        sc.setJobGroup(None, None)
        jobs = tracker.getJobIdsForGroup(group)
        n_stages = 0
        n_tasks = 0
        for j in jobs:
            ji = tracker.getJobInfo(j)
            if ji is None:
                continue
            for s in ji.stageIds:
                si = tracker.getStageInfo(s)
                if si is not None:
                    n_stages += 1
                    n_tasks += si.numTasks
        out[name] = {"wall": wall, "jobs": len(jobs),
                     "stages": n_stages, "tasks": n_tasks}
        print(f"{name}: {wall}s jobs={len(jobs)} stages={n_stages} "
              f"tasks={n_tasks}", file=sys.stderr)
        spark.catalog.clearCache()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
