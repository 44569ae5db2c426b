"""Round-11 A/B #5: hyperplane_bucket one-expr form vs the per-plane
Column loop (old operator module loaded from the r10 checkout).

Usage: PYTHONPATH=/root/repo OLD_REPO=/tmp/r11_old python scripts/r11_ab5.py [passes]
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OLD_REPO = os.environ.get("OLD_REPO", "/tmp/r11_old")
PASSES = int(sys.argv[1]) if len(sys.argv) > 1 else 7

from pyspark.sql import functions as F  # noqa: E402

from server2_vector_search_server_spark.plans.registry import tbl  # noqa: E402

spec = importlib.util.spec_from_file_location(
    "old_ann", os.path.join(
        OLD_REPO, "server2_vector_search_server_spark/operators/ann.py"))
old_ann = importlib.util.module_from_spec(spec)
spec.loader.exec_module(old_ann)


def old_multiprobe(spark, sf_dir):
    import server2_vector_search_server_spark.plans.ann_queries as aq
    emb = tbl(spark, sf_dir, "embeddings")
    hyperplanes = [r["embedding"] for r in
                   emb.filter(F.col("vec_id") < aq._N_HYPER)
                   .orderBy("vec_id").collect()]
    return old_ann.hyperplane_knn(
        emb, aq._vec(spark, sf_dir, aq._QUERY_ID), hyperplanes, k=5,
        n_probe_flips=aq._N_FLIPS).drop("bucket")


def main() -> None:
    from server2_vector_search_server_spark.plans import load_registry
    from server2_vector_search_server_spark.session import get_spark

    spark = get_spark("r11_ab5")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_registry()
    new = registry["ann_hyperplane_multiprobe_knn"].fn

    o = [tuple(r) for r in old_multiprobe(spark, SF_DIR).collect()]
    n = [tuple(r) for r in new(spark, SF_DIR).collect()]
    assert sorted(o) == sorted(n), "results differ!"
    print(f"identity OK ({len(n)} rows)", file=sys.stderr)

    times: dict[str, list[float]] = {}
    for p in range(PASSES):
        arms = [("old", old_multiprobe), ("new", new)]
        if p % 2:
            arms.reverse()
        for arm, fn in arms:
            spark.sparkContext.setJobDescription(f"r11ab5 {arm} p{p}")
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            times.setdefault(arm, []).append(time.perf_counter() - t0)
            spark.catalog.clearCache()
    mo = sorted(times["old"])[len(times["old"]) // 2]
    mn = sorted(times["new"])[len(times["new"]) // 2]
    print(json.dumps({"multiprobe": {
        "old": round(mo, 3), "new": round(mn, 3),
        "delta_pct": round(100 * (mn - mo) / mo, 1),
        "old_runs": [round(r, 3) for r in times["old"]],
        "new_runs": [round(r, 3) for r in times["new"]]}}, indent=1))


if __name__ == "__main__":
    main()
