"""Round-11 A/B #7: one-expr ivf_assign argmin + batch cell ranking vs
the Column-built forms (old ann module loaded from a HEAD worktree).

Usage: PYTHONPATH=/root/repo OLD_REPO=/tmp/r11_head \
       python scripts/r11_ab7.py [passes]
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OLD_REPO = os.environ.get("OLD_REPO", "/tmp/r11_head")
PASSES = int(sys.argv[1]) if len(sys.argv) > 1 else 7

from pyspark.sql import functions as F  # noqa: E402

from server2_vector_search_server_spark.plans.registry import tbl  # noqa: E402

spec = importlib.util.spec_from_file_location(
    "old_ann", os.path.join(
        OLD_REPO, "server2_vector_search_server_spark/operators/ann.py"))
old_ann = importlib.util.module_from_spec(spec)
spec.loader.exec_module(old_ann)


def old_ivf_batch(spark, sf_dir):
    import server2_vector_search_server_spark.plans.ann_queries as aq
    emb = tbl(spark, sf_dir, "embeddings")
    corpus = (emb.filter(F.col("vec_id") < aq._BATCH_CORPUS_N)
              .select("vec_id", "label", "embedding"))
    centroids = (emb.filter(F.col("vec_id") < aq._N_CENTROIDS)
                 .select(F.col("vec_id").alias("centroid_id"),
                         F.col("embedding").alias("centroid")))
    queries = (emb.filter((F.col("vec_id") >= aq._BATCH_Q_LO)
                          & (F.col("vec_id") < aq._BATCH_Q_HI))
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("query_vec")))
    out = old_ann.ivf_knn_batch(corpus, centroids, queries, k=5,
                                nprobe=aq._NPROBE)
    return (out.select("query_id", "vec_id", "label", "centroid_id",
                       "score")
            .orderBy("query_id", F.col("score").desc(), "vec_id"))


def main() -> None:
    from server2_vector_search_server_spark.plans import load_registry
    from server2_vector_search_server_spark.session import get_spark

    spark = get_spark("r11_ab7")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_registry()
    new_batch = registry["ann_ivf_batch_knn"].fn
    o = [tuple(r) for r in old_ivf_batch(spark, SF_DIR).collect()]
    n = [tuple(r) for r in new_batch(spark, SF_DIR).collect()]
    assert sorted(o) == sorted(n), "batch results differ!"
    print(f"identity OK: batch ({len(n)} rows)", file=sys.stderr)

    pairs = {"ivf_batch": (old_ivf_batch, new_batch)}
    times: dict[str, list[float]] = {}
    for p in range(PASSES):
        for key, (old, new) in pairs.items():
            arms = [("old", old), ("new", new)]
            if p % 2:
                arms.reverse()
            for arm, fn in arms:
                k = f"{key}:{arm}"
                spark.sparkContext.setJobDescription(f"r11ab7 {k} p{p}")
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop") \
                    .mode("overwrite").save()
                times.setdefault(k, []).append(time.perf_counter() - t0)
                spark.catalog.clearCache()
    out = {}
    for key in pairs:
        o = times[f"{key}:old"]
        n = times[f"{key}:new"]
        mo = sorted(o)[len(o) // 2]
        mn = sorted(n)[len(n) // 2]
        out[key] = {"old": round(mo, 3), "new": round(mn, 3),
                    "delta_pct": round(100 * (mn - mo) / mo, 1),
                    "old_runs": [round(r, 3) for r in o],
                    "new_runs": [round(r, 3) for r in n]}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
