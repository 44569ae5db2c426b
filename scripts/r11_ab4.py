"""Round-11 A/B #4: dedup_embedding_cosine_lsh — in-plan hyperplane frame
vs the r10 collect()+createDataFrame round trip.

Usage: PYTHONPATH=/root/repo python scripts/r11_ab4.py [passes]
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = int(sys.argv[1]) if len(sys.argv) > 1 else 7

from pyspark.sql import functions as F  # noqa: E402

from server2_vector_search_server_spark.operators import dedup  # noqa: E402
from server2_vector_search_server_spark.plans.registry import tbl  # noqa: E402


def old_lsh(spark, sf_dir):
    from server2_vector_search_server_spark.plans.dedup_queries import (
        _LSH_N, _LSH_PILLAR_BITS, _LSH_TABLES, _LSH_THRESHOLD,
    )
    bits, n, threshold = _LSH_PILLAR_BITS, _LSH_N, _LSH_THRESHOLD
    emb = tbl(spark, sf_dir, "embeddings")
    planes = [r["embedding"] for r in
              emb.filter(F.col("vec_id") < _LSH_TABLES * bits)
              .orderBy("vec_id").collect()]
    base = emb.filter(F.col("vec_id") < n).select("vec_id", "embedding")
    both = base.select(
        F.explode(F.array(F.col("vec_id"),
                          F.col("vec_id") + 20000)).alias("vec_id"),
        "embedding")
    return dedup.cosine_lsh_near_duplicates(
        both, planes, threshold=threshold,
        tables=_LSH_TABLES, bits=bits)


def main() -> None:
    from server2_vector_search_server_spark.plans import load_registry
    from server2_vector_search_server_spark.session import get_spark

    spark = get_spark("r11_ab4")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_registry()
    new = registry["dedup_embedding_cosine_lsh"].fn

    o = [tuple(r) for r in old_lsh(spark, SF_DIR).collect()]
    n = [tuple(r) for r in new(spark, SF_DIR).collect()]
    assert sorted(o) == sorted(n), "results differ!"
    print(f"identity OK ({len(n)} rows)", file=sys.stderr)

    times: dict[str, list[float]] = {}
    for p in range(PASSES):
        arms = [("old", old_lsh), ("new", new)]
        if p % 2:
            arms.reverse()
        for arm, fn in arms:
            spark.sparkContext.setJobDescription(f"r11ab4 {arm} p{p}")
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            times.setdefault(arm, []).append(time.perf_counter() - t0)
            spark.catalog.clearCache()
    out = {}
    mo = sorted(times["old"])[len(times["old"]) // 2]
    mn = sorted(times["new"])[len(times["new"]) // 2]
    out["lsh"] = {"old": round(mo, 3), "new": round(mn, 3),
                  "delta_pct": round(100 * (mn - mo) / mo, 1),
                  "old_runs": [round(r, 3) for r in times["old"]],
                  "new_runs": [round(r, 3) for r in times["new"]]}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
