"""Round-11 A/B #6: shingle-containment rare-set via window-over-g vs the
r10 aggregate+join-back form (old arm inline).

Usage: PYTHONPATH=/root/repo python scripts/r11_ab6.py [passes]
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = int(sys.argv[1]) if len(sys.argv) > 1 else 7

from pyspark.sql import functions as F  # noqa: E402

from server2_vector_search_server_spark.plans.registry import tbl  # noqa: E402


def old_containment(spark, sf_dir):
    from server2_vector_search_server_spark.plans.quality_queries import (
        _CT_DF_CAP, _CT_GRAM, _CT_MIN_SHARED, _CT_N, _CT_THRESHOLD,
    )
    d = (tbl(spark, sf_dir, "documents")
         .filter(F.col("doc_id") < _CT_N)
         .select("doc_id", F.lower(F.col("text")).alias("t")))
    sh = (d.select(
              "doc_id",
              F.when(F.length("t") >= _CT_GRAM,
                     F.expr(f"transform(sequence(1, length(t) - "
                            f"{_CT_GRAM - 1}), "
                            f"i -> substring(t, i, {_CT_GRAM}))"))
              .otherwise(F.array()).alias("gs"))
          .select("doc_id", F.explode("gs").alias("g"))
          .distinct()
          .localCheckpoint(eager=True))
    df_ = sh.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    rare = (sh.join(df_.filter(F.col("df") <= _CT_DF_CAP), "g")
            .select("doc_id", "g"))
    ra = rare.select(F.col("doc_id").alias("doc_a"), "g")
    rb = rare.select(F.col("doc_id").alias("doc_b"), "g")
    cand = (ra.join(rb, "g")
            .filter(F.col("doc_a") != F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("n_rare_shared"))
            .filter(F.col("n_rare_shared") >= _CT_MIN_SHARED)
            .select("doc_a", "doc_b"))
    sz = sh.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("n"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), "g")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "g")
    shared = (cand.join(sa, "doc_a").join(sb, ["doc_b", "g"])
              .groupBy("doc_a", "doc_b")
              .agg(F.count(F.lit(1)).cast("long").alias("n_shared")))
    za = sz.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
    cont = (F.col("n_shared").cast("double")
            / F.col("n_a").cast("double"))
    return (shared.join(za, "doc_a")
            .filter(cont >= _CT_THRESHOLD)
            .select("doc_a", "doc_b", "n_shared", "n_a",
                    F.round(cont, 6).alias("containment"))
            .orderBy("doc_a", "doc_b"))


def main() -> None:
    from server2_vector_search_server_spark.plans import load_registry
    from server2_vector_search_server_spark.session import get_spark

    spark = get_spark("r11_ab6")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_registry()
    new = registry["dedup_shingle_containment"].fn

    o = [tuple(r) for r in old_containment(spark, SF_DIR).collect()]
    n = [tuple(r) for r in new(spark, SF_DIR).collect()]
    assert o == n, "results differ!"
    print(f"identity OK ({len(n)} rows)", file=sys.stderr)

    times: dict[str, list[float]] = {}
    for p in range(PASSES):
        arms = [("old", old_containment), ("new", new)]
        if p % 2:
            arms.reverse()
        for arm, fn in arms:
            spark.sparkContext.setJobDescription(f"r11ab6 {arm} p{p}")
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            times.setdefault(arm, []).append(time.perf_counter() - t0)
            spark.catalog.clearCache()
    mo = sorted(times["old"])[len(times["old"]) // 2]
    mn = sorted(times["new"])[len(times["new"]) // 2]
    print(json.dumps({"containment": {
        "old": round(mo, 3), "new": round(mn, 3),
        "delta_pct": round(100 * (mn - mo) / mo, 1),
        "old_runs": [round(r, 3) for r in times["old"]],
        "new_runs": [round(r, 3) for r in times["new"]]}}, indent=1))


if __name__ == "__main__":
    main()
