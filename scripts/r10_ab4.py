"""Round-10 optimization A/B #4 (method: r10_ab1.py).

Pairs:
  mp   old 1-2 partition checkpoint residue  vs  new pre-spread checkpoint
       (events_matrix_profile_motif all-pairs nested-loop stream side)

Usage: PYTHONPATH=/root/repo python scripts/r10_ab4.py [passes]
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = int(sys.argv[1]) if len(sys.argv) > 1 else 5

from pyspark.sql import DataFrame, functions as F  # noqa: E402


def old_mp(spark, sf_dir) -> DataFrame:
    """Pre-batch-4 form: checkpoint without spreading — the nested-loop
    join's stream side inherits the 1-2 partition residue."""
    from pyspark.sql import Window

    from server2_vector_search_server_spark.plans.quality_queries import (
        _MP_EXCL, _MP_M, _MP_N, _MP_ORIGIN, _MP_TOPK,
    )
    from server2_vector_search_server_spark.plans.registry import tbl

    ev = tbl(spark, sf_dir, "events")
    origin_h = F.floor(
        F.unix_timestamp(F.lit(_MP_ORIGIN).cast("timestamp")) / 3600.0)
    raw = (ev.select((F.floor(F.unix_timestamp("ts") / 3600.0)
                      - origin_h).cast("long").alias("t"))
           .groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("n")))
    spine = spark.range(_MP_N).select(F.col("id").alias("t"))
    c = (spine.join(raw, "t", "left")
         .select("t", F.coalesce("n", F.lit(0)).cast("long").alias("n")))
    ser = c.agg(F.array_sort(F.collect_list(F.struct("t", "n"))).alias("p"))
    ser = ser.select(F.transform("p", lambda s: s["n"]).alias("a"))
    w = (ser.select(F.explode(
             F.sequence(F.lit(0), F.lit(_MP_N - _MP_M))).alias("i"), "a")
         .select("i", F.slice("a", F.col("i") + 1, _MP_M).alias("arr")))
    st = w.select(
        "i", "arr",
        F.aggregate("arr", F.lit(0).cast("long"),
                    lambda acc, x: acc + x).alias("s1"),
        F.aggregate("arr", F.lit(0).cast("long"),
                    lambda acc, x: acc + x * x).alias("s2"))
    nz = (st.filter(_MP_M * F.col("s2") - F.col("s1") * F.col("s1") > 0)
          .localCheckpoint(eager=True))
    a = nz.select(F.col("i").alias("i"), F.col("arr").alias("wa"),
                  F.col("s1").alias("s1a"), F.col("s2").alias("s2a"))
    b = nz.select(F.col("i").alias("j"), F.col("arr").alias("wb"),
                  F.col("s1").alias("s1b"), F.col("s2").alias("s2b"))
    dot = F.aggregate(F.zip_with("wa", "wb", lambda x, y: x * y),
                      F.lit(0).cast("long"), lambda acc, v: acc + v)
    d2 = F.round(
        2.0 * _MP_M * (F.lit(1.0) -
            (F.lit(float(_MP_M)) * dot
             - F.col("s1a").cast("double") * F.col("s1b").cast("double"))
            / F.sqrt((_MP_M * F.col("s2a")
                      - F.col("s1a") * F.col("s1a")).cast("double")
                     * (_MP_M * F.col("s2b")
                        - F.col("s1b") * F.col("s1b")).cast("double"))),
        6)
    pairs = (a.join(b, F.abs(F.col("i") - F.col("j")) >= _MP_EXCL)
             .select("i", "j", d2.alias("d2")))
    mp = (pairs.withColumn(
              "rn", F.row_number().over(
                  Window.partitionBy("i").orderBy("d2", "j")))
          .filter(F.col("rn") == 1))
    return (mp.select(F.col("i").cast("long").alias("i"),
                      F.col("j").cast("long").alias("j_nn"), "d2")
            .orderBy("d2", "i").limit(_MP_TOPK))


def new_mp(spark, sf_dir) -> DataFrame:
    from server2_vector_search_server_spark.plans import load_registry

    return load_registry()["events_matrix_profile_motif"].fn(spark, sf_dir)


def main() -> None:
    from server2_vector_search_server_spark.session import get_spark

    spark = get_spark("r10_ab4")
    spark.sparkContext.setLogLevel("ERROR")

    variants = {"mp_old": old_mp, "mp_new": new_mp}
    # identity check first: same rows either way
    rows = {}
    for name, fn in variants.items():
        rows[name] = [tuple(r) for r in fn(spark, SF_DIR).collect()]
    assert rows["mp_old"] == rows["mp_new"], "mp results differ!"
    print("identity OK:", len(rows["mp_old"]), "rows", file=sys.stderr)

    times: dict[str, list[float]] = {n: [] for n in variants}
    for p in range(PASSES):
        order = list(variants.items())
        if p % 2:
            order.reverse()
        for name, fn in order:
            spark.sparkContext.setJobDescription(f"ab4 {name} pass{p}")
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            times[name].append(time.perf_counter() - t0)
            spark.catalog.clearCache()
    out = {}
    for name, runs in times.items():
        med = sorted(runs)[len(runs) // 2]
        out[name] = {"median": round(med, 3),
                     "runs": [round(r, 3) for r in runs]}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
