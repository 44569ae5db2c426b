"""Round-10 optimization A/B #3 (method: r10_ab1.py).

Pairs:
  lossy  old per-round eager checkpoints      vs new lazily-chained 6 rounds
  cdc    old 4x-recomputed chunk digests      vs new checkpointed chunk table

Usage: PYTHONPATH=/root/repo python scripts/r10_ab3.py [passes]
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = int(sys.argv[1]) if len(sys.argv) > 1 else 5

from pyspark.sql import DataFrame, functions as F  # noqa: E402


def old_lossy(spark, sf_dir) -> DataFrame:
    from server2_vector_search_server_spark.plans.registry import tbl
    from server2_vector_search_server_spark.plans.sketch_queries import (
        _LC_DAYS_PER_BUCKET, _LC_ROUNDS,
    )

    ev = tbl(spark, sf_dir, "events")
    min_day = ev.agg(F.min(F.to_date("ts")).alias("d0"))
    cnt = (ev.join(F.broadcast(min_day))
           .select((F.floor(F.datediff(F.to_date("ts"), F.col("d0"))
                            / _LC_DAYS_PER_BUCKET)).cast("int").alias("b"),
                   F.round(F.col("value").cast("double")).cast("int")
                   .alias("item"))
           .groupBy("b", "item").agg(F.count(F.lit(1)).alias("c"))
           .localCheckpoint(eager=True))
    state = (cnt.filter((F.col("b") == 0) & (F.col("c") + 0 > 1))
             .select("item", F.col("c").alias("f"),
                     F.lit(0).cast("long").alias("delta")))
    for r in range(2, _LC_ROUNDS + 1):
        batch = (cnt.filter(F.col("b") == r - 1)
                 .select(F.col("item").alias("b_item"), "c"))
        merged = (state.join(batch, state.item == batch.b_item, "full_outer")
                  .select(
                      F.coalesce("item", "b_item").alias("item"),
                      (F.coalesce("f", F.lit(0))
                       + F.coalesce("c", F.lit(0))).alias("f"),
                      F.coalesce("delta", F.lit(r - 1)).cast("long")
                      .alias("delta")))
        state = (merged.filter(F.col("f") + F.col("delta") > r)
                 .localCheckpoint(eager=True))
    truth = (ev.select(F.round(F.col("value").cast("double")).cast("int")
                       .alias("item"))
             .groupBy("item").agg(F.count(F.lit(1)).cast("long")
                                  .alias("true_count")))
    out = (state.join(truth, "item")
           .select("item", F.col("f").cast("long").alias("f"),
                   F.col("delta").cast("long").alias("delta"),
                   "true_count",
                   ((F.col("f") <= F.col("true_count"))
                    & (F.col("true_count") <= F.col("f") + F.col("delta")))
                   .alias("error_bound_ok")))
    return out.orderBy(F.col("f").desc(), "item").limit(50)


def old_cdc(spark, sf_dir) -> DataFrame:
    from server2_vector_search_server_spark.operators import dedup
    from server2_vector_search_server_spark.plans.dedup_queries import (
        _CDC_DIV, _CDC_K, _CDC_PREFIX, _N_BASE,
    )
    from server2_vector_search_server_spark.plans.registry import tbl

    base = (tbl(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < _N_BASE).select("doc_id", "text"))
    variants = F.array(
        F.struct(F.col("doc_id"), F.col("text")),
        F.struct((F.col("doc_id") + 10000).alias("doc_id"),
                 F.concat(F.lit(_CDC_PREFIX), F.col("text"))
                 .alias("text")))
    docs2 = (base.select(F.explode(variants).alias("v"))
             .select("v.doc_id", "v.text"))
    chunks = (dedup.cdc_chunks(docs2, k=_CDC_K, divisor=_CDC_DIV)
              .withColumn("digest", F.md5("chunk_text"))
              .select("doc_id", "digest"))
    stats = chunks.agg(
        F.count(F.lit(1)).cast("long").alias("total_chunks"),
        F.count_distinct("digest").cast("long").alias("distinct_digests"))
    pairs = chunks.distinct()
    b = pairs.filter(F.col("doc_id") < 10000)
    t = (pairs.filter(F.col("doc_id") >= 10000)
         .select((F.col("doc_id") - 10000).alias("doc_id"), "digest"))
    realign = b.join(t, ["doc_id", "digest"]).agg(
        F.count(F.lit(1)).cast("long").alias("realigned_matches"))
    base_pairs = b.agg(
        F.count(F.lit(1)).cast("long").alias("base_chunk_pairs"))
    n_docs = docs2.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    return (n_docs.crossJoin(stats).crossJoin(realign)
            .crossJoin(base_pairs)
            .select("n_docs", "total_chunks", "distinct_digests",
                    F.round(F.lit(1.0)
                            - F.col("distinct_digests").cast("double")
                            / F.col("total_chunks"), 6)
                    .alias("dedup_ratio"),
                    "realigned_matches", "base_chunk_pairs"))


def canon(df: DataFrame):
    pdf = df.toPandas()
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    return pdf.sort_values(list(pdf.columns), ignore_index=True)


def main() -> None:
    from server2_vector_search_server_spark.plans import load_registry
    from server2_vector_search_server_spark.session import get_spark

    spark = get_spark("r10_ab3")
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_registry()

    warm = spark.read.parquet(os.path.join(SF_DIR, "region.parquet"))
    warm.groupBy("r_name").count() \
        .write.format("noop").mode("overwrite").save()

    pairs = [
        ("lossy", old_lossy, reg["events_lossy_counting"].fn),
        ("cdc", old_cdc, reg["dedup_cdc_chunks"].fn),
    ]
    for name, old, new in pairs:
        a = canon(old(spark, SF_DIR))
        b = canon(new(spark, SF_DIR))
        same = a.equals(b)
        print(f"identity {name}: {'OK' if same else 'MISMATCH'}",
              file=sys.stderr)
        if not same:
            print(a.head(12).to_string(), file=sys.stderr)
            print(b.head(12).to_string(), file=sys.stderr)
            sys.exit(1)
        spark.catalog.clearCache()

    samples = {n: {"old": [], "new": []} for n, _, _ in pairs}
    for p in range(PASSES):
        for name, old, new in pairs:
            order = [("old", old), ("new", new)]
            if p % 2:
                order.reverse()
            for tag, fn in order:
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop") \
                    .mode("overwrite").save()
                samples[name][tag].append(
                    round(time.perf_counter() - t0, 3))
                spark.catalog.clearCache()
    out = {}
    for name, _, _ in pairs:
        o = sorted(samples[name]["old"])[PASSES // 2]
        n = sorted(samples[name]["new"])[PASSES // 2]
        out[name] = {"old_med": o, "new_med": n,
                     "ratio": round(n / o, 3) if o else None,
                     "old": samples[name]["old"],
                     "new": samples[name]["new"]}
        print(f"{name}: old {o}s -> new {n}s  (x{out[name]['ratio']})",
              file=sys.stderr)
    print(json.dumps({"loadavg": round(os.getloadavg()[0], 2),
                      "passes": PASSES, "results": out}))


if __name__ == "__main__":
    main()
