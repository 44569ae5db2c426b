"""Round-11 A/B #1: re-measure the four r10 perf-weak pillars (VERDICT #3).

Arms:
  bloom    old = STRING-cast key hashing     vs new = BIGINT key (registry)
  cdc      old = no digest localCheckpoint   vs new = materialized (registry)
  minhash  old = per-element long lits       vs new = _long_lits (registry)
  pca      old = per-element F.lit vectors   vs new = vector_literal (registry)

minhash/pca arms flip the literal builders by monkeypatching the module
attributes the operators actually reference (dedup._long_lits,
ann.vector_literal, knn.vector_literal) before building the DataFrame —
plan BUILD time is inside the timed region, as in bench.py.

Usage: PYTHONPATH=/root/repo python scripts/r11_ab1.py [passes]
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = int(sys.argv[1]) if len(sys.argv) > 1 else 7

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from server2_vector_search_server_spark.operators import ann, dedup, knn  # noqa: E402
from server2_vector_search_server_spark.operators.dedup import (  # noqa: E402
    bloom_might_contain, bloom_positions, build_bloom,
)
from server2_vector_search_server_spark.plans.registry import tbl  # noqa: E402

NEW_LONG_LITS = dedup._long_lits
NEW_VECTOR_LITERAL = knn.vector_literal


def _old_long_lits(vals):
    return F.array(*[F.lit(int(v)).cast("long") for v in vals])


def _old_vector_literal(vec):
    return F.array(*[F.lit(float(x)) for x in vec])


def _patch(old: bool) -> None:
    dedup._long_lits = _old_long_lits if old else NEW_LONG_LITS
    lit = _old_vector_literal if old else NEW_VECTOR_LITERAL
    knn.vector_literal = lit
    ann.vector_literal = lit
    dedup.vector_literal = lit


def old_bloom(spark, sf_dir) -> DataFrame:
    from server2_vector_search_server_spark.plans.insight_queries import (
        _BLOOM_PRIORITY, _BLOOM_YEAR,
    )
    dim = (tbl(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == _BLOOM_PRIORITY)
        & (F.year("o_orderdate") == _BLOOM_YEAR))
        .select("o_orderkey"))
    bloom = build_bloom(dim.select(
        F.col("o_orderkey").cast("string").alias("k")), "k")
    li = tbl(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_extendedprice", "l_discount")
    gated = (li.withColumn("_pos", bloom_positions(
        F.col("l_orderkey").cast("string")))
        .join(F.broadcast(bloom))
        .filter(bloom_might_contain("_pos", "bloom_words"))
        .drop("_pos", "bloom_words"))
    rev_cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    return (gated.join(F.broadcast(dim),
                       gated.l_orderkey == dim.o_orderkey)
            .groupBy(F.month("l_shipdate").alias("ship_month"))
            .agg(F.count(F.lit(1)).alias("n_items"),
                 F.sum(rev_cents).alias("revenue_cents"))
            .orderBy("ship_month"))


def old_cdc(spark, sf_dir) -> DataFrame:
    from server2_vector_search_server_spark.plans.dedup_queries import (
        _CDC_DIV, _CDC_K, _CDC_PREFIX, _N_BASE,
    )
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


def main() -> None:
    from server2_vector_search_server_spark.plans import load_registry
    from server2_vector_search_server_spark.session import get_spark

    spark = get_spark("r11_ab1")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_registry()

    def patched(fn, old):
        def run(spark, sf_dir):
            _patch(old)
            try:
                return fn(spark, sf_dir)
            finally:
                _patch(False)
        return run

    mh = registry["dedup_minhash_lsh"].fn
    pca = registry["ann_pca_knn"].fn
    pairs = {
        "bloom": (old_bloom, registry["lineitem_bloom_join_prune"].fn),
        "cdc": (old_cdc, registry["dedup_cdc_chunks"].fn),
        "minhash": (patched(mh, True), patched(mh, False)),
        "pca": (patched(pca, True), patched(pca, False)),
    }
    for key, (old, new) in pairs.items():
        o = [tuple(r) for r in old(spark, SF_DIR).collect()]
        n = [tuple(r) for r in new(spark, SF_DIR).collect()]
        assert o == n, f"{key}: results differ!"
        print(f"identity OK: {key} ({len(n)} rows)", file=sys.stderr)

    times: dict[str, list[float]] = {}
    for p in range(PASSES):
        for key, (old, new) in pairs.items():
            arms = [("old", old), ("new", new)]
            if p % 2:
                arms.reverse()
            for arm, fn in arms:
                k = f"{key}:{arm}"
                spark.sparkContext.setJobDescription(f"r11ab1 {k} p{p}")
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
