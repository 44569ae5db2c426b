"""Round-11 A/B #2: this round's first code batch vs the r10 forms.

Arms (old form via monkeypatch/inline, new form = working-tree registry):
  psum_sweep / psum_pack / psum_spear / psum_gini:
        old = exclusive_prefix_sum at defaultParallelism range partitions
        new = size-derived partition count (_range_partition_count)
  wal:  old = 8-file WAL, maxFilesPerTrigger=8 (one micro-batch)
        new = 4-file WAL, trigger=2 (two micro-batches)
  boiler: old = r10 per-line-key collect_list single-pass
          new = bounded count_distinct verdict + join-back
  pq / ivf_pq / ivf / batch / kmeans: old = per-element literals + HOF
          lambdas at build sites, new = one-expr literals + constant folds
          (monkeypatched builders cannot express this one — old arm is the
          inline reimplementation below for pq only; the others ride the
          identity check + bench).

Usage: PYTHONPATH=/root/repo python scripts/r11_ab2.py [passes]
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = int(sys.argv[1]) if len(sys.argv) > 1 else 7

from pyspark.sql import functions as F  # noqa: E402

from server2_vector_search_server_spark.operators import text_analysis  # noqa: E402
from server2_vector_search_server_spark.streaming import wal as walmod  # noqa: E402

NEW_RANGE_COUNT = text_analysis._range_partition_count


def _old_range_count(df):
    return df.sparkSession.sparkContext.defaultParallelism


def patched_psum(fn, old):
    def run(spark, sf_dir):
        text_analysis._range_partition_count = (
            _old_range_count if old else NEW_RANGE_COUNT)
        try:
            return fn(spark, sf_dir)
        finally:
            text_analysis._range_partition_count = NEW_RANGE_COUNT
    return run


def old_wal(spark, sf_dir):
    """The r10 wal_replay: 8 build files, one micro-batch."""
    from server2_vector_search_server_spark.plans.streaming_queries import (
        _build_wal, scratch_dir, state_partitions,
    )
    work = scratch_dir("wal_replay_old_")
    wal_dir = os.path.join(work, "wal")
    # r10 build shape: 8 files
    import server2_vector_search_server_spark.plans.streaming_queries as sq
    docs = None
    # rebuild inline: same rows, repartition(8)
    from server2_vector_search_server_spark.plans.registry import tbl
    from server2_vector_search_server_spark.streaming.wal import (
        OP_DELETE, OP_UPSERT, WAL_SCHEMA, WalLog,
    )
    docs = tbl(spark, sf_dir, "documents")
    common = [F.col("doc_id").cast("string").alias("chunk_id"),
              F.col("doc_id").cast("string").alias("doc_id"),
              F.concat(F.lit("doc_"), F.col("doc_id")).alias("doc_name"),
              F.lit(0).alias("chunk_index"),
              F.lit("master").alias("collection")]
    v1 = docs.select(
        (F.col("doc_id") * 3).alias("seq_id"),
        F.lit(OP_UPSERT).alias("operation"), *common,
        F.col("text").alias("content"),
        F.lit(None).cast("array<float>").alias("embedding"))
    dels = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") * 3 + 1).alias("seq_id"),
        F.lit(OP_DELETE).alias("operation"), *common,
        F.lit(None).cast("string").alias("content"),
        F.lit(None).cast("array<float>").alias("embedding"))
    v2 = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") * 3 + 2).alias("seq_id"),
        F.lit(OP_UPSERT).alias("operation"), *common,
        F.concat(F.lit("v2:"), F.col("text")).alias("content"),
        F.lit(None).cast("array<float>").alias("embedding"))
    wal_df = v1.unionByName(dels).unionByName(v2).select(
        [f.name for f in WAL_SCHEMA.fields])
    wal_df.repartition(8).write.mode("overwrite").parquet(wal_dir)
    log = WalLog(spark, os.path.join(work, "store"))
    with state_partitions(spark):
        q = walmod.start_wal_stream(
            spark, wal_dir, log,
            checkpoint_dir=os.path.join(work, "ckpt"),
            max_files_per_trigger=8)
        q.awaitTermination()
    return (log.current_state()
            .select(F.col("doc_id").cast("long").alias("doc_id"), "content")
            .orderBy("doc_id"))


def old_boiler(spark, sf_dir):
    """The r10 per-line-key collect_list form, inline."""
    from server2_vector_search_server_spark.plans.registry import tbl
    docs = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    corpus = docs.select(
        "doc_id",
        F.concat(
            F.lit("NAV MENU HOME ABOUT\n"),
            F.when(F.col("doc_id") % 2 == 0, F.lit("SUBSCRIBE NOW\n"))
            .otherwise(F.lit("")),
            F.when(F.col("doc_id") % 97 == 0, F.lit("RARE NOTICE\n"))
            .otherwise(F.lit("")),
            F.col("text"),
            F.lit("\nCOPYRIGHT ALL RIGHTS RESERVED")).alias("text"))
    min_docs, text_col, id_col = 5, "text", "doc_id"
    lines = (
        corpus.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), "\n"))
            .alias("line_no", "line"))
        .filter(F.trim("line") != "")
        .withColumn("line_key", F.trim("line")))
    by_line = (
        lines.groupBy("line_key")
        .agg(F.count_distinct(F.col(id_col)).alias("n_docs"),
             F.collect_list(F.struct(id_col, "line_no", "line"))
             .alias("occ")))
    occ = (by_line
           .select((F.col("n_docs") < min_docs).alias("keep"),
                   F.explode("occ").alias("o"))
           .select("keep", F.col("o." + id_col).alias(id_col),
                   F.col("o.line_no").alias("line_no"),
                   F.col("o.line").alias("line")))
    out = (
        occ.groupBy(id_col)
        .agg(F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.when(F.col("keep"),
                               F.struct("line_no", "line")))),
                    lambda s: s["line"]),
                "\n").alias(text_col),
             F.sum(F.col("keep").cast("long")).alias("n_kept"),
             F.count(F.lit(1)).alias("_n_total"))
        .filter(F.col("n_kept") > 0)
        .withColumn("n_removed", F.col("_n_total") - F.col("n_kept"))
        .drop("_n_total"))
    return (out.select("doc_id", "text",
                       F.col("n_kept").cast("int").alias("n_kept"),
                       F.col("n_removed").cast("int").alias("n_removed"))
            .orderBy("doc_id"))


def main() -> None:
    from server2_vector_search_server_spark.plans import load_registry
    from server2_vector_search_server_spark.session import get_spark

    spark = get_spark("r11_ab2")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_registry()

    pairs = {
        "psum_sweep": (patched_psum(registry["events_concurrency_sweep"].fn, True),
                       patched_psum(registry["events_concurrency_sweep"].fn, False)),
        "psum_pack": (patched_psum(registry["text_sequence_packing_distributed"].fn, True),
                      patched_psum(registry["text_sequence_packing_distributed"].fn, False)),
        "psum_spear": (patched_psum(registry["lineitem_spearman_rank_corr"].fn, True),
                       patched_psum(registry["lineitem_spearman_rank_corr"].fn, False)),
        "psum_gini": (patched_psum(registry["customer_gini_revenue"].fn, True),
                      patched_psum(registry["customer_gini_revenue"].fn, False)),
        "wal": (old_wal, registry["streaming_wal_replay"].fn),
        "boiler": (old_boiler, registry["dedup_boilerplate_lines"].fn),
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
                spark.sparkContext.setJobDescription(f"r11ab2 {k} p{p}")
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
