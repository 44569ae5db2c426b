"""Round-10 optimization A/B #2: same-process interleaved old-vs-new with
result identity asserted (see r10_ab1.py for the method).

Pairs:
  bm25     old 3-tokenize-pass explode+shuffle  vs new one-pass in-array tf
  maxsim   old two-stage (label,qid)+(label)    vs new single label aggregate
  dsir     old double token-stream scan         vs new (doc,bucket) fold
  waiting  old two-branch fact recompute        vs new per-order window

Usage: PYTHONPATH=/root/repo python scripts/r10_ab2.py [passes]
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = int(sys.argv[1]) if len(sys.argv) > 1 else 5

from pyspark.sql import DataFrame, Window, functions as F  # noqa: E402


def old_bm25(spark, sf_dir) -> DataFrame:
    from server2_vector_search_server_spark.functions.text import tokens
    from server2_vector_search_server_spark.plans.registry import (
        exact_sum, tbl,
    )
    from server2_vector_search_server_spark.plans.retrieval_queries import (
        _B, _BM25_TERMS, _K1, _K1_PLUS_1, _ONE_MINUS_B,
    )

    docs = (tbl(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < 200)
            .select("doc_id",
                    tokens(F.lower(F.col("text"))).alias("toks")))
    dl = docs.select("doc_id", F.size("toks").alias("dl"))
    sum_dl, n_docs = docs.agg(
        F.sum(F.size("toks")), F.count(F.lit(1))).first()
    avgdl = float(sum_dl) / n_docs
    tf = (docs.select("doc_id", F.explode("toks").alias("term"))
          .filter(F.col("term").isin(*_BM25_TERMS))
          .groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf")))
    df_ = tf.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    k1, k1p1 = float(_K1), float(_K1_PLUS_1)
    b, omb = float(_B), float(_ONE_MINUS_B)
    term_scores = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .select(
            "doc_id",
            (((F.lit(float(n_docs)) - F.col("df") + 0.5)
              / (F.col("df") + 0.5))
             * ((F.col("tf") * k1p1)
                / (F.col("tf") + k1 * (omb + b * (F.col("dl")
                                                  / F.lit(avgdl))))))
            .alias("s")))
    scored = term_scores.groupBy("doc_id").agg(exact_sum(F.col("s"), 6)
                                               .alias("bm25"))
    w = Window.orderBy(F.round("bm25", 6).desc(), F.col("doc_id").asc())
    return (scored
            .select("doc_id", F.round("bm25", 6).alias("bm25"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 10)
            .orderBy("rank"))


def old_maxsim(spark, sf_dir) -> DataFrame:
    from server2_vector_search_server_spark.functions.vector import dot
    from server2_vector_search_server_spark.plans.registry import (
        exact_sum, tbl,
    )

    emb = tbl(spark, sf_dir, "embeddings")
    q = (emb.filter(F.col("vec_id") < 3)
         .select(F.col("vec_id").alias("qid"),
                 F.col("embedding").alias("qv")))
    corpus = (emb.filter(F.col("vec_id") >= 10)
              .select("label", "embedding"))
    pairs = corpus.crossJoin(F.broadcast(q)).select(
        "label", "qid",
        F.round(dot(F.col("qv"), F.col("embedding")), 6).alias("sim"))
    mx = pairs.groupBy("label", "qid").agg(F.max("sim").alias("best"))
    return (mx.groupBy("label")
            .agg(exact_sum(F.col("best"), 6).alias("maxsim"))
            .select("label", F.round("maxsim", 6).alias("maxsim"))
            .orderBy(F.col("maxsim").desc(), F.col("label").asc()))


def old_dsir(spark, sf_dir) -> DataFrame:
    from server2_vector_search_server_spark.functions.text import tokens
    from server2_vector_search_server_spark.operators.text_analysis import (
        md5_bucket,
    )
    from server2_vector_search_server_spark.plans.registry import tbl

    docs = tbl(spark, sf_dir, "documents")
    target_pred = F.col("lang") == "en"
    n_buckets, weight_decimals = 64, 6
    toks = docs.select(
        F.col("doc_id"), target_pred.alias("_is_target"),
        F.explode(tokens(F.col("text"))).alias("_tok"))
    toks = toks.withColumn(
        "_bucket", md5_bucket(F.lower(F.col("_tok")), n_buckets)).drop("_tok")
    counts = (toks.groupBy("_bucket")
              .agg(F.count(F.lit(1)).alias("_cs"),
                   F.sum(F.when(F.col("_is_target"), 1).otherwise(0))
                   .cast("long").alias("_ct"))
              .localCheckpoint(eager=True))
    totals = counts.agg(F.sum("_cs").alias("_ns"),
                        F.sum("_ct").alias("_nt")).collect()[0]
    ns, nt = int(totals["_ns"]), int(totals["_nt"])
    w = F.round(
        F.log(F.col("_ct") + 1.0) - F.log(F.lit(float(nt + n_buckets)))
        - F.log(F.col("_cs") + 1.0) + F.log(F.lit(float(ns + n_buckets))),
        weight_decimals)
    weights = counts.select(
        "_bucket",
        F.round(w * 1_000_000).cast("long").alias("_w_micro"))
    scored = (toks.join(F.broadcast(weights), "_bucket")
              .groupBy("doc_id")
              .agg(F.count(F.lit(1)).alias("n_tokens"),
                   F.sum("_w_micro").alias("_imp_micro")))
    return (scored.select(
        F.col("doc_id"), F.col("n_tokens"),
        F.round(F.col("_imp_micro") / 1_000_000.0, weight_decimals)
        .alias("importance")).orderBy("doc_id"))


def old_waiting(spark, sf_dir) -> DataFrame:
    from server2_vector_search_server_spark.plans.registry import tbl

    orders = tbl(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F")
    li = tbl(spark, sf_dir, "lineitem")
    supplier = tbl(spark, sf_dir, "supplier")
    lo = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    is_late = (F.col("l_shipdate")
               > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
    pair_flag = (lo.groupBy("l_orderkey", "l_suppkey")
                 .agg(F.max(is_late.cast("int")).alias("is_late")))
    qualifying = (
        pair_flag.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_supp"),
             F.sum("is_late").alias("n_late_supp"))
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .select(F.col("l_orderkey").alias("qualifying_orderkey")))
    return (
        pair_flag.filter(F.col("is_late") == 1)
        .join(qualifying,
              F.col("l_orderkey") == F.col("qualifying_orderkey"))
        .join(F.broadcast(supplier),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20))


def canon(df: DataFrame):
    pdf = df.toPandas()
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    return pdf.sort_values(list(pdf.columns), ignore_index=True)


def main() -> None:
    from server2_vector_search_server_spark.plans import load_registry
    from server2_vector_search_server_spark.session import get_spark

    spark = get_spark("r10_ab2")
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_registry()

    warm = spark.read.parquet(os.path.join(SF_DIR, "region.parquet"))
    warm.join(warm.selectExpr("r_regionkey as k"),
              warm.r_regionkey == F.col("k")) \
        .groupBy("r_name").count() \
        .write.format("noop").mode("overwrite").save()

    pairs = [
        ("bm25", old_bm25, reg["text_bm25_topk"].fn),
        ("maxsim", old_maxsim, reg["search_maxsim_late_interaction"].fn),
        ("dsir", old_dsir, reg["text_dsir_importance"].fn),
        ("waiting", old_waiting, reg["waiting_suppliers"].fn),
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
