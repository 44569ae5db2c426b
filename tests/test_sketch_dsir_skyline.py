"""Behavioral tests for the round-3 additions: mergeable sketches, DSIR
importance weights, Pareto skyline, sweep-line concurrency.

Oracle parity (tests/test_oracle_parity.py) already pins the fixture-level
results; these tests pin the SEMANTICS on tiny hand-built inputs where the
expected answer is computable by eye.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from server2_vector_search_server_spark.operators.text_analysis import (
    dsir_importance,
    md5_bucket,
)


def test_md5_bucket_range_and_determinism(spark):
    df = spark.createDataFrame(
        [(w,) for w in ["alpha", "beta", "gamma", "alpha"]], "w string")
    rows = df.select(md5_bucket(F.col("w"), 64).alias("b")).collect()
    assert all(0 <= r["b"] < 64 for r in rows)
    # same token -> same bucket
    assert rows[0]["b"] == rows[3]["b"]


def test_md5_bucket_uses_all_buckets(spark):
    # ADVICE r3 regression: the ascii-code form collapsed any power-of-two
    # n_buckets <= 256 to at most 16 effective buckets. With hex-digit
    # values the first two md5 chars are uniform over 0..255, so 500
    # distinct tokens must hit (nearly) all 64 buckets — far more than 16.
    df = spark.range(500).select(
        F.concat(F.lit("tok_"), F.col("id")).alias("w"))
    n = (df.select(md5_bucket(F.col("w"), 64).alias("b"))
         .distinct().count())
    assert n > 55, f"only {n} distinct buckets for n_buckets=64"


def test_dsir_importance_prefers_target_language(spark):
    # target docs share the token "qqq"; source-only docs share "zzz".
    # A fresh doc made of target tokens must outscore one of source tokens:
    # weight(bucket("qqq")) has ct high, weight(bucket("zzz")) has ct=0.
    rows = [
        (1, "qqq qqq qqq", "en"),
        (2, "qqq qqq qqq", "en"),
        (3, "zzz zzz zzz", "de"),
        (4, "qqq qqq qqq", "xx"),   # target-looking doc OUTSIDE the target
        (5, "zzz zzz zzz", "xx"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r["doc_id"]: r["importance"]
           for r in dsir_importance(
               docs, F.col("lang") == "en").collect()}
    assert got[4] > got[5]
    assert got[1] == got[2] == got[4]  # same token stream -> same score


def test_dsir_importance_tokens_counted_with_multiplicity(spark):
    docs = spark.createDataFrame(
        [(1, "aa aa aa", "en"), (2, "aa", "en")],
        "doc_id long, text string, lang string")
    out = {r["doc_id"]: r for r in dsir_importance(
        docs, F.col("lang") == "en").collect()}
    assert out[1]["n_tokens"] == 3 and out[2]["n_tokens"] == 1
    assert out[1]["importance"] == pytest.approx(3 * out[2]["importance"])


def _brute_skyline(points):
    out = []
    for i, (q, n) in enumerate(points):
        dominated = any(
            (q2 >= q and n2 >= n and (q2 > q or n2 > n))
            for j, (q2, n2) in enumerate(points) if j != i)
        if not dominated:
            out.append((q, n))
    return sorted(set(out))


def test_skyline_levels_match_bruteforce(spark):
    # exercise the level decomposition directly: ties on quality, ties on
    # n_chars, a dominated middle level, and duplicate points
    pts = [(0.9, 100), (0.9, 80), (0.7, 100), (0.7, 120),
           (0.5, 120), (0.5, 130), (0.3, 130), (0.9, 100)]
    docs = spark.createDataFrame(
        [(i, q, n) for i, (q, n) in enumerate(pts)],
        "doc_id long, quality double, n_chars long")
    from pyspark.sql import Window
    lvl = docs.groupBy("quality").agg(F.max("n_chars").alias("n_max"))
    w = (Window.orderBy(F.col("quality").desc())
         .rowsBetween(Window.unboundedPreceding, -1))
    sky = (lvl.withColumn("prev", F.max("n_max").over(w))
           .filter(F.col("prev").isNull() | (F.col("n_max") > F.col("prev"))))
    got = sorted((r["quality"], r["n_max"]) for r in sky.collect())
    assert got == _brute_skyline(pts)


def test_theta_sketch_agg_skips_nulls(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (None, "a")],
        "user_id long, seg string")
    est = df.agg(
        F.theta_sketch_estimate(
            F.theta_sketch_agg(
                F.when(F.col("seg") == "a", F.col("user_id"))))
        .alias("e")).collect()[0]["e"]
    # exact mode at this cardinality: nulls (the 'b' row and the null id)
    # must not contribute
    assert float(est) == pytest.approx(2.0)


def test_hll_rollup_merge_equals_global(spark):
    df = spark.createDataFrame(
        [(u, t) for u in range(200) for t in ("x", "y") if (u + len(t)) % 3],
        "user_id long, event_type string")
    per = df.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"))
    merged = per.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e")
    ).collect()[0]["e"]
    direct = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("e")
    ).collect()[0]["e"]
    assert merged == direct  # merge-then-estimate == estimate-of-all


def test_polymorphic_udtf_two_schemas_one_function(spark):
    from server2_vector_search_server_spark.operators.udtf_ops import (
        register_udtfs,
    )

    register_udtfs(spark)
    spark.sql("SELECT 1").collect()
    a = spark.sql(
        "SELECT * FROM parse_delimited('7|x', 'k bigint, v string')")
    b = spark.sql(
        "SELECT * FROM parse_delimited('7|1.5|x', "
        "'k int, score double, tag string')")
    assert [f.name for f in a.schema.fields] == ["k", "v"]
    assert [(f.name, f.dataType.simpleString()) for f in b.schema.fields] \
        == [("k", "int"), ("score", "double"), ("tag", "string")]
    assert a.collect()[0].asDict() == {"k": 7, "v": "x"}
    assert b.collect()[0].asDict() == {"k": 7, "score": 1.5, "tag": "x"}
