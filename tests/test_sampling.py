"""Sampling + approximate-aggregate tests (operators/sampling.py)."""
from __future__ import annotations

from pyspark.sql import functions as F

from server2_vector_search_server_spark.operators import sampling


def test_hash_sample_is_value_deterministic(tables):
    """Same rows selected regardless of partitioning — the property that
    makes content-hash splits reproducible across cluster layouts."""
    docs = tables["documents"]
    a = {r["doc_id"] for r in
         sampling.hash_sample(docs, "doc_id").select("doc_id").collect()}
    b = {r["doc_id"] for r in
         sampling.hash_sample(docs.repartition(7), "doc_id")
         .select("doc_id").collect()}
    assert a == b
    n = docs.count()
    # 2/16 expected; generous bounds for a 500-doc corpus
    assert 0.04 * n < len(a) < 0.22 * n


def test_hash_sample_split_partition(tables):
    """Prefix sets partition the corpus: all 16 hex chars = everything."""
    docs = tables["documents"]
    allchars = tuple("0123456789abcdef")
    assert sampling.hash_sample(docs, "doc_id", allchars).count() == docs.count()


def test_stratified_sample_fractions(tables):
    docs = tables["documents"]
    frac = {"en": 0.3, "de": 1.0}
    out = sampling.stratified_sample(docs, "lang", frac, seed=42)
    got = {r["lang"]: r["n"] for r in
           out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    base = {r["lang"]: r["n"] for r in
            docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(got) == {"en", "de"}          # absent strata dropped
    assert got["de"] == base["de"]           # fraction 1.0 keeps all
    assert 0.1 * base["en"] < got["en"] < 0.6 * base["en"]
    # seeded determinism
    again = sampling.stratified_sample(docs, "lang", frac, seed=42)
    assert sorted(r["doc_id"] for r in out.select("doc_id").collect()) == \
           sorted(r["doc_id"] for r in again.select("doc_id").collect())


def test_approx_count_distinct_error_bound(tables):
    events = tables["events"]
    exact = {r["event_type"]: r["n"] for r in
             events.groupBy("event_type")
             .agg(F.count_distinct("user_id").alias("n")).collect()}
    approx = {r["event_type"]: r["n"] for r in
              events.groupBy("event_type")
              .agg(F.approx_count_distinct("user_id", 0.02).alias("n"))
              .collect()}
    for k, ex in exact.items():
        assert abs(approx[k] - ex) <= max(0.05 * ex, 2), (k, ex, approx[k])


def test_approx_percentile_error_bound(tables):
    events = tables["events"]
    rows = events.agg(
        F.expr("percentile(value, 0.5)").alias("exact_p50"),
        F.percentile_approx("value", 0.5, 10000).alias("approx_p50")).first()
    spread = events.agg(
        (F.max("value") - F.min("value")).alias("r")).first()["r"]
    assert abs(rows["approx_p50"] - rows["exact_p50"]) <= 0.01 * spread


def test_heavy_hitters_guarantee_and_exactness(spark):
    """Misra-Gries candidate guarantee + exact rescore: the result must
    EQUAL the plain GROUP BY ... HAVING on an adversarial mix (heavy
    values interleaved with a rotating long tail designed to pressure
    counter eviction)."""
    from server2_vector_search_server_spark.operators.sampling import (
        heavy_hitters,
    )

    rows = []
    for i in range(5000):
        rows.append((f"hot_{i % 2}",) if i % 5 < 2
                    else (f"tail_{i % 997}",))
    df = spark.createDataFrame(rows, "v string").repartition(7)
    got = {(r["v"], r["n_occurrences"])
           for r in heavy_hitters(df, "v", k=20).collect()}
    n = len(rows)
    exact = {(r["v"], r["n"]) for r in
             df.groupBy("v").agg(F.count(F.lit(1)).alias("n"))
             .filter(F.col("n") > n // 20).collect()}
    assert got == exact and {v for v, _ in got} == {"hot_0", "hot_1"}
