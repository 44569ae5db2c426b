"""Salted-join / salted-collect equivalence with their unsalted forms
(operators/skew.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from server2_vector_search_server_spark.operators.skew import (
    key_skew_profile, salted_collect_list, salted_join,
)


def _skewed_events(spark):
    """90% of rows on one hot key."""
    return spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), F.col("id"))).alias("key"),
        F.col("id").alias("val"))


def test_salted_join_matches_plain_join(spark):
    big = _skewed_events(spark)
    small = spark.createDataFrame(
        [("hot", 1.0), ("k950", 2.0), ("missing", 3.0)], "key string, w double")
    got = sorted((r["key"], r["val"], r["w"])
                 for r in salted_join(big, small, "key").collect())
    want = sorted((r["key"], r["val"], r["w"])
                  for r in big.join(small, "key").collect())
    assert got == want and len(got) == 901


def test_salted_left_join_keeps_unmatched(spark):
    big = _skewed_events(spark)
    small = spark.createDataFrame([("hot", 1.0)], "key string, w double")
    out = salted_join(big, small, "key", how="left")
    assert out.count() == 1000
    assert out.filter(F.col("w").isNull()).count() == 100


def test_salted_collect_list_matches_plain(spark):
    df = _skewed_events(spark)
    got = {r["key"]: sorted(r["values"])
           for r in salted_collect_list(df, "key", "val").collect()}
    want = {r["key"]: sorted(r["values"])
            for r in df.groupBy("key")
            .agg(F.collect_list("val").alias("values")).collect()}
    assert got == want


def test_key_skew_profile(spark):
    top = key_skew_profile(_skewed_events(spark), "key", top=3).collect()
    assert top[0]["key"] == "hot"
    assert top[0]["n_rows"] == 900
    assert abs(top[0]["share"] - 0.9) < 1e-9
