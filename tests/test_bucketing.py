"""Bucketed tables enable shuffle-free co-located joins — the physical
contract the engine relies on at 100 TB (SURVEY.md §4; brief: "bucketing for
co-located joins"). Both sides written bucketBy(8, key) + sortBy(key): the
join plans as SortMergeJoin with NO Exchange on either side."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    a_name = f"bkt_a_{uuid.uuid4().hex[:6]}"
    b_name = f"bkt_b_{uuid.uuid4().hex[:6]}"
    a = spark.range(10_000).select(F.col("id").alias("k"),
                                   (F.col("id") * 2).alias("va"))
    b = spark.range(10_000).select(F.col("id").alias("k"),
                                   (F.col("id") * 3).alias("vb"))
    for df, name, sub in ((a, a_name, "a"), (b, b_name, "b")):
        (df.write.bucketBy(8, "k").sortBy("k")
         .option("path", str(tmp_path / sub))
         .saveAsTable(name))
    # force the non-broadcast regime: bucketing matters exactly when both
    # sides are too big to broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ta, tb = spark.table(a_name), spark.table(b_name)
        joined = ta.join(tb, "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, \
            f"bucketed join should not shuffle:\n{plan}"
        # and it computes the right thing
        row = joined.agg(F.sum(F.col("va") + F.col("vb")).alias("s")).first()
        n = 10_000
        assert row["s"] == 5 * n * (n - 1) // 2

        # contrast: the same join on unbucketed data DOES exchange
        plain = (spark.range(10_000).select(F.col("id").alias("k"))
                 .join(spark.range(10_000).select(F.col("id").alias("k"),
                                                  F.lit(1).alias("v")), "k"))
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))
        spark.sql(f"DROP TABLE IF EXISTS {a_name}")
        spark.sql(f"DROP TABLE IF EXISTS {b_name}")
