"""Runtime-filter audits: dynamic partition pruning and runtime bloom
filters — the two optimizer features that cut PROBE-side I/O at 100 TB
using facts only known at run time (the dim side's surviving keys).

Both are asserted against executed plans on real partitioned writes, with
the non-obvious trigger conditions documented (SCALE.md §16): DPP requires
a *likely-selective* dim predicate (a comparison/IN/LIKE — a bare boolean
column does NOT qualify), and runtime bloom filters apply to shuffle joins
(they complement, not replace, broadcast).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from server2_vector_search_server_spark.session import read_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def date_partitioned(spark, tmp_path_factory):
    """events written date-partitioned + a date-dim with a weekday column."""
    base = str(tmp_path_factory.mktemp("dpp"))
    ev = read_table(spark, SF_SMOKE, "events")
    (ev.withColumn("event_date", F.to_date("ts"))
       .write.partitionBy("event_date").mode("overwrite")
       .parquet(base + "/ev"))
    part_ev = spark.read.parquet(base + "/ev")
    (part_ev.select("event_date").distinct()
     .withColumn("dow", F.dayofweek("event_date"))
     .withColumn("is_weekend", F.dayofweek("event_date").isin(1, 7))
     .write.mode("overwrite").parquet(base + "/dim"))
    return part_ev, spark.read.parquet(base + "/dim")


def test_dynamic_partition_pruning_fires(spark, date_partitioned):
    """Joining a partitioned fact to a dim filtered by a selective
    predicate must inject a dynamicpruning partition filter: only the
    partitions whose keys survive the dim filter are read — at 100 TB the
    difference between scanning 2 weekend-days/week and all 7."""
    part_ev, dim = date_partitioned
    weekend = dim.filter(F.col("dow").isin(1, 7))
    j = part_ev.join(weekend, "event_date").groupBy("event_date").count()
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan.lower()


def test_dpp_not_triggered_by_bare_boolean(spark, date_partitioned):
    """The trigger condition, pinned: Spark's isLikelySelective() rejects a
    bare boolean attribute as the dim predicate, so no DPP is inserted —
    model dim flags as comparable attributes (dow IN (…)), not pre-baked
    STORED booleans, if you want pruning. (A boolean computed inline
    simplifies to its defining comparison and does trigger — the trap is
    specifically materialized flag columns.)"""
    part_ev, dim = date_partitioned
    flagged = dim.filter(F.col("is_weekend"))
    j = part_ev.join(flagged, "event_date").groupBy("event_date").count()
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" not in plan.lower()


def test_runtime_bloom_filter_on_shuffle_join(spark):
    """When the dim side of a SHUFFLE join is selectively filtered, Spark
    can build a bloom filter of its surviving keys and apply it to the
    fact side BEFORE the shuffle — rows that cannot match never cross the
    network. Thresholds are lowered to fire at test scale; at real scale
    the defaults (10 MB creation side) gate it to genuinely large joins."""
    saved = {}
    tuned = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold":
            "10GB",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
    }
    for k, v in tuned.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        li = read_table(spark, SF_SMOKE, "lineitem")
        orders = read_table(spark, SF_SMOKE, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT")
        j = (li.join(orders, li.l_orderkey == orders.o_orderkey)
             .groupBy("l_returnflag").count())
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan.lower()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
