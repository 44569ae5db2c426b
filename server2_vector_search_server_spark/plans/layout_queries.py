"""Physical-layout query surface (operators/layout.py): prove that
write-time layout turns predicates into file/partition pruning.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from server2_vector_search_server_spark.operators import layout
from server2_vector_search_server_spark.plans.registry import (
    exact_sum,
    query,
    sql_exact_sum,
    tbl,
)


@query(
    "events_time_partitioned_scan",
    survey="A-extension(write-time layout: date-partitioned events, "
           "partition-pruned window scan)",
    oracle=f"""
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS event_date, event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           {sql_exact_sum('value', 2)} AS total_value
    FROM events
    WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-10' AND DATE '2024-01-12'
    GROUP BY event_date, event_type
    ORDER BY event_date, event_type
    """,
)
def events_time_partitioned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The append-only event-stream layout: materialize events partitioned
    by day, then answer a 3-day window query. The date predicate becomes
    PartitionFilters — the scan lists and reads 3 of 30 partition
    directories (asserted in tests/test_layout.py); at 100 TB that is the
    difference between scanning 10 TB and 100 TB for a daily report."""
    events = tbl(spark, sf_dir, "events")
    path = tempfile.mkdtemp(prefix="events_by_day_")
    part_col = layout.write_time_partitioned(events, path, ts_col="ts")
    stored = spark.read.parquet(path)
    return (
        stored.filter(F.col(part_col).between("2024-01-10", "2024-01-12"))
        .groupBy(F.date_format(part_col, "yyyy-MM-dd").alias("event_date"),
                 "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.count_distinct("user_id").alias("n_users"),
             exact_sum(F.col("value"), 2).alias("total_value"))
        .orderBy("event_date", "event_type")
    )
