"""Temporal-join queries: as-of join and bucketed range join over events.

DuckDB's native ``ASOF JOIN`` and a plain inequality join serve as oracles
for the distributed implementations in ``operators/temporal.py`` — the Spark
side must produce the same pairs through its shuffle-friendly rewrites
(union + carry-forward window; bucket equi-join + refine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from server2_vector_search_server_spark.operators.temporal import (
    asof_join, bucketed_range_join,
)
from server2_vector_search_server_spark.plans.registry import query, tbl


@query(
    "events_asof_join",
    survey="C-extension(as-of join: latest right row at-or-before each left ts)",
    oracle="""
    WITH purch AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, MAX(value) AS last_purchase
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, ts)
    SELECT e.event_id, e.user_id, e.event_type, p.last_purchase
    FROM (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
          FROM events) e
    ASOF LEFT JOIN purch p
      ON e.user_id = p.user_id AND e.ts >= p.ts
    ORDER BY e.event_id
    """,
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attach each event's most recent purchase value (same user, ts <= event
    ts). One shuffle on user_id; checked against DuckDB's native ASOF JOIN."""
    events = tbl(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase") \
                      .select("user_id", "ts", "value")
    return (
        asof_join(events.select("event_id", "user_id", "event_type", "ts"),
                  purchases, on="ts", by="user_id",
                  value_col="value", out_col="last_purchase")
        .select("event_id", "user_id", "event_type", "last_purchase")
        .orderBy("event_id")
    )


@query(
    "events_range_join_counts",
    survey="C-extension(range join: trailing-band pairs via bucket equi-join)",
    oracle="""
    SELECT p.event_id, COUNT(c.event_id) AS n_recent_clicks
    FROM events p
    LEFT JOIN events c
      ON c.user_id = p.user_id AND c.event_type = 'click'
     AND CAST(c.ts AS TIMESTAMP)
         BETWEEN CAST(p.ts AS TIMESTAMP) - INTERVAL 600 SECOND
             AND CAST(p.ts AS TIMESTAMP)
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id
    ORDER BY p.event_id
    """,
)
def events_range_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clicks in the 10 minutes before each purchase (same user). The naive
    inequality join is quadratic (BroadcastNestedLoopJoin); the bucketed
    rewrite shuffles each side ≤2× on (user_id, bucket)."""
    events = tbl(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase") \
                      .select("event_id", "user_id", "ts")
    clicks = events.filter(F.col("event_type") == "click") \
                   .select("event_id", "user_id", "ts")
    pairs = bucketed_range_join(purchases, clicks, on="ts", by="user_id",
                                width_seconds=600)
    counts = pairs.groupBy("event_id") \
                  .agg(F.count(F.col("event_id_r")).alias("n_recent_clicks"))
    return (
        purchases.join(counts, "event_id", "left")
        .select("event_id",
                F.coalesce("n_recent_clicks", F.lit(0)).alias("n_recent_clicks"))
        .orderBy("event_id")
    )
