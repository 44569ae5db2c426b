"""Relational + event-time query surface over the TPC-H-ish fixtures
(SURVEY.md §2 D aggregations, E windows, F sort/limit, I streaming-analog,
H/json extension).

The reference has no joins/windows of its own (SURVEY.md §2.C/E) — these
queries exercise the engine breadth a production corpus catalog needs, written
the way they must be written at 100 TB:
  * dimension joins broadcast (nation/customer), fact side never shuffled for
    the join;
  * aggregations rely on map-side partial aggregation;
  * top-k per group via ranking window, global top-k via TakeOrderedAndProject;
  * float totals via the exact scaled-integer sum (see plans/registry.py) so
    results are reproducible at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from server2_vector_search_server_spark.plans.registry import (
    link_table_files,
    exact_sum,
    state_partitions,
    query,
    scratch_dir,
    sql_exact_sum,
    tbl,
)


@query(
    "pricing_summary",
    survey="D(aggs),F1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_exact_sum('l_quantity')} AS sum_qty,
           {sql_exact_sum('l_extendedprice')} AS sum_base_price,
           {sql_exact_sum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           ROUND({sql_exact_sum('l_quantity')} / COUNT(*), 6) AS avg_qty,
           ROUND({sql_exact_sum('l_extendedprice')} / COUNT(*), 6) AS avg_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: the canonical wide-agg scan. One
    shuffle (the groupBy), partial aggregation map-side; at 100 TB the
    4-6 output groups mean the shuffle moves ~nothing."""
    li = tbl(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    cnt = F.count(F.lit(1))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(exact_sum(F.col("l_quantity")).alias("sum_qty"),
             exact_sum(F.col("l_extendedprice")).alias("sum_base_price"),
             exact_sum(disc_price).alias("sum_disc_price"),
             F.round(exact_sum(F.col("l_quantity")) / cnt, 6).alias("avg_qty"),
             F.round(exact_sum(F.col("l_extendedprice")) / cnt, 6).alias("avg_price"),
             cnt.alias("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "revenue_by_nation",
    survey="C(joins),D",
    oracle=f"""
    SELECT n.n_name,
           {sql_exact_sum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact lineitem joined up the dimension chain. nation and
    customer are broadcast (dimension tables stay small relative to the
    fact at every SF); only lineitem⨝orders shuffles, on the join key."""
    li = tbl(spark, sf_dir, "lineitem")
    orders = tbl(spark, sf_dir, "orders")
    cust = tbl(spark, sf_dir, "customer")
    nation = tbl(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(exact_sum(revenue).alias("revenue"),
             F.count(F.lit(1)).alias("n_lineitems"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


@query(
    "top_orders_per_customer",
    survey="E(window),F2",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(row_number() OVER (
                PARTITION BY o_custkey
                ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rank
    FROM orders
    QUALIFY rank <= 3
    ORDER BY o_custkey, rank
    """,
)
def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via ranking window — the pattern behind per-query kNN
    and any per-entity top-k; one shuffle on the partition key."""
    orders = tbl(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        orders.select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .orderBy("o_custkey", "rank")
    )


@query(
    "events_hourly_rollup",
    survey="I(event-time windows, batch form)",
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           {sql_exact_sum('value', 2)} AS total_value
    FROM events
    GROUP BY window_start, event_type
    ORDER BY window_start, event_type
    """,
)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window aggregation (batch form of the Structured
    Streaming job in streaming/; same F.window expression runs under
    readStream + watermark — see streaming/events.py)."""
    events = tbl(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             exact_sum(F.col("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n_events", "total_value")
        .orderBy("window_start", "event_type")
    )


@query(
    "events_json_props",
    survey="H(json extension)",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_mod,
           COUNT(*) AS n,
           MIN(event_id) AS min_event_id
    FROM events
    GROUP BY k_mod
    ORDER BY k_mod
    """,
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction over the events props column (beyond-reference
    extension noted in SURVEY.md §2.H) — F.get_json_object stays JVM-side."""
    events = tbl(spark, sf_dir, "events")
    return (
        events.withColumn(
            "k_mod",
            (F.get_json_object("props", "$.k").cast("int") % 10))
        .groupBy("k_mod")
        .agg(F.count(F.lit(1)).alias("n"),
             F.min("event_id").alias("min_event_id"))
        .orderBy("k_mod")
    )


@query(
    "shipping_priority_top10",
    survey="C,D,F(TPC-H Q3 shape: 3-way join, agg, top-k)",
    oracle=f"""
    SELECT l_orderkey,
           {sql_exact_sum('l_extendedprice * (1.0 - l_discount)', 4)} AS revenue,
           o_orderdate
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def shipping_priority_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 adapted to the fixture columns (no o_shippriority in the
    driver's orders table): segment + date filters push to the scans, the
    customer dim broadcasts, and the final top-10 plans as
    TakeOrderedAndProject over the aggregated revenue."""
    customer = tbl(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING")
    orders = tbl(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
    lineitem = tbl(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer),
              orders.o_custkey == customer.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(exact_sum(F.col("l_extendedprice")
                       * (F.lit(1.0) - F.col("l_discount")), 4)
             .alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "customer_running_spend",
    survey="E-extension(window frame spec: running total per partition)",
    oracle="""
    SELECT o_custkey, o_orderkey,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS UNBOUNDED PRECEDING) / 100.0 AS running_spend
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
)
def customer_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative per-customer spend — an explicit ROWS frame over an ordered
    partition. Scaled-integer accumulation keeps the running double sum
    bit-reproducible at any parallelism (same pattern as exact_sum)."""
    orders = tbl(spark, sf_dir, "orders")
    w = (Window.partitionBy("o_custkey")
         .orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        orders.select(
            "o_custkey", "o_orderkey",
            (F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).over(w)
             / 100.0).alias("running_spend"))
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "order_value_percentiles",
    survey="D-extension(exact percentiles: median/p95 per group)",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           ROUND(quantile_cont(o_totalprice, 0.95), 4) AS p95
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def order_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark `percentile` ==
    DuckDB `quantile_cont`, both linear interpolation — verified to match at
    4 decimals). Exact percentile is a sort-based aggregate: fine per-group;
    at 100 TB switch to `approx_percentile` (t-digest, mergeable, one pass)
    when the per-group value sets stop fitting a task."""
    orders = tbl(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
             F.round(F.expr("percentile(o_totalprice, 0.95)"), 4).alias("p95"))
        .orderBy("o_orderpriority")
    )


_ABOVE_AVG_SQL = """
    SELECT o_custkey, COUNT(*) AS n_above
    FROM orders o
    WHERE o_totalprice >
          (SELECT SUM(CAST(ROUND(i.o_totalprice * 100) AS BIGINT))
                  / (100.0 * COUNT(*))
           FROM orders i WHERE i.o_custkey = o.o_custkey)
    GROUP BY o_custkey
    ORDER BY o_custkey
"""


@query(
    "orders_above_customer_avg",
    survey="C-extension(correlated scalar subquery via spark.sql; Catalyst decorrelation)",
    oracle=_ABOVE_AVG_SQL,
)
def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — each order compared to its own customer's
    average — submitted as LITERAL SQL through spark.sql(): the engine's SQL
    surface is the same ANSI text DuckDB runs as the oracle. Catalyst
    decorrelates the subquery into an aggregate + join (no per-row re-scan).
    The average uses scaled-integer accumulation so the comparison threshold
    is bit-reproducible at any parallelism."""
    from server2_vector_search_server_spark.session import load_tables

    load_tables(spark, sf_dir, "orders")
    return spark.sql(_ABOVE_AVG_SQL)


@query(
    "events_pivot_by_type",
    survey="D-extension(pivot: rows -> typed count columns)",
    oracle="""
    SELECT user_id % 100 AS user_bucket,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                AS BIGINT) AS click,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS purchase,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                AS BIGINT) AS view,
           CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                AS BIGINT) AS signup,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                AS BIGINT) AS error
    FROM events
    GROUP BY user_bucket
    ORDER BY user_bucket
    """,
)
def events_pivot_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event counts into one column per type. The explicit value list
    keeps the plan single-pass (no extra distinct-values job) and the output
    schema static — both required at scale and for the oracle contract."""
    events = tbl(spark, sf_dir, "events")
    types = ["click", "purchase", "view", "signup", "error"]
    out = (
        events.withColumn("user_bucket", F.col("user_id") % 100)
        .groupBy("user_bucket")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .orderBy("user_bucket")
    )
    return out.select("user_bucket",
                      *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(t)
                        for t in types])


@query(
    "events_lag_lead_deltas",
    survey="E-extension(lag/lead window navigation)",
    oracle="""
    SELECT event_id,
           epoch_us(CAST(ts AS TIMESTAMP))
             - LAG(epoch_us(CAST(ts AS TIMESTAMP)))
               OVER (PARTITION BY user_id
                     ORDER BY ts, event_id) AS micros_since_prev,
           LEAD(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS next_type
    FROM events
    ORDER BY event_id
    """,
)
def events_lag_lead_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user navigation functions: time since the previous event and the
    next event's type. Exact integer microseconds on both engines (second
    arithmetic differs: Spark floors each timestamp, DuckDB rounds the
    interval). Deterministic frame order via (ts, event_id)."""
    from pyspark.sql import Window

    events = tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.select(
            "event_id",
            (F.unix_micros("ts")
             - F.unix_micros(F.lag("ts").over(w))).alias("micros_since_prev"),
            F.lead("event_type").over(w).alias("next_type"))
        .orderBy("event_id")
    )


@query(
    "cube_order_stats",
    survey="D-extension(CUBE grouping sets: all dimension combinations)",
    oracle=f"""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n_orders,
           {sql_exact_sum('o_totalprice', 2)} AS total_price
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    ORDER BY status, priority
    """,
)
def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE — all 2^d dimension combinations in one aggregate pass (the
    sibling of rollup_revenue's hierarchy). Grouping-set expansion happens
    inside a single Expand + aggregate: one shuffle regardless of d."""
    orders = tbl(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             exact_sum(F.col("o_totalprice"), 2).alias("total_price"))
        .select(F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
                F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
                "n_orders", "total_price")
        .orderBy("status", "priority")
    )


@query(
    "part_brand_revenue",
    survey="C,D(fact-dim join over the part table)",
    oracle=f"""
    SELECT p_brand,
           {sql_exact_sum('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def part_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per part brand — fact⨝part with the dimension broadcast; the
    fact side is never shuffled for the join."""
    li = tbl(spark, sf_dir, "lineitem")
    part = tbl(spark, sf_dir, "part")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(exact_sum(revenue, 4).alias("revenue"),
             F.count(F.lit(1)).alias("n_lineitems"))
        .orderBy("p_brand")
    )


@query(
    "supplier_region_sales",
    survey="C,D(TPC-H Q5 shape: full dimension chain to region)",
    oracle=f"""
    SELECT r_name,
           {sql_exact_sum('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
           COUNT(DISTINCT s_suppkey) AS n_suppliers
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    ORDER BY r_name
    """,
)
def supplier_region_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5-shaped chain fact→supplier→nation→region: every dimension
    broadcasts, so the whole query is one fact scan plus the final 5-group
    aggregate — no join shuffle at any scale factor."""
    li = tbl(spark, sf_dir, "lineitem")
    supplier = tbl(spark, sf_dir, "supplier")
    nation = tbl(spark, sf_dir, "nation")
    region = tbl(spark, sf_dir, "region")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(exact_sum(revenue, 4).alias("revenue"),
             F.count_distinct("s_suppkey").alias("n_suppliers"))
        .orderBy("r_name")
    )


_REACHABILITY_SQL = """
    WITH RECURSIVE reach(node, hop) AS (
      SELECT CAST(0 AS BIGINT) AS node, 0 AS hop
      UNION ALL
      SELECT e.dst AS node, r.hop + 1 AS hop
      FROM reach r
      JOIN (
        SELECT p_partkey AS src, (p_partkey * 7 + 13) % 200 AS dst
        FROM part WHERE p_partkey < 200
        UNION ALL
        SELECT p_partkey AS src, (p_partkey * 3 + 41) % 200 AS dst
        FROM part WHERE p_partkey < 200
      ) e ON e.src = r.node
      WHERE r.hop < 8
    )
    SELECT node, MIN(hop) AS min_hops, COUNT(*) AS n_paths
    FROM reach
    GROUP BY node
    ORDER BY node
"""


@query(
    "part_reachability_recursive",
    survey="C-extension(recursive CTE via spark.sql: bounded BFS "
           "reachability — the same WITH RECURSIVE text runs on both "
           "engines)",
    oracle=_REACHABILITY_SQL,
)
def part_reachability_recursive(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """WITH RECURSIVE as literal SQL through spark.sql() (Spark 4 recursive
    CTE support): 8-hop bounded BFS over a deterministic two-successor
    graph derived from part keys, reporting minimum hop count and path
    multiplicity per reached node. The identical ANSI text IS the DuckDB
    oracle — the strongest possible parity claim for the recursion
    surface. For unbounded closures at scale, the iterative DataFrame
    operators (connected components, PageRank) remain the right tool; the
    recursion here certifies the SQL dialect itself."""
    from server2_vector_search_server_spark.session import load_tables

    load_tables(spark, sf_dir, "part")
    return spark.sql(_REACHABILITY_SQL)


_LATERAL_SQL = """
    SELECT r.r_name, n.n_name, t.total_spend
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey,
    LATERAL (
      SELECT CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS total_spend
      FROM customer c
      JOIN orders o ON o.o_custkey = c.c_custkey
      WHERE c.c_nationkey = n.n_nationkey
    ) t
    ORDER BY r.r_name, n.n_name
"""


@query(
    "nation_spend_lateral",
    survey="C-extension(correlated LATERAL subquery via spark.sql: per-row "
           "derived table; Catalyst decorrelates to an aggregate + join)",
    oracle=_LATERAL_SQL,
)
def nation_spend_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL derived table correlated on the outer nation — per-nation
    total spend computed 'per row' in the SQL text, decorrelated by
    Catalyst into one aggregate + join (no per-row re-scan; the naive
    interpretation would scan orders once per nation). The identical ANSI
    text runs as the DuckDB oracle. Scaled-integer SUM keeps the money
    total bit-reproducible at any parallelism."""
    from server2_vector_search_server_spark.session import load_tables

    load_tables(spark, sf_dir, "region", "nation", "customer", "orders")
    return spark.sql(_LATERAL_SQL)


@query(
    "events_pivot_clause",
    survey="D-extension(native SQL PIVOT clause: multi-aggregate pivot "
           "with typed NULL cells for absent combinations)",
    oracle="""
    -- the PIVOT clause is dialect-specific; the oracle is the semantic
    -- spec: conditional aggregates with NULL (not 0) for absent cells
    SELECT user_id % 20 AS user_bucket,
           (SUM(CASE WHEN event_type = 'click'
                 THEN CAST(ROUND(value * 100) AS BIGINT) END) / 100.0)
             AS click_total,
           CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT)
             AS click_n,
           (SUM(CASE WHEN event_type = 'purchase'
                 THEN CAST(ROUND(value * 100) AS BIGINT) END) / 100.0)
             AS purchase_total,
           CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
                AS BIGINT) AS purchase_n
    FROM events
    WHERE user_id < 400
    GROUP BY user_bucket
    ORDER BY user_bucket
    """,
)
def events_pivot_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native SQL PIVOT clause with MULTIPLE aggregates per pivot
    value (sum + count per event type). The contract being pinned: absent
    (bucket, type) combinations surface as typed NULL cells, not zeros —
    conditional-CASE aggregation (events_pivot_by_type) yields 0 for
    COUNT-style sums, the PIVOT clause yields NULL; both are correct, a
    migration must know which it is getting. Scaled-integer sums keep the
    money totals bit-reproducible."""
    from server2_vector_search_server_spark.session import load_tables

    load_tables(spark, sf_dir, "events")
    return spark.sql("""
      SELECT user_bucket,
             CAST(click_cents AS DOUBLE) / 100.0 AS click_total,
             CAST(click_n AS BIGINT) AS click_n,
             CAST(purchase_cents AS DOUBLE) / 100.0 AS purchase_total,
             CAST(purchase_n AS BIGINT) AS purchase_n
      FROM (
        SELECT user_id % 20 AS user_bucket, event_type,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events WHERE user_id < 400)
      PIVOT (SUM(cents) AS cents, COUNT(cents) AS n
             FOR event_type IN ('click' AS click, 'purchase' AS purchase))
      ORDER BY user_bucket""")


@query(
    "events_bitmap_distinct_users",
    survey="D4-adjacent (bitmap-aggregate distinct counting: Spark 4 "
           "bitmap_construct_agg/bitmap_count — the roaring-bitmap "
           "pattern for mergeable EXACT distinct counts; oracle is plain "
           "COUNT(DISTINCT))",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(DISTINCT user_id % 64) AS BIGINT)
             AS n_user_buckets
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def events_bitmap_distinct_users(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """EXACT distinct users per event type computed as BITMAPS: each
    user_id sets one bit (bitmap_bucket_number/bitmap_bit_position),
    per-partition bitmaps OR-merge (bitmap_construct_agg is a full
    partial-aggregable monoid), bitmap_count pops the answer. Unlike HLL
    (`events_hll_distinct_rollup`) this is exact, and unlike
    COUNT(DISTINCT) it never expands rows (no Expand node, no
    distinct-shuffle of (type, user) pairs — the SCALE §13 trap): state
    per group is one bitmap ≤ |id-space|/8 bits. The 100 TB pattern for
    billion-user distinct dashboards with int keys; the second column
    shows the same machinery over a hashed/bucketed key for unbounded id
    spaces. Oracle: plain COUNT(DISTINCT) — same numbers, different
    physics."""
    events = tbl(spark, sf_dir, "events")
    by_bucket = (events.select(
        "event_type",
        F.expr("bitmap_bucket_number(user_id)").alias("bkt"),
        F.expr("bitmap_bit_position(user_id)").alias("pos"),
        F.expr("bitmap_bucket_number(user_id % 64)").alias("hbkt"),
        F.expr("bitmap_bit_position(user_id % 64)").alias("hpos")))
    full = (by_bucket.groupBy("event_type", "bkt")
            .agg(F.expr("bitmap_count(bitmap_construct_agg(pos))")
                 .alias("c"))
            .groupBy("event_type")
            .agg(F.sum("c").cast("long").alias("n_users")))
    hashed = (by_bucket.groupBy("event_type", "hbkt")
              .agg(F.expr("bitmap_count(bitmap_construct_agg(hpos))")
                   .alias("c"))
              .groupBy("event_type")
              .agg(F.sum("c").cast("long").alias("n_user_buckets")))
    return (full.join(hashed, "event_type")
            .select("event_type", "n_users", "n_user_buckets")
            .orderBy("event_type"))


_SQL_OHLC = """
    SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS bucket,
           event_type,
           ROUND(arg_min(CAST(value AS DOUBLE),
                         CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)))
                              AS BIGINT)
                           * 100000000 + event_id), 2) AS open,
           ROUND(MAX(CAST(value AS DOUBLE)), 2) AS high,
           ROUND(MIN(CAST(value AS DOUBLE)), 2) AS low,
           ROUND(arg_max(CAST(value AS DOUBLE),
                         CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)))
                              AS BIGINT)
                           * 100000000 + event_id), 2) AS close,
           CAST(COUNT(*) AS BIGINT) AS volume
    FROM events
    GROUP BY bucket, event_type
    ORDER BY bucket, event_type
    """


@query(
    "events_ohlc_hourly",
    survey="I-extension (OHLC candle downsampling: deterministic "
           "first/last via min_by/max_by on a composite order scalar, "
           "one shuffle)",
    oracle=_SQL_OHLC,
)
def events_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series downsampling to hourly OHLC candles per event type —
    the storage shape every metrics/market pipeline compacts raw ticks
    into. first/last are NOT Spark's order-undefined ``first()``/
    ``last()``: the open/close are ``min_by``/``max_by`` on the composite
    scalar epoch*1e8 + event_id, so ties inside one second resolve by
    event id identically on both engines, under any shuffle order. One
    map-side-combinable aggregation — at 100 TB this is the canonical
    'compact before you store' pass, shuffle ∝ buckets x types."""
    events = tbl(spark, sf_dir, "events")
    ordk = (F.unix_timestamp("ts").cast("long") * 100000000
            + F.col("event_id"))
    v = F.col("value").cast("double")
    return (events
            .groupBy(F.date_trunc("hour", "ts").alias("bucket"),
                     "event_type")
            .agg(F.round(F.min_by(v, ordk), 2).alias("open"),
                 F.round(F.max(v), 2).alias("high"),
                 F.round(F.min(v), 2).alias("low"),
                 F.round(F.max_by(v, ordk), 2).alias("close"),
                 F.count(F.lit(1)).cast("long").alias("volume"))
            .orderBy("bucket", "event_type"))


@query(
    "streaming_ohlc_upkeep",
    survey="I × time-series (incremental OHLC maintenance: per-micro-"
           "batch candle partials per ingest_batch partition, "
           "min_by/max_by-merged at read, batch-0 replay folded in — "
           "hash-pins to the SAME oracle as the batch candles, because "
           "the OHLC merge is exact and associative)",
    oracle=_SQL_OHLC,
)
def streaming_ohlc_upkeep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``events_ohlc_hourly`` maintained incrementally: each micro-batch
    folds its events into per-(bucket, type) candle PARTIALS — (open,
    ord_min, high, low, close, ord_max, volume) — written under the
    batch's own partition; state per batch ∝ touched buckets x types,
    never events. Serving merges partials with the same associative
    algebra (open = value at the globally minimal order key, etc.), so
    stream-built candles equal batch-built candles BIT-EXACTLY — proven
    by sharing the batch query's oracle. At-least-once replay of batch 0
    is idempotent via dynamic partition overwrite (the CMS-upkeep
    discipline). Values stay UNROUNDED in state; rounding happens once
    at serve time, exactly like the batch path."""
    import os
    import uuid as _uuid

    from server2_vector_search_server_spark.session import (
        read_events_stream,
    )

    src = scratch_dir("ohlc_stream_")
    link_table_files(sf_dir, "events", src)
    state = scratch_dir("ohlc_state_") + "/candles"

    ordk = (F.unix_timestamp("ts").cast("long") * 100000000
            + F.col("event_id"))
    v = F.col("value").cast("double")

    def process(batch, batch_id: int) -> None:
        (batch
         .groupBy(F.date_trunc("hour", "ts").alias("bucket"), "event_type")
         .agg(F.min_by(v, ordk).alias("open"),
              F.min(ordk).alias("ord_min"),
              F.max(v).alias("high"), F.min(v).alias("low"),
              F.max_by(v, ordk).alias("close"),
              F.max(ordk).alias("ord_max"),
              F.count(F.lit(1)).alias("volume"))
         .withColumn("ingest_batch", F.lit(int(batch_id)))
         .write.mode("overwrite").partitionBy("ingest_batch")
         .option("partitionOverwriteMode", "dynamic").parquet(state))

    with state_partitions(spark):
        q = (read_events_stream(spark, src)
             .select("event_id", "ts", "event_type", "value")
             .writeStream.foreachBatch(process)
             .option("checkpointLocation",
                     scratch_dir(f"ohlc_ckpt_{_uuid.uuid4().hex[:6]}"))
             .trigger(availableNow=True).start())
        q.awaitTermination()

    b0 = (spark.read.parquet(state)
          .filter(F.col("ingest_batch") == 0)
          .drop("ingest_batch").localCheckpoint(eager=True))
    (b0.withColumn("ingest_batch", F.lit(0))
     .write.mode("overwrite").partitionBy("ingest_batch")
     .option("partitionOverwriteMode", "dynamic").parquet(state))

    return (spark.read.parquet(state)
            .groupBy("bucket", "event_type")
            .agg(F.round(F.min_by("open", "ord_min"), 2).alias("open"),
                 F.round(F.max("high"), 2).alias("high"),
                 F.round(F.min("low"), 2).alias("low"),
                 F.round(F.max_by("close", "ord_max"), 2).alias("close"),
                 F.sum("volume").cast("long").alias("volume"))
            .orderBy("bucket", "event_type"))
