"""Additional TPC-H-shaped relational coverage (beyond-reference breadth).

The reference has no SQL surface (SURVEY.md §2.C/D "no equi-join", "no
grouping sets") — this module widens the engine's relational capability
checklist with the optimizer shapes the earlier queries did not yet
exercise:

  * conditional aggregation (CASE inside SUM)           — Q12 shape
  * aggregate-over-aggregate ratio in one pass          — Q14 shape
  * count-distinct per group + NOT-IN style exclusion   — Q16 shape
  * HAVING over a grouped fact, joined back to dims     — Q18 shape
  * disjunctive (OR-of-conjunctions) predicate pushdown — Q19 shape
  * scalar subquery threshold + anti-join existence     — Q22 shape
  * self-contained nation-pair volume (two role-joins
    of the same dimension)                              — Q7 shape
  * date arithmetic: datediff / year / quarter          — H(date extension)

All queries follow the parity rules in plans/registry.py: exact
scaled-integer sums, every computed column aliased identically on both
engines, deterministic ORDER BY.

100 TB notes are per-query docstrings; the common theme: every dimension
(customer/supplier/nation/part at any SF) broadcasts, the fact table is
scanned once with predicates pushed to parquet, and each query has exactly
one fact-side shuffle (its groupBy) — no shuffle joins anywhere in this
module except Q18's self-join-back, which co-partitions on the same key as
its aggregation so AQE reuses the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from server2_vector_search_server_spark.plans.registry import (
    exact_sum,
    query,
    sql_exact_sum,
    tbl,
)


@query(
    "priority_shipment_counts",
    survey="D-extension(conditional aggregation, TPC-H Q12 shape)",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def priority_shipment_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (fixture has no l_shipmode; l_returnflag plays the
    grouping role): conditional counts via CASE folded into one aggregate
    pass. The shipdate range is pushed to the parquet scan; lineitem⨝orders
    shuffles once on orderkey and the CASE arithmetic rides the same
    aggregation — no second pass per priority class."""
    li = tbl(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")))
    orders = tbl(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
             F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"))
        .orderBy("l_returnflag")
    )


@query(
    "promo_revenue_ratio",
    survey="D-extension(aggregate ratio in one pass, TPC-H Q14 shape)",
    oracle=f"""
    SELECT ROUND(
             100.0 * {sql_exact_sum(
                 "CASE WHEN p_type = 'PROMO' "
                 "THEN l_extendedprice * (1 - l_discount) ELSE 0 END", 4)}
                   / {sql_exact_sum('l_extendedprice * (1 - l_discount)', 4)},
             6) AS promo_revenue_pct
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1997-04-01'
    """,
)
def promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promotion revenue share. Numerator and denominator are
    computed in the SAME aggregate (one fact scan, one reduce to a single
    row) — never two scans. part broadcasts; the ratio of two exact
    scaled-integer sums is reproducible at any parallelism."""
    li = tbl(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp")))
    part = tbl(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(F.round(100.0 * exact_sum(promo_rev, 4) / exact_sum(rev, 4), 6)
             .alias("promo_revenue_pct"))
    )


@query(
    "brand_supplier_diversity",
    survey="D-extension(count-distinct per group + exclusion list, TPC-H Q16 shape)",
    oracle="""
    SELECT p_brand, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt,
           COUNT(*) AS n_lineitems
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type NOT IN ('PROMO', 'ECONOMY')
      AND p_size IN (1, 9, 19, 29, 39, 49)
    GROUP BY p_brand, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_size
    """,
)
def brand_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers serve each surviving
    (brand, size) bucket. The <> / NOT IN / IN predicates all push to the
    part scan BEFORE the join, so the fact side joins against a pre-shrunk
    broadcast. COUNT(DISTINCT) plans as a two-phase partial-distinct
    aggregate (dedup map-side, count reduce-side) — no collect_set blowup."""
    part = tbl(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & ~F.col("p_type").isin("PROMO", "ECONOMY")
        & F.col("p_size").isin(1, 9, 19, 29, 39, 49))
    li = tbl(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"),
             F.count(F.lit(1)).alias("n_lineitems"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_size")
    )


@query(
    "large_volume_orders",
    survey="D-extension(HAVING over grouped fact + join-back, TPC-H Q18 shape)",
    oracle=f"""
    SELECT c_name, o_orderkey, o_orderdate, o_totalprice,
           {sql_exact_sum('l_quantity', 2)} AS total_qty
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) / 100.0 > 300)
    GROUP BY c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds a HAVING threshold,
    joined back to customer detail. The qualifying-keys aggregate and the
    detail aggregate both hash-partition lineitem on l_orderkey — the same
    key — so AQE reuses one exchange rather than shuffling the fact twice;
    the key list then semi-joins (broadcast at this selectivity). customer
    broadcasts. Final top-100 is TakeOrderedAndProject."""
    li = tbl(spark, sf_dir, "lineitem")
    orders = tbl(spark, sf_dir, "orders")
    cust = tbl(spark, sf_dir, "customer")
    big_keys = (
        li.groupBy("l_orderkey")
        .agg((F.sum(F.round(F.col("l_quantity") * 100).cast("long")) / 100.0)
             .alias("qty"))
        .filter(F.col("qty") > 300)
        .select("l_orderkey"))
    return (
        li.join(big_keys, "l_orderkey", "left_semi")
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(exact_sum(F.col("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@query(
    "disjunctive_part_revenue",
    survey="B-extension(OR-of-conjunctions predicate pushdown, TPC-H Q19 shape)",
    oracle=f"""
    SELECT {sql_exact_sum('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
           COUNT(*) AS n_matched
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def disjunctive_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: an OR of three conjunctive brand/size/quantity bands.
    Catalyst extracts the common sub-predicates it can (brand IN (...),
    size <= 35, quantity <= 30) and pushes them into BOTH scans below the
    join, while the full disjunction evaluates as the join residual — the
    classic test that an optimizer doesn't give up on OR. Verified in
    .explain: PushedFilters on both parquet relations."""
    li = tbl(spark, sf_dir, "lineitem")
    part = tbl(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), part.p_partkey == li.l_partkey)
    band = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 30)))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        joined.filter(band)
        .agg(exact_sum(rev, 4).alias("revenue"),
             F.count(F.lit(1)).alias("n_matched"))
    )


@query(
    "rich_customers_no_urgent_orders",
    survey="C-extension(scalar-subquery threshold + anti-join, TPC-H Q22 shape)",
    oracle="""
    SELECT c_nationkey,
           COUNT(*) AS n_customers,
           SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) / 100.0 AS total_acctbal
    FROM customer c
    WHERE c_acctbal > (SELECT SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT))
                              / (100.0 * COUNT(*))
                       FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def rich_customers_no_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (every fixture customer has orders, so the
    anti-join condition is 'no URGENT order' rather than 'no order'):
    an uncorrelated scalar subquery computes the positive-balance average
    once (broadcast as a literal-like single-row plan), then a LEFT ANTI
    join removes customers holding urgent orders. The anti-join's right
    side is pre-filtered and pre-deduplicated to distinct custkeys — at
    100 TB that collapses the orders side to ~|customers| rows before the
    join, and it broadcasts whenever customers do."""
    cust = tbl(spark, sf_dir, "customer")
    orders = tbl(spark, sf_dir, "orders")
    avg_pos = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg((F.sum(F.round(F.col("c_acctbal") * 100).cast("long"))
              / (100.0 * F.count(F.lit(1)))).alias("a")))
    urgent_cust = (orders.filter(F.col("o_orderpriority") == "1-URGENT")
                   .select("o_custkey").distinct())
    return (
        cust.join(F.broadcast(avg_pos))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(urgent_cust, cust.c_custkey == urgent_cust.o_custkey,
              "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"),
             (F.sum(F.round(F.col("c_acctbal") * 100).cast("long")) / 100.0)
             .alias("total_acctbal"))
        .orderBy("c_nationkey")
    )


@query(
    "nation_pair_volume",
    survey="C-extension(two role-joins of one dimension, TPC-H Q7 shape)",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
           {sql_exact_sum('l_extendedprice * (1 - l_discount)', 4)} AS volume
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: trade volume between two nations, both directions — the
    same nation dimension joined twice under different roles. Both nation
    role-joins, supplier, and customer broadcast; the only shuffle is
    lineitem⨝orders on orderkey plus the final 2×years-group aggregate.
    The pair disjunction is evaluated after both roles resolve (it
    references both sides), but each role's IN ('NATION_1','NATION_2')
    implication is derived by Catalyst and pushed into the broadcast
    builds."""
    li = tbl(spark, sf_dir, "lineitem")
    supplier = tbl(spark, sf_dir, "supplier")
    orders = tbl(spark, sf_dir, "orders")
    cust = tbl(spark, sf_dir, "customer")
    nation = tbl(spark, sf_dir, "nation")
    n1 = nation.select(F.col("n_nationkey").alias("n1_key"),
                       F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("n2_key"),
                       F.col("n_name").alias("cust_nation"))
    pair = (
        ((F.col("supp_nation") == "NATION_1")
         & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2")
           & (F.col("cust_nation") == "NATION_1")))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(exact_sum(rev, 4).alias("volume"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "shipping_delay_stats",
    survey="H-extension(date arithmetic: datediff/year/quarter)",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS order_year,
           CAST(EXTRACT(quarter FROM o_orderdate) AS INTEGER) AS order_quarter,
           COUNT(*) AS n_lineitems,
           ROUND(SUM(date_diff('day', CAST(o_orderdate AS DATE),
                               CAST(l_shipdate AS DATE))) * 1.0
                 / COUNT(*), 6) AS avg_delay_days,
           MIN(date_diff('day', CAST(o_orderdate AS DATE),
                         CAST(l_shipdate AS DATE))) AS min_delay_days,
           MAX(date_diff('day', CAST(o_orderdate AS DATE),
                         CAST(l_shipdate AS DATE))) AS max_delay_days
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    GROUP BY order_year, order_quarter
    ORDER BY order_year, order_quarter
    """,
)
def shipping_delay_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-function coverage over the order→ship interval: datediff in
    whole days (exact integer arithmetic — the average is an integer sum
    divided by a count, rounded once), year/quarter extraction as grouping
    keys. One fact shuffle; the delay arithmetic is whole-stage-codegen
    column math."""
    li = tbl(spark, sf_dir, "lineitem")
    orders = tbl(spark, sf_dir, "orders")
    delay = F.datediff(F.col("l_shipdate").cast("date"),
                       F.col("o_orderdate").cast("date"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.year("o_orderdate").alias("order_year"),
                F.quarter("o_orderdate").alias("order_quarter"),
                delay.alias("delay"))
        .groupBy("order_year", "order_quarter")
        .agg(F.count(F.lit(1)).alias("n_lineitems"),
             F.round(F.sum("delay") * 1.0 / F.count(F.lit(1)), 6)
             .alias("avg_delay_days"),
             F.min("delay").alias("min_delay_days"),
             F.max("delay").alias("max_delay_days"))
        .orderBy("order_year", "order_quarter")
    )
