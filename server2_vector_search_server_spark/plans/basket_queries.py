"""Market-basket / pattern-mining query surface: exact pair affinity plus
the MLlib FP-Growth and PrefixSpan miners.

Exact pair co-occurrence is the SQL-checkable core of association analysis;
FP-Growth generalizes it to arbitrary-size itemsets and PrefixSpan to
ORDERED event sequences — both are MLlib distributed implementations whose
hash-partitioned mining steps aren't SQL-expressible (rows-only checks).

Scale notes (SCALE.md §18): the pair self-join explodes quadratically in
basket size — the affinity query therefore joins DISTINCT (order, item)
pairs (bounded baskets in TPC-H-shaped data; for long-tail baskets cap
per-basket items or switch to FP-Growth, which is exactly what the
companion query demonstrates). The pair aggregate is partial-aggregable;
its exchange carries only surviving (p1, p2) pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from server2_vector_search_server_spark.plans.registry import query, tbl

_MIN_ORDERS = 2
_TOP = 20


@query(
    "part_pair_affinity",
    survey="north-star pattern mining (exact market-basket pair "
           "co-occurrence with support threshold)",
    oracle=f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT a.l_partkey AS p1, b.l_partkey AS p2
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    counted AS (
      SELECT p1, p2, COUNT(*) AS n_orders
      FROM pairs GROUP BY p1, p2
      HAVING COUNT(*) >= {_MIN_ORDERS})
    SELECT p1, p2, CAST(n_orders AS BIGINT) AS n_orders
    FROM counted
    ORDER BY n_orders DESC, p1, p2
    LIMIT {_TOP}
    """,
)
def part_pair_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top part pairs bought together: distinct (order, part) self-join with
    p1 < p2 dedup, count per pair, support threshold, top-20. The self-join
    is co-partitioned on l_orderkey (one shuffle feeds both sides)."""
    items = (tbl(spark, sf_dir, "lineitem")
             .select("l_orderkey", "l_partkey").distinct())
    a = items.alias("a")
    b = items.alias("b")
    pairs = (a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                    & (F.col("a.l_partkey") < F.col("b.l_partkey")))
             .select(F.col("a.l_partkey").alias("p1"),
                     F.col("b.l_partkey").alias("p2")))
    return (pairs.groupBy("p1", "p2")
            .agg(F.count(F.lit(1)).alias("n_orders"))
            .filter(F.col("n_orders") >= _MIN_ORDERS)
            .orderBy(F.col("n_orders").desc(), "p1", "p2")
            .limit(_TOP))


@query(
    "orders_frequent_itemsets",
    survey="north-star pattern mining (MLlib FP-Growth frequent itemsets; "
           "distributed miner, not SQL-reproducible)",
    oracle=None,
)
def orders_frequent_itemsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FP-Growth over per-order part baskets (minSupport 0.1%): the scale
    path for association mining — no pairwise explosion, the FP-tree is
    mined per hash partition. Items sorted inside each set and sets ordered
    (freq desc, items) for a deterministic rows-only check."""
    from pyspark.ml.fpm import FPGrowth

    baskets = (tbl(spark, sf_dir, "lineitem")
               .groupBy("l_orderkey")
               .agg(F.array_sort(F.collect_set("l_partkey")).alias("items")))
    # baskets are ~4 items over a wide catalog: pair supports are a handful
    # of orders at any SF, so anchor the threshold at an absolute count
    # (freq >= 3) rather than a fixed fraction
    n_baskets = baskets.count()
    model = FPGrowth(itemsCol="items", minSupport=3.0 / n_baskets,
                     minConfidence=0.1).fit(baskets)
    return (model.freqItemsets
            .filter(F.size("items") >= 2)
            .select(F.array_sort("items").alias("items"), "freq")
            .orderBy(F.col("freq").desc(),
                     F.col("items").cast("string").asc()))


@query(
    "events_frequent_sequences",
    survey="north-star pattern mining (MLlib PrefixSpan sequential patterns "
           "over per-user event-type sequences; not SQL-reproducible)",
    oracle=None,
)
def events_frequent_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PrefixSpan over each user's first 20 events (event types in time
    order, one item per itemset): which journeys are frequent. Sequence
    assembly is a window + per-user aggregate; mining is MLlib's
    distributed prefix-projection."""
    from pyspark.ml.fpm import PrefixSpan
    from pyspark.sql import Window

    ev = tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seqs = (ev.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 20)
            .groupBy("user_id")
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: F.array(s["event_type"])).alias("sequence")))
    ps = PrefixSpan(minSupport=0.5, maxPatternLength=3,
                    maxLocalProjDBSize=32000000)
    return (ps.findFrequentSequentialPatterns(seqs)
            .select(F.col("sequence").cast("string").alias("pattern"),
                    "freq")
            .orderBy(F.col("freq").desc(), F.col("pattern").asc()))
