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

from pyspark.sql import DataFrame, SparkSession, Window
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
    survey="north-star pattern mining (MLlib FP-Growth frequent itemsets, "
           "recursive-CTE subset-enumeration oracle)",
    oracle="""
    WITH RECURSIVE b AS (
      SELECT l_orderkey, list_sort(list_distinct(list(l_partkey))) AS items
      FROM lineitem GROUP BY l_orderkey),
    -- every subset of every basket, each built exactly once (extend by
    -- strictly-later positions); bounded by sum(2^|basket|), fine at
    -- oracle SF
    sub AS (
      SELECT l_orderkey, [items[i]] AS s, i AS last_i, items
      FROM b, LATERAL (SELECT unnest(range(1, len(items) + 1)) AS i)
      UNION ALL
      SELECT l_orderkey, list_append(s, items[j]) AS s, j, items
      FROM sub,
           LATERAL (SELECT unnest(range(last_i + 1, len(items) + 1)) AS j)
    )
    SELECT array_to_string(list_sort(s), ',') AS items,
           CAST(COUNT(*) AS BIGINT) AS freq
    FROM sub WHERE len(s) >= 2
    GROUP BY 1 HAVING COUNT(*) >= 3
    ORDER BY freq DESC, items ASC
    """,
)
def orders_frequent_itemsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FP-Growth over per-order part baskets: the scale path for
    association mining — no pairwise explosion, the FP-tree is mined per
    hash partition. Oracle-checked since round 4: FP-Growth is an EXACT
    algorithm (every itemset with support ≥ minCount, nothing else), so a
    DuckDB twin that enumerates all ≥2-subsets of each ≤13-item basket via
    a recursive CTE and thresholds on count must produce the identical
    set — feasible at oracle SF (Σ 2^|basket| ≈ 8·10⁵ rows at sf0.01),
    while FP-Growth is what survives at corpus scale. Items serialized to
    a sorted CSV string (the driver's canonicalizer cannot hash list
    cells)."""
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
            .select(F.array_join(
                F.transform(F.array_sort("items"),
                            lambda x: x.cast("string")), ",")
                .alias("items"), "freq")
            .orderBy(F.col("freq").desc(), F.col("items").asc()))


@query(
    "events_frequent_sequences",
    survey="north-star pattern mining (MLlib PrefixSpan sequential "
           "patterns, subsequence-enumeration oracle)",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events),
    e AS (SELECT user_id, event_type, rn FROM ev WHERE rn <= 20),
    nu AS (SELECT COUNT(DISTINCT user_id) AS n FROM e),
    p1 AS (SELECT DISTINCT user_id,
                  '[[' || event_type || ']]' AS pat FROM e),
    p2 AS (
      SELECT DISTINCT a.user_id,
             '[[' || a.event_type || '], [' || b.event_type || ']]' AS pat
      FROM e a JOIN e b ON b.user_id = a.user_id AND b.rn > a.rn),
    p3 AS (
      SELECT DISTINCT a.user_id,
             '[[' || a.event_type || '], [' || b.event_type || '], ['
                  || c.event_type || ']]' AS pat
      FROM e a
      JOIN e b ON b.user_id = a.user_id AND b.rn > a.rn
      JOIN e c ON c.user_id = b.user_id AND c.rn > b.rn),
    allp AS (
      SELECT * FROM p1 UNION ALL SELECT * FROM p2
      UNION ALL SELECT * FROM p3)
    SELECT pat AS pattern, CAST(COUNT(*) AS BIGINT) AS freq
    FROM allp
    GROUP BY pat
    HAVING COUNT(*) >= CAST(ceil(0.5 * (SELECT n FROM nu)) AS BIGINT)
    ORDER BY freq DESC, pattern ASC
    """,
)
def events_frequent_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PrefixSpan over each user's first 20 events (event types in time
    order, one item per itemset): which journeys are frequent. Sequence
    assembly is a window + per-user aggregate; mining is MLlib's
    distributed prefix-projection.

    Oracle-checked since round 4: PrefixSpan is EXACT (every pattern with
    support ≥ ceil(minSupport·n), nothing else), and with
    maxPatternLength=3 over ≤20-item single-item-itemset sequences, the
    DuckDB twin can enumerate each user's DISTINCT subsequences of length
    ≤3 with three position-ordered self-joins (≤ C(20,3)+C(20,2)+20 ≈
    1.3k rows per user) and threshold the per-pattern user count — the
    enumeration is oracle-SF math; prefix-projection is what scales. The
    pattern string replicates Spark's array<array<string>> cast
    ('[[a], [b]]') so the hash compare is byte-identical."""
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


# ---------------------------------------------------------------------------
# ABC inventory classification (cumulative revenue share classes)

_ABC_A, _ABC_B = 0.7, 0.9


@query(
    "part_abc_classification",
    survey="insight extension(ABC inventory classification: parts ranked "
           "by revenue, cumulative-share cutoffs 70/90% — the Pareto "
           "CLASSIFICATION op next to the concentration report; exact "
           "cents cumulatives, cross-multiplied threshold compares)",
    oracle=f"""
    WITH pr AS (
        SELECT l_partkey,
               CAST(SUM(CAST(ROUND(CAST(l_extendedprice AS DOUBLE)
                    * (1 - CAST(l_discount AS DOUBLE)) * 100) AS BIGINT))
                    AS BIGINT) AS rev_cents
        FROM lineitem GROUP BY l_partkey
    ), ranked AS (
        SELECT l_partkey, rev_cents,
               CAST(SUM(rev_cents) OVER (ORDER BY rev_cents DESC, l_partkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_cents,
               CAST(SUM(rev_cents) OVER () AS BIGINT) AS tot_cents
        FROM pr
    ), classed AS (
        SELECT *,
               CASE WHEN cum_cents * 100 <= tot_cents * {int(_ABC_A * 100)}
                    THEN 'A'
                    WHEN cum_cents * 100 <= tot_cents * {int(_ABC_B * 100)}
                    THEN 'B' ELSE 'C' END AS abc_class
        FROM ranked
    )
    SELECT abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           (SUM(rev_cents) / 100.0) AS revenue,
           ROUND(CAST(SUM(rev_cents) AS DOUBLE) / MAX(tot_cents), 6)
               AS revenue_share
    FROM classed GROUP BY abc_class ORDER BY abc_class
    """,
)
def part_abc_classification(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """ABC analysis: rank parts by revenue, walk the cumulative share,
    and class them A (first 70% of revenue), B (to 90%), C (tail) —
    the inventory-policy segmentation (count cycle A items weekly, C
    items yearly).  Revenue folds as exact cents; the class cutoffs
    compare CROSS-MULTIPLIED integers (cum·100 ≤ tot·70), so no float
    share ever decides a boundary part — the k-anonymity floor()
    lesson applied to thresholds.  Tie-break (revenue DESC, partkey)
    pins the cumulative order.  Scale: one part-keyed aggregate; the
    cumulative window orders the part table (catalog-sized, not
    corpus-sized) — range-partitioned sort at scale."""
    li = tbl(spark, sf_dir, "lineitem")
    pr = (li.groupBy("l_partkey")
          .agg(F.sum(F.round(F.col("l_extendedprice")
                             * (1 - F.col("l_discount")) * 100)
                     .cast("long")).alias("rev_cents")))
    w_cum = (Window.orderBy(F.col("rev_cents").desc(), "l_partkey")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ranked = pr.select(
        "l_partkey", "rev_cents",
        F.sum("rev_cents").over(w_cum).cast("long").alias("cum_cents"),
        F.sum("rev_cents").over(Window.partitionBy()).cast("long")
        .alias("tot_cents"))
    cls = (F.when(F.col("cum_cents") * 100
                  <= F.col("tot_cents") * int(_ABC_A * 100), "A")
           .when(F.col("cum_cents") * 100
                 <= F.col("tot_cents") * int(_ABC_B * 100), "B")
           .otherwise("C"))
    return (ranked.withColumn("abc_class", cls)
            .groupBy("abc_class")
            .agg(F.count(F.lit(1)).cast("long").alias("n_parts"),
                 (F.sum("rev_cents") / 100.0).alias("revenue"),
                 F.round(F.sum("rev_cents").cast("double")
                         / F.max("tot_cents"), 6).alias("revenue_share"))
            .orderBy("abc_class"))
