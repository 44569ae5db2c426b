"""SCALE §44 — runtime-filter (Bloom) join pruning: when does the gate pay?

Measures `lineitem_bloom_join_prune`'s pattern at sf0.1 under the two join
regimes that matter:

  * broadcast join (dim fits executor memory — the local default): the gate
    is pure overhead, because the join itself is already map-side;
  * shuffle join (broadcast disabled, the 100 TB regime where the dimension
    is too big to broadcast but still selective): the gate removes
    non-matching fact rows BEFORE the exchange, which is the entire point of
    runtime filters.

Also reports the gated-row counts, because wall-clock at local scale
understates what shrinking the exchange buys a real cluster.

Run:  python scripts/scale44_bloom_join.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from server2_vector_search_server_spark.operators.dedup import (  # noqa: E402
    bloom_might_contain,
    bloom_positions,
    build_bloom,
)
from server2_vector_search_server_spark.session import (  # noqa: E402
    get_spark,
    read_table,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def bench(label, df, runs=3):
    best = None
    for _ in range(runs):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"  {label:<46} {best:6.2f} s (best of {runs})")
    return best


def main() -> None:
    spark = get_spark("scale44")
    spark.sparkContext.setLogLevel("ERROR")

    for sel_label, dim_filter in [
        ("selective dim (urgent+1996, ~1% of orders)",
         (F.col("o_orderpriority") == "1-URGENT")
         & (F.year("o_orderdate") == 1996)),
        ("loose dim (urgent any year, ~20%)",
         F.col("o_orderpriority") == "1-URGENT"),
    ]:
        orders = read_table(spark, SF_DIR, "orders")
        li = read_table(spark, SF_DIR, "lineitem").select(
            "l_orderkey", "l_shipdate", "l_extendedprice", "l_discount")
        dim = orders.filter(dim_filter).select("o_orderkey")
        n_dim = dim.count()
        n_li = li.count()
        bloom = build_bloom(
            dim.select(F.col("o_orderkey").cast("string").alias("k")), "k")
        gated = (li.withColumn("_pos", bloom_positions(
            F.col("l_orderkey").cast("string")))
            .join(F.broadcast(bloom))
            .filter(bloom_might_contain("_pos", "bloom_words"))
            .drop("_pos", "bloom_words"))
        n_gated = gated.count()
        print(f"\n== {sel_label}: dim keys {n_dim}, lineitem {n_li}, "
              f"bloom-gated {n_gated} "
              f"({100.0 * n_gated / n_li:.1f}% pass the gate)")

        rev = F.round(F.col("l_extendedprice")
                      * (1 - F.col("l_discount")) * 100).cast("long")

        def agg(fact):
            return (fact.join(F.broadcast(dim),
                              fact.l_orderkey == dim.o_orderkey)
                    .groupBy(F.month("l_shipdate").alias("m"))
                    .agg(F.count(F.lit(1)).alias("n"),
                         F.sum(rev).alias("cents")))

        def agg_shuffle(fact):
            return (fact.join(dim.hint("merge"),
                              fact.l_orderkey == dim.o_orderkey)
                    .groupBy(F.month("l_shipdate").alias("m"))
                    .agg(F.count(F.lit(1)).alias("n"),
                         F.sum(rev).alias("cents")))

        bench("broadcast join, no gate", agg(li))
        bench("broadcast join, bloom gate", agg(gated))
        bench("shuffle (merge) join, no gate", agg_shuffle(li))
        bench("shuffle (merge) join, bloom gate", agg_shuffle(gated))


if __name__ == "__main__":
    main()
