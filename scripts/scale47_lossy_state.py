"""SCALE §47 — lossy counting: summary size vs distinct-item count.

Runs the events_lossy_counting fold at sf0.1 and reports, per round, the
distinct items seen so far vs the pruned summary size, plus the worst
observed undercount vs the delta guarantee.

Run:  python scripts/scale47_lossy_state.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from server2_vector_search_server_spark.plans.sketch_queries import (  # noqa: E402
    _LC_DAYS_PER_BUCKET,
    _LC_ROUNDS,
)
from server2_vector_search_server_spark.session import (  # noqa: E402
    get_spark,
    read_table,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark()
    ev = read_table(spark, SF_DIR, "events")
    min_day = ev.agg(F.min(F.to_date("ts")).alias("d0"))
    cnt = (ev.join(F.broadcast(min_day))
           .select((F.floor(F.datediff(F.to_date("ts"), F.col("d0"))
                            / _LC_DAYS_PER_BUCKET)).cast("int").alias("b"),
                   F.round(F.col("value").cast("double")).cast("int")
                   .alias("item"))
           .groupBy("b", "item").agg(F.count(F.lit(1)).alias("c"))
           .localCheckpoint(eager=True))
    state = (cnt.filter((F.col("b") == 0) & (F.col("c") > 1))
             .select("item", F.col("c").alias("f"),
                     F.lit(0).cast("long").alias("delta")))
    seen = cnt.filter(F.col("b") == 0).select("item").distinct()
    print(f"{'round':>5} {'distinct_seen':>13} {'summary_rows':>12}")
    print(f"{1:>5} {seen.count():>13} {state.count():>12}")
    for r in range(2, _LC_ROUNDS + 1):
        batch = (cnt.filter(F.col("b") == r - 1)
                 .select(F.col("item").alias("b_item"), "c"))
        merged = (state.join(batch, state.item == batch.b_item,
                             "full_outer")
                  .select(F.coalesce("item", "b_item").alias("item"),
                          (F.coalesce("f", F.lit(0))
                           + F.coalesce("c", F.lit(0))).alias("f"),
                          F.coalesce("delta", F.lit(r - 1)).cast("long")
                          .alias("delta")))
        state = (merged.filter(F.col("f") + F.col("delta") > r)
                 .localCheckpoint(eager=True))
        seen = seen.unionByName(
            batch.select(F.col("b_item").alias("item"))).distinct() \
            .localCheckpoint(eager=True)
        print(f"{r:>5} {seen.count():>13} {state.count():>12}")
    truth = (ev.select(F.round(F.col("value").cast("double")).cast("int")
                       .alias("item"))
             .groupBy("item").agg(F.count(F.lit(1)).alias("t")))
    audit = (state.join(truth, "item")
             .select((F.col("t") - F.col("f")).alias("under"),
                     ((F.col("t") - F.col("f")) <= F.col("delta"))
                     .alias("ok")))
    row = audit.agg(F.max("under").alias("worst_under"),
                    F.min("ok").alias("all_within_delta")).first()
    print(f"worst undercount {row['worst_under']} "
          f"(guarantee: <= delta per item, all_within_delta="
          f"{row['all_within_delta']})")


if __name__ == "__main__":
    main()
