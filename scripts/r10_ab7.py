"""Round-10 optimization A/B #7 (method: r10_ab1.py).

Pairs (old form inline, new form = registry):
  funnel   3x-evaluated stage tables        vs per-stage checkpoints
  q13      left-outer join then count       vs pre-aggregated fact side
  boiler   3-branch line dedup (anti-join)  vs single-pass keep-flag form
  asof     right pre-agg groupBy            vs tie-break in window order

Usage: PYTHONPATH=/root/repo python scripts/r10_ab7.py [passes]
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = int(sys.argv[1]) if len(sys.argv) > 1 else 5

from pyspark.sql import DataFrame, Window, functions as F  # noqa: E402

from server2_vector_search_server_spark.plans.registry import tbl  # noqa: E402


def old_funnel(spark, sf_dir) -> DataFrame:
    events = tbl(spark, sf_dir, "events")
    v = (events.filter(F.col("event_type") == "view")
         .groupBy("user_id").agg(F.min("ts").alias("t1")))
    c = (events.filter(F.col("event_type") == "click")
         .join(v, "user_id")
         .filter(F.col("ts") > F.col("t1"))
         .groupBy("user_id").agg(F.min("ts").alias("t2")))
    p = (events.filter(F.col("event_type") == "purchase")
         .join(c, "user_id")
         .filter(F.col("ts") > F.col("t2"))
         .groupBy("user_id").agg(F.min("ts").alias("t3")))
    nv = v.agg(F.count(F.lit(1)).alias("n_view"))
    nc = c.agg(F.count(F.lit(1)).alias("n_click"))
    np_ = p.agg(F.count(F.lit(1)).alias("n_purchase"))
    return (nv.crossJoin(nc).crossJoin(np_)
            .select(
                "n_view", "n_click", "n_purchase",
                F.round(F.col("n_click")
                        / F.col("n_view").cast("double"), 6)
                .alias("click_rate"),
                F.round(F.col("n_purchase")
                        / F.col("n_click").cast("double"), 6)
                .alias("purchase_rate")))


def old_q13(spark, sf_dir) -> DataFrame:
    cust = tbl(spark, sf_dir, "customer")
    orders = tbl(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders,
                  (F.col("c_custkey") == F.col("o_custkey"))
                  & (F.col("o_orderpriority") != "1-URGENT"),
                  "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count")))
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def _old_remove_boilerplate(docs, *, text_col="text", id_col="doc_id",
                            min_docs=5):
    lines = (
        docs.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), "\n"))
            .alias("line_no", "line"))
        .filter(F.trim("line") != "")
        .withColumn("line_key", F.trim("line"))
    )
    common = (
        lines.groupBy("line_key")
        .agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("line_key")
    )
    kept = lines.join(common, "line_key", "left_anti")
    n_total = (lines.groupBy(id_col)
               .agg(F.count(F.lit(1)).alias("_n_total")))
    return (
        kept.groupBy(id_col)
        .agg(F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct("line_no", "line"))),
                    lambda s: s["line"]),
                "\n").alias(text_col),
             F.count(F.lit(1)).alias("n_kept"))
        .join(n_total, id_col)
        .withColumn("n_removed", F.col("_n_total") - F.col("n_kept"))
        .drop("_n_total")
    )


def old_boiler(spark, sf_dir) -> DataFrame:
    docs = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    corpus = docs.select(
        "doc_id",
        F.concat(
            F.lit("NAV MENU HOME ABOUT\n"),
            F.when(F.col("doc_id") % 2 == 0, F.lit("SUBSCRIBE NOW\n"))
            .otherwise(F.lit("")),
            F.when(F.col("doc_id") % 97 == 0, F.lit("RARE NOTICE\n"))
            .otherwise(F.lit("")),
            F.col("text"),
            F.lit("\nCOPYRIGHT ALL RIGHTS RESERVED")).alias("text"))
    out = _old_remove_boilerplate(corpus, min_docs=5)
    return (out.select("doc_id", "text",
                       F.col("n_kept").cast("int").alias("n_kept"),
                       F.col("n_removed").cast("int").alias("n_removed"))
            .orderBy("doc_id"))


def _old_asof_join(left, right, *, on="ts", by=None, value_col="value",
                   out_col="asof_value"):
    key_cols = [by] if by else []
    rights = (right.groupBy(*key_cols, on)
              .agg(F.max(value_col).alias(out_col))
              .withColumn("_is_r", F.lit(1)))
    lefts = left.withColumn("_is_r", F.lit(0)) \
                .withColumn(out_col, F.lit(None).cast(
                    rights.schema[out_col].dataType))
    unioned = lefts.unionByName(
        rights.select(*key_cols, on, out_col, "_is_r"),
        allowMissingColumns=True)
    w = (Window.partitionBy(*(key_cols or [F.lit(1)]))
         .orderBy(F.col(on).asc(), F.col("_is_r").desc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        unioned.withColumn(out_col,
                           F.last(out_col, ignorenulls=True).over(w))
        .filter(F.col("_is_r") == 0)
        .drop("_is_r")
    )


def old_asof(spark, sf_dir) -> DataFrame:
    events = tbl(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase") \
                      .select("user_id", "ts", "value")
    return (
        _old_asof_join(
            events.select("event_id", "user_id", "event_type", "ts"),
            purchases, on="ts", by="user_id",
            value_col="value", out_col="last_purchase")
        .select("event_id", "user_id", "event_type", "last_purchase")
        .orderBy("event_id")
    )


def main() -> None:
    from server2_vector_search_server_spark.plans import load_registry
    from server2_vector_search_server_spark.session import get_spark

    spark = get_spark("r10_ab7")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_registry()

    pairs = {
        "funnel": (old_funnel,
                   registry["events_funnel_conversion"].fn),
        "q13": (old_q13, registry["customer_order_distribution"].fn),
        "boiler": (old_boiler, registry["dedup_boilerplate_lines"].fn),
        "asof": (old_asof, registry["events_asof_join"].fn),
    }
    for key, (old, new) in pairs.items():
        o = [tuple(r) for r in old(spark, SF_DIR).collect()]
        n = [tuple(r) for r in new(spark, SF_DIR).collect()]
        assert o == n, f"{key}: results differ!"
        print(f"identity OK: {key} ({len(n)} rows)", file=sys.stderr)

    times: dict[str, list[float]] = {}
    for p in range(PASSES):
        for key, (old, new) in pairs.items():
            arms = [("old", old), ("new", new)]
            if p % 2:
                arms.reverse()
            for arm, fn in arms:
                k = f"{key}:{arm}"
                spark.sparkContext.setJobDescription(f"ab7 {k} p{p}")
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop") \
                    .mode("overwrite").save()
                times.setdefault(k, []).append(time.perf_counter() - t0)
                spark.catalog.clearCache()
    out = {}
    for key in pairs:
        o = times[f"{key}:old"]
        n = times[f"{key}:new"]
        mo = sorted(o)[len(o) // 2]
        mn = sorted(n)[len(n) // 2]
        out[key] = {"old": round(mo, 3), "new": round(mn, 3),
                    "delta_pct": round(100 * (mn - mo) / mo, 1),
                    "old_runs": [round(r, 3) for r in o],
                    "new_runs": [round(r, 3) for r in n]}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
