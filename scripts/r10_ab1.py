"""Round-10 optimization A/B #1: same-process interleaved old-vs-new for the
first change batch, with result-identity asserted per pair (the SCALE §59
admissible method — cross-round artifact ratios are not evidence on this
fleet).

Pairs:
  butterfly   old wedge self-join        vs new in-array pair explode
  facility    old 2-actions-per-round    vs new gain-running-sum
  shapley     old second-scan j.count()  vs new bym-derived n_j
  components  old per-round new⋈old join vs new inline _chg count
  kcore_plans old count-then-checkpoint  vs new checkpoint-then-count
  ewma        applyInPandas grouped fold vs JVM aggregate() HOF fold (probe)

Usage: PYTHONPATH=/root/repo python scripts/r10_ab1.py [passes]
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = int(sys.argv[1]) if len(sys.argv) > 1 else 5

from pyspark.sql import DataFrame, functions as F  # noqa: E402


# --- old variants (verbatim from git HEAD before this round's edits) -------

def old_butterfly(spark, sf_dir) -> DataFrame:
    from server2_vector_search_server_spark.plans.graph_queries import (
        shipment_pairs,
    )
    pairs = shipment_pairs(spark, sf_dir)
    a = pairs.select(F.col("l_suppkey").alias("s1"),
                     F.col("o_custkey").alias("c"))
    b = pairs.select(F.col("l_suppkey").alias("s2"),
                     F.col("o_custkey").alias("c"))
    copairs = (a.join(b, "c")
               .filter(F.col("s1") < F.col("s2"))
               .groupBy("s1", "s2")
               .agg(F.count(F.lit(1)).cast("long").alias("co")))
    deg = pairs.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("deg"))
    wedges = deg.agg(
        F.sum((F.col("deg") * (F.col("deg") - 1) / 2).cast("long"))
        .cast("long").alias("n_wedges"))
    stats = copairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_copaired_supplier_pairs"),
        F.coalesce(F.sum((F.col("co") >= 2).cast("long")), F.lit(0))
        .cast("long").alias("n_pairs_with_butterfly"),
        F.coalesce(F.sum((F.col("co") * (F.col("co") - 1) / 2)
                         .cast("long")), F.lit(0))
        .cast("long").alias("n_butterflies"))
    return (wedges.crossJoin(F.broadcast(stats))
            .select("n_wedges", "n_copaired_supplier_pairs",
                    "n_pairs_with_butterfly", "n_butterflies"))


def old_facility(spark, sf_dir) -> DataFrame:
    from server2_vector_search_server_spark.functions.vector import (
        cosine_similarity,
    )
    from server2_vector_search_server_spark.plans.registry import tbl

    emb = tbl(spark, sf_dir, "embeddings")
    universe = emb.filter(F.col("vec_id") < 200)
    pool = emb.filter(F.col("vec_id") < 40)
    k = 5
    factor = 10 ** 6
    u = universe.select(F.col("vec_id").alias("_v"),
                        F.col("embedding").alias("_uvec"))
    p = pool.select(F.col("vec_id").alias("_c"),
                    F.col("embedding").alias("_pvec"))
    sim = F.round(F.greatest(
        cosine_similarity(F.col("_uvec"), F.col("_pvec")),
        F.lit(0.0)), 6)
    sims = (u.crossJoin(F.broadcast(p))
            .select("_c", "_v",
                    F.round(sim * factor).cast("long").alias("_s"))
            .localCheckpoint(eager=True))
    picked, rows = [], []
    for rank in range(1, k + 1):
        if picked:
            cov = (sims.filter(F.col("_c").isin(picked))
                   .groupBy("_v").agg(F.max("_s").alias("_cov")))
            gains = (sims.filter(~F.col("_c").isin(picked))
                     .join(cov, "_v", "left")
                     .withColumn("_g", F.greatest(
                         F.col("_s") - F.coalesce(F.col("_cov"), F.lit(0)),
                         F.lit(0)))
                     .groupBy("_c")
                     .agg(F.sum("_g").cast("long").alias("_gain")))
        else:
            gains = (sims.groupBy("_c")
                     .agg(F.sum("_s").cast("long").alias("_gain")))
        top = (gains.orderBy(F.col("_gain").desc(), F.col("_c").asc())
               .limit(1).collect())
        if not top:
            break
        picked.append(top[0]["_c"])
        total = (sims.filter(F.col("_c").isin(picked))
                 .groupBy("_v").agg(F.max("_s").alias("_cov"))
                 .agg(F.sum("_cov").cast("long")).collect()[0][0])
        rows.append((rank, top[0]["_c"], int(top[0]["_gain"]), int(total)))
    return spark.createDataFrame(
        rows, "rank int, vec_id long, gain_micro long, coverage_micro long")


def old_shapley(spark, sf_dir) -> DataFrame:
    from server2_vector_search_server_spark.plans.insight_queries import (
        _SHAP_BITS, _SHAP_DENOM,
    )
    from server2_vector_search_server_spark.plans.registry import tbl

    ev = tbl(spark, sf_dir, "events")
    bit = F.when(F.col("event_type") == "click", 1) \
        .when(F.col("event_type") == "error", 2) \
        .when(F.col("event_type") == "signup", 4) \
        .when(F.col("event_type") == "view", 8).otherwise(0)
    j = (ev.groupBy("user_id", F.to_date("ts").alias("day"))
         .agg(F.bit_or(bit).alias("mask"),
              F.max((F.col("event_type") == "purchase").cast("int"))
              .alias("conv")))
    bym = (j.groupBy("mask").agg(F.sum("conv").cast("long").alias("n_conv"))
           .localCheckpoint(eager=True))
    n_j = j.count()
    ss = spark.range(16).select(F.col("id").cast("int").alias("s"))
    coal = (ss.join(bym, F.col("mask").bitwiseAND(F.col("s"))
                    == F.col("mask"), "left")
            .groupBy("s").agg(F.coalesce(F.sum("n_conv"), F.lit(0))
                              .alias("v"))
            .localCheckpoint(eager=True))
    ch = spark.createDataFrame(list(_SHAP_BITS), "name string, bit int")
    w = (F.when(F.bit_count("s") == 0, 6)
         .when(F.bit_count("s") == 1, 2)
         .when(F.bit_count("s") == 2, 2).otherwise(6))
    cs = coal.select(F.col("s").alias("s0"), F.col("v").alias("v0"))
    cu = coal.select(F.col("s").alias("s1"), F.col("v").alias("v1"))
    phi = (ch.join(ss, F.col("s").bitwiseAND(F.col("bit")) == 0)
           .join(cs, F.col("s0") == F.col("s"))
           .join(cu, F.col("s1") == F.col("s").bitwiseOR(F.col("bit")))
           .groupBy("name")
           .agg(F.sum(w * (F.col("v1") - F.col("v0"))).alias("phi_scaled")))
    tot = phi.agg(F.sum("phi_scaled").alias("tot"))
    rhs = (coal.agg(
        (F.lit(_SHAP_DENOM)
         * (F.max(F.when(F.col("s") == 15, F.col("v")))
            - F.max(F.when(F.col("s") == 0, F.col("v"))))).alias("rhs")))
    return (phi.join(F.broadcast(tot)).join(F.broadcast(rhs))
            .select(F.col("name").alias("channel"),
                    F.round(F.col("phi_scaled").cast("double")
                            / (float(_SHAP_DENOM) * n_j), 6)
                    .alias("shapley_value"),
                    F.round(F.col("phi_scaled").cast("double")
                            / F.when(F.col("tot") != 0, F.col("tot"))
                            .cast("double"), 6).alias("share"),
                    (F.col("tot") == F.col("rhs")).alias("efficiency_ok"))
            .orderBy("channel"))


def _old_connected_components(edges, src, dst, max_iter=25):
    bi = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
          .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
          .distinct())
    labels = (bi.select(F.col("a").alias("node")).distinct()
              .withColumn("component", F.col("node"))
              .localCheckpoint(eager=True))
    for _ in range(max_iter):
        neighbor_min = (
            bi.join(labels, bi.b == labels.node)
            .groupBy("a").agg(F.min("component").alias("nbr_component")))
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.a, "left")
            .select(
                "node",
                F.least(
                    "component",
                    F.coalesce("nbr_component", F.col("component")))
                .alias("component"))
            .localCheckpoint(eager=True))
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count())
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError("no converge")


def old_component_groups(spark, sf_dir) -> DataFrame:
    from server2_vector_search_server_spark.operators.graph import (
        component_summary,
    )
    from server2_vector_search_server_spark.plans.dedup_queries import (
        _cosine_pairs,
    )
    comps = _old_connected_components(
        _cosine_pairs(spark, sf_dir).select("id_a", "id_b"), "id_a", "id_b")
    return component_summary(comps)


def old_kcore_influential(spark, sf_dir) -> DataFrame:
    from server2_vector_search_server_spark.operators.graph import k_core
    from server2_vector_search_server_spark.plans.quality_queries import (
        _IC_K, _IC_N, _IC_TOP,
    )
    from server2_vector_search_server_spark.plans.registry import tbl

    p = (tbl(spark, sf_dir, "part")
         .filter(F.col("p_partkey") < _IC_N)
         .select(F.col("p_partkey").alias("v")))
    e1 = p.select(F.col("v").alias("src"),
                  ((F.col("v") * 7 + 13) % _IC_N).alias("dst"))
    e2 = p.select(F.col("v").alias("src"),
                  ((F.col("v") * 3 + 41) % _IC_N).alias("dst"))
    core = k_core(e1.unionByName(e2), _IC_K)
    comps = _old_connected_components(core, "a", "b")
    return (comps
            .withColumn("influence", (F.col("node") * 37) % 100)
            .groupBy(F.col("component").alias("community"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"),
                 F.min("influence").cast("long").alias("influence"))
            .orderBy(F.col("influence").desc(), F.col("community").asc())
            .limit(_IC_TOP))


def ewma_hof(spark, sf_dir) -> DataFrame:
    """JVM HOF fold probe: identical float op sequence to the pandas fold
    (seed = first value; acc' = 0.2*x + 0.8*acc, IEEE doubles, same order)."""
    from server2_vector_search_server_spark.plans.registry import tbl

    alpha = 0.2
    events = tbl(spark, sf_dir, "events").filter(F.col("user_id") < 300)
    seq = (events
           .select("user_id", F.struct("ts", "event_id", "value").alias("e"))
           .groupBy("user_id")
           .agg(F.array_sort(F.collect_list("e")).alias("seq")))
    fold = F.aggregate(
        F.slice("seq", 2, F.greatest(F.size("seq") - 1, F.lit(0))),
        F.element_at("seq", 1)["value"].cast("double"),
        lambda acc, e: (F.lit(alpha) * e["value"].cast("double")
                        + F.lit(1.0 - alpha) * acc))
    return (seq.select("user_id",
                       F.size("seq").cast("long").alias("n_events"),
                       F.round(fold, 6).alias("ewma"))
            .orderBy("user_id"))


# --- harness ---------------------------------------------------------------

def canon(df: DataFrame):
    pdf = df.toPandas()
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    return pdf.sort_values(list(pdf.columns), ignore_index=True)


def main() -> None:
    from server2_vector_search_server_spark.plans import load_registry
    from server2_vector_search_server_spark.session import get_spark

    spark = get_spark("r10_ab1")
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_registry()

    warm = spark.read.parquet(os.path.join(SF_DIR, "region.parquet"))
    warm.join(warm.selectExpr("r_regionkey as k"),
              warm.r_regionkey == F.col("k")) \
        .groupBy("r_name").count() \
        .write.format("noop").mode("overwrite").save()
    from server2_vector_search_server_spark.plans.graph_queries import (
        shipment_silver,
    )
    shipment_silver(spark, SF_DIR)

    pairs = [
        ("butterfly", old_butterfly, reg["graph_butterfly_count"].fn),
        ("facility", old_facility,
         reg["embedding_facility_location_coreset"].fn),
        ("shapley", old_shapley, reg["events_shapley_attribution"].fn),
        ("components", old_component_groups, reg["dedup_component_groups"].fn),
        ("kcore_infl", old_kcore_influential,
         reg["graph_kcore_influential_communities"].fn),
        ("ewma", reg["events_ewma_by_user"].fn, ewma_hof),
    ]

    # identity first
    for name, old, new in pairs:
        a = canon(old(spark, SF_DIR))
        b = canon(new(spark, SF_DIR))
        same = a.equals(b)
        print(f"identity {name}: {'OK' if same else 'MISMATCH'}",
              file=sys.stderr)
        if not same:
            print(a.head(10).to_string(), file=sys.stderr)
            print(b.head(10).to_string(), file=sys.stderr)
            sys.exit(1)
        spark.catalog.clearCache()

    samples = {n: {"old": [], "new": []} for n, _, _ in pairs}
    for p in range(PASSES):
        for name, old, new in pairs:
            order = [("old", old), ("new", new)]
            if p % 2:
                order.reverse()
            for tag, fn in order:
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop") \
                    .mode("overwrite").save()
                samples[name][tag].append(
                    round(time.perf_counter() - t0, 3))
                spark.catalog.clearCache()
    out = {}
    for name, _, _ in pairs:
        o = sorted(samples[name]["old"])[PASSES // 2]
        n = sorted(samples[name]["new"])[PASSES // 2]
        out[name] = {"old_med": o, "new_med": n,
                     "ratio": round(n / o, 3) if o else None,
                     "old": samples[name]["old"],
                     "new": samples[name]["new"]}
        print(f"{name}: old {o}s -> new {n}s  (x{out[name]['ratio']})",
              file=sys.stderr)
    print(json.dumps({"loadavg": round(os.getloadavg()[0], 2),
                      "passes": PASSES, "results": out}))


if __name__ == "__main__":
    main()
