"""SCALE.md §53: one measured decade — the top-cost pillars at 1× vs 10×.

Driver-generated data stops at sf0.1, so every per-pillar scale claim in
SCALE.md so far extrapolates from one point. This experiment materializes
a DETERMINISTIC 10× multiplication of every sf0.1 table (key-consistent
replica offsets, so joins stay referentially intact) and measures the 20
most expensive bench pillars (per BENCH_QUIET_r06) at both scales: wall
time and shuffle read/write bytes from the Spark status REST API.

Multiplication semantics (replica r = 0..9; MAX_k = max key + 1):
  region/nation    — unchanged (fixed dimensions, the TPC-H convention)
  customer         — c_custkey + r·MAX; names suffixed for r>0
  supplier/part    — same key-offset scheme
  orders           — o_orderkey + r·MAX_o, o_custkey + r·MAX_c
  lineitem         — l_orderkey/l_partkey/l_suppkey offset consistently
  events           — event_id + r·MAX_e, user_id + r·MAX_u (10× users in
                     the same time range ⇒ 10× hourly densities)
  documents        — doc_id + r·MAX_d; even r byte-identical copy, odd r
                     near-copy (unique suffix) — the scale22 planted-dup
                     convention, so dedup pillars scale on realistic
                     duplicate clusters
  embeddings       — vec_id + r·MAX_v; r>0 vectors deterministically
                     perturbed elementwise (no degenerate 10-way ties)

Hardcoded query constants (vec_id < 8, p_partkey < 200, …) all address
replica 0, which is preserved verbatim — every pillar stays semantically
valid; only the corpus it scans grows.

Verdict rule: a pillar is flagged SUPER-LINEAR if shuffle-write bytes
grow by more than 13× (10× + headroom for AQE re-bucketing) on a >10 MB
base; wall ratios are reported but judged loosely (local[32] CPU
contention is not cluster behavior).

Run:   python scripts/scale53_decade.py            # gen + both measures
       python scripts/scale53_decade.py --gen-only
       python scripts/scale53_decade.py --measure <sf_dir> --out <json>
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/sf1_synth")
UI_PORT = 4053
REPEATS = int(os.environ.get("SCALE53_REPEATS", "2"))
N_REPLICAS = 10

PILLARS = [
    "streaming_stream_stream_join", "graph_betweenness_centrality",
    "dedup_embedding_cosine_lsh", "graph_adamic_adar_links",
    "graph_pagerank", "graph_pagerank_shuffle",
    "dedup_shingle_containment", "events_ewma_by_user",
    "events_matrix_profile_motif", "dedup_component_groups",
    "ann_ivf_pq_knn", "streaming_incremental_rollup",
    "text_contamination_overlap", "kmeans_lloyd_assignments",
    "events_concurrency_sweep", "ann_pq_knn", "lineitem_bloom_join_prune",
    "ann_sq8_knn", "dedup_jaccard_prefix_filter", "streaming_wal_replay",
]


def _spark(ui: bool):
    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    b = (SparkSession.builder.master(f"local[{cpus}]")
         .appName("scale53")
         .config("spark.sql.shuffle.partitions", str(cpus))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.sql.autoBroadcastJoinThreshold",
                 str(64 * 1024 * 1024))
         .config("spark.driver.memory",
                 os.environ.get("SPARK_DRIVER_MEMORY", "12g"))
         .config("spark.ui.enabled", str(ui).lower())
         .config("spark.ui.port", str(UI_PORT)))
    s = b.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    return s


def shuffle_totals() -> tuple[int, int]:
    base = f"http://localhost:{UI_PORT}/api/v1"
    with urllib.request.urlopen(f"{base}/applications") as r:
        app_id = json.load(r)[0]["id"]
    with urllib.request.urlopen(
            f"{base}/applications/{app_id}/stages?status=complete") as r:
        stages = json.load(r)
    return (sum(s.get("shuffleReadBytes", 0) for s in stages),
            sum(s.get("shuffleWriteBytes", 0) for s in stages))


# --------------------------------------------------------------------------
# data generation


def generate() -> None:
    from pyspark.sql import functions as F

    from server2_vector_search_server_spark.session import read_table

    spark = _spark(ui=False)
    os.makedirs(DST, exist_ok=True)

    def reps(df, n=N_REPLICAS):
        return df.withColumn(
            "_r", F.explode(F.sequence(F.lit(0), F.lit(n - 1))))

    def off(col, mx):
        return (F.col(col) + F.col("_r") * F.lit(mx)).alias(col)

    def write(df, name, parts):
        (df.repartition(parts)
         .write.mode("overwrite").parquet(f"{DST}/{name}.parquet"))
        print(f"  {name}: written", flush=True)

    t0 = time.time()
    for name in ("region", "nation"):
        write(spark.read.parquet(f"{SRC}/{name}.parquet"), name, 1)

    def mx(df, key):
        return df.agg(F.max(key)).first()[0] + 1

    cust = spark.read.parquet(f"{SRC}/customer.parquet")
    c_mx = mx(cust, "c_custkey")
    write(reps(cust).select(
        off("c_custkey", c_mx),
        F.when(F.col("_r") > 0, F.concat("c_name", F.lit("#r"),
                                         F.col("_r").cast("string")))
        .otherwise(F.col("c_name")).alias("c_name"),
        "c_nationkey", "c_acctbal", "c_mktsegment"), "customer", 4)

    supp = spark.read.parquet(f"{SRC}/supplier.parquet")
    s_mx = mx(supp, "s_suppkey")
    write(reps(supp).select(
        off("s_suppkey", s_mx),
        F.when(F.col("_r") > 0, F.concat("s_name", F.lit("#r"),
                                         F.col("_r").cast("string")))
        .otherwise(F.col("s_name")).alias("s_name"),
        "s_nationkey", "s_acctbal"), "supplier", 2)

    part = spark.read.parquet(f"{SRC}/part.parquet")
    p_mx = mx(part, "p_partkey")
    write(reps(part).select(
        off("p_partkey", p_mx),
        F.when(F.col("_r") > 0, F.concat("p_name", F.lit(" r"),
                                         F.col("_r").cast("string")))
        .otherwise(F.col("p_name")).alias("p_name"),
        "p_brand", "p_type", "p_size", "p_retailprice"), "part", 4)

    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    o_mx = mx(orders, "o_orderkey")
    write(reps(orders).select(
        off("o_orderkey", o_mx), off("o_custkey", c_mx),
        "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"),
        "orders", 8)

    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    write(reps(li).select(
        off("l_orderkey", o_mx), off("l_partkey", p_mx),
        off("l_suppkey", s_mx), "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate"), "lineitem", 32)

    ev = read_table(spark, SRC, "events")      # normalizes ts
    e_mx = mx(ev, "event_id")
    u_mx = mx(ev, "user_id")
    write(reps(ev).select(
        off("event_id", e_mx), "ts", off("user_id", u_mx),
        "event_type", "value", "props"), "events", 16)

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    d_mx = mx(docs, "doc_id")
    text = (F.when(F.col("_r") % 2 == 1,
                   F.concat("text", F.lit(" rr"),
                            F.col("_r").cast("string")))
            .otherwise(F.col("text")))
    write(reps(docs).select(
        off("doc_id", d_mx), text.alias("text"), "lang", "source",
        F.length(text).cast("long").alias("n_chars")), "documents", 8)

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    v_mx = mx(emb, "vec_id")
    pert = F.transform(
        "embedding",
        lambda x, i: (x + F.when(F.col("_r") > 0,
                                 F.sin((F.col("vec_id") + i)
                                       * (F.col("_r") + 1.0)) * 0.03)
                      .otherwise(F.lit(0.0))).cast("float"))
    write(reps(emb).select(
        off("vec_id", v_mx), pert.alias("embedding"), "label"),
        "embeddings", 4)
    print(f"generated 10x tables under {DST} in {time.time()-t0:.0f}s",
          flush=True)
    spark.stop()


# --------------------------------------------------------------------------
# measurement (one process per scale — fresh JVM, scale22 methodology)


def measure(sf_dir: str, out_path: str) -> None:
    from server2_vector_search_server_spark.plans import load_registry

    spark = _spark(ui=True)
    registry = load_registry()
    # warm: parquet reader, shuffle machinery, noop sink
    warm = spark.read.parquet(f"{sf_dir}/region.parquet")
    warm.crossJoin(warm.selectExpr("r_regionkey k")).groupBy("r_name") \
        .count().write.format("noop").mode("overwrite").save()

    results = {}
    for name in PILLARS:
        rq = registry.get(name)
        if rq is None:
            continue
        walls, reads, writes = [], [], []
        for _ in range(REPEATS):
            r0, w0 = shuffle_totals()
            t0 = time.perf_counter()
            rq.fn(spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            walls.append(time.perf_counter() - t0)
            r1, w1 = shuffle_totals()
            reads.append(r1 - r0)
            writes.append(w1 - w0)
            spark.catalog.clearCache()
        mid = len(walls) // 2
        results[name] = {
            "wall_s": round(sorted(walls)[mid], 3),
            "shuffle_read_mb": round(sorted(reads)[mid] / 1e6, 2),
            "shuffle_write_mb": round(sorted(writes)[mid] / 1e6, 2),
        }
        print(f"  {name}: {results[name]}", flush=True)
    with open(out_path, "w") as fh:
        json.dump({"sf_dir": sf_dir, "repeats": REPEATS,
                   "pillars": results}, fh, indent=1)
    spark.stop()


# --------------------------------------------------------------------------


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gen-only", action="store_true")
    ap.add_argument("--measure")
    ap.add_argument("--out", default="/tmp/scale53_measure.json")
    args = ap.parse_args()

    if args.measure:
        measure(args.measure, args.out)
        return
    if not os.path.exists(f"{DST}/lineitem.parquet"):
        generate()
    elif args.gen_only:
        print(f"{DST} already exists")
    if args.gen_only:
        return

    here = os.path.abspath(__file__)
    for sf_dir, out in ((SRC, "/tmp/scale53_1x.json"),
                        (DST, "/tmp/scale53_10x.json")):
        print(f"== measuring {sf_dir}", flush=True)
        subprocess.run([sys.executable, here, "--measure", sf_dir,
                        "--out", out], check=True)

    with open("/tmp/scale53_1x.json") as fh:
        one = json.load(fh)["pillars"]
    with open("/tmp/scale53_10x.json") as fh:
        ten = json.load(fh)["pillars"]
    print("\n| pillar | wall 1x | wall 10x | ratio | shufW 1x MB "
          "| shufW 10x MB | ratio | verdict |")
    print("|---|---|---|---|---|---|---|---|")
    for name in PILLARS:
        if name not in one or name not in ten:
            continue
        a, b = one[name], ten[name]
        wr = b["wall_s"] / max(a["wall_s"], 1e-9)
        sw_a, sw_b = a["shuffle_write_mb"], b["shuffle_write_mb"]
        sr = (sw_b / sw_a) if sw_a > 0.05 else float("nan")
        flag = ("SUPER-LINEAR" if sw_a > 5 and sr > 13 else
                "linear-ok" if sr == sr and sr <= 13 else "tiny-shuffle")
        print(f"| {name} | {a['wall_s']} | {b['wall_s']} | {wr:.2f}x "
              f"| {sw_a} | {sw_b} | "
              f"{'-' if sr != sr else f'{sr:.1f}x'} | {flag} |")


if __name__ == "__main__":
    main()
