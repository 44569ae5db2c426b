"""SCALE §64: WARC parse throughput and its scaling shape.

Generates a synthetic crawl (N files x M records of deterministic HTML,
CommonCrawl-style one-gzip-member-per-record), then measures the full
distributed path — binaryFile scan -> mapInPandas record expansion ->
per-record digest manifest — at 1x and 10x record volume, same file count
(file size grows 10x: the CommonCrawl shape where parallelism is fixed by
file count and per-task work scales with file size) AND at 10x file count
(how a bigger crawl actually arrives).

Usage: PYTHONPATH=/root/repo python scripts/scale64_warc.py
Prints a markdown row set for SCALE.md.
"""

import os
import shutil
import time

from server2_vector_search_server_spark.sources import warc as W

ROOT = "/tmp/scale64_warc"
HTML = ("<html><head><title>doc %d</title></head><body>"
        + "<p>paragraph body text with some filler words</p>" * 40
        + "</body></html>")


def gen(dirname: str, n_files: int, recs_per_file: int) -> float:
    path = os.path.join(ROOT, dirname)
    if os.path.exists(path):
        sz = sum(os.path.getsize(os.path.join(path, f))
                 for f in os.listdir(path))
        return sz / 1e6
    os.makedirs(path)
    total = 0
    for f in range(n_files):
        records = []
        for i in range(recs_per_file):
            d = f * recs_per_file + i
            body = (HTML % d).encode()
            records.append({
                "warc_type": "response",
                "target_uri": f"http://example.com/{d}",
                "payload": W.http_response_bytes(
                    200, "text/html; charset=utf-8", body,
                    chunked=(d % 3 == 0)),
                "content_type": "application/http;msgtype=response"})
        blob = W.build_warc_bytes(records, gzip_members=True)
        with open(os.path.join(path, f"crawl{f:04d}.warc.gz"), "wb") as fh:
            fh.write(blob)
        total += len(blob)
    return total / 1e6


def measure(spark, dirname: str) -> tuple[float, int]:
    from pyspark.sql import functions as F

    path = os.path.join(ROOT, dirname)
    t0 = time.time()
    files = spark.read.format("binaryFile").load(path)
    recs = W.parse_warc(files)
    n = (recs.select(F.md5("payload").alias("d"), F.length("payload"))
         .write.format("noop").mode("overwrite").save())
    cnt = W.parse_warc(files).count()
    return time.time() - t0, cnt


def main():
    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", str(cpus))
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    shapes = [("1x", 16, 500), ("10x_fat", 16, 5000), ("10x_wide", 160, 500)]
    if os.environ.get("SCALE64_CENTURY"):
        # the third decade (VERDICT r9 #7): 100× record volume in the
        # file-granular layout — parallelism saturates at the core count
        # and per-record cost must stay flat (embarrassingly parallel)
        shapes.append(("100x_wide", 1600, 500))
    print("| shape | files | recs | MB (gz) | wall s | recs/s | MB/s |")
    print("|---|---|---|---|---|---|---|")
    results = {}
    for name, nf, rpf in shapes:
        mb = gen(name, nf, rpf)
        wall, cnt = measure(spark, name)
        wall2, _ = measure(spark, name)     # steady-state repeat
        wall = min(wall, wall2)
        results[name] = (wall, cnt, mb)
        print(f"| {name} | {nf} | {cnt} | {mb:.1f} | {wall:.2f} "
              f"| {cnt / wall:.0f} | {mb / wall:.1f} |", flush=True)
    a, b, c = results["1x"], results["10x_fat"], results["10x_wide"]
    print(f"fat ratio {b[0] / a[0]:.2f}x, wide ratio {c[0] / a[0]:.2f}x "
          f"for 10x records")
    if "100x_wide" in results:
        d = results["100x_wide"]
        print(f"century ratio {d[0] / a[0]:.2f}x wall for 100x records "
              f"({d[1] / d[0]:.0f} recs/s vs {a[1] / a[0]:.0f} at 1x)")
    if os.environ.get("SCALE64_CLEAN"):
        shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
