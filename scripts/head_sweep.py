"""Sweep ONLY the driver-head window (first _DRIVER_HEAD_SIZE registry
queries) against the DuckDB oracles at sf0.01 — the exact population the
per-round correctness gate samples.  Run after ANY head reorder
(ROUND_NOTES r8 gotcha: never trust a reorder without this).

Usage: PYTHONPATH=/root/repo python scripts/head_sweep.py
"""

import time

import duckdb
from pyspark.sql import SparkSession

from server2_vector_search_server_spark.plans import load_registry, \
    _DRIVER_HEAD_SIZE
from full_sweep import SF, TABLES, frames_equal


def main():
    t0 = time.time()
    reg = load_registry()
    head = list(reg)[:_DRIVER_HEAD_SIZE]
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.driver.memory", "8g")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    failures = []
    for i, name in enumerate(head):
        rq = reg[name]
        try:
            got = rq.fn(spark, SF).toPandas()
            if rq.oracle is None:
                print(f"[{i+1}/{len(head)}] {name}: rows-only ({len(got)})")
                continue
            want = con.execute(rq.oracle).df()
            ok = frames_equal(got, want)
        except Exception as exc:  # noqa: BLE001
            ok, got, want = False, None, None
            print(f"[{i+1}/{len(head)}] {name}: ERROR {exc}")
        if got is not None:
            print(f"[{i+1}/{len(head)}] {name}: "
                  f"{'OK' if ok else 'MISMATCH'} ({len(got)} rows)")
        if not ok:
            failures.append(name)
    print(f"\nhead sweep: {len(head) - len(failures)}/{len(head)} OK "
          f"in {time.time() - t0:.0f}s")
    print("FAILURES:", failures if failures else "none")


if __name__ == "__main__":
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
