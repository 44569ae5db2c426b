"""Full-surface oracle parity sweep at sf0.01 — writes PARITY_r{N}.json.

Usage: PYTHONPATH=/root/repo python scripts/full_sweep.py <round>
Compares every registered query against its DuckDB oracle with the
driver-hash-equivalent logic (column-name-sorted, value-exact, NaN==NaN).
"""

import json
import sys
import time

import duckdb
import numpy as np
from pyspark.sql import SparkSession

from server2_vector_search_server_spark.plans import load_registry

ROUND = int(sys.argv[1]) if len(sys.argv) > 1 else 0
SF = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _normalize(df):
    """pytest-mirror normalization (tests/test_oracle_parity.py): lists
    to tuples, column-name order, row sort. str()-based canonicalization
    is WRONG for list cells (numpy array str differs from list str)."""
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v)
                              if isinstance(v, (list, tuple, np.ndarray))
                              else v)
    return df.sort_values(list(df.columns), ignore_index=True)


def _values_equal(a, b):
    import math
    af = isinstance(a, (float, np.floating))
    bf = isinstance(b, (float, np.floating))
    ai = isinstance(a, (int, np.integer)) and not isinstance(a, bool)
    bi = isinstance(b, (int, np.integer)) and not isinstance(b, bool)
    if (af and bi) or (ai and bf):
        return False
    if af and bf:
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if isinstance(a, tuple) and isinstance(b, tuple):
        return (len(a) == len(b)
                and all(_values_equal(x, y) for x, y in zip(a, b)))
    return a == b


def frames_equal(got, want):
    if sorted(got.columns) != sorted(want.columns) or len(got) != len(want):
        return False
    g, w = _normalize(got), _normalize(want)
    for i in range(len(g)):
        for c in g.columns:
            if not _values_equal(g[c].iloc[i], w[c].iloc[i]):
                return False
    return True


def main():
    t0 = time.time()
    reg = load_registry()
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    failures, rows_only, checked = [], 0, 0
    for i, (name, rq) in enumerate(sorted(reg.items())):
        try:
            got = rq.fn(spark, SF).toPandas()
            if rq.oracle is None:
                rows_only += 1
                print(f"[{i+1}/{len(reg)}] {name} rows-only {len(got)}",
                      flush=True)
                continue
            want = con.execute(rq.oracle).df()
            ok = frames_equal(got, want)
            checked += 1
            print(f"[{i+1}/{len(reg)}] {name} "
                  f"{'OK' if ok else 'FAIL'} {len(got)}", flush=True)
            if not ok:
                failures.append(name)
        except Exception as ex:
            checked += 1
            failures.append(name)
            print(f"[{i+1}/{len(reg)}] {name} ERROR "
                  f"{type(ex).__name__}: {ex}"[:300], flush=True)
    doc = {
        "round": ROUND,
        "what": ("Full-surface oracle parity at the driver's correctness "
                 "scale (sf0.01): every registered query vs its DuckDB "
                 "oracle — row count, column set, and exact values on "
                 "column-name-sorted rows (driver-hash-equivalent compare "
                 "from tests/test_oracle_parity.py)."),
        "sf": 0.01,
        "queries_total": len(reg),
        "queries_checked": checked,
        "rows_only": rows_only,
        "failures": failures,
        "wall_seconds": int(time.time() - t0),
    }
    out = f"PARITY_r{ROUND:02d}.json"
    with open(out, "w") as fh:
        json.dump(doc, fh, indent=1)
    print("FAILURES:", failures)
    print("wrote", out, f"({int(time.time()-t0)}s)")


if __name__ == "__main__":
    main()
