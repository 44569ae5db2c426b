"""Round-10 experiment: would spreading a table's 1-partition local scan
help a pillar? Patches registry.read_table so the named table is
round-robined to session parallelism right after the read, then times each
query with the patch on (new) vs off (old), interleaved, identity-checked.

This is an EXPERIMENT harness: winners get a hand-placed registry.spread
at the right site in the query (and a re-A/B); losers are recorded in
OPTIMIZATION_r10.md.

Usage:
  PYTHONPATH=/root/repo python scripts/r10_ab6.py <table> [passes] name...
"""

from __future__ import annotations

import json
import os
import sys
import time

import server2_vector_search_server_spark.plans.registry as reg

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    table = sys.argv[1]
    rest = sys.argv[2:]
    passes = int(rest[0]) if rest and rest[0].isdigit() else 3
    names = rest[1:] if rest and rest[0].isdigit() else rest

    from server2_vector_search_server_spark.plans import load_registry
    from server2_vector_search_server_spark.session import get_spark

    spark = get_spark("r10_ab6")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_registry()
    real_read = reg.read_table
    par = spark.sparkContext.defaultParallelism

    def spread_read(spark_, sf_dir, name):
        df = real_read(spark_, sf_dir, name)
        if name == table:
            df = df.repartition(par)
        return df

    def run(name, on):
        reg.read_table = spread_read if on else real_read
        try:
            return registry[name].fn(spark, SF_DIR)
        finally:
            reg.read_table = real_read

    skipped = []
    ok_names = []
    for name in names:
        try:
            old = sorted(tuple(r) for r in run(name, False).collect())
            new = sorted(tuple(r) for r in run(name, True).collect())
        except Exception as exc:  # noqa: BLE001
            skipped.append((name, repr(exc)[:120]))
            continue
        if old != new:
            skipped.append((name, "RESULTS DIFFER (order-sensitive)"))
            continue
        ok_names.append(name)
        print(f"identity OK: {name} ({len(new)} rows)", file=sys.stderr)
    for name, why in skipped:
        print(f"SKIP {name}: {why}", file=sys.stderr)

    times: dict[str, list[float]] = {}
    for p in range(passes):
        for name in ok_names:
            for arm in ((False, True) if p % 2 else (True, False)):
                key = f"{name}:{'new' if arm else 'old'}"
                spark.sparkContext.setJobDescription(f"ab6 {key} p{p}")
                t0 = time.perf_counter()
                run(name, arm).write.format("noop") \
                    .mode("overwrite").save()
                times.setdefault(key, []).append(
                    time.perf_counter() - t0)
                spark.catalog.clearCache()
    out = {}
    for name in ok_names:
        o = times[f"{name}:old"]
        n = times[f"{name}:new"]
        mo = sorted(o)[len(o) // 2]
        mn = sorted(n)[len(n) // 2]
        out[name] = {"old": round(mo, 3), "new": round(mn, 3),
                     "delta_pct": round(100 * (mn - mo) / mo, 1)}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
