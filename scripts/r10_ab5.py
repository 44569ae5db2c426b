"""Round-10 optimization A/B #5: the registry.spread scan-width fix.

Times each named query with spread() active (new) vs forced to identity
(old) — same process, interleaved passes, identity-checked rows first.

Usage: PYTHONPATH=/root/repo python scripts/r10_ab5.py [passes] name...
"""

from __future__ import annotations

import json
import sys
import time

import server2_vector_search_server_spark.plans.registry as reg

SF_DIR = __import__("os").environ.get("SPARK_GRAFT_SF_DIR",
                                      "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    passes = int(args[0]) if args and args[0].isdigit() else 5
    names = args[1:] if args and args[0].isdigit() else args

    from server2_vector_search_server_spark.plans import load_registry
    from server2_vector_search_server_spark.session import get_spark

    spark = get_spark("r10_ab5")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_registry()
    real_spread = reg.spread
    # `spread` is bound at import time in consumer modules — patch it there
    import server2_vector_search_server_spark.plans.quality_queries as qq
    import server2_vector_search_server_spark.plans.text_queries as tq
    consumers = [m for m in (reg, qq, tq) if hasattr(m, "spread")]

    def run(name, spread_on):
        fn = real_spread if spread_on else (lambda df: df)
        for m in consumers:
            m.spread = fn
        try:
            return registry[name].fn(spark, SF_DIR)
        finally:
            for m in consumers:
                m.spread = real_spread

    # identity first
    for name in names:
        old = [tuple(r) for r in run(name, False).collect()]
        new = [tuple(r) for r in run(name, True).collect()]
        assert old == new, f"{name}: results differ!"
        print(f"identity OK: {name} ({len(new)} rows)", file=sys.stderr)

    times: dict[str, list[float]] = {}
    for p in range(passes):
        for name in names:
            for arm in ((False, True) if p % 2 else (True, False)):
                key = f"{name}:{'new' if arm else 'old'}"
                spark.sparkContext.setJobDescription(f"ab5 {key} p{p}")
                t0 = time.perf_counter()
                run(name, arm).write.format("noop") \
                    .mode("overwrite").save()
                times.setdefault(key, []).append(
                    time.perf_counter() - t0)
                spark.catalog.clearCache()
    out = {}
    for key, runs in sorted(times.items()):
        med = sorted(runs)[len(runs) // 2]
        out[key] = {"median": round(med, 3),
                    "runs": [round(r, 3) for r in runs]}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
