"""Spot-sweep oracle parity on the 10× SYNTHETIC corpus (/tmp/sf1_synth).

PARITY runs at sf0.01 and the pytest gate at sf0.001 — both
driver-generated distributions.  The §53 corpus is a third axis: 10×
volume, replica structure, planted near-dup clusters, 10× hot-key
densities.  Tie-break and NULL-ordering divergences that the small
corpora never exercise (the ADVICE r8 er_blocking class) surface here.

Selects queries by REGEX over names (default: families with windows /
rank ties / NULL-prone aggregates) — not the whole registry, since some
fixture-parameterized queries take minutes at 10×.

Usage: PYTHONPATH=/root/repo python scripts/synth_spot_sweep.py [regex]
"""

import re
import sys
import time

import duckdb
from pyspark.sql import SparkSession

from server2_vector_search_server_spark.plans import load_registry

# full_sweep reads sys.argv at import (its ROUND arg) — consume ours first
_ARGV_PATTERN = sys.argv[1] if len(sys.argv) > 1 else None
sys.argv = sys.argv[:1]
from full_sweep import TABLES, frames_equal  # noqa: E402

SF = "/tmp/sf1_synth"
DEFAULT = (r"rank|percentile|window|top|kendall|spearman|mann|theil|"
           r"blocking|quantile|median|gini|benford|roc|skyline|"
           r"butterfly|degree|distribution|session|funnel|retention")


def main():
    pat = re.compile(_ARGV_PATTERN or DEFAULT)
    reg = load_registry()
    names = [n for n in reg if pat.search(n)]
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.driver.memory", "12g")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS "
                    f"SELECT * FROM '{SF}/{t}.parquet/*.parquet'")
    failures = []
    t0 = time.time()
    for i, name in enumerate(names):
        rq = reg[name]
        try:
            got = rq.fn(spark, SF).toPandas()
            want = con.execute(rq.oracle).df()
            ok = frames_equal(got, want)
        except Exception as exc:  # noqa: BLE001
            ok = False
            print(f"[{i+1}/{len(names)}] {name}: ERROR {exc}", flush=True)
            failures.append(name)
            continue
        print(f"[{i+1}/{len(names)}] {name}: "
              f"{'OK' if ok else 'MISMATCH'} ({len(got)} rows)", flush=True)
        if not ok:
            failures.append(name)
        spark.catalog.clearCache()
    print(f"\nsynth spot sweep: {len(names) - len(failures)}/{len(names)} "
          f"OK in {time.time() - t0:.0f}s")
    print("FAILURES:", failures if failures else "none")

    # accumulate into the committed artifact (one entry per query, the
    # newest verdict wins — re-running after a fix flips its row green)
    import json
    import os

    art = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SYNTH_SWEEP_r09.json")
    try:
        with open(art) as fh:
            data = json.load(fh)
    except (OSError, ValueError):
        data = {"what": "oracle parity on the 10x synthetic corpus "
                        "(/tmp/sf1_synth, scripts/scale53_decade.py "
                        "replicas) — a third data distribution beyond "
                        "the sf0.001 pytest gate and sf0.01 PARITY",
                "queries": {}}
    for n in names:
        data["queries"][n] = "FAIL" if n in failures else "OK"
    ok = sum(1 for v in data["queries"].values() if v == "OK")
    data["n_checked"] = len(data["queries"])
    data["n_ok"] = ok
    with open(art, "w") as fh:
        json.dump(data, fh, indent=1, sort_keys=True)
    print(f"wrote {art} ({ok}/{len(data['queries'])} OK)")


if __name__ == "__main__":
    import os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
