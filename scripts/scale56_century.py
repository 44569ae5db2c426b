"""SCALE.md §56: a SECOND measured decade — selected pillars at 1×/10×/100×.

§53 bought one decade (sf0.1 → 10×) for the 20 most expensive pillars and
flagged nothing super-linear — but one decade fits a line through two
points. This experiment adds a third point: a deterministic 100×
multiplication of every sf0.1 table (same key-consistent replica scheme
as §53 — the generator IS §53's, re-parameterized, so the corpora are
nested: replicas 0..9 of the 100× corpus equal the 10× corpus) and
measures a pillar subset chosen for COVERAGE of plan families rather
than cost: scan+agg, broadcast-dim join, window top-k, hash dedup,
MinHash banding, IVF ANN, stateful stream-stream join, iterative
pagerank. Wall + shuffle read/write via the status REST API, fresh JVM
per scale, same methodology as §53.

Run:   python scripts/scale56_century.py --gen-only
       python scripts/scale56_century.py --measure <sf_dir> --out <json>
       python scripts/scale56_century.py            # gen + measure all 3
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

_spec = importlib.util.spec_from_file_location(
    "scale53", os.path.join(HERE, "scale53_decade.py"))
s53 = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(s53)

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.environ.get("SPARK_GRAFT_SF100_DIR", "/tmp/sf2_century")

# one pillar per plan family — NOT the §53 cost-ranked list
PILLARS = [
    "pricing_summary",            # scan + partial/final agg
    "revenue_by_nation",          # broadcast-dim multi-join
    "top_orders_per_customer",    # window top-k over a join
    "events_hourly_rollup",       # event-time rollup
    "dedup_exact",                # hash-groupBy dedup
    "dedup_minhash_lsh",          # shingle→minhash→band bucket join
    "ann_ivf_knn",                # IVF centroid prune + local top-k
    "text_token_stats",           # text analytics scan
    "streaming_stream_stream_join",  # stateful dual-watermark join
    "graph_pagerank",             # iterative, pinned edges (above gate)
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gen-only", action="store_true")
    ap.add_argument("--measure")
    ap.add_argument("--out", default="/tmp/scale56_measure.json")
    args = ap.parse_args()

    # re-parameterize §53's generator/measurer in place
    s53.N_REPLICAS = 100
    s53.DST = DST
    s53.SRC = SRC
    s53.PILLARS = PILLARS

    if args.measure:
        s53.measure(args.measure, args.out)
        return
    if not os.path.isdir(DST) or not os.listdir(DST):
        s53.generate()
    if args.gen_only:
        return
    # one fresh process per scale (fresh JVM — §22 methodology); this
    # process only orchestrates
    import subprocess
    for sf_dir, tag in ((SRC, "1x"),
                        (os.environ.get("SPARK_GRAFT_SF10_DIR",
                                        "/tmp/sf1_synth"), "10x"),
                        (DST, "100x")):
        out = f"/tmp/scale56_{tag}.json"
        subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--measure", sf_dir, "--out", out],
            check=True, env={**os.environ, "PYTHONPATH":
                             os.path.dirname(HERE)})
        print(json.dumps(json.load(open(out)), indent=1)[:400], flush=True)


if __name__ == "__main__":
    main()
