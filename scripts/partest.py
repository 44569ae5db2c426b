"""Parallel test runner — the suite in ~N× less wall time, no plugins.

pytest-xdist is not installable in this container (offline), so this
shards the suite across worker PROCESSES, each with its own Spark session
(JVM) and DuckDB connection:

  * ``tests/test_oracle_parity.py`` — the long pole (427 parametrized
    oracle cases) — runs in EVERY worker with
    ``SPARK_GRAFT_TEST_SHARD=i/n``, which stride-slices the case list
    inside the module (see ``_shard``), so its cost divides evenly;
  * every other test file is assigned greedily (largest first) to the
    worker with the least accumulated file size — a crude but serviceable
    cost proxy.

Each worker gets ``SPARK_GRAFT_CPUS = max(4, cpus // n)`` so n local-mode
JVMs don't oversubscribe the box. Cross-process safety: test tables are
UUID-named with per-test paths, scratch dirs are process-scoped mkdtemp,
and the Spark UI is disabled (no port contention).

Usage:
    python scripts/partest.py            # 4 workers
    python scripts/partest.py -n 6      # 6 workers
    python scripts/partest.py -n 4 -k knn   # extra args pass to pytest

Exit code is non-zero if any worker fails; per-worker tails are printed
for failed workers, full logs land in /tmp/partest_w{i}.log.
"""

from __future__ import annotations

import argparse
import glob
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHARDED_FILE = "tests/test_oracle_parity.py"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=4, help="worker processes")
    ap.add_argument("extra", nargs="*", help="extra pytest args")
    args = ap.parse_args()
    n = args.n

    files = sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py")))
    others = [(os.path.getsize(f), os.path.relpath(f, REPO)) for f in files
              if os.path.relpath(f, REPO) != SHARDED_FILE]
    buckets: list[list[str]] = [[] for _ in range(n)]
    load = [0] * n
    for size, rel in sorted(others, reverse=True):
        w = load.index(min(load))
        buckets[w].append(rel)
        load[w] += size

    cpus = os.cpu_count() or 8
    per_worker_cpus = max(4, cpus // n)
    procs = []
    t0 = time.time()
    for i in range(n):
        env = dict(os.environ)
        env["SPARK_GRAFT_TEST_SHARD"] = f"{i}/{n}"
        env["SPARK_GRAFT_CPUS"] = str(per_worker_cpus)
        env.setdefault("PYTHONPATH", REPO)
        targets = [SHARDED_FILE] + sorted(buckets[i])
        log = open(f"/tmp/partest_w{i}.log", "w")
        cmd = [sys.executable, "-m", "pytest", "-q", *targets, *args.extra]
        procs.append((i, subprocess.Popen(
            cmd, cwd=REPO, env=env, stdout=log, stderr=subprocess.STDOUT),
            log, targets))
        print(f"worker {i}: shard {i}/{n} + {len(buckets[i])} files "
              f"(local[{per_worker_cpus}])", flush=True)

    rc = 0
    for i, p, log, targets in procs:
        code = p.wait()
        log.close()
        with open(f"/tmp/partest_w{i}.log") as fh:
            tail = fh.readlines()[-3:]
        status = "ok" if code == 0 else f"FAILED rc={code}"
        print(f"worker {i} [{status}] {''.join(tail).strip()}", flush=True)
        if code != 0:
            rc = 1
            with open(f"/tmp/partest_w{i}.log") as fh:
                print("".join(fh.readlines()[-40:]))
    print(f"total wall: {time.time() - t0:.0f}s", flush=True)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
