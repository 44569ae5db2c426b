"""Minimal Delta-Lake-protocol table: JSON action log + parquet parts.

The open Delta protocol (delta.io PROTOCOL.md) is just parquet data files
plus an append-only ``_delta_log/`` of numbered JSON commits whose lines
are actions (``add`` / ``remove`` / ``metaData`` / ``protocol``).  A
reader needs NO library: list commits ≤ the wanted version, fold the
add/remove actions into the live file set, read those parquet files.
This module implements exactly that fold so the engine can time-travel a
Delta-shaped table in any container (delta-spark is not installed here),
mirroring the role of ``sources/snapshots.py``'s own manifest format but
speaking the interchange protocol other engines write.

Scale notes: the log fold is manifest-sized driver work (Delta readers
checkpoint it for long histories — same idea as snapshots.py's manifest);
the data read is an ordinary pushdown-capable parquet scan of the live
files, so Catalyst treats a Delta snapshot exactly like any other
parquet table.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

_LOG_DIR = "_delta_log"


def _commit_path(root: str, version: int) -> str:
    return os.path.join(root, _LOG_DIR, f"{version:020d}.json")


def write_commit(root: str, version: int, actions: "list[dict]") -> None:
    """One numbered commit, one JSON action per line (the protocol's
    framing). Caller supplies protocol/metaData on version 0."""
    os.makedirs(os.path.join(root, _LOG_DIR), exist_ok=True)
    path = _commit_path(root, version)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        for a in actions:
            fh.write(json.dumps(a, separators=(",", ":")) + "\n")
    os.rename(tmp, path)           # atomic publish, like the protocol


def add_action(path: str, size: int) -> dict:
    return {"add": {"path": path, "partitionValues": {}, "size": size,
                    "modificationTime": 0, "dataChange": True}}


def remove_action(path: str) -> dict:
    return {"remove": {"path": path, "deletionTimestamp": 0,
                       "dataChange": True}}


def versions(root: str) -> "list[int]":
    log = os.path.join(root, _LOG_DIR)
    if not os.path.isdir(log):
        return []
    return sorted(int(f.split(".")[0]) for f in os.listdir(log)
                  if f.endswith(".json"))


def live_files(root: str, version: int | None = None) -> "list[str]":
    """Fold add/remove actions of commits ≤ version into the live set.
    Later actions win (the protocol's reconciliation rule)."""
    avail = versions(root)
    if not avail:
        return []
    v = avail[-1] if version is None else version
    if v not in avail:
        raise ValueError(f"version {v} not in log (have {avail})")
    live: "dict[str, bool]" = {}
    for cv in avail:
        if cv > v:
            break
        with open(_commit_path(root, cv)) as fh:
            for line in fh:
                a = json.loads(line)
                if "add" in a:
                    live[a["add"]["path"]] = True
                elif "remove" in a:
                    live[a["remove"]["path"]] = False
    return sorted(p for p, alive in live.items() if alive)


def read_snapshot(spark: SparkSession, root: str,
                  version: int | None = None) -> DataFrame:
    files = [os.path.join(root, p) for p in live_files(root, version)]
    if not files:
        raise ValueError("empty snapshot")
    return spark.read.parquet(*files)


def write_data_file(df: DataFrame, root: str, name: str) -> dict:
    """Materialize df as ONE parquet file ``<root>/<name>`` and return its
    add action. Spark writes directories; the protocol addresses files —
    relocate the single part file (driver-side rename, no data copy)."""
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="deltapart_", dir=root)
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(f for f in os.listdir(tmp)
                if f.endswith(".parquet") and f.startswith("part-"))
    dest = os.path.join(root, name)
    os.replace(os.path.join(tmp, part), dest)
    shutil.rmtree(tmp, ignore_errors=True)
    return add_action(name, os.path.getsize(dest))


def vacuum(root: str, *, keep_from_version: int) -> "list[str]":
    """Delete data files referenced ONLY by versions older than
    ``keep_from_version`` — VACUUM with a version-based retention cutoff
    (the protocol's time-based retention maps to versions here; commits
    themselves are never deleted, so the log stays auditable while
    time travel below the cutoff loses its data files).

    A file survives iff it is LIVE in at least one retained version
    (≥ cutoff).  Returns the deleted names.  Deletion is idempotent —
    missing files are skipped, so concurrent vacuums race safely."""
    avail = versions(root)
    if not avail:
        return []
    if keep_from_version not in avail:
        raise ValueError(
            f"cutoff {keep_from_version} not a version (have {avail})")
    keep: "set[str]" = set()
    for v in avail:
        if v >= keep_from_version:
            keep.update(live_files(root, v))
    referenced: "set[str]" = set()
    for v in avail:
        with open(_commit_path(root, v)) as fh:
            for line in fh:
                a = json.loads(line)
                if "add" in a:
                    referenced.add(a["add"]["path"])
    deleted = []
    for p in sorted(referenced - keep):
        full = os.path.join(root, p)
        try:
            os.remove(full)
            deleted.append(p)
        except FileNotFoundError:
            pass
    return deleted


def convert_versioned_files(versioned_files: "list[list[str]]",
                            root: str) -> int:
    """CONVERT-TO-DELTA, metadata-only: given the live ABSOLUTE file set
    of each source-table version (oldest first), emit one delta commit
    per version whose add/remove actions are the set difference against
    the previous version.  No data file is read or copied — the commits
    reference the source files in place (the protocol allows absolute
    paths in ``add.path``, and :func:`read_snapshot`'s join is a no-op
    for them).  This is the Delta/Iceberg table-migration move: history
    preserved, bytes untouched.  Returns the number of commits."""
    prev: "set[str]" = set()
    for i, files in enumerate(versioned_files):
        cur = set(files)
        actions: "list[dict]" = []
        if i == 0:
            actions.append({"protocol": {"minReaderVersion": 1,
                                         "minWriterVersion": 2}})
            actions.append({"metaData": {"id": "converted-table",
                                         "format": {"provider": "parquet"}}})
        for p in sorted(cur - prev):
            actions.append(add_action(p, os.path.getsize(p)))
        for p in sorted(prev - cur):
            actions.append(remove_action(p))
        write_commit(root, i, actions)
        prev = cur
    return len(versioned_files)
