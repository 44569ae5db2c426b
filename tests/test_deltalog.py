"""Delta-protocol log fold semantics — the reconciliation rules a
snapshot read depends on (later action wins, version bounds, atomic
commit publish)."""

from __future__ import annotations

import os

import pytest

from server2_vector_search_server_spark.sources import deltalog as dl


def _table(tmp_path):
    root = str(tmp_path / "tbl")
    os.makedirs(root)
    dl.write_commit(root, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        dl.add_action("a.parquet", 1), dl.add_action("b.parquet", 1)])
    dl.write_commit(root, 1, [dl.remove_action("a.parquet"),
                              dl.add_action("c.parquet", 1)])
    dl.write_commit(root, 2, [dl.add_action("a.parquet", 1)])
    return root


def test_fold_later_action_wins(tmp_path):
    root = _table(tmp_path)
    assert dl.live_files(root, 0) == ["a.parquet", "b.parquet"]
    assert dl.live_files(root, 1) == ["b.parquet", "c.parquet"]
    # re-ADD after remove resurrects the path (later action wins)
    assert dl.live_files(root, 2) == ["a.parquet", "b.parquet", "c.parquet"]
    # default = newest version
    assert dl.live_files(root) == dl.live_files(root, 2)


def test_unknown_version_rejected(tmp_path):
    root = _table(tmp_path)
    with pytest.raises(ValueError, match="version 7"):
        dl.live_files(root, 7)


def test_empty_log_and_empty_snapshot(tmp_path, spark):
    root = str(tmp_path / "none")
    assert dl.live_files(root) == []
    with pytest.raises(ValueError, match="empty snapshot"):
        dl.read_snapshot(spark, root)


def test_commit_publish_is_atomic(tmp_path):
    root = _table(tmp_path)
    log = os.path.join(root, "_delta_log")
    # no .tmp residue; commits named per the protocol's %020d scheme
    names = sorted(os.listdir(log))
    assert names == [f"{v:020d}.json" for v in (0, 1, 2)]


def test_roundtrip_reads_only_live_files(tmp_path, spark):
    root = str(tmp_path / "data")
    os.makedirs(root)
    df0 = spark.range(10).selectExpr("id", "id * 2 AS v")
    df1 = spark.range(10, 15).selectExpr("id", "id * 2 AS v")
    a0 = dl.write_data_file(df0, root, "f0.parquet")
    a1 = dl.write_data_file(df1, root, "f1.parquet")
    dl.write_commit(root, 0, [a0, a1])
    dl.write_commit(root, 1, [dl.remove_action("f0.parquet")])
    assert dl.read_snapshot(spark, root, 0).count() == 15
    got = sorted(r["id"] for r in dl.read_snapshot(spark, root, 1).collect())
    assert got == list(range(10, 15))


def test_vacuum_keeps_retained_versions_readable(tmp_path, spark):
    root = str(tmp_path / "vac")
    os.makedirs(root)
    df0 = spark.range(5).selectExpr("id", "id AS v")
    df1 = spark.range(5, 9).selectExpr("id", "id AS v")
    a0 = dl.write_data_file(df0, root, "f0.parquet")
    a1 = dl.write_data_file(df1, root, "f1.parquet")
    dl.write_commit(root, 0, [a0])
    dl.write_commit(root, 1, [dl.remove_action("f0.parquet"), a1])
    deleted = dl.vacuum(root, keep_from_version=1)
    assert deleted == ["f0.parquet"]
    # the retained snapshot still reads; the vacuumed version cannot
    assert dl.read_snapshot(spark, root, 1).count() == 4
    assert not os.path.exists(os.path.join(root, "f0.parquet"))
    # log history is intact (auditable), only the data bytes are gone
    assert dl.versions(root) == [0, 1]


def test_vacuum_retains_files_live_anywhere_at_or_after_cutoff(tmp_path):
    root = _table(tmp_path)        # v2 re-adds a.parquet
    # cutoff 1: a.parquet is dead at v1 but LIVE at v2 -> retained
    assert dl.vacuum(root, keep_from_version=1) == []


def test_vacuum_unknown_cutoff_rejected(tmp_path):
    root = _table(tmp_path)
    with pytest.raises(ValueError, match="cutoff 9"):
        dl.vacuum(root, keep_from_version=9)
