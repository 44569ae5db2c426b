"""Branch/merge semantics on the snapshot store (Nessie/LakeFS model)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from server2_vector_search_server_spark.sources.snapshots import (
    BranchedSnapshotStore,
)


def _chunks(spark, lo, hi, tag=""):
    rows = [(f"c{i}", f"d{i}", f"doc_{i}", 0, "col_a",
             f"{tag}text {i}", {"k": "v"}, [0.1, 0.2], "col_a")
            for i in range(lo, hi)]
    return spark.createDataFrame(
        rows, "chunk_id string, doc_id string, doc_name string, "
              "chunk_index int, original_collection string, "
              "content string, metadata map<string,string>, "
              "embedding array<float>, collection string")


@pytest.fixture()
def store(spark, tmp_path):
    return BranchedSnapshotStore(spark, str(tmp_path / "branched"))


def _names(df):
    return {r["doc_name"] for r in df.select("doc_name").collect()}


def test_branch_isolation_both_directions(spark, store):
    store.commit_on("main", _chunks(spark, 0, 5))
    store.create_branch("feat")
    store.commit_on("feat", _chunks(spark, 100, 103))
    store.commit_on("main", _chunks(spark, 200, 202))
    assert _names(store.read_ref("feat")) == (
        {f"doc_{i}" for i in range(5)} | {"doc_100", "doc_101", "doc_102"})
    assert _names(store.read_ref("main")) == (
        {f"doc_{i}" for i in range(5)} | {"doc_200", "doc_201"})


def test_merge_disjoint_is_merge_commit(spark, store):
    store.commit_on("main", _chunks(spark, 0, 5))
    store.create_branch("feat")
    store.commit_on("feat", _chunks(spark, 100, 103))
    store.commit_on("main", _chunks(spark, 200, 202))
    outcome, v = store.merge("feat")
    assert outcome == "merge"
    assert _names(store.read_ref("main")) == (
        {f"doc_{i}" for i in range(5)}
        | {"doc_100", "doc_101", "doc_102", "doc_200", "doc_201"})


def test_merge_fast_forward_moves_pointer_without_commit(spark, store):
    store.commit_on("main", _chunks(spark, 0, 3))
    store.create_branch("feat")
    v_feat = store.commit_on("feat", _chunks(spark, 10, 12))
    before = store.current_version()
    outcome, v = store.merge("feat")
    assert outcome == "fast_forward" and v == v_feat
    assert store.current_version() == before      # no new manifest
    assert _names(store.read_ref("main")) == (
        {"doc_0", "doc_1", "doc_2", "doc_10", "doc_11"})


def test_merge_conflict_leaves_target_unchanged(spark, store):
    store.commit_on("main", _chunks(spark, 0, 3))
    store.create_branch("conf")
    store.commit_on("conf", _chunks(spark, 5, 8, tag="branch:"))
    store.commit_on("main", _chunks(spark, 5, 7, tag="main:"))
    before = _names(store.read_ref("main"))
    outcome, v = store.merge("conf")
    assert outcome == "conflict"
    assert _names(store.read_ref("main")) == before
    # branch content never leaked into main
    main_tags = {r["content"][:5] for r in store.read_ref("main")
                 .filter(F.col("doc_name") == "doc_5").collect()}
    assert main_tags == {"main:"}


def test_duplicate_branch_name_rejected(spark, store):
    store.create_branch("x")
    with pytest.raises(ValueError, match="already exists"):
        store.create_branch("x")


def test_expire_pins_branch_refs(spark, store):
    """GC must never delete a manifest a ref still points at: after main
    advances past the fork and expire(keep_last=1) runs, the branch head
    stays fully readable and the merge still works."""
    store.commit_on("main", _chunks(spark, 0, 3))
    store.create_branch("feat")
    store.commit_on("feat", _chunks(spark, 10, 13))
    store.commit_on("main", _chunks(spark, 20, 22))
    removed = store.expire(keep_last=1)
    # branch view intact after GC
    assert _names(store.read_ref("feat")) == (
        {"doc_0", "doc_1", "doc_2", "doc_10", "doc_11", "doc_12"})
    outcome, _ = store.merge("feat")
    assert outcome == "merge"
    assert _names(store.read_ref("main")) == (
        {"doc_0", "doc_1", "doc_2", "doc_10", "doc_11", "doc_12",
         "doc_20", "doc_21"})


def test_inherited_writers_route_through_main_ref(spark, store):
    """ADVICE r6 (medium): the ChunkStore-contract writers must commit on
    the MAIN ref, not the latest global manifest — after a branch commit
    the global latest IS the branch head, and the old inherited append()
    folded branch files into an orphan commit no ref pointed at."""
    store.commit_on("main", _chunks(spark, 0, 3))
    store.create_branch("feat")
    store.commit_on("feat", _chunks(spark, 100, 102))
    # inherited append lands on main, not on top of feat's head
    store.append(_chunks(spark, 10, 12))
    assert _names(store.read_ref("main")) == (
        {"doc_0", "doc_1", "doc_2", "doc_10", "doc_11"})
    assert "doc_100" not in _names(store.read_ref("main"))
    assert "doc_10" not in _names(store.read_ref("feat"))
    # default read() follows main, never the newest global manifest
    assert _names(store.read()) == _names(store.read_ref("main"))
    # upsert / delete are ref-routed too
    store.upsert(_chunks(spark, 10, 11, tag="v2:"))
    contents = {r["content"] for r in store.read()
                .filter(F.col("doc_name") == "doc_10").collect()}
    assert contents == {"v2:text 10"}
    store.delete_document("d11")
    assert "doc_11" not in _names(store.read())
    assert "doc_100" in _names(store.read_ref("feat"))  # branch untouched


def test_compact_and_stream_batch_route_through_main(spark, store):
    store.commit_on("main", _chunks(spark, 0, 4))
    store.create_branch("side")
    store.commit_on("side", _chunks(spark, 50, 52))
    v1 = store.append_stream_batch(_chunks(spark, 20, 22), batch_id=7)
    v2 = store.append_stream_batch(_chunks(spark, 20, 22), batch_id=7)
    assert v1 == v2                      # replay is a no-op
    assert _names(store.read()) == (
        {"doc_0", "doc_1", "doc_2", "doc_3", "doc_20", "doc_21"})
    store.compact(rows_per_file=1000)
    assert _names(store.read()) == (
        {"doc_0", "doc_1", "doc_2", "doc_3", "doc_20", "doc_21"})
    assert _names(store.read_ref("side")) == (
        {"doc_0", "doc_1", "doc_2", "doc_3", "doc_50", "doc_51"})


def test_merge_rebases_branch_for_continued_work(spark, store):
    """ADVICE r6 (low): after a successful merge the branch must be able
    to keep committing and merge AGAIN without self-conflicting on its
    own already-merged docs."""
    store.commit_on("main", _chunks(spark, 0, 3))
    store.create_branch("feat")
    store.commit_on("feat", _chunks(spark, 100, 102))
    store.commit_on("main", _chunks(spark, 200, 201))
    outcome, _ = store.merge("feat")
    assert outcome == "merge"
    # round 2 on the same branch: previously this self-conflicted
    store.commit_on("feat", _chunks(spark, 110, 112))
    outcome2, _ = store.merge("feat")
    assert outcome2 == "fast_forward"    # main unchanged since re-base
    assert _names(store.read()) >= {"doc_100", "doc_101", "doc_110",
                                    "doc_111", "doc_200"}


def test_merge_empty_branch_is_noop_fast_forward(spark, store):
    """A branch with no commits must not land an empty merge commit."""
    store.commit_on("main", _chunks(spark, 0, 3))
    store.create_branch("idle")
    store.commit_on("main", _chunks(spark, 10, 12))
    before = store.current_version()
    outcome, v = store.merge("idle")
    assert outcome == "fast_forward"
    assert store.current_version() == before       # no new manifest
    assert v == before
