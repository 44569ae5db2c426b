"""Snapshot-isolated chunk store (sources/snapshots.py): manifest commits,
time travel, reader isolation, file-level merge, expiry GC."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from server2_vector_search_server_spark.sources.snapshots import (
    SnapshotChunkStore,
)


def _chunks(spark, docs, collection="collection_a"):
    rows = [(f"{name}#{i}", name, f"{name}.txt", i, collection,
             text, {"source": name}, [0.1, 0.2], collection)
            for name, texts in docs for i, text in enumerate(texts)]
    return spark.createDataFrame(
        rows, "chunk_id string, doc_id string, doc_name string, "
              "chunk_index int, original_collection string, content string, "
              "metadata map<string,string>, embedding array<float>, "
              "collection string")


@pytest.fixture()
def store(spark, tmp_path):
    return SnapshotChunkStore(spark, str(tmp_path / "snap"))


def test_append_and_versions(spark, store):
    assert store.current_version() == 0
    assert store.read(None).count() == 0
    v1 = store.append(_chunks(spark, [("a", ["a1", "a2"])]))
    v2 = store.append(_chunks(spark, [("b", ["b1"])]))
    assert (v1, v2) == (1, 2)
    assert store.read(None).count() == 3
    assert [h["operation"] for h in store.history()] == ["append", "append"]


def test_time_travel_reads_old_snapshot(spark, store):
    store.append(_chunks(spark, [("a", ["a1", "a2"])]))
    store.append(_chunks(spark, [("b", ["b1"])]))
    store.delete_document("a")
    assert store.read(None).count() == 1                      # latest
    assert store.read(None, version=2).count() == 3           # time travel
    assert store.read(None, version=1).count() == 2
    names = {r["doc_id"] for r in store.read(None).collect()}
    assert names == {"b"}


def test_reader_isolated_from_later_commits(spark, store):
    store.append(_chunks(spark, [("a", ["a1", "a2"]), ("b", ["b1"])]))
    scan = store.read(None)            # resolves manifest v1 NOW
    store.delete_document("a")         # commit v2
    store.upsert(_chunks(spark, [("b", ["B1-new", "B2-new"])]))   # v3
    # the v1-resolved scan still sees the v1 rows, bit-for-bit
    assert scan.count() == 3
    assert {r["content"] for r in scan.collect()} == {"a1", "a2", "b1"}


def test_upsert_replaces_and_carries_untouched_files(spark, store):
    store.append(_chunks(spark, [("a", ["a1", "a2"])]))
    store.append(_chunks(spark, [("b", ["b1"])]))
    files_before = set(store._live_files())
    store.upsert(_chunks(spark, [("b", ["B1-new"]), ("c", ["c1"])]))
    t = store.read(None)
    assert {r["content"] for r in
            t.filter(F.col("doc_id") == "b").collect()} == {"B1-new"}
    assert t.count() == 4              # a1 a2 B1-new c1
    # the file holding only doc a was carried by reference, not rewritten
    assert any(f in set(store._live_files()) for f in files_before)


def test_upsert_and_delete_in_uri_hostile_root(spark, tmp_path):
    """ADVICE r3: _split_files compared input_file_name() URIs (percent-
    encoded) against os.path strings — a store root with spaces/'%'/
    non-ASCII made every file look untouched, so delete/upsert silently
    carried stale rows forward. Exercise exactly such a root."""
    root = tmp_path / "snap dir%40 ü"
    store = SnapshotChunkStore(spark, str(root))
    store.append(_chunks(spark, [("a", ["a1", "a2"])]))
    store.append(_chunks(spark, [("b", ["b1"])]))
    store.upsert(_chunks(spark, [("b", ["B1-new"])]))
    t = store.read(None)
    assert {r["content"] for r in
            t.filter(F.col("doc_id") == "b").collect()} == {"B1-new"}
    assert t.count() == 3
    store.delete_document("a")
    assert store.read(None).count() == 1


def test_delete_all_docs_yields_empty_readable_table(spark, store):
    store.append(_chunks(spark, [("a", ["a1"])]))
    store.delete_document("a")
    assert store.read(None).count() == 0
    assert store.current_version() == 2


def test_expire_gc_unreferenced_files(spark, store):
    store.append(_chunks(spark, [("a", ["a1", "a2"])]))
    store.append(_chunks(spark, [("b", ["b1"])]))
    store.delete_document("a")
    removed = store.expire(keep_last=1)
    assert removed > 0
    assert store.versions() == [3]
    # latest snapshot still fully readable after GC
    assert {r["doc_id"] for r in store.read(None).collect()} == {"b"}
    # time travel to expired versions is gone
    with pytest.raises(FileNotFoundError):
        store._manifest(1)


def test_compact_is_a_commit_preserving_history(spark, store):
    """Compaction publishes a new version with identical content in fewer
    files; readers of OLDER versions are untouched."""
    for name in ("a", "b", "c", "d"):
        store.append(_chunks(spark, [(name, [f"{name}1", f"{name}2"])]))
    v_before = store.current_version()
    files_before = len(store._live_files())
    contents_before = {r["content"] for r in store.read(None).collect()}
    v = store.compact()
    assert v == v_before + 1
    assert len(store._live_files()) < files_before
    assert {r["content"] for r in store.read(None).collect()} \
        == contents_before
    # pre-compaction version still time-travels
    assert store.read(None, version=v_before).count() == 8
    assert store.history()[-1]["operation"] == "compact"


def test_collection_pruned_read(spark, store):
    store.append(_chunks(spark, [("a", ["a1"])], collection="collection_a"))
    store.append(_chunks(spark, [("b", ["b1"])], collection="collection_b"))
    assert store.read("collection_a").count() == 1
    assert store.read("master").count() == 2


def test_stream_batch_commit_is_idempotent(spark, store):
    """A replayed foreachBatch micro-batch (same batch_id) must not
    double-append — the manifest tag makes the commit exactly-once."""
    b0 = _chunks(spark, [("a", ["a1", "a2"])])
    b1 = _chunks(spark, [("b", ["b1"])])
    v1 = store.append_stream_batch(b0, batch_id=0)
    v2 = store.append_stream_batch(b1, batch_id=1)
    assert (v1, v2) == (1, 2)
    assert store.read(None).count() == 3
    # crash-replay of batch 1: recognized, skipped, version unchanged
    assert store.append_stream_batch(b1, batch_id=1) == 2
    assert store.current_version() == 2
    assert store.read(None).count() == 3
    # a genuinely new batch still commits
    assert store.append_stream_batch(
        _chunks(spark, [("c", ["c1"])]), batch_id=2) == 3
    assert store.read(None).count() == 4


def test_stream_batch_replay_guard_survives_expire(spark, store):
    """ADVICE r3: expire() used to delete the tagged manifests the replay
    guard scans — a crash-window replay AFTER an expire appended twice.
    The ledger folds pruned tags forward, so the replay is still caught."""
    b0 = _chunks(spark, [("a", ["a1", "a2"])])
    b1 = _chunks(spark, [("b", ["b1"])])
    store.append_stream_batch(b0, batch_id=0)
    store.append_stream_batch(b1, batch_id=1)
    n_before = store.read(None).count()
    store.expire(keep_last=1)          # prunes the v1 'stream-append:0' tag
    # crash-window replay of batch 0 after the expire: must be a no-op
    store.append_stream_batch(b0, batch_id=0)
    assert store.read(None).count() == n_before
    # and the guard composes with further expires
    store.expire(keep_last=1)
    store.append_stream_batch(b1, batch_id=1)
    assert store.read(None).count() == n_before


def test_stream_into_snapshot_store_end_to_end(spark, store, tmp_path):
    """readStream -> foreachBatch(append_stream_batch): drained stream
    lands every row exactly once; versions track micro-batches."""
    src = str(tmp_path / "src")
    chk = str(tmp_path / "chk")
    _chunks(spark, [("a", ["a1", "a2"]), ("b", ["b1"])]) \
        .coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = (stream.writeStream
         .foreachBatch(store.append_stream_batch)
         .option("checkpointLocation", chk)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    assert store.read(None).count() == 3
    assert all(h["operation"].startswith("stream-append:")
               for h in store.history())
    # restart from the same checkpoint with no new data: no new commits
    v = store.current_version()
    q2 = (spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(src)
          .writeStream.foreachBatch(store.append_stream_batch)
          .option("checkpointLocation", chk)
          .trigger(availableNow=True).start())
    q2.awaitTermination()
    assert store.current_version() == v
    assert store.read(None).count() == 3
