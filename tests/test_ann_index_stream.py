"""Streaming IVF-PQ index refresh (SURVEY.md §2.I × the north-star ANN
tiers): new vectors streamed into the materialized index must yield exactly
the index a from-scratch batch build would, appending only to the touched
cells — the online-serving analog of ChromaDB applying its WAL to the HNSW
segment (``chroma.sqlite3`` collection config: batch_size=100)."""

from __future__ import annotations

import pytest

import glob
import os

from pyspark.sql import functions as F

from server2_vector_search_server_spark.operators import ann
from server2_vector_search_server_spark.streaming.ann_index import (
    start_ivf_pq_refresh_stream,
)

N_CENTROIDS = 4
PQ_M = 4
PQ_K = 4


def _fixtures(tables):
    emb = tables["embeddings"].filter(F.col("vec_id") < 400)
    centroids = (emb.filter(F.col("vec_id") < N_CENTROIDS)
                 .select(F.col("vec_id").alias("centroid_id"),
                         F.col("embedding").alias("centroid")))
    books = ann.pq_codebooks(emb, PQ_M, PQ_K)
    return emb, centroids, books


def _index_files(index_path):
    # centroid_id=M/ingest_batch=N/part-*.parquet
    return set(glob.glob(os.path.join(index_path, "*", "*", "*.parquet")))


@pytest.mark.slow  # r11: driver-window tier, see OPTIMIZATION_r11.md
def test_streamed_index_matches_batch_build_and_search(spark, tables,
                                                       tmp_path):
    emb, centroids, books = _fixtures(tables)
    base = emb.filter(F.col("vec_id") % 2 == 0)
    arriving = emb.filter(F.col("vec_id") % 2 == 1)

    # batch-build the index from the base half
    index_path = str(tmp_path / "index")
    ann.write_ivf_pq_index(base, centroids, books, index_path)
    # append mode must not disturb the batch-built files
    before = _index_files(index_path)

    # stream the other half in micro-batches (2 files -> 2 triggers)
    src_dir = str(tmp_path / "arrivals")
    arriving.repartition(2).write.parquet(src_dir)
    q = start_ivf_pq_refresh_stream(
        spark, src_dir, index_path, centroids, books,
        str(tmp_path / "ckpt"), max_files_per_trigger=1)
    q.awaitTermination()

    # incremental property: base files untouched, only new files appended
    after = _index_files(index_path)
    assert before <= after and len(after) > len(before)

    # the streamed index is row-identical to a from-scratch build over all
    streamed = spark.read.parquet(index_path)
    full_path = str(tmp_path / "index_full")
    ann.write_ivf_pq_index(emb, centroids, books, full_path)
    full = spark.read.parquet(full_path)
    assert sorted(streamed.columns) == sorted(full.columns)
    # ingest_batch is write provenance (base build = -1, stream = batch id),
    # not index content — excluded alongside the float vectors.
    cols = [c for c in streamed.columns
            if c not in ("embedding", "ingest_batch")]
    sym_diff = (streamed.select(*cols).exceptAll(full.select(*cols))
                .unionAll(full.select(*cols)
                          .exceptAll(streamed.select(*cols))))
    assert sym_diff.count() == 0

    # and a search over it matches the non-indexed composition
    qvec = (emb.filter(F.col("vec_id") == 42)
            .select("embedding").first()[0])
    got = ann.ivf_pq_knn_indexed(spark, index_path, centroids, qvec,
                                 books, k=5, nprobe=2)
    want = ann.ivf_pq_knn(emb, centroids, qvec, books, k=5, nprobe=2)
    assert [tuple(r) for r in
            got.orderBy("vec_id").collect()] == \
           [tuple(r) for r in want.orderBy("vec_id").collect()]


def test_refresh_replayed_batch_is_idempotent(spark, tables, tmp_path):
    """A foreachBatch replay (failure after the parquet write but before the
    checkpoint commit) re-runs the same batch_id over the same rows; the
    dynamic-partition-overwrite write must converge, not duplicate."""
    from server2_vector_search_server_spark.streaming.ann_index import (
        refresh_ivf_pq_index,
    )

    emb, centroids, books = _fixtures(tables)
    batch = emb.filter(F.col("vec_id") < 100)
    index_path = str(tmp_path / "index")
    refresh_ivf_pq_index(batch, index_path, centroids, books, batch_id=7)
    n1 = spark.read.parquet(index_path).count()
    refresh_ivf_pq_index(batch, index_path, centroids, books, batch_id=7)
    stored = spark.read.parquet(index_path)
    assert stored.count() == n1 == batch.count()
    assert stored.select("vec_id").distinct().count() == batch.count()


def test_refresh_checkpoint_restart_is_exactly_once(spark, tables, tmp_path):
    emb, centroids, books = _fixtures(tables)
    first = emb.filter(F.col("vec_id") < 200)
    later = emb.filter(F.col("vec_id") >= 200)

    src_dir = str(tmp_path / "arrivals")
    index_path = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    first.coalesce(1).write.parquet(src_dir)
    q = start_ivf_pq_refresh_stream(spark, src_dir, index_path, centroids,
                                    books, ckpt)
    q.awaitTermination()
    n1 = spark.read.parquet(index_path).count()
    assert n1 == first.count()

    # restart with one new file: only the new rows are applied
    later.coalesce(1).write.mode("append").parquet(src_dir)
    q = start_ivf_pq_refresh_stream(spark, src_dir, index_path, centroids,
                                    books, ckpt)
    q.awaitTermination()
    assert spark.read.parquet(index_path).count() == emb.count()


def test_refresh_survives_crash_after_write_before_commit(spark, tables,
                                                          tmp_path):
    """ACTUAL mid-batch crash (VERDICT r02 item 8): the foreachBatch body
    completes its parquet write and then the 'process dies' before Spark
    commits the batch to the checkpoint. On restart the batch REPLAYS
    (commit file absent), and the dynamic-partition-overwrite must converge
    to exactly-once — no duplicates, no loss."""
    import pytest

    from server2_vector_search_server_spark.streaming.ann_index import (
        VECTORS_STREAM_SCHEMA,
        refresh_ivf_pq_index,
    )

    emb, centroids, books = _fixtures(tables)
    arriving = emb.filter(F.col("vec_id") < 200)
    src_dir = str(tmp_path / "arrivals")
    index_path = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    arriving.coalesce(1).write.parquet(src_dir)

    def crash_after_write(batch, batch_id):
        refresh_ivf_pq_index(batch, index_path, centroids, books,
                             batch_id=batch_id)
        raise RuntimeError("simulated crash between write and commit")

    q = (spark.readStream.schema(VECTORS_STREAM_SCHEMA).parquet(src_dir)
         .writeStream.foreachBatch(crash_after_write)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    with pytest.raises(Exception):
        q.awaitTermination()

    # crash state: data landed, commit didn't — the at-least-once window
    assert spark.read.parquet(index_path).count() == arriving.count()
    assert not os.path.exists(os.path.join(ckpt, "commits", "0"))

    # restart cleanly: batch 0 replays over the same rows and converges
    q2 = start_ivf_pq_refresh_stream(spark, src_dir, index_path, centroids,
                                     books, ckpt)
    q2.awaitTermination()
    stored = spark.read.parquet(index_path)
    assert stored.count() == arriving.count()
    assert stored.select("vec_id").distinct().count() == arriving.count()
    assert os.path.exists(os.path.join(ckpt, "commits", "0"))


def test_refresh_survives_torn_partial_write(spark, tables, tmp_path):
    """Crash DURING the write: only some of the batch's leaf partitions
    landed before the death, no checkpoint commit. Because the torn write's
    rows are a subset of the batch, its partitions are a subset of the
    replay's — dynamic overwrite replaces every torn partition and the
    index still converges exactly."""
    from server2_vector_search_server_spark.streaming.ann_index import (
        refresh_ivf_pq_index,
    )

    emb, centroids, books = _fixtures(tables)
    arriving = emb.filter(F.col("vec_id") < 200)
    src_dir = str(tmp_path / "arrivals")
    index_path = str(tmp_path / "index")
    arriving.coalesce(1).write.parquet(src_dir)

    # leftover of a write that died halfway through batch 0
    refresh_ivf_pq_index(arriving.filter(F.col("vec_id") % 2 == 0),
                         index_path, centroids, books, batch_id=0)

    q = start_ivf_pq_refresh_stream(spark, src_dir, index_path, centroids,
                                    books, str(tmp_path / "ckpt"))
    q.awaitTermination()
    stored = spark.read.parquet(index_path)
    assert stored.count() == arriving.count()
    assert stored.select("vec_id").distinct().count() == arriving.count()
