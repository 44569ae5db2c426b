"""Streaming document ingestion into the ChunkStore (SURVEY.md §3.1 under
readStream).

The reference's ``/upload-document`` is a synchronous request loop; arriving
files are naturally a stream. This wraps the batch ingestion pipeline
(``plans/ingest.ingest_documents`` — dedup gate → chunk → embed →
partitioned append) in ``foreachBatch``, so each micro-batch:

  * first drops in-batch duplicate names (the reference's sequential loop
    hits the store-exists gate after the first copy is stored; batch form =
    first-seen-wins within the trigger);
  * then runs the global anti-join gate against the CURRENT store state —
    names ingested by earlier micro-batches are skipped exactly like names
    from earlier HTTP uploads (``app.py:152``);
  * then appends the surviving chunk rows.

Checkpointed source offsets make redelivery exactly-once at the file level;
the dedup gate additionally makes re-ingesting an already-stored name a
no-op, so the pipeline is idempotent even across checkpoint resets.

**Concurrency contract (single writer per store).** Within one streaming
query, Structured Streaming runs ``foreachBatch`` batches strictly
sequentially, so batch N+1's gate always sees batch N's writes — the gate
is airtight against in-flight duplicates across micro-batches (tested with
``maxFilesPerTrigger=1``). Across CONCURRENT queries writing the same store
there is no such ordering: two streams could both pass the gate before
either appends (classic read-modify-write race). Run one ingest stream per
store — the same discipline the reference enforces implicitly by being a
single synchronous server process (``app.py``'s sequential request loop).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from server2_vector_search_server_spark import config
from server2_vector_search_server_spark.plans.ingest import ingest_documents
from server2_vector_search_server_spark.sources.store import ChunkStore

DOCS_STREAM_SCHEMA = "doc_name string, text string"


def start_document_ingest_stream(
    spark: SparkSession,
    src_dir: str,
    store: ChunkStore,
    checkpoint_dir: str,
    *,
    collection: str = config.MASTER_COLLECTION_NAME,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    **ingest_kwargs,
):
    """Consume parquet document files from ``src_dir`` and ingest each
    micro-batch through the full pipeline. Returns the StreamingQuery."""

    def apply(batch, batch_id: int) -> None:
        ingest_documents(store,
                         batch.dropDuplicates(["doc_name"]),
                         collection=collection, **ingest_kwargs)

    reader = spark.readStream.schema(DOCS_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(src_dir)
    writer = (
        stream.writeStream
        .foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
