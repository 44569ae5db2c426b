"""Catalog / listing / existence / dedup operators (SURVEY.md §2 D, B4/B5, C3, G).

Reference behaviors reproduced:
  * D1 ``/list-documents`` — scan metadata, one row per doc_id with its name
    (``app.py:447-484``; dict-dedup loop at ``:466-473``). The reference's
    "first-seen wins" is scan-order nondeterminism; we use deterministic
    aggregates (min) so results are stable and oracle-checkable.
  * D2 ``/documents_ui`` — group all chunks per doc with collected payloads
    (``app.py:549-577``). ``collect_list`` order is partition-dependent, so we
    ``sort_array`` — deterministic, same information.
  * B4/B5 existence probes (``vector_store.py:56-89``) — the reference loops
    ``get(limit=1)`` per collection; here one aggregate over the (optionally
    partition-pruned) table.
  * C3 dedup-by-name upload guard (``app.py:152-157,212-217``) — batch form is
    a LEFT ANTI join, the scalable replacement for per-file existence loops:
    at 100 TB the anti-join shuffles only distinct names, not chunks.
  * G master == union of collections (``vector_store.py:115-131`` dual-write)
    — with the single partitioned table, master is simply "no collection
    predicate"; ``union_collections`` exists to prove the equivalence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def list_documents(chunks: DataFrame, *, id_col: str = "doc_id",
                   name_col: str = "doc_name") -> DataFrame:
    """D1: one row per document: (doc_id, doc_name, n_chunks).

    Single hash-aggregate; partial aggregation map-side means the shuffle
    carries one row per (partition, doc_id) — safe at any corpus size.
    """
    return (
        chunks.groupBy(id_col)
        .agg(F.min(name_col).alias(name_col),
             F.count(F.lit(1)).alias("n_chunks"))
    )


def group_documents(chunks: DataFrame, *, id_col: str = "doc_id",
                    payload_col: str = "chunk_id") -> DataFrame:
    """D2: per-document collected chunk payloads (UI shape), deterministic."""
    return (
        chunks.groupBy(id_col)
        .agg(F.sort_array(F.collect_list(payload_col)).alias("chunk_ids"),
             F.count(F.lit(1)).alias("n_chunks"))
    )


def document_exists(chunks: DataFrame, where) -> DataFrame:
    """B4/B5: one-row DataFrame with ``doc_exists`` boolean.

    The engine form of the reference's LIMIT-1 probe; Catalyst pushes the
    predicate to the scan and AQE stops early — no full materialization.
    """
    from server2_vector_search_server_spark.functions.filters import apply_where

    return (
        apply_where(chunks, where)
        .agg((F.count(F.lit(1)) > 0).alias("doc_exists"))
    )


def dedup_new_documents(new_docs: DataFrame, existing: DataFrame,
                        on: str) -> DataFrame:
    """C3: keep only new docs whose ``on`` key does not already exist.

    LEFT ANTI join; broadcast chosen by Catalyst when the distinct-key side
    is small, shuffle-hash otherwise. This is the batched, scalable version
    of the reference's per-upload global existence scan.
    """
    return new_docs.join(existing.select(on).distinct(), on, "left_anti")


def union_collections(parts: list[DataFrame]) -> DataFrame:
    """G: explicit union of per-collection frames (master-view equivalence)."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
