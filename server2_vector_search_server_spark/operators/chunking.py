"""Sentence splitting + greedy chunk merge (SURVEY.md §2 H5/H6, J3/J4).

Reproduces the observable behavior of the reference's
``KoreanSentenceSplitter`` (``text_spliter.py:54-166``) — the only
non-library algorithm in the reference — as a fresh implementation:

  * sentences are packed greedily into chunks joined by ``" "`` while the
    joined length stays ≤ ``chunk_size`` (``text_spliter.py:107-113``);
  * when a chunk closes, the *trailing* sentences whose joined length is
    ≤ ``chunk_overlap`` are carried into the next chunk
    (``text_spliter.py:119-138``, backward scan, stop at first overflow);
  * a single sentence longer than ``chunk_size`` flushes the current chunk
    and becomes its own (oversize) chunk (``text_spliter.py:91-105``);
  * if the current sentence doesn't fit even after overlap seeding, the
    pure-overlap chunk is flushed and the sentence starts a fresh chunk
    (``text_spliter.py:145-153``);
  * all emitted chunks are ``.strip()``-ed (``text_spliter.py:162-163``).

Sentence splitting: the reference uses KSS (Korean) with a newline-split
fallback on error (``text_spliter.py:62-68``). KSS isn't available here, so
the engine offers deterministic splitters with the same contract
(strip + drop empties): ``punct`` (sentence-ending punctuation, the KSS
analog), ``newline`` (the reference's fallback, exact), and ``words:N``
(fixed-size word groups, for corpora without punctuation — the driver's
``documents`` fixture).

Spark realization: per-document, order-sensitive fold ⇒ ``applyInPandas``
grouped by ``doc_id``. This is the intended shape for 100 TB ingestion: each
group is one document (bounded size), groups distribute freely across
executors, and the only shuffle is the hash partition on doc_id. The pure
functions are importable and unit-tested without Spark.
"""

from __future__ import annotations

import re
from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from server2_vector_search_server_spark import config

_PUNCT_SPLIT = re.compile(r"(?<=[.!?。！？])\s+")


def _kss_split(text: str) -> list[str]:
    """The reference's exact H5: KSS sentence splitting with ITS newline
    fallback on runtime errors (``text_spliter.py:57-68``). Import-gated like
    the embedding model (``embedding._load_model``): KSS is heavyweight and
    version-nondeterministic, so the container ships without it and tests
    pin the deterministic splitters instead (SURVEY.md §7); installing
    ``kss`` makes this path reference-exact, including the error fallback."""
    try:
        import kss  # type: ignore
    except ImportError as exc:
        raise NotImplementedError(
            "kss is not installed in this environment. Install it for "
            "reference-exact Korean sentence splitting (text_spliter.py:57); "
            "tests use mode='punct' (the KSS analog) or mode='newline' "
            "(the reference's own fallback).") from exc
    try:
        return list(kss.split_sentences(text))
    except Exception:              # text_spliter.py:66-68: fall back, don't die
        return text.split("\n")


def split_sentences(text: str, mode: str = "punct") -> list[str]:
    """Deterministic sentence splitting; strips and drops empties like the
    reference does after KSS (``text_spliter.py:59``)."""
    if text is None:
        return []
    if mode == "punct":
        parts: Iterable[str] = _PUNCT_SPLIT.split(text)
    elif mode == "newline":        # the reference's KSS-error fallback
        parts = text.split("\n")
    elif mode == "kss":            # the reference's primary path, import-gated
        parts = _kss_split(text)
    elif mode.startswith("words:"):
        n = int(mode.split(":", 1)[1])
        words = text.split()
        parts = (" ".join(words[i:i + n]) for i in range(0, len(words), n))
    else:
        raise ValueError(f"unknown sentence split mode {mode!r}")
    return [s for s in (p.strip() for p in parts) if s]


def merge_sentences(sentences: list[str],
                    chunk_size: int = config.CHUNK_SIZE,
                    chunk_overlap: int = config.CHUNK_OVERLAP,
                    separator: str = " ") -> list[str]:
    """Greedy sentence→chunk packing with trailing-sentence overlap.

    Behavior-parity target: ``text_spliter.py:80-166`` (see module docstring
    for the clause-by-clause mapping). Pure function — property-tested in
    ``tests/test_chunking.py``.
    """
    chunks: list[str] = []
    current: list[str] = []
    current_len = 0
    sep_len = len(separator)

    def joined_len(base_len: int, n_parts: int, add_len: int) -> int:
        return base_len + add_len + (sep_len if n_parts else 0)

    for sentence in sentences:
        s_len = len(sentence)

        if s_len > chunk_size:
            # oversize sentence: flush, emit alone, reset (no overlap carry)
            if current:
                chunks.append(separator.join(current))
            chunks.append(sentence)
            current, current_len = [], 0
            continue

        fits = joined_len(current_len, len(current), s_len)
        if fits <= chunk_size:
            current.append(sentence)
            current_len = fits
            continue

        # close the full chunk
        chunks.append(separator.join(current))

        # seed the next chunk with trailing overlap sentences
        overlap: list[str] = []
        overlap_len = 0
        for prev in reversed(current):
            cand = joined_len(overlap_len, len(overlap), len(prev))
            if cand <= chunk_overlap:
                overlap.insert(0, prev)
                overlap_len = cand
            else:
                break

        current, current_len = overlap, overlap_len
        with_overlap = joined_len(current_len, len(current), s_len)
        if with_overlap <= chunk_size:
            current.append(sentence)
            current_len = with_overlap
        else:
            # sentence doesn't fit beside the overlap: flush the pure-overlap
            # chunk and restart from the sentence alone
            if current:
                chunks.append(separator.join(current))
            current, current_len = [sentence], s_len

    if current:
        chunks.append(separator.join(current))
    return [c.strip() for c in chunks]


def split_text(text: str, chunk_size: int = config.CHUNK_SIZE,
               chunk_overlap: int = config.CHUNK_OVERLAP,
               mode: str = "punct") -> list[str]:
    """Full H5+H6 pipeline for one document."""
    return merge_sentences(split_sentences(text, mode), chunk_size,
                           chunk_overlap)


def chunk_documents(docs: DataFrame, *, id_col: str = "doc_id",
                    text_col: str = "text",
                    chunk_size: int = config.CHUNK_SIZE,
                    chunk_overlap: int = config.CHUNK_OVERLAP,
                    mode: str = "punct") -> DataFrame:
    """Distributed chunking: one input row per document → one output row per
    chunk with ``chunk_index`` (the materialized per-doc row_number the
    reference assigns at split time, ``document_processor.py:141-147``).

    Implemented with a pandas UDF over ``text_col`` returning the chunk array,
    then ``posexplode`` — a narrow transformation (NO shuffle at all, unlike a
    grouped-map), because chunking one document never needs another
    document's rows. Carries all other input columns through.
    """
    def _chunk(texts):
        return texts.map(
            lambda t: split_text(t, chunk_size, chunk_overlap, mode))

    # explicit functionType: `from __future__ import annotations` stringifies
    # hints, which PySpark's eval-type inference can't read
    chunk_udf = F.pandas_udf(_chunk, "array<string>")

    other_cols = [c for c in docs.columns if c != text_col]
    return (
        docs.withColumn("__chunks", chunk_udf(F.col(text_col)))
        .select(*other_cols,
                F.posexplode("__chunks").alias("chunk_index", "content"))
    )
