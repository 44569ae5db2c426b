"""Extract the reference's REAL E5 vectors into a committed golden fixture.

The reference server persists a ChromaDB store whose write-ahead log
(``embeddings_queue`` in ``vector_db_collections/master/chroma.sqlite3``)
retains every upserted row: chunk text (``chroma:document``), the engine
metadata keys (``doc_id``/``doc_name``/``chunk_index``/
``original_collection`` — document_processor.py:143-149), and the raw
4096-byte FLOAT32 vector actually produced by
``intfloat/multilingual-e5-large-instruct`` (config.py:35-43,
embedding.py:7-27: normalized, no role prefixes). Those vectors are the
ground truth the engine's ``/search_score`` parity has to hold against —
every other oracle runs on the deterministic hash embedder, which can
never prove the REAL-vector numeric path.

This script snapshots them into ``tests/fixtures/e5_golden.parquet``:

  seq_id BIGINT, chunk_id STRING, doc_id STRING, doc_name STRING,
  chunk_index INT, original_collection STRING, content STRING,
  embedding LIST<FLOAT>   (1024-dim, unit L2 norm)

One source document (a personal resume) is EXCLUDED: its chunks contain
an individual's personal data, which has no place in a committed fixture;
the remaining 58 chunks (public exam papers + synthetic corporate
notices) carry the same numeric evidence.

Run only where ``/root/reference`` exists; the fixture is committed, so
tests never need the reference at runtime. ``tests/test_e5_golden_parity.py``
re-verifies byte-exactness against the WAL when the reference IS present.
"""

from __future__ import annotations

import json
import os
import sqlite3
import unicodedata

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REF_DB = "/root/reference/vector_db_collections/master/chroma.sqlite3"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "e5_golden.parquet")
# personal data — never commit (see module docstring)
EXCLUDE_DOCS = {"[에프앤가이드] 지원이력서.pdf"}


def main() -> None:
    con = sqlite3.connect(f"file:{REF_DB}?mode=ro", uri=True)
    rows = con.execute(
        "SELECT seq_id, id, vector, metadata FROM embeddings_queue "
        "WHERE operation = 2 ORDER BY seq_id").fetchall()
    out = {k: [] for k in ("seq_id", "chunk_id", "doc_id", "doc_name",
                           "chunk_index", "original_collection", "content",
                           "embedding")}
    skipped = 0
    for seq_id, chunk_id, blob, md_json in rows:
        md = json.loads(md_json)
        # the WAL stores macOS-style NFD doc names; compare and store NFC
        # (the engine's A4 filename decode chain normalizes to NFC too)
        doc_name = unicodedata.normalize("NFC", md["doc_name"])
        if doc_name in EXCLUDE_DOCS:
            skipped += 1
            continue
        md["doc_name"] = doc_name
        vec = np.frombuffer(blob, dtype=np.float32)
        assert vec.shape == (1024,), vec.shape
        out["seq_id"].append(int(seq_id))
        out["chunk_id"].append(chunk_id)
        out["doc_id"].append(md["doc_id"])
        out["doc_name"].append(md["doc_name"])
        out["chunk_index"].append(int(md["chunk_index"]))
        out["original_collection"].append(md["original_collection"])
        out["content"].append(md["chroma:document"])
        out["embedding"].append(vec.tolist())
    table = pa.table({
        "seq_id": pa.array(out["seq_id"], pa.int64()),
        "chunk_id": pa.array(out["chunk_id"], pa.string()),
        "doc_id": pa.array(out["doc_id"], pa.string()),
        "doc_name": pa.array(out["doc_name"], pa.string()),
        "chunk_index": pa.array(out["chunk_index"], pa.int32()),
        "original_collection": pa.array(out["original_collection"],
                                        pa.string()),
        "content": pa.array(out["content"], pa.string()),
        "embedding": pa.array(out["embedding"], pa.list_(pa.float32())),
    })
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pq.write_table(table, OUT, compression="zstd")
    print(f"wrote {table.num_rows} rows ({skipped} excluded) -> {OUT}")


if __name__ == "__main__":
    main()
