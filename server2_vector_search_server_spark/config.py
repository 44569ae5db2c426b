"""Engine constants mirroring the reference's observable configuration.

Every value cites the reference file:line it reproduces (``/root/reference``).
These are the knobs that define observable semantics — they are NOT tuning
parameters of this engine's execution (Spark configs live in ``session.py``).
"""

from __future__ import annotations

# --- Collections (reference config.py:16-28) -------------------------------
# One master + five topical collections. The reference dual-writes every chunk
# to its target collection AND master (vector_store.py:115-131); this engine
# stores one table partitioned by `collection` and treats master as the union
# view (SURVEY.md §1.3) — same observable semantics, half the writes, no
# cascading-delete complexity.
MASTER_COLLECTION_NAME = "master"
SPECIFIC_COLLECTION_NAMES = [
    "collection_a",
    "collection_b",
    "collection_c",
    "collection_d",
    "collection_e",
]
ALL_COLLECTION_NAMES = [MASTER_COLLECTION_NAME, *SPECIFIC_COLLECTION_NAMES]

# --- Chunking (reference config.py:31-32; text_spliter.py:80-166) ----------
CHUNK_SIZE = 500      # max chunk length in characters
CHUNK_OVERLAP = 100   # max overlap carried from previous chunk, in characters

# --- Embedding (reference config.py:35-43) ---------------------------------
# Reference: intfloat/multilingual-e5-large-instruct, 1024-dim float32,
# L2-normalized (config.py:43). Tests use a 64-dim deterministic hash-embedder
# (FIXTURES.md) because the HF model is hardware/version-dependent.
EMBEDDING_DIM = 1024
TEST_EMBEDDING_DIM = 64

# --- Search (reference config.py:46-49; api_models.py:8) -------------------
SEARCH_K = 1            # config fallback, used only when request k == -1
                        # (vector_store.py:141,158)
DEFAULT_API_K = 5       # API default k (api_models.py:8)
SIMILARITY_THRESHOLD = 0.1   # applied to score = 1 - d^2 (app.py:418-420,
                             # config.py:49)

# --- Ingestion file types (reference document_processor.py:100-117) --------
ALLOWED_EXTENSIONS = {".pdf", ".txt", ".md"}

# --- Oracle-parity rounding ------------------------------------------------
# Scores are single double-precision expressions, deterministic per row, but we
# round to 6 dp so Spark/DuckDB value-hash comparison is robust to any
# fold-order difference in array summation.
SCORE_DECIMALS = 6
