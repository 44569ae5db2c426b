"""Python UDTF surface (SURVEY.md §2.J5 — the one-row-in/N-rows-out shape).

The reference's row-expanding operator is the ZIP member expander
(``app.py:166-198``), realized in this engine as a mapInPandas flatMap
(sources/files.expand_zip). This module adds the FIRST-CLASS table-function
form — PySpark's ``@udtf`` — so the engine also exposes the lateral-join
API a SQL user expects: ``FROM docs, LATERAL word_shingles(text)``.

``useArrow=True`` batches rows over Arrow instead of pickling one at a
time (the UDF-is-the-slow-path rule applies doubly to UDTFs); the shingle
logic itself is trivially vectorizable, so at 100 TB this exact operator
would be the mapInPandas form — the UDTF form exists for API completeness
and for operators whose per-row fan-out is genuinely imperative.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos int, shingle string", useArrow=True)
class WordShingles:
    """Expand text into word 3-gram shingles with 1-based positions —
    the shingle set MinHash consumes (operators/dedup.py), exposed as a
    lateral table function."""

    def eval(self, text: str):  # noqa: D102 — UDTF contract method
        if text is None:
            return
        toks = text.split(" ")
        for i in range(len(toks) - 2):
            yield i + 1, " ".join(toks[i:i + 3])


def register_udtfs(spark) -> None:
    """Register all engine UDTFs on the session (idempotent)."""
    spark.udtf.register("word_shingles", WordShingles)
