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
    from pyspark.sql.functions import udtf as _udtf

    spark.udtf.register("word_shingles", WordShingles)
    # no returnType: analyze() supplies the schema per call site
    spark.udtf.register("parse_delimited", _udtf(ParseDelimited))


class ParseDelimited:
    """POLYMORPHIC UDTF: the output schema is computed at PLAN TIME by
    ``analyze()`` from the (foldable) column-spec argument — Spark 4's
    dynamic-schema table function. ``parse_delimited(line, 'a bigint,
    b string')`` plans with exactly those output columns; a different spec
    literal plans a different relation. This is the schema-on-read escape
    hatch for delimited logs whose layout is a runtime parameter.

    Supported field types: bigint, int, double, string (enough to make the
    polymorphism real; the cast table extends mechanically).
    """

    _FIELD_TYPES = None  # populated lazily (worker has no SparkContext)

    @staticmethod
    def analyze(line, spec):
        # NOTE: runs in a driver-side Python worker with NO active
        # SparkSession — StructType.fromDDL would raise
        # SESSION_OR_CONTEXT_NOT_EXISTS; parse the spec by hand.
        from pyspark.sql.types import (
            DoubleType, IntegerType, LongType, StringType, StructField,
            StructType,
        )
        from pyspark.sql.udtf import AnalyzeResult

        if not spec.isConstantExpression or spec.value is None:
            raise ValueError("spec must be a constant column-spec string")
        types = {"bigint": LongType(), "int": IntegerType(),
                 "integer": IntegerType(), "double": DoubleType(),
                 "string": StringType()}
        fields = []
        for part in spec.value.split(","):
            name, tname = part.strip().rsplit(" ", 1)
            fields.append(StructField(name.strip(), types[tname.lower()]))
        return AnalyzeResult(schema=StructType(fields))

    _CASTS = {"bigint": int, "int": int, "integer": int,
              "double": float, "string": str}

    def eval(self, line: str, spec: str):  # noqa: D102 — UDTF contract
        if line is None:
            return
        types = [f.strip().split()[-1].lower() for f in spec.split(",")]
        parts = line.split("|")
        row = []
        for raw, t in zip(parts, types):
            cast = self._CASTS.get(t, str)
            row.append(None if raw == "" else cast(raw))
        row += [None] * (len(types) - len(row))
        yield tuple(row)
