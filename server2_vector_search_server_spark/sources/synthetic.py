"""Spark-4 Python DataSource: a deterministic synthetic document corpus.

The reference ingests documents from uploaded files; a scale test bench also
needs corpora LARGER than any fixture. This implements the modern Spark 4
``pyspark.sql.datasource`` API (the Python analog of a DataSourceV2
TableProvider) as a real planned source, not a driver-side createDataFrame:

  * ``partitions()`` splits the id range into ``parts`` independent splits —
    the query planner schedules one task per split, so generation is fully
    parallel and the driver never holds a row;
  * ``pushFilters()`` (Spark 4.1) consumes ``doc_id`` range/equality
    predicates by NARROWING the planned splits — a ``doc_id >= k`` filter
    prunes whole partitions at planning time, the Python-source counterpart
    of parquet row-group pruning (remaining filters are returned to Spark
    for post-scan evaluation);
  * rows are a pure function of ``doc_id`` (integer arithmetic only), so an
    SQL oracle on ANY engine reproduces the corpus bit-for-bit — the same
    portability contract as `functions/text.py`'s portable hash.

Row shape matches the documents fixture: (doc_id, text, lang, source,
n_chars).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

FORMAT_NAME = "synthetic_docs"
_LANGS = ("en", "es", "de")
_SOURCES = ("web", "wiki", "books")


def doc_text(doc_id: int) -> str:
    """The row contract: 'doc <id> ' + (5 + id%10) words 'w<(id*31+i*7)%97>'.
    Pure integer arithmetic so DuckDB replicates it literally."""
    k = 5 + doc_id % 10
    words = " ".join(f"w{(doc_id * 31 + i * 7) % 97}" for i in range(k))
    return f"doc {doc_id} {words}"


def doc_row(doc_id: int) -> tuple:
    text = doc_text(doc_id)
    return (doc_id, text, _LANGS[doc_id % 3], _SOURCES[doc_id % 5 % 3],
            len(text))


@dataclass
class _IdRange(InputPartition):
    lo: int
    hi: int  # exclusive


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.parts = max(1, int(options.get("parts", 8)))
        self.lo, self.hi = 0, self.n

    def pushFilters(self, filters):
        """Narrow [lo, hi) from doc_id comparisons; yield back whatever we
        cannot consume (Spark re-applies those after the scan)."""
        for f in filters:
            name = type(f).__name__
            col = f.attribute[0] if f.attribute else None
            if col == "doc_id" and name == "GreaterThan":
                self.lo = max(self.lo, f.value + 1)
            elif col == "doc_id" and name == "GreaterThanOrEqual":
                self.lo = max(self.lo, f.value)
            elif col == "doc_id" and name == "LessThan":
                self.hi = min(self.hi, f.value)
            elif col == "doc_id" and name == "LessThanOrEqual":
                self.hi = min(self.hi, f.value + 1)
            elif col == "doc_id" and name == "EqualTo":
                self.lo = max(self.lo, f.value)
                self.hi = min(self.hi, f.value + 1)
            else:
                yield f

    def partitions(self):
        lo, hi = self.lo, max(self.lo, self.hi)
        span = hi - lo
        if span == 0:
            return [_IdRange(lo, lo)]
        parts = min(self.parts, span)
        step = -(-span // parts)
        return [_IdRange(lo + i * step, min(lo + (i + 1) * step, hi))
                for i in range(parts)]

    def read(self, partition: _IdRange):
        for doc_id in range(partition.lo, partition.hi):
            yield doc_row(doc_id)


class SyntheticDocsDataSource(DataSource):
    @classmethod
    def name(cls):
        return FORMAT_NAME

    def schema(self):
        return ("doc_id bigint, text string, lang string, source string, "
                "n_chars bigint")

    def reader(self, schema):
        return SyntheticDocsReader(self.options)

    def simpleStreamReader(self, schema):
        return SyntheticDocsStreamReader(self.options)


def register(spark) -> None:
    # a reader that implements pushFilters is REJECTED outright when the
    # python filter-pushdown conf is off, so enable it at registration
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticDocsDataSource)


class SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch stream over the same pure-function corpus: offsets are
    ``{"id": next_doc_id}``, each batch emits up to ``batch`` rows, and
    ``readBetweenOffsets`` regenerates any committed range untouched — the
    deterministic-replay contract that makes checkpoint recovery
    exactly-once (same property the WAL replay tests pin for the parquet
    stream, here provided BY the source instead of by the sink)."""

    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.batch = max(1, int(options.get("batch", 100)))

    def initialOffset(self):
        return {"id": 0}

    def read(self, start):
        lo = int(start["id"])
        hi = min(lo + self.batch, self.n)
        return (iter([doc_row(i) for i in range(lo, hi)]), {"id": hi})

    def readBetweenOffsets(self, start, end):
        return iter([doc_row(i)
                     for i in range(int(start["id"]), int(end["id"]))])

    def commit(self, end):
        pass
