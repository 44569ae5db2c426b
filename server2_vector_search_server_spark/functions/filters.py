"""Chroma ``where``-dict filter dialect → Spark Column translator.

The reference passes user filter dicts straight through to ChromaDB
(``vector_store.py:148,165``; API surface ``api_models.py:9``), so Chroma's
public ``where`` grammar is part of the observable contract (SURVEY.md §2 B2):

    {"field": value}                       — implicit $eq
    {"field": {"$eq"|"$ne"|"$gt"|"$gte"|"$lt"|"$lte": scalar}}
    {"field": {"$in"|"$nin": [scalars]}}
    {"$and": [expr, ...]}  /  {"$or": [expr, ...]}

Translating to a Column (instead of evaluating post-hoc in Python like the
reference's library does via its sqlite EAV store) means Catalyst pushes the
predicate INTO the parquet scan — at 100 TB a ``doc_name = X`` filter prunes
row groups via min/max stats and never materializes non-matching rows, which
is the whole reason filtered k-NN stays cheap without an index.
"""

from __future__ import annotations

from typing import Any, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_COMPARISONS = {
    "$eq": lambda c, v: c == F.lit(v),
    "$ne": lambda c, v: c != F.lit(v),
    "$gt": lambda c, v: c > F.lit(v),
    "$gte": lambda c, v: c >= F.lit(v),
    "$lt": lambda c, v: c < F.lit(v),
    "$lte": lambda c, v: c <= F.lit(v),
    "$in": lambda c, v: c.isin(list(v)),
    "$nin": lambda c, v: ~c.isin(list(v)),
}


def where_dict_to_column(where: Mapping[str, Any]) -> Column:
    """Translate a Chroma ``where`` dict into a single boolean Column.

    Raises ``ValueError`` on unknown operators / malformed shapes (the
    reference would surface these as Chroma errors → HTTP 500, app.py:442-444).
    """
    if not isinstance(where, Mapping) or not where:
        raise ValueError(f"where must be a non-empty dict, got {where!r}")
    clauses = []
    for key, value in where.items():
        if key == "$and" or key == "$or":
            if not isinstance(value, (list, tuple)) or not value:
                raise ValueError(f"{key} expects a non-empty list")
            subs = [where_dict_to_column(sub) for sub in value]
            combined = subs[0]
            for sub in subs[1:]:
                combined = (combined & sub) if key == "$and" else (combined | sub)
            clauses.append(combined)
        elif key.startswith("$"):
            raise ValueError(f"unknown logical operator {key!r}")
        elif isinstance(value, Mapping):
            if len(value) != 1:
                raise ValueError(
                    f"field predicate must have exactly one operator: {value!r}")
            op, operand = next(iter(value.items()))
            if op not in _COMPARISONS:
                raise ValueError(f"unknown comparison operator {op!r}")
            clauses.append(_COMPARISONS[op](F.col(key), operand))
        else:
            # bare scalar — implicit $eq (Chroma shorthand)
            clauses.append(F.col(key) == F.lit(value))
    combined = clauses[0]
    for clause in clauses[1:]:
        combined = combined & clause   # top-level keys AND together
    return combined


def apply_where(df: DataFrame, where: Mapping[str, Any] | None) -> DataFrame:
    """``df.filter(translate(where))``; identity when ``where`` is None.

    Mirrors the optional ``filter`` param of the reference search endpoints
    (``vector_store.py:139-171``).
    """
    if where is None:
        return df
    return df.filter(where_dict_to_column(where))
