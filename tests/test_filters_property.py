"""Property test: the Chroma where-dialect translator agrees with a direct
Python evaluation of the same dict on every row — including null semantics
(any comparison against NULL excludes the row, Spark's three-valued logic
collapsed by the final filter)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from server2_vector_search_server_spark.functions.filters import apply_where

ROWS = [
    (0, 5, "red"), (1, 7, "blue"), (2, 5, None), (3, 9, "green"),
    (4, 2, "red"), (5, 7, "blue"), (6, 4, "red"), (7, 1, None),
    (8, 9, "green"), (9, 3, "yellow"),
]

INTS = st.integers(min_value=0, max_value=10)
STRS = st.sampled_from(["red", "blue", "green", "yellow", "purple"])

leaf_a = st.one_of(
    INTS.map(lambda v: {"a": v}),
    st.tuples(st.sampled_from(["$eq", "$ne", "$gt", "$gte", "$lt", "$lte"]),
              INTS).map(lambda t: {"a": {t[0]: t[1]}}),
    st.lists(INTS, min_size=1, max_size=4).map(lambda v: {"a": {"$in": v}}),
    st.lists(INTS, min_size=1, max_size=4).map(lambda v: {"a": {"$nin": v}}),
)
leaf_b = st.one_of(
    STRS.map(lambda v: {"b": v}),
    st.tuples(st.sampled_from(["$eq", "$ne"]), STRS)
      .map(lambda t: {"b": {t[0]: t[1]}}),
    st.lists(STRS, min_size=1, max_size=3).map(lambda v: {"b": {"$in": v}}),
)
where_st = st.recursive(
    st.one_of(leaf_a, leaf_b),
    lambda children: st.one_of(
        st.lists(children, min_size=1, max_size=3)
          .map(lambda subs: {"$and": subs}),
        st.lists(children, min_size=1, max_size=3)
          .map(lambda subs: {"$or": subs}),
    ),
    max_leaves=6,
)


def _eval(row: dict, where: dict) -> bool:
    """Python mirror: NULL fails every comparison (SQL three-valued logic
    after the final boolean filter)."""
    out = True
    for key, value in where.items():
        if key == "$and":
            out = out and all(_eval(row, sub) for sub in value)
        elif key == "$or":
            out = out and any(_eval(row, sub) for sub in value)
        else:
            v = row[key]
            if isinstance(value, dict):
                op, operand = next(iter(value.items()))
            else:
                op, operand = "$eq", value
            if v is None:
                return False
            ok = {
                "$eq": lambda: v == operand,
                "$ne": lambda: v != operand,
                "$gt": lambda: v > operand,
                "$gte": lambda: v >= operand,
                "$lt": lambda: v < operand,
                "$lte": lambda: v <= operand,
                "$in": lambda: v in operand,
                "$nin": lambda: v not in operand,
            }[op]()
            out = out and ok
        if not out:
            return False
    return out


@pytest.fixture(scope="module")
def frame(spark):
    df = spark.createDataFrame(ROWS, "id long, a long, b string").cache()
    df.count()
    return df


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(where=where_st)
def test_where_dialect_matches_python_eval(frame, where):
    got = {r["id"] for r in apply_where(frame, where).select("id").collect()}
    want = {rid for rid, a, b in ROWS
            if _eval({"a": a, "b": b}, where)}
    assert got == want, where
