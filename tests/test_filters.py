"""Chroma where-dialect translator tests (SURVEY.md §2 B1/B2)."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from server2_vector_search_server_spark.functions.filters import (
    apply_where,
    where_dict_to_column,
)


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [("a.pdf", 1, 10.0, "es"), ("b.txt", 2, 20.0, "en"),
         ("c.pdf", 3, 30.0, "es"), ("d.txt", 4, 40.0, "zh")],
        "doc_name string, chunk_index int, score double, lang string")


def names(df, where):
    return sorted(r["doc_name"] for r in apply_where(df, where).collect())


def test_implicit_eq(df):
    assert names(df, {"doc_name": "a.pdf"}) == ["a.pdf"]


def test_comparisons(df):
    assert names(df, {"chunk_index": {"$gt": 2}}) == ["c.pdf", "d.txt"]
    assert names(df, {"chunk_index": {"$gte": 2}}) == ["b.txt", "c.pdf", "d.txt"]
    assert names(df, {"chunk_index": {"$lt": 2}}) == ["a.pdf"]
    assert names(df, {"chunk_index": {"$lte": 2}}) == ["a.pdf", "b.txt"]
    assert names(df, {"lang": {"$ne": "es"}}) == ["b.txt", "d.txt"]
    assert names(df, {"lang": {"$eq": "zh"}}) == ["d.txt"]


def test_in_nin(df):
    assert names(df, {"lang": {"$in": ["es", "zh"]}}) == ["a.pdf", "c.pdf", "d.txt"]
    assert names(df, {"lang": {"$nin": ["es", "zh"]}}) == ["b.txt"]


def test_and_or_nesting(df):
    w = {"$or": [{"lang": "en"},
                 {"$and": [{"lang": "es"}, {"chunk_index": {"$gt": 1}}]}]}
    assert names(df, w) == ["b.txt", "c.pdf"]


def test_multiple_top_level_keys_and_together(df):
    assert names(df, {"lang": "es", "chunk_index": {"$gt": 1}}) == ["c.pdf"]


def test_none_is_identity(df):
    assert apply_where(df, None).count() == 4


@pytest.mark.parametrize("bad", [
    {}, {"$and": []}, {"$unknown": [{"a": 1}]},
    {"f": {"$regex": "x"}}, {"f": {"$gt": 1, "$lt": 2}},
])
def test_malformed_raises(bad):
    with pytest.raises(ValueError):
        where_dict_to_column(bad)


def test_pushdown_reaches_parquet_scan(tables):
    """Scale check: the translated predicate must reach the parquet source."""
    plan = apply_where(
        tables["documents"], {"lang": {"$eq": "es"}}
    ).select("doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,es)]" in plan
