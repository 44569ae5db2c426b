"""Embedding tests (SURVEY.md §2 J1/J2): determinism, normalization, and the
mapInPandas model-path plumbing with a fake encoder."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from server2_vector_search_server_spark.embedding import (
    embed_hash,
    embed_with_model,
    hash_embedding_expr,
)
from server2_vector_search_server_spark.functions.vector import l2_norm


@pytest.fixture(scope="module")
def texts(spark):
    return spark.createDataFrame(
        [(1, "spark vector search"), (2, "spark vector search"),
         (3, "a completely different sentence"), (4, "")],
        "id long, content string")


def test_hash_embedding_deterministic_and_normalized(texts):
    out = embed_hash(texts, dim=16).withColumn(
        "norm", l2_norm(F.col("embedding"))).collect()
    by_id = {r["id"]: r for r in out}
    # determinism: same text → identical vector
    assert by_id[1]["embedding"] == by_id[2]["embedding"]
    # different text → different vector
    assert by_id[1]["embedding"] != by_id[3]["embedding"]
    # unit norm (config.py:43 analog)
    for i in (1, 2, 3):
        assert math.isclose(by_id[i]["norm"], 1.0, abs_tol=1e-9)
    assert len(by_id[1]["embedding"]) == 16


def test_hash_embedding_empty_text_is_zero_vector(texts):
    row = embed_hash(texts, dim=8).filter(F.col("id") == 4).first()
    assert all(v == 0.0 for v in row["embedding"])   # guarded normalize


def test_model_path_plumbing_with_fake_encoder(texts):
    """The mapInPandas production path, exercised with a deterministic fake
    (the real model is absent by design — embedding.py stub)."""
    import numpy as np

    def factory():
        def encode(batch):
            return np.array([[float(len(t)), 1.0, 0.0] for t in batch])
        return encode

    out = embed_with_model(texts, dim=3, encoder_factory=factory).collect()
    by_id = {r["id"]: r["embedding"] for r in out}
    assert by_id[1] == [len("spark vector search"), 1.0, 0.0]
    assert by_id[4] == [0.0, 1.0, 0.0]
    assert set(by_id) == {1, 2, 3, 4}


def test_model_path_without_lib_raises_not_implemented(texts):
    try:
        import sentence_transformers  # noqa: F401

        pytest.skip("sentence-transformers present")
    except ImportError:
        pass
    with pytest.raises(Exception) as exc_info:
        embed_with_model(texts).collect()
    assert "NotImplementedError" in str(exc_info.value) or \
        isinstance(exc_info.value, NotImplementedError)


def test_embed_with_model_real_backend_smoke(spark):
    """J1 production path: one executed run against a real (tiny)
    sentence-transformers model when the library is installed; skipped — not
    faked — otherwise. Pins the contract the fake-encoder tests assume:
    ArrayType(Float) column, model dimensionality, L2-normalized rows."""
    import math

    import pytest

    pytest.importorskip("sentence_transformers")
    from server2_vector_search_server_spark.embedding import embed_with_model

    df = spark.createDataFrame(
        [("hello world",), ("안녕하세요",)], "content string")
    rows = (embed_with_model(
                df, model_name="sentence-transformers/all-MiniLM-L6-v2",
                dim=384)
            .select("embedding").collect())
    assert len(rows) == 2
    for r in rows:
        vec = r["embedding"]
        assert len(vec) == 384
        assert math.isclose(sum(x * x for x in vec), 1.0, rel_tol=1e-3)
