"""Deterministic mock embedder: bit-for-bit parity with the reference's
MockEmbedder recipe (sha256[:8] seed → RandomState.randn → normalize),
plus the cache-table join path."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from custom_python_vectordb_spark.functions.embeddings import (
    embed_column,
    embed_with_cache,
    mock_embed_one,
    text_cache_key,
)


def reference_recipe(text: str, dim: int) -> np.ndarray:
    seed = int(hashlib.sha256(text.encode()).hexdigest()[:8], 16)
    rng = np.random.RandomState(seed)
    v = rng.randn(dim).astype(np.float32)
    return v / np.linalg.norm(v)


def test_driver_twin_matches_recipe():
    for t in ("hello", "world", ""):
        if t == "":
            continue  # norm of empty-seeded vector still fine, but skip degenerate
        assert np.array_equal(mock_embed_one(t, 64), reference_recipe(t, 64))


def test_udf_matches_driver_twin(spark):
    df = spark.createDataFrame([(i, f"text number {i}") for i in range(20)], "id long, text string")
    out = embed_column(df, "text", dimensions=64).collect()
    for r in out:
        exp = mock_embed_one(f"text number {r['id']}", 64)
        assert np.array_equal(np.array(r["embedding"], dtype=np.float32), exp)


def test_unit_norm(spark):
    df = spark.createDataFrame([(1, "abc")], "id long, text string")
    r = embed_column(df, "text", dimensions=32).collect()[0]
    assert np.linalg.norm(r["embedding"]) == pytest.approx(1.0, rel=1e-6)


def test_cache_join_path(spark):
    df = spark.createDataFrame([(1, "aaa"), (2, "bbb")], "id long, text string")
    # cache holds a DIFFERENT vector for 'aaa' so we can tell hit from miss
    fake = [1.0] + [0.0] * 63
    key_aaa = df.filter(F.col("id") == 1).select(text_cache_key("text").alias("k")).first()["k"]
    cache = spark.createDataFrame([(key_aaa, fake)], "key string, embedding array<float>")
    out = {r["id"]: r["embedding"] for r in embed_with_cache(df, cache, "text").collect()}
    assert out[1] == fake  # served from cache
    assert np.array_equal(np.array(out[2], dtype=np.float32), mock_embed_one("bbb", 64))


def test_provider_dispatch_and_gating(spark):
    """The real-provider slot is gated at factory time with a clear error;
    the mock dispatches and stays the deterministic default."""
    import pytest as _pytest

    from custom_python_vectordb_spark.functions.embeddings import embedder_udf

    udf = embedder_udf("mock", dimensions=8)
    df = spark.createDataFrame([("hello",)], "text string").select(udf("text").alias("e"))
    assert len(df.collect()[0]["e"]) == 8
    with _pytest.raises(NotImplementedError, match="sentence-transformers"):
        embedder_udf("sentence-transformers")
    with _pytest.raises(ValueError, match="unknown embedding provider"):
        embedder_udf("nope")
