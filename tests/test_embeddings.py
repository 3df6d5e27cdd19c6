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


def test_hosted_providers_gate_cleanly_without_keys(monkeypatch):
    """No keys, no transport → a clear driver-side NotImplementedError
    (never an executor-side failure storm)."""
    import pytest as _pytest

    from custom_python_vectordb_spark.functions.embeddings import (
        cohere_embedder_udf,
        embedder_udf,
        openai_embedder_udf,
    )

    monkeypatch.delenv("OPENAI_API_KEY", raising=False)
    monkeypatch.delenv("COHERE_API_KEY", raising=False)
    with _pytest.raises(NotImplementedError, match="OPENAI_API_KEY"):
        openai_embedder_udf()
    with _pytest.raises(NotImplementedError, match="OPENAI_API_KEY"):
        embedder_udf("openai")
    with _pytest.raises(NotImplementedError, match="COHERE_API_KEY"):
        cohere_embedder_udf()
    # auto falls back to mock when no key and no st library
    udf = embedder_udf("auto", dimensions=4)
    assert udf is not None


def test_openai_provider_batches_retries_and_orders(spark, monkeypatch):
    """Fake-transport run through the full Spark plan: requests are chunked
    at batch_size, a retryable failure is retried with backoff, and
    embeddings reassemble in input order even when the provider returns
    data out of order (the reference sorts by index, embeddings.py:171)."""
    from pyspark.sql import functions as F

    from custom_python_vectordb_spark.functions.embeddings import (
        RetryableProviderError,
        openai_embedder_udf,
    )

    calls = {"sizes": [], "fails_left": 1}

    def fake_transport(url, headers, payload):
        assert url.endswith("/v1/embeddings")
        assert headers["Authorization"] == "Bearer test-key"
        assert payload["dimensions"] == 4
        if calls["fails_left"] > 0:
            calls["fails_left"] -= 1
            raise RetryableProviderError("simulated 429")
        texts = payload["input"]
        calls["sizes"].append(len(texts))
        # return data OUT of order; vector encodes (len(text), position)
        data = [
            {"index": i, "embedding": [float(len(t)), float(i), 0.0, 0.0]}
            for i, t in enumerate(texts)
        ]
        return {"data": list(reversed(data))}

    # (the one simulated 429 costs a single 0.5 s worker-side backoff sleep)
    udf = openai_embedder_udf(
        api_key="test-key", dimensions=4, batch_size=3, transport=fake_transport
    )
    rows = [(i, "x" * (i + 1)) for i in range(7)]
    df = spark.createDataFrame(rows, "id long, text string").coalesce(1)
    out = {r["id"]: r["e"] for r in df.select("id", udf("text").alias("e")).collect()}
    # Position proofs (closure state lives in the WORKER's pickled copy, so
    # assertions must ride the returned vectors, not driver-side counters):
    # out[i][0] == len(text_i) proves input order survived the reversed
    # provider response; out[i][1] == i%3 proves chunking at batch_size=3
    # (a single un-chunked request would give positions 0..6). The job
    # completing at all proves the simulated-429 retry: the first transport
    # call in the task raised RetryableProviderError.
    for i in range(7):
        assert out[i][0] == float(i + 1), (i, out[i])
        assert out[i][1] == float(i % 3)


def test_cohere_provider_shape(spark):
    from custom_python_vectordb_spark.functions.embeddings import cohere_embedder_udf

    def fake_transport(url, headers, payload):
        assert url.endswith("/v1/embed")
        assert payload["input_type"] == "search_query"
        return {"embeddings": [[1.0, 2.0] for _ in payload["texts"]]}

    udf = cohere_embedder_udf(
        api_key="k", input_type="search_query", transport=fake_transport
    )
    df = spark.createDataFrame([("a",), ("b",)], "text string")
    got = [r["e"] for r in df.select(udf("text").alias("e")).collect()]
    assert got == [[1.0, 2.0], [1.0, 2.0]]
