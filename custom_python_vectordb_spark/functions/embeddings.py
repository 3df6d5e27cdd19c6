"""Embedding providers (SURVEY.md §2.8 E8/E9).

The reference's ``Embedder`` ABC (``embeddings.py:49-88``) becomes an
Arrow-batched pandas UDF factory — ``embed_batch`` IS the UDF contract
(vectorized batches), so providers map 1:1.

``MockEmbedder`` (``embeddings.py:343-371``) is reproduced bit-for-bit:
seed = int(sha256(text)[:8], 16), RandomState(seed).randn(dim) → float32 →
L2-normalize. Generation stays in Python/NumPy on executors (never
re-derived JVM-side) so results are identical to the reference on any
cluster layout.

``CachedEmbedder`` (``embeddings.py:376-420``, sha256-keyed memo) becomes a
precomputed embeddings *table* joined by `sha2(text, 256)` — the cache is
data, checkpointable and shared across jobs, instead of process state.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def mock_embed_one(text: str, dimensions: int) -> np.ndarray:
    """Driver-side twin of the UDF (tests + query literals)."""
    seed = int(hashlib.sha256(text.encode()).hexdigest()[:8], 16)
    rng = np.random.RandomState(seed)
    v = rng.randn(dimensions).astype(np.float32)
    return v / np.linalg.norm(v)


def mock_embedder_udf(dimensions: int = 64):
    """pandas UDF: text → ARRAY<FLOAT> (deterministic mock provider).

    The UDF body is self-contained (imports inside, no module-level
    references) so cloudpickle ships it by value — Python workers need
    neither this package on sys.path nor matching PYTHONPATH."""

    @pandas_udf("array<float>")
    def embed(texts: pd.Series) -> pd.Series:
        import hashlib as _hl

        import numpy as _np
        import pandas as _pd

        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            seed = int(_hl.sha256(t.encode()).hexdigest()[:8], 16)
            v = _np.random.RandomState(seed).randn(dimensions).astype(_np.float32)
            out.append((v / _np.linalg.norm(v)).tolist())
        return _pd.Series(out)

    return embed


def embed_column(df: DataFrame, text_col: str, out_col: str = "embedding", dimensions: int = 64) -> DataFrame:
    """E8 — attach deterministic mock embeddings."""
    return df.withColumn(out_col, mock_embedder_udf(dimensions)(F.col(text_col)))


def text_cache_key(col: Column | str) -> Column:
    """E9 — cache key: sha256 hex of the text (``embeddings.py:391``
    truncates to 32 hex chars; we keep that)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(F.sha2(c, 256), 1, 32)


def embed_with_cache(
    df: DataFrame,
    cache: DataFrame,
    text_col: str = "text",
    out_col: str = "embedding",
    dimensions: int = 64,
) -> DataFrame:
    """Join-first embedding: rows whose key is in `cache`
    (key, embedding) reuse it; the rest run the provider UDF. Returns the
    input plus `out_col`, and is itself the next cache increment."""
    keyed = df.withColumn("__key", text_cache_key(text_col))
    hit = keyed.join(cache.select(F.col("key").alias("__key"), F.col("embedding").alias(out_col)), "__key")
    miss = keyed.join(cache.select(F.col("key").alias("__key")), "__key", "left_anti")
    computed = miss.withColumn(out_col, mock_embedder_udf(dimensions)(F.col(text_col)))
    return hit.unionByName(computed).drop("__key")


def sentence_transformer_udf(model_name: str = "all-MiniLM-L6-v2", batch_size: int = 64):
    """Real-provider slot (reference ``embeddings.py:146-256``,
    SentenceTransformerEmbedder): same pandas-UDF contract as the mock, so
    swapping providers changes one factory call. Gated at factory time —
    sentence-transformers is not in this runtime, and a clear driver-side
    error beats an executor-side ImportError storm.

    When the library exists, the model loads lazily ONCE PER WORKER (cached
    on the function object), then every Arrow batch is one `encode` call —
    the batching the reference hand-rolls in `embed_batch`.
    """
    try:
        import sentence_transformers  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "sentence-transformers is not installed in this runtime; use "
            "mock_embedder_udf (deterministic) or install the provider"
        ) from e

    @pandas_udf("array<float>")
    def embed(texts: pd.Series) -> pd.Series:
        import pandas as _pd
        from sentence_transformers import SentenceTransformer as _ST

        model = getattr(embed, "_model", None)
        if model is None:
            model = _ST(model_name)
            embed._model = model
        vecs = model.encode(
            ["" if t is None else t for t in texts],
            batch_size=batch_size,
            normalize_embeddings=True,
        )
        return _pd.Series([v.tolist() for v in vecs])

    return embed


def http_json_transport(url: str, headers: dict, payload: dict) -> dict:
    """Default provider transport: one JSON POST, stdlib-only. Kept as a
    separate injectable callable so tests exercise the full batch/retry
    pipeline against a fake transport without network access."""
    import json as _json
    import urllib.request as _rq

    req = _rq.Request(
        url,
        data=_json.dumps(payload).encode(),
        headers={"Content-Type": "application/json", **headers},
        method="POST",
    )
    with _rq.urlopen(req, timeout=60) as resp:
        return _json.loads(resp.read())


class RetryableProviderError(RuntimeError):
    """Transport signal for retry-worthy failures (429 / 5xx / timeouts)."""


def _hosted_embedder_udf(build_request, parse_response, batch_size: int, max_retries: int, transport):
    """Shared hosted-provider loop (the reference's ``embed_batch`` shape,
    ``embeddings.py:158-176`` / ``:323-334``): chunk the Arrow batch into
    provider-sized requests, POST each with exponential backoff on
    retryable failures, reassemble in input order. The pandas-UDF contract
    means Spark already delivers texts in vectorized batches — the chunk
    loop only adapts batch sizes to the provider's request cap."""
    tport = transport or http_json_transport

    @pandas_udf("array<float>")
    def embed(texts: pd.Series) -> pd.Series:
        import time as _time

        import pandas as _pd

        out: list = []
        items = list(texts)
        for lo in range(0, len(items), batch_size):
            chunk = ["" if t is None else t for t in items[lo : lo + batch_size]]
            url, headers, payload = build_request(chunk)
            for attempt in range(max_retries + 1):
                try:
                    resp = tport(url, headers, payload)
                    break
                except RetryableProviderError:
                    if attempt == max_retries:
                        raise
                    # exponential backoff with cap — the reference retries
                    # via its client library; this is the same policy inline
                    _time.sleep(min(2.0**attempt * 0.5, 8.0))
            out.extend(parse_response(resp))
        return _pd.Series(out)

    return embed


def openai_embedder_udf(
    model: str = "text-embedding-3-small",
    api_key: str | None = None,
    dimensions: int | None = None,
    batch_size: int = 100,
    max_retries: int = 4,
    transport=None,
):
    """OpenAI embeddings provider (reference ``embeddings.py:95-198``) as a
    pandas UDF over the public REST API (stdlib HTTP — the openai package
    is not in this runtime). Gated at FACTORY time: without a key (or an
    injected test transport) this raises immediately driver-side rather
    than failing per-executor. `dimensions` forwards the v3 models'
    dimension-reduction parameter."""
    import os

    key = api_key or os.environ.get("OPENAI_API_KEY")
    if key is None and transport is None:
        raise NotImplementedError(
            "OPENAI_API_KEY is not set and no transport was injected; use "
            "provider='mock' in this runtime"
        )

    def build_request(chunk):
        payload = {"input": chunk, "model": model}
        if dimensions and "3-" in model:
            payload["dimensions"] = dimensions
        return (
            "https://api.openai.com/v1/embeddings",
            {"Authorization": f"Bearer {key}"},
            payload,
        )

    def parse_response(resp):
        data = sorted(resp["data"], key=lambda d: d["index"])
        return [[float(x) for x in d["embedding"]] for d in data]

    return _hosted_embedder_udf(build_request, parse_response, batch_size, max_retries, transport)


def cohere_embedder_udf(
    model: str = "embed-english-v3.0",
    api_key: str | None = None,
    input_type: str = "search_document",
    batch_size: int = 96,
    max_retries: int = 4,
    transport=None,
):
    """Cohere embeddings provider (reference ``embeddings.py:263-341``) as a
    pandas UDF over the public REST API; same factory-time gating and
    batch/retry shape as the OpenAI provider. `input_type` distinguishes
    document vs query embeddings (v3 models)."""
    import os

    key = api_key or os.environ.get("COHERE_API_KEY")
    if key is None and transport is None:
        raise NotImplementedError(
            "COHERE_API_KEY is not set and no transport was injected; use "
            "provider='mock' in this runtime"
        )

    def build_request(chunk):
        return (
            "https://api.cohere.com/v1/embed",
            {"Authorization": f"Bearer {key}"},
            {"texts": chunk, "model": model, "input_type": input_type},
        )

    def parse_response(resp):
        return [[float(x) for x in v] for v in resp["embeddings"]]

    return _hosted_embedder_udf(build_request, parse_response, batch_size, max_retries, transport)


def embedder_udf(provider: str = "mock", dimensions: int = 64, **kwargs):
    """Provider dispatch mirroring the reference's ``get_embedder`` factory
    (``embeddings.py:455-519``): 'mock' (deterministic, always available),
    'openai' / 'cohere' (hosted REST, gated on keys), 'sentence-transformers'
    (local model, gated on the library), or 'auto' (the reference's
    preference order: OpenAI key → sentence-transformers → mock)."""
    if provider == "auto":
        import os

        if os.environ.get("OPENAI_API_KEY") or kwargs.get("api_key"):
            provider = "openai"
        else:
            try:
                import sentence_transformers  # noqa: F401

                provider = "sentence-transformers"
            except ImportError:
                provider = "mock"
    if provider == "mock":
        return mock_embedder_udf(dimensions)
    if provider == "openai":
        return openai_embedder_udf(**kwargs)
    if provider == "cohere":
        return cohere_embedder_udf(**kwargs)
    if provider in ("sentence-transformers", "st"):
        return sentence_transformer_udf(**kwargs)
    raise ValueError(
        f"unknown embedding provider {provider!r}; "
        "one of mock|openai|cohere|sentence-transformers|auto"
    )
