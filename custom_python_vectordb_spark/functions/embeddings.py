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


def embedder_udf(provider: str = "mock", dimensions: int = 64, **kwargs):
    """Provider dispatch mirroring the reference's embedder registry
    (``embeddings.py:425-459``): 'mock' (deterministic, always available)
    or 'sentence-transformers' (real, gated on the library)."""
    if provider == "mock":
        return mock_embedder_udf(dimensions)
    if provider in ("sentence-transformers", "st"):
        return sentence_transformer_udf(**kwargs)
    raise ValueError(f"unknown embedding provider {provider!r}; one of mock|sentence-transformers")
