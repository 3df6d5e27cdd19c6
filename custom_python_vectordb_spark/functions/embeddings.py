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
