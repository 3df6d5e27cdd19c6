"""Document chunking — the RAG/embedding-pipeline primitive.

The reference's RAG walkthrough (``notes_rag_example.txt``) chunks documents
before embedding; at 100 TB chunking is a pure map-side projection and must
stay JVM-only: tokenize → windowed slices of the token array via
`sequence`/`slice`/`posexplode`. No Python, no shuffle — a chunked corpus
scan pipelines straight into the embedding pandas_udf or the tokenizer
stats.

Windowing convention (mirrored exactly by the DuckDB oracle):
  stride = chunk_tokens − overlap;  starts = 1, 1+stride, … ≤ max(n−overlap, 1)
  chunk i = tokens[start : start+chunk_tokens−1]  (1-based, clipped at n)
Every document yields ≥1 chunk (an empty/short doc yields its whole token
list as chunk 0), so no document silently disappears from the pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from custom_python_vectordb_spark.functions.text import tokenize


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, chunk_idx, chunk_text, n_tokens) — overlapping token windows."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}")
    stride = chunk_tokens - overlap
    toks = docs.select(F.col(id_col), tokenize(text_col).alias("toks"))
    starts = F.sequence(
        F.lit(1), F.greatest(F.size("toks") - overlap, F.lit(1)), F.lit(stride)
    )
    return (
        toks.select(F.col(id_col), "toks", F.posexplode(starts).alias("chunk_idx", "s"))
        .select(
            F.col(id_col),
            "chunk_idx",
            F.array_join(F.slice("toks", F.col("s"), chunk_tokens), " ").alias("chunk_text"),
            F.least(
                F.size("toks") - F.col("s") + 1, F.lit(chunk_tokens)
            ).alias("n_tokens"),
        )
        .withColumn("n_tokens", F.greatest("n_tokens", F.lit(0)).cast("long"))
    )
