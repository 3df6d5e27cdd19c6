"""Chunking + RRF edge semantics (the oracle checks cover the bulk path)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from custom_python_vectordb_spark.operators.chunking import chunk_documents


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_every_doc_yields_at_least_one_chunk(spark):
    docs = _docs(spark, [(1, "one two three"), (2, ""), (3, "x")])
    out = chunk_documents(docs, chunk_tokens=4, overlap=1)
    by_doc = {r["doc_id"]: r for r in out.collect()}
    assert set(by_doc) == {1, 2, 3}
    assert by_doc[1]["chunk_text"] == "one two three" and by_doc[1]["n_tokens"] == 3
    assert by_doc[2]["chunk_text"] == "" and by_doc[2]["n_tokens"] == 0


def test_overlap_windows(spark):
    text = " ".join(f"t{i}" for i in range(10))  # 10 tokens
    out = (
        chunk_documents(_docs(spark, [(1, text)]), chunk_tokens=4, overlap=2)
        .orderBy("chunk_idx")
        .collect()
    )
    # stride 2, starts 1,3,5,7 (≤ max(10-2,1)=8): 4 chunks
    assert [r["chunk_idx"] for r in out] == [0, 1, 2, 3]
    assert out[0]["chunk_text"] == "t0 t1 t2 t3"
    assert out[1]["chunk_text"] == "t2 t3 t4 t5"
    assert out[3]["chunk_text"] == "t6 t7 t8 t9"
    assert all(r["n_tokens"] == 4 for r in out)


def test_invalid_overlap_rejected(spark):
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, [(1, "a b")]), chunk_tokens=4, overlap=4)


def test_rrf_scores_are_rank_based(spark, sf_small):
    from custom_python_vectordb_spark.operators.bm25 import rrf_fusion
    from custom_python_vectordb_spark.sources.catalog import load_table

    emb = load_table(spark, sf_small, "embeddings")
    docs = load_table(spark, sf_small, "documents")
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    out = rrf_fusion(emb, docs, qv, "fast hash join", k=5, fetch_k=20).collect()
    assert len(out) == 5
    # monotone non-increasing, and the best possible score is rank-1 on both
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    assert scores[0] <= 2 / 61
