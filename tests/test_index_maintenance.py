"""Incremental BM25 index maintenance: the streamed, foreachBatch-appended
postings index must be indistinguishable from a from-scratch batch build —
same postings relation, same BM25 top-k, same scores."""

from __future__ import annotations

from pyspark.sql import functions as F

from custom_python_vectordb_spark.operators.bm25 import bm25_topk, postings
from custom_python_vectordb_spark.sources.catalog import load_table
from custom_python_vectordb_spark.streaming.index_maintenance import (
    bm25_from_postings,
    maintain_postings,
    read_document_stream,
)

QUERY = "fast hash join merge sort join"


def test_streamed_postings_equal_batch_build(spark, sf_small, tmp_path):
    from custom_python_vectordb_spark.sources.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.save("postings", spark.createDataFrame([], "doc_id long, term string, tf long"))
    # maxFilesPerTrigger guarantees ≥1 micro-batch; availableNow drains all
    stream = read_document_stream(spark, sf_small)
    q = maintain_postings(stream, wh, "postings").trigger(availableNow=True).start()
    q.awaitTermination(120)
    q.stop()

    maintained = wh.load("postings")
    batch = postings(load_table(spark, sf_small, "documents"))
    assert maintained.count() == batch.count()
    assert maintained.exceptAll(batch).count() == 0
    assert batch.exceptAll(maintained).count() == 0


def test_bm25_from_maintained_index_equals_from_corpus(spark, sf_small, tmp_path):
    from custom_python_vectordb_spark.sources.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.save("postings", spark.createDataFrame([], "doc_id long, term string, tf long"))
    q = (
        maintain_postings(read_document_stream(spark, sf_small), wh, "postings")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()

    served = [
        (r["doc_id"], round(r["score"], 6))
        for r in bm25_from_postings(wh.load("postings"), QUERY, k=10).collect()
    ]
    direct = [
        (r["doc_id"], round(r["score"], 6))
        for r in bm25_topk(load_table(spark, sf_small, "documents"), QUERY, k=10).collect()
    ]
    assert served == direct


def test_empty_query_returns_empty(spark, sf_small):
    post = postings(load_table(spark, sf_small, "documents"))
    assert bm25_from_postings(post, "", k=5).count() == 0
