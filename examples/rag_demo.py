"""RAG retrieval pipeline end-to-end on the real test tables, mirroring the
reference's RAG walkthrough (``notes_rag_example.txt``) Spark-first:

  chunk → embed (deterministic mock) → index into a collection →
  ask a question → retrieve top chunks by vector + keyword (RRF) →
  print the stitched context window.

    python examples/rag_demo.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from custom_python_vectordb_spark.functions.embeddings import embed_column, mock_embed_one
from custom_python_vectordb_spark.operators.bm25 import bm25_topk
from custom_python_vectordb_spark.operators.chunking import chunk_documents
from custom_python_vectordb_spark.operators.knn import knn
from custom_python_vectordb_spark.session import get_spark
from custom_python_vectordb_spark.sources.catalog import load_table

QUESTION = "fast hash join strategies for large tables"
DIMS = 64


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("rag_demo")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    print(f"corpus: {docs.count()} documents")

    # 1. chunk: 64-token windows, 16 overlap (pure JVM projection)
    chunks = chunk_documents(docs, chunk_tokens=64, overlap=16).withColumn(
        "chunk_id", F.col("doc_id") * 1000 + F.col("chunk_idx")
    )
    print(f"chunked: {chunks.count()} chunks")

    # 2. embed every chunk (Arrow-batched pandas_udf; mock provider — swap
    #    `provider='sentence-transformers'` when the library is available)
    embedded = embed_column(chunks, "chunk_text", dimensions=DIMS).persist()
    embedded.count()

    # 3. retrieve: vector side = kNN over chunk embeddings
    qvec = [float(x) for x in mock_embed_one(QUESTION, DIMS)]
    queries = spark.createDataFrame([(0, qvec)], "qid long, qvec array<float>")
    vec_hits = knn(
        embedded, queries, k=5, metric="cosine",
        id_col="chunk_id", vec_col="embedding",
    ).select("chunk_id", "dist")

    # 4. keyword side = BM25 over the chunk texts
    kw_hits = bm25_topk(chunks, QUESTION, k=5, id_col="chunk_id", text_col="chunk_text")

    # 5. fuse by reciprocal rank (no score normalization needed)
    from pyspark.sql import Window

    vr = vec_hits.withColumn(
        "r", F.row_number().over(Window.orderBy(F.col("dist").asc(), F.col("chunk_id")))
    ).select("chunk_id", (1.0 / (60 + F.col("r"))).alias("s"))
    kr = kw_hits.withColumn(
        "r", F.row_number().over(Window.orderBy(F.col("score").desc(), F.col("chunk_id")))
    ).select("chunk_id", (1.0 / (60 + F.col("r"))).alias("s"))
    fused = (
        vr.unionByName(kr)
        .groupBy("chunk_id")
        .agg(F.sum("s").alias("rrf"))
        .orderBy(F.col("rrf").desc(), "chunk_id")
        .limit(3)
    )

    # 6. stitch the context window
    ctx = (
        fused.join(chunks, "chunk_id")
        .orderBy(F.col("rrf").desc(), "chunk_id")
        .select("chunk_id", "rrf", "chunk_text")
        .collect()
    )
    print(f"\nquestion: {QUESTION}\n")
    for row in ctx:
        print(f"--- chunk {row['chunk_id']} (rrf={row['rrf']:.5f})")
        print(row["chunk_text"][:160] + ("…" if len(row["chunk_text"]) > 160 else ""))
    embedded.unpersist()


if __name__ == "__main__":
    main()
