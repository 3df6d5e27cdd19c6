"""Exact kNN vs NumPy brute force, and the GEMM fast path vs the
expression path (same result contract)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from custom_python_vectordb_spark.operators.knn import knn, knn_batch_gemm
from custom_python_vectordb_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def corpus(spark, sf_small):
    df = load_table(spark, sf_small, "embeddings").cache()
    rows = df.collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return df, ids, mat


@pytest.fixture(scope="module")
def queries_df(spark, corpus):
    df, ids, mat = corpus
    return df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )


def numpy_topk(ids, mat, q, k, metric):
    if metric == "cosine":
        d = 1 - (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    elif metric == "l2":
        d = np.linalg.norm(mat - q, axis=1)
    else:
        d = -(mat @ q)
    order = np.lexsort((ids, d))
    return [(int(ids[i]), float(d[i])) for i in order[:k]]


@pytest.mark.parametrize("metric", ["cosine", "l2", "ip"])
def test_knn_matches_numpy(spark, corpus, queries_df, metric):
    df, ids, mat = corpus
    got = knn(df, queries_df, k=5, metric=metric).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["qid"], []).append((r["vec_id"], r["dist"]))
    for qid, hits in by_q.items():
        expected = numpy_topk(ids, mat, mat[list(ids).index(qid)], 5, metric)
        assert [h[0] for h in hits] == [e[0] for e in expected]
        for (_, d_got), (_, d_exp) in zip(hits, expected):
            assert d_got == pytest.approx(d_exp, rel=1e-9, abs=1e-12)


def test_knn_filtered_subset(spark, corpus, queries_df):
    df, ids, mat = corpus
    got = knn(
        df, queries_df, k=5, metric="cosine",
        filter_cond=F.col("label") == 2, payload_cols=["label"],
    ).collect()
    assert len(got) > 0
    assert all(r["label"] == 2 for r in got)


def test_gemm_path_equals_expression_path(spark, corpus, queries_df):
    df, ids, mat = corpus
    expr = knn(df, queries_df, k=7, metric="cosine").collect()
    qpd = queries_df.toPandas()
    gemm = knn_batch_gemm(df, qpd, k=7, metric="cosine").collect()
    assert [(r["qid"], r["vec_id"]) for r in expr] == [(r["qid"], r["vec_id"]) for r in gemm]
    for a, b in zip(expr, gemm):
        assert a["dist"] == pytest.approx(b["dist"], rel=1e-9, abs=1e-12)
