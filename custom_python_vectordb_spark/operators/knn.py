"""Exact k-nearest-neighbour search — the engine's flagship operator.

Semantics: the reference's ANN search (`Collection.search`
``vectordb_optimized.py:507-575``, batch ``:577-644``; parallel variants
``parallel_search.py:246-368``) is "top-k by distance, optionally
pre-filtered". HNSW is an *accelerator* for that contract on one node; on a
cluster the honest baseline is exact brute-force kNN, which Spark executes
as a partition-parallel scan:

    corpus ⨯ broadcast(queries)  →  distance column  →  per-query top-k

Scale design (100 TB corpus, Q queries):
- queries are broadcast (Q ≤ ~10⁴): the corpus NEVER shuffles for scoring —
  each executor scores its own Parquet splits (BroadcastNestedLoopJoin).
- per-query top-k uses row_number over (qid); WindowGroupLimit limits each
  partition to k rows per query BEFORE the exchange, so the shuffle moves
  O(partitions·Q·k) rows, not O(N·Q).
- the filtered variant pushes the predicate BELOW scoring (into the Parquet
  scan) — strictly better than the reference's fetch_k=k*10 over-fetch
  heuristic (``vectordb_optimized.py:531-532``), which can return <k rows.
  Exactness makes the heuristic obsolete (SURVEY.md §4).

Approximate accelerators (IVF / LSH) live in ``operators/similarity.py``;
they reuse this module for the final exact rerank (K5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from custom_python_vectordb_spark.functions.distances import distance_expr
from custom_python_vectordb_spark.operators.topk import top_k_per_group


def knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    metric: str = "cosine",
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
    query_vec_col: str = "qvec",
    dist_col: str = "dist",
    filter_cond: Column | None = None,
    payload_cols: list[str] | None = None,
    round_to: int | None = None,
) -> DataFrame:
    """Exact top-k per query: (qid, id, dist[, payload…]) ascending by dist.

    `filter_cond` is applied to the corpus BEFORE scoring (filter-then-rank,
    exact — see module docstring). Ties broken by id for determinism.
    `round_to` rounds the reported distance (ordering uses exact values) so
    cross-engine value hashes are stable.
    """
    if filter_cond is not None:
        corpus = corpus.filter(filter_cond)
    cols = [F.col(query_id_col), F.col(id_col)]
    if payload_cols:
        cols += [F.col(c) for c in payload_cols]
    scored = corpus.join(F.broadcast(queries)).select(
        *cols, distance_expr(metric, vec_col, query_vec_col).alias(dist_col)
    )
    result = top_k_per_group(
        scored, query_id_col, k, F.col(dist_col).asc(), F.col(id_col).asc()
    )
    if round_to is not None:
        # + 0.0 canonicalizes IEEE −0.0 (a self-match cosine distance rounds
        # to −0.0) so cross-engine value hashes agree
        result = result.withColumn(dist_col, F.round(F.col(dist_col), round_to) + F.lit(0.0))
    return result.orderBy(query_id_col, dist_col, id_col)


def knn_batch_gemm(
    corpus: DataFrame,
    queries_pd,
    k: int,
    metric: str = "cosine",
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dist_col: str = "dist",
    dtype: str = "float64",
) -> DataFrame:
    """Throughput path: NumPy GEMM per Arrow batch (mapInPandas), mirroring
    the reference's batch-GEMM plan (``search_batch`` ``vectordb_optimized.py:
    577-644``). Queries arrive as a pandas DataFrame (qid, qvec) small enough
    to ship in the UDF closure; per-partition local top-k then global merge —
    identical result contract to :func:`knn` (asserted in tests).

    `dtype`: float64 (default) keeps the arithmetic oracle-reproducible;
    float32 halves memory bandwidth and doubles BLAS throughput for
    benchmark/serving paths where last-ulp tie order doesn't matter.

    The kernel runs over raw Arrow batches (mapInArrow): the list<float>
    embedding column decodes by reshaping the Arrow values buffer —
    zero-copy, no per-row Python objects — and the per-batch top-k is one
    vectorized argpartition along axis 0 (no per-query Python loop).
    """
    import numpy as np
    import pyarrow as pa

    # the closure-shipped query matrix rides every task's serialized state;
    # beyond ~10⁴ queries switch to a broadcast-join plan (operators/knn.knn)
    if len(queries_pd) > 10_000:
        raise ValueError(
            f"{len(queries_pd)} queries exceed the closure-shipping cap (10000); "
            "use knn() or chunk the batch"
        )
    qids = queries_pd["qid"].to_numpy()
    qmat = np.asarray([np.asarray(v, dtype=dtype) for v in queries_pd["qvec"]])
    if metric == "cosine":
        qnorm = np.linalg.norm(qmat, axis=1)
    elif metric == "l2":
        q2 = (qmat * qmat).sum(1)

    def score(batches):
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            ids = batch.column(0).to_numpy(zero_copy_only=False)
            # flatten() honors the list offsets: one flat values array,
            # reshaped to (rows, dim) — no per-row conversion
            flat = batch.column(1).flatten().to_numpy(zero_copy_only=False)
            mat = flat.reshape(n, -1).astype(dtype, copy=False)
            if metric == "cosine":
                sims = (mat @ qmat.T) / (np.linalg.norm(mat, axis=1)[:, None] * qnorm[None, :])
                dists = 1.0 - sims
            elif metric == "l2":
                dists = np.sqrt(
                    np.maximum((mat * mat).sum(1)[:, None] + q2[None, :] - 2.0 * (mat @ qmat.T), 0.0)
                )
            else:  # ip
                dists = -(mat @ qmat.T)
            kk = min(k, n)
            # batch-local top-k for ALL queries at once (argpartition = the
            # reference's own O(n) select), merged globally by the window below
            idx = np.argpartition(dists, kk - 1, axis=0)[:kk]  # (kk, nq)
            sel = np.take_along_axis(dists, idx, axis=0)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.repeat(qids, kk), type=pa.int64()),
                    pa.array(ids[idx.T.ravel()], type=pa.int64()),
                    pa.array(sel.T.ravel().astype(np.float64)),
                ],
                names=["qid", id_col, dist_col],
            )

    partial = corpus.select(id_col, vec_col).mapInArrow(
        score, schema=f"qid long, {id_col} long, {dist_col} double"
    )
    return top_k_per_group(partial, "qid", k, F.col(dist_col).asc(), F.col(id_col).asc()).orderBy(
        "qid", dist_col, id_col
    )
