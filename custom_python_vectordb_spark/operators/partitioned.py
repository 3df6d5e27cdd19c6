"""Partition-local ANN index — the cluster analog of the reference's HNSW.

The reference accelerates exact scan with an in-process hnswlib index
(``vectordb_optimized.py:271-280, 507-575``): sub-linear candidate probing,
recall traded via ef/M. On a cluster the same role is a SHARDED index: each
partition builds an index over ITS OWN rows once per job, probes it per
query, and the driver-side contract stays (qid, vec_id, dist) top-k — the
global merge is the same WindowGroupLimit top-k used everywhere else.

Here the per-partition index is a small IVF built with NumPy inside
``mapInPandas`` (hnswlib isn't in this runtime, and an IVF keeps the whole
build deterministic):

- build: k-means over the partition's vectors (Lloyd, fixed iteration
  count, centroids seeded from the lowest-id rows — fully deterministic
  given partition membership, which the modulo shard key pins);
- probe: per query score centroids, take the `nprobe` nearest cells,
  exact-score only their members (GEMM over the gathered submatrix);
- merge: local top-k per query → global top-k per query.

Scanned fraction ≈ nprobe/n_cells per partition. Recall is measured, not
assumed: `recall_partitioned_vs_exact` (queries/extras registration) joins
this against the exact kNN truth — the reference's own quality-gate
methodology (``benchmark_quantization.py:874-928``).

At 100 TB: partitions sized to executor memory, the index build amortizes
over the query batch shipped in the closure (Q ≤ ~10⁴), and the corpus
never shuffles after the one deterministic range partitioning — which a
real deployment replaces with a bucketed/sorted table so even that shuffle
happens once at write time, not per job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from custom_python_vectordb_spark.operators.topk import top_k_per_group


def knn_partitioned(
    corpus: DataFrame,
    queries_pd,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 6,
    num_partitions: int = 4,
    metric: str = "cosine",
    assign_r: int = 2,
    *,
    dtype: str = "float64",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dist_col: str = "dist",
    assume_sharded: bool = False,
) -> DataFrame:
    """Approximate top-k via per-partition IVF index. `queries_pd`: pandas
    (qid, qvec). Deterministic: modulo sharding by id + seeded k-means.

    `assume_sharded`: the caller guarantees `corpus` is already partitioned
    the way a production deployment stores it (bucketed/pre-repartitioned,
    e.g. via `sources/warehouse.py:save_bucketed` or a persisted
    ``repartition(n, id % n)``) — skips the per-call shuffle, leaving only
    the probe cost. Partition membership then follows the CALLER's layout,
    so determinism is the caller's contract.

    `assign_r`: each vector is indexed under its `assign_r` nearest cells
    (multi-assignment). Border vectors — the dominant recall loss of plain
    IVF — stay reachable from both neighbouring cells, a strictly better
    recall/scan trade than raising nprobe. Scanned fraction ≈
    nprobe·assign_r/n_cells. `dtype`: float64 (default) keeps ties and
    distances bit-stable; float32 halves bandwidth for serving paths.
    """
    qids_l = queries_pd["qid"].to_list()
    qvecs_l = [list(map(float, v)) for v in queries_pd["qvec"]]
    kk, cells, probe, met, rr, dt = k, n_cells, nprobe, metric, assign_r, dtype
    idc, vc, dc = id_col, vec_col, dist_col

    def build_and_search(batches):
        import numpy as np
        import pandas as pd

        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        ids = pdf[idc].to_numpy()
        order = np.argsort(ids, kind="stable")  # centroid seeding by lowest id
        ids = ids[order]
        mat = np.asarray([np.asarray(v, dtype=dt) for v in pdf[vc]])[order]
        qmat = np.asarray(qvecs_l, dtype=dt)
        if met == "cosine":
            mn = np.linalg.norm(mat, axis=1, keepdims=True)
            mat = mat / np.where(mn == 0, 1.0, mn)
            qn = np.linalg.norm(qmat, axis=1, keepdims=True)
            qmat = qmat / np.where(qn == 0, 1.0, qn)

        n = len(ids)
        c = min(cells, max(1, n // max(2 * kk, 1)))
        # Lloyd's, deterministic: init = first c rows (lowest ids), 5 iters
        cent = mat[:c].copy()
        for _ in range(5):
            d2 = ((mat * mat).sum(1)[:, None] + (cent * cent).sum(1)[None, :]
                  - 2.0 * (mat @ cent.T))
            assign = d2.argmin(1)
            for j in range(c):
                members = mat[assign == j]
                if len(members):
                    cent[j] = members.mean(0)

        # multi-assignment: membership under the r nearest cells each
        r = min(rr, c)
        d2 = ((mat * mat).sum(1)[:, None] + (cent * cent).sum(1)[None, :]
              - 2.0 * (mat @ cent.T))
        multi_assign = np.argpartition(d2, r - 1, axis=1)[:, :r]

        qd2 = ((qmat * qmat).sum(1)[:, None] + (cent * cent).sum(1)[None, :]
               - 2.0 * (qmat @ cent.T))
        p = min(probe, c)
        probe_cells = np.argpartition(qd2, p - 1, axis=1)[:, :p]

        # batched probe, inverted: one GEMM per CELL over (members × probing
        # queries) — per-query gathers would dominate; per-cell blocks keep
        # the work in BLAS at scan_fraction × brute-force flops
        qids_arr = np.asarray(qids_l)
        out_frames = []
        for j in range(c):
            msel = np.nonzero((multi_assign == j).any(axis=1))[0]
            qsel = np.nonzero((probe_cells == j).any(axis=1))[0]
            if not len(msel) or not len(qsel):
                continue
            sub = mat[msel]
            qsub = qmat[qsel]
            if met == "cosine":
                dmat = 1.0 - sub @ qsub.T
            elif met == "l2":
                dmat = np.sqrt(np.maximum(
                    (sub * sub).sum(1)[:, None] - 2.0 * (sub @ qsub.T)
                    + (qsub * qsub).sum(1)[None, :], 0.0))
            else:  # ip
                dmat = -(sub @ qsub.T)
            m = min(kk, len(msel))
            idx = np.argpartition(dmat, m - 1, axis=0)[:m]          # (m, |Q_j|)
            out_frames.append(pd.DataFrame({
                "qid": np.broadcast_to(qids_arr[qsel], (m, len(qsel))).ravel(),
                idc: ids[msel][idx].ravel(),
                dc: np.take_along_axis(dmat, idx, axis=0).ravel(),
            }))
        if not out_frames:
            return
        allc = pd.concat(out_frames, ignore_index=True)
        # a row indexed under 2 cells can reach the same query via both —
        # drop duplicates so the global top-k never counts an id twice
        allc = allc.drop_duplicates(["qid", idc])
        # per-partition prune to k per query before the shuffle
        allc = allc.sort_values(["qid", dc, idc]).groupby("qid", sort=False).head(kk)
        yield allc

    # NOT repartitionByRange: RangePartitioner samples boundaries with an
    # RDD-id-derived seed, so partition membership (and thus the per-shard
    # index) would differ run to run. An explicit modulo shard key hashes
    # identically every run.
    if assume_sharded:
        sharded = corpus.select(id_col, vec_col)
    else:
        sharded = (
            corpus.select(id_col, vec_col)
            .repartition(num_partitions, F.col(id_col) % num_partitions)
        )
    partial = sharded.mapInPandas(build_and_search, schema=f"qid long, {idc} long, {dc} double")
    return top_k_per_group(partial, "qid", k, F.col(dist_col).asc(), F.col(id_col).asc()).orderBy(
        "qid", dist_col, id_col
    )
