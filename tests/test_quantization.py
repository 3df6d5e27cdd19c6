"""Quantization operator semantics: NumPy ground truth + packed fast path."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from custom_python_vectordb_spark.functions.distances import hamming_distance
from custom_python_vectordb_spark.operators.quantization import (
    bq_encode_expr,
    bq_pack_expr,
    bq_train,
    hamming_bits_expr,
    pq_adc_distances,
    pq_encode,
    pq_lut,
    pq_sample_codebook,
    pq_train_kmeans,
    sq_encode,
    sq_model,
)
from custom_python_vectordb_spark.sources.catalog import load_table

RNG = np.random.RandomState(7)


@pytest.fixture(scope="module")
def emb(spark, sf_small):
    return load_table(spark, sf_small, "embeddings").cache()


def test_sq_encode_matches_numpy(spark, emb):
    rows = emb.orderBy("vec_id").limit(50).collect()
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    mn, mx = mat.min(0), mat.max(0)  # trained on the 500-row table below
    full = np.array([r["embedding"] for r in emb.collect()], dtype=np.float64)
    mn, mx = full.min(0), full.max(0)
    scale = np.where(mx - mn == 0, 1.0, mx - mn)
    exp = np.floor(np.clip((mat - mn) / scale * 255.0, 0, 255)).astype(int)
    got = {
        r["vec_id"]: r["codes"]
        for r in sq_encode(emb, sq_model(emb)).filter(F.col("vec_id") < 50).collect()
    }
    for i, r in enumerate(rows):
        assert got[r["vec_id"]] == exp[i].tolist()


def test_bq_bits_and_packed_hamming_agree(spark, emb):
    model = bq_train(emb)
    bits = emb.crossJoin(F.broadcast(model)).select(
        "vec_id", bq_encode_expr(F.col("embedding")).alias("bits")
    ).filter(F.col("vec_id") < 20)
    packed = bits.withColumn("words", bq_pack_expr(F.col("bits"), 2))
    a = packed.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("ida"), F.col("bits").alias("ba"), F.col("words").alias("wa")
    )
    b = packed.filter(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("idb"), F.col("bits").alias("bb"), F.col("words").alias("wb")
    )
    both = a.crossJoin(b).select(
        "ida", "idb",
        hamming_bits_expr(F.col("ba"), F.col("bb")).alias("h_bits"),
        hamming_distance(F.col("wa"), F.col("wb")).alias("h_packed"),
    )
    for r in both.collect():
        assert r["h_bits"] == r["h_packed"], (r["ida"], r["idb"])


def test_pq_codes_match_numpy(spark, emb):
    M, K = 8, 16
    full = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in emb.collect()}
    cb = np.stack([full[c] for c in range(K)])  # (K, 64)
    sub = 64 // M
    got = {(r["vec_id"], r["m"]): r["code"] for r in pq_encode(
        emb.filter(F.col("vec_id") < 30), pq_sample_codebook(emb, M, K), M
    ).collect()}
    for vid in range(30):
        v = full[vid]
        for m in range(M):
            seg = slice(m * sub, (m + 1) * sub)
            d2 = ((cb[:, seg] - v[seg]) ** 2).sum(1)
            assert got[(vid, m)] == int(np.argmin(d2)), (vid, m)


def test_pq_adc_matches_numpy(spark, emb):
    M, K = 8, 16
    cbdf = pq_sample_codebook(emb, M, K)
    codes = pq_encode(emb, cbdf, M)
    qv = emb.filter(F.col("vec_id") == 1).select(F.col("embedding").alias("qvec"))
    got = {r["vec_id"]: r["dist"] for r in pq_adc_distances(codes, pq_lut(qv, cbdf, M)).collect()}

    full = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in emb.collect()}
    cb = np.stack([full[c] for c in range(K)])
    sub = 64 // M
    q = full[1]
    for vid in (0, 1, 7, 99):
        total = 0.0
        v = full[vid]
        for m in range(M):
            seg = slice(m * sub, (m + 1) * sub)
            code = int(np.argmin(((cb[:, seg] - v[seg]) ** 2).sum(1)))
            total += ((q[seg] - cb[code, seg]) ** 2).sum()
        assert got[vid] == pytest.approx(np.sqrt(total), rel=1e-9)


def test_pq_kmeans_recall_quality(spark, emb):
    """A6 quality gate: seeded-KMeans PQ should beat the trivial sample
    codebook on recall@10 territory (reference claims ~90% at 8x; we assert
    a conservative floor at tiny scale)."""
    M, K = 8, 16
    cb = pq_train_kmeans(emb, M, K, seed=42, max_iter=10)
    codes = pq_encode(emb, cb, M)
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    approx = {r["vec_id"] for r in pq_adc_distances(codes, pq_lut(qv, cb, M)).orderBy("dist", "vec_id").limit(10).collect()}

    from custom_python_vectordb_spark.operators.knn import knn

    queries = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    truth = {r["vec_id"] for r in knn(emb, queries, k=10, metric="l2").collect()}
    # near-uniform random 64-d vectors are PQ's worst case (no cluster
    # structure); 8x16 codes give modest recall there — floor, not target
    assert len(truth & approx) / 10.0 >= 0.2


def test_pq_snapshot_matches_retrained_codebook(spark, sf_med):
    """The `pq_kmeans_recall` oracle pins the sf0.01 codebook as literals
    (`queries/_pq_snapshot.py`). Retrain with the same seed/params and
    assert bit-equality, so snapshot drift (Spark/MLlib version change,
    fixture regeneration) fails HERE, loudly, instead of surfacing as a
    mysterious driver-gate hash mismatch."""
    from custom_python_vectordb_spark.queries._pq_snapshot import PQ_CENTROIDS_SF001

    emb01 = load_table(spark, sf_med, "embeddings")
    cb = pq_train_kmeans(emb01, 8, 16, seed=42, max_iter=10)
    got = sorted((r["m"], r["code"], tuple(r["centroid"])) for r in cb.collect())
    want = sorted((m, code, tuple(c)) for m, code, c in PQ_CENTROIDS_SF001)
    assert got == want
