"""Vector quantization operators (SURVEY.md §2 A4-A6, E1-E4, D4-D7, K5).

Reference semantics (``quantization.py``), re-expressed as DataFrame plans:

- **SQ** (scalar, uint8): train = per-dim min/max (``:85-106``); encode =
  ``trunc(clip((v−min)/scale·255, 0, 255))`` (``:108-126`` — NumPy's
  ``.astype(uint8)`` truncates after clip, so we floor explicitly in both
  engines); decode = ``code/255·scale+min`` (``:128-139``); L2 on codes =
  ``sqrt(Σ((Δcode·scale/255)²))`` (``:217-236``); dot = reconstruct-then-
  −dot (``:239-251``).
- **BQ** (1 bit/dim): train = per-dim median thresholds (``:307-327``);
  encode = ``v > t`` bits (``:329-350``); distance = Hamming (``:356-374``).
  The bit-array form is the semantic canon (oracle-checkable); packing into
  64-bit words for `bit_count` is the storage/bandwidth optimization
  (asserted equal in tests).
- **PQ** (M×uint8): per-subspace nearest-centroid encode (``:510-539``),
  asymmetric LUT distance ``sqrt(Σ_m lut[m][code])`` (``:541-578``).
  Codebook *quality* comes from k-means (``:480-508``) — nondeterministic
  in the reference (np.random); here MLlib KMeans with a fixed seed is the
  production trainer, while a deterministic first-K-vectors sample codebook
  is used for oracle-checked encode/distance queries (the operator under
  test is encode/ADC, not Lloyd's).
- **K5 rerank**: quantized scan → candidate top-C → exact distance on
  candidates → top-k (``parallel_search.py:895-947``).

Scale design: the trained model (64 dims / M×K centroids) is a 1-row or
tiny DataFrame broadcast into `zip_with`/`transform` expressions — no UDF,
no driver-side matrix, corpus never shuffles for encode or scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from custom_python_vectordb_spark.functions.distances import distance_expr
from custom_python_vectordb_spark.functions.distances import _ref as _sqlref
from custom_python_vectordb_spark.operators.topk import top_k_per_group
from custom_python_vectordb_spark.functions.local_relation import local_df

ColumnOrName = Column | str

# ------------------------------------------------------------------ SQ

def sq_train(vectors: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """A4 — (dim, min_val, max_val, scale); scale 0 → 1.0. posexplode →
    groupBy(dim) is map-side combined; dim count is tiny."""
    exploded = vectors.select(F.posexplode(vec_col).alias("dim", "v"))
    return (
        exploded.groupBy("dim")
        .agg(F.min("v").cast("double").alias("min_val"), F.max("v").cast("double").alias("max_val"))
        .withColumn(
            "scale",
            F.when(F.col("max_val") - F.col("min_val") == 0.0, F.lit(1.0)).otherwise(
                F.col("max_val") - F.col("min_val")
            ),
        )
    )


def sq_model(vectors: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """1-row (minv array<double>, scale array<double>), dim-ordered —
    broadcastable into encode/decode expressions."""
    stats = sq_train(vectors, vec_col)
    return stats.agg(
        F.array_sort(F.collect_list(F.struct("dim", "min_val", "scale"))).alias("s")
    ).select(
        F.transform("s", lambda x: x["min_val"]).alias("minv"),
        F.transform("s", lambda x: x["scale"]).alias("scale"),
    )


def sq_encode_expr(vec: ColumnOrName) -> Column:
    """E1 — requires `minv`/`scale` columns in scope (join sq_model first).
    floor() pins NumPy's truncating uint8 cast in both engines. Plain-name
    operands emit one F.expr (see functions/distances.py: the lambda path
    costs ~13 ms of py4j chatter per HOF at plan-build time)."""
    if (r := _sqlref(vec)) is not None:
        return F.expr(
            f"transform(zip_with(zip_with({r}, minv, (x, m) -> CAST(x AS DOUBLE) - m), "
            "scale, (x, s) -> x / s * 255.0D), "
            "x -> CAST(floor(least(greatest(x, 0.0D), 255.0D)) AS INT))"
        )
    norm = F.zip_with(vec, F.col("minv"), lambda x, m: x.cast("double") - m)
    scaled = F.zip_with(norm, F.col("scale"), lambda x, s: x / s * 255.0)
    return F.transform(scaled, lambda x: F.floor(F.least(F.greatest(x, F.lit(0.0)), F.lit(255.0))).cast("int"))


def _sq_decode_sql(codes_ref: str) -> str:
    return (
        f"zip_with(zip_with({codes_ref}, scale, (c, s) -> CAST(c AS DOUBLE) / 255.0D * s), "
        "minv, (x, m) -> x + m)"
    )


def sq_decode_expr(codes: ColumnOrName) -> Column:
    """E2 — inverse affine."""
    if (r := _sqlref(codes)) is not None:
        return F.expr(_sq_decode_sql(r))
    un = F.zip_with(codes, F.col("scale"), lambda c, s: c.cast("double") / 255.0 * s)
    return F.zip_with(un, F.col("minv"), lambda x, m: x + m)


def sq_encode(vectors: DataFrame, model: DataFrame, vec_col: str = "embedding", out_col: str = "codes") -> DataFrame:
    return vectors.crossJoin(F.broadcast(model)).withColumn(out_col, sq_encode_expr(vec_col))


def sq_l2_dist_expr(codes_a: ColumnOrName, codes_b: ColumnOrName) -> Column:
    """D5 — ``sqrt(Σ((Δcode·scale/255)²))`` (int16 trick ≡ exact int diff)."""
    if (ra := _sqlref(codes_a)) is not None and (rb := _sqlref(codes_b)) is not None:
        return F.expr(
            f"sqrt(aggregate(zip_with(zip_with({ra}, {rb}, "
            "(a, b) -> CAST(a - b AS DOUBLE)), scale, (d, s) -> d * s / 255.0D), "
            "0.0D, (acc, x) -> acc + x * x))"
        )
    diff = F.zip_with(codes_a, codes_b, lambda a, b: (a - b).cast("double"))
    scaled = F.zip_with(diff, F.col("scale"), lambda d, s: d * s / 255.0)
    return F.sqrt(F.aggregate(scaled, F.lit(0.0), lambda acc, x: acc + x * x))


def sq_dot_dist_expr(codes_a: ColumnOrName, codes_b: ColumnOrName) -> Column:
    """D6 — reconstruct both sides, −dot."""
    if (ra := _sqlref(codes_a)) is not None and (rb := _sqlref(codes_b)) is not None:
        return F.expr(
            f"-aggregate(zip_with({_sq_decode_sql(ra)}, {_sq_decode_sql(rb)}, "
            "(x, y) -> x * y), 0.0D, (acc, x) -> acc + x)"
        )
    rec_a = sq_decode_expr(codes_a)
    rec_b = sq_decode_expr(codes_b)
    prods = F.zip_with(rec_a, rec_b, lambda x, y: x * y)
    return -F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


# ------------------------------------------------------------------ BQ

def bq_train(vectors: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """A5 — per-dim median thresholds (1-row array<double>)."""
    exploded = vectors.select(F.posexplode(vec_col).alias("dim", "v"))
    stats = exploded.groupBy("dim").agg(F.median("v").alias("t"))
    return stats.agg(F.array_sort(F.collect_list(F.struct("dim", "t"))).alias("s")).select(
        F.transform("s", lambda x: x["t"]).alias("thresholds")
    )


def bq_encode_expr(vec: ColumnOrName) -> Column:
    """E3 — bit per dim: v > threshold (requires `thresholds` in scope)."""
    if (r := _sqlref(vec)) is not None:
        return F.expr(
            f"zip_with({r}, thresholds, (x, t) -> CAST(CAST(x AS DOUBLE) > t AS INT))"
        )
    return F.zip_with(vec, F.col("thresholds"), lambda x, t: (x.cast("double") > t).cast("int"))


def bq_pack_expr(bits: Column, n_words: int) -> Column:
    """Pack bit array into BIGINT words, 32 bits per word MSB-first (staying
    below the sign bit keeps ANSI-mode arithmetic overflow-free), for
    `bit_count` Hamming. n_words = ceil(D/32)."""
    def word(w):
        return F.aggregate(
            F.sequence(F.lit(0), F.lit(31)),
            F.lit(0).cast("long"),
            lambda acc, j: acc * F.lit(2).cast("long")
            + F.coalesce(
                F.element_at(bits, (F.lit(w * 32 + 1) + j).cast("int")).cast("long"),
                F.lit(0).cast("long"),
            ),
        )
    return F.array(*[word(w) for w in range(n_words)])


def hamming_bits_expr(bits_a: ColumnOrName, bits_b: ColumnOrName) -> Column:
    """D4 over unpacked bits: Σ (a≠b)."""
    if (ra := _sqlref(bits_a)) is not None and (rb := _sqlref(bits_b)) is not None:
        return F.expr(
            f"aggregate(zip_with({ra}, {rb}, "
            "(a, b) -> CASE WHEN a != b THEN 1 ELSE 0 END), "
            "CAST(0 AS BIGINT), (acc, x) -> acc + CAST(x AS BIGINT))"
        )
    return F.aggregate(
        F.zip_with(bits_a, bits_b, lambda a, b: F.when(a != b, 1).otherwise(0)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x.cast("long"),
    )


# ------------------------------------------------------------------ PQ

def pq_sample_codebook(
    vectors: DataFrame,
    num_subspaces: int,
    num_centroids: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic codebook: centroid c of subspace m = subvector m of the
    c-th lowest-id vector. (dim-order slice as in ``quantization.py:466-471``;
    kmeans *quality* is supplied by :func:`pq_train_kmeans` instead.)
    Returns (m, code, centroid array<double>)."""
    dim_df = vectors.orderBy(id_col).limit(num_centroids)
    # the window only ever sees the limit(num_centroids) rows above (≤256),
    # so a single partition is the intent — make it explicit
    base = dim_df.select(
        F.row_number().over(Window.partitionBy(F.lit(0)).orderBy(id_col)).alias("rk"),
        F.col(vec_col).alias("v"),
    ).withColumn("code", F.col("rk") - 1).drop("rk")
    m_df = base.crossJoin(
        base.sparkSession.range(num_subspaces).select(F.col("id").cast("int").alias("m"))
    )
    sub = F.expr(f"slice(v, m * (size(v) div {num_subspaces}) + 1, size(v) div {num_subspaces})")
    return m_df.select("m", "code", F.transform(sub, lambda x: x.cast("double")).alias("centroid"))


def pq_encode(
    vectors: DataFrame,
    codebook: DataFrame,
    num_subspaces: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """E4 — (id, m, code): nearest centroid per subspace slice (L2²,
    lowest code wins ties = np.argmin)."""
    m_df = vectors.crossJoin(
        vectors.sparkSession.range(num_subspaces).select(F.col("id").cast("int").alias("m"))
    )
    sub = F.expr(f"slice({vec_col}, m * (size({vec_col}) div {num_subspaces}) + 1, size({vec_col}) div {num_subspaces})")
    sliced = m_df.select(F.col(id_col), "m", F.transform(sub, lambda x: x.cast("double")).alias("sub"))
    joined = sliced.join(F.broadcast(codebook), "m")
    d2 = F.aggregate(
        F.zip_with("sub", "centroid", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = joined.select(F.col(id_col), "m", "code", d2.alias("d2"))
    return (
        scored.groupBy(id_col, "m")
        .agg(F.min_by("code", F.struct(F.col("d2"), F.col("code"))).alias("code"))
    )


def pq_lut(query_vec: DataFrame, codebook: DataFrame, num_subspaces: int) -> DataFrame:
    """D7 — (m, code, d2): ‖q_sub − centroid‖² per (subspace, centroid)."""
    m_df = query_vec.crossJoin(
        query_vec.sparkSession.range(num_subspaces).select(F.col("id").cast("int").alias("m"))
    )
    sub = F.expr(f"slice(qvec, m * (size(qvec) div {num_subspaces}) + 1, size(qvec) div {num_subspaces})")
    sliced = m_df.select("m", F.transform(sub, lambda x: x.cast("double")).alias("qsub"))
    joined = sliced.join(F.broadcast(codebook), "m")
    d2 = F.aggregate(
        F.zip_with("qsub", "centroid", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return joined.select("m", "code", d2.alias("d2"))


def pq_adc_distances(codes: DataFrame, lut: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """(id, dist): sqrt(Σ_m lut[m][code_m]) — the O(M) table-lookup scan as a
    broadcast join + sum."""
    return (
        codes.join(F.broadcast(lut), ["m", "code"])
        .groupBy(id_col)
        .agg(F.sqrt(F.sum("d2")).alias("dist"))
    )


def pq_train_kmeans(
    vectors: DataFrame,
    num_subspaces: int,
    num_centroids: int,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 20,
) -> DataFrame:
    """A6 — production codebook via MLlib KMeans per subspace (seeded).
    Returns (m, code, centroid array<double>)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    spark = vectors.sparkSession
    out = []
    dim = len(vectors.select(vec_col).first()[0])
    sub_dim = dim // num_subspaces
    for m in range(num_subspaces):
        sliced = vectors.select(
            array_to_vector(
                F.transform(F.slice(vec_col, m * sub_dim + 1, sub_dim), lambda x: x.cast("double"))
            ).alias("features")
        )
        km = KMeans(k=num_centroids, seed=seed, maxIter=max_iter).fit(sliced)
        for code, center in enumerate(km.clusterCenters()):
            out.append((m, code, [float(x) for x in center]))
    return local_df(spark, out, "m int, code int, centroid array<double>")


def pq_train_lloyd(
    vectors: DataFrame,
    num_subspaces: int,
    num_centroids: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    iters: int = 10,
    sample_cap: int = 65536,
) -> DataFrame:
    """A6 codebook via the deterministic driver-side Lloyd kernel
    (`operators/similarity.lloyd_kmeans`) on a bounded hash-stride sample.

    Replaces :func:`pq_train_kmeans`'s per-subspace MLlib fits for the
    declared recall query (r14, VERDICT r13 #4): M fits × maxIter
    distributed passes over the full corpus collapse into ONE bounded
    collect (`_stride_sample`: ≤ sample_cap rows regardless of corpus
    size — the same driver-matrix bound as the IVF coarse trainer) plus
    pure NumPy. RNG-free and id-sort-deterministic, so the trained
    sf0.01 codebook freezes as snapshot literals exactly like the MLlib
    one did (`queries/_pq_snapshot.py`; the retrain-equality test pins
    it). Returns (m, code, centroid array<double>)."""
    import numpy as np

    from custom_python_vectordb_spark.operators.similarity import (
        _stride_sample,
        lloyd_kmeans,
    )

    spark = vectors.sparkSession
    n = vectors.count()
    samp = _stride_sample(vectors.select(id_col, vec_col), n, sample_cap, id_col)
    pdf = samp.toPandas()
    order = np.argsort(pdf[id_col].to_numpy(), kind="stable")
    mat = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])[order]
    sub_dim = mat.shape[1] // num_subspaces
    out = []
    for m in range(num_subspaces):
        block = np.ascontiguousarray(mat[:, m * sub_dim:(m + 1) * sub_dim])
        cents = lloyd_kmeans(np, block, num_centroids, iters=iters)
        for code, center in enumerate(cents):
            out.append((m, code, [float(x) for x in center]))
    return local_df(spark, out, "m int, code int, centroid array<double>")


# ------------------------------------------------------------------ K5 rerank

def quantized_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    model: DataFrame,
    k: int = 10,
    candidates: int = 50,
    metric: str = "l2",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    coded_corpus: DataFrame | None = None,
) -> DataFrame:
    """K5 — SQ-coded coarse scan → top-`candidates` per query → exact
    distance on the candidate set → top-k. Two-stage plan: stage 1 reads
    codes only (4× less data), stage 2 touches `candidates` rows per query.
    `coded_corpus`: optional pre-encoded (id, vec, codes) frame — the E1
    storage tier a serving system persists at ingest (sources/corpus_view
    .sq_coded_view); when omitted the codes are derived inline."""
    if coded_corpus is None:
        coded_corpus = sq_encode(corpus, model, vec_col).select(id_col, vec_col, "codes")
    coded_queries = (
        queries.withColumnRenamed("qvec", "embedding")
        .crossJoin(F.broadcast(model))
        .withColumn("qcodes", sq_encode_expr("embedding"))
        .select("qid", F.col("embedding").alias("qvec"), "qcodes")
    )
    stage1 = (
        coded_corpus.join(F.broadcast(coded_queries.select("qid", "qcodes")))
        .crossJoin(F.broadcast(model))
        .select(
            "qid", id_col, vec_col,
            sq_l2_dist_expr("qcodes", "codes").alias("qdist"),
        )
    )
    cands = top_k_per_group(stage1, "qid", candidates, F.col("qdist").asc(), F.col(id_col).asc())
    stage2 = cands.join(F.broadcast(coded_queries.select("qid", "qvec")), "qid").select(
        "qid", id_col, distance_expr(metric, vec_col, "qvec").alias("dist")
    )
    return top_k_per_group(stage2, "qid", k, F.col("dist").asc(), F.col(id_col).asc()).orderBy(
        "qid", "dist", id_col
    )


# --------------------------------------------- in-process quantized replica

# {(paths, id_col): (stat_key, ids, codes uint8 (N,D), minv, s, wa2)}
_SQ_REPLICA_CACHE: dict = {}
# {(paths, mmap_dir, stat_key): {id: mmap row}} for the rerank gather
_SQ_POS_CACHE: dict = {}


def sq_replica_serve(
    shard_paths: list[str],
    queries_pd,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    dist_col: str = "dist",
    chunk_rows: int = 16384,
    fetch_k: int | None = None,
    rerank_mmap_dir: str | None = None,
):
    """Quantized serving replica — the reference's SQ serving regime
    (``vectordb_optimized.py`` stores int8 codes to fit more corpus per
    node; ``benchmark_quantization.py`` is its quality gate) as an
    in-process twin of :func:`knn.knn_replica_serve`:

    - **build** (once per shard stat): decode vectors, train the SAME SQ
      model the batch operators use (per-dim min/max, ``sq_train``),
      encode to a resident uint8 code matrix — **4× less RAM than
      float32, 8× less than float64** — plus the per-row weighted square
      norm Σ s²a² the L2 expansion needs.
    - **serve**: encode the query batch with the same model (floor/clip,
      bit-identical to ``sq_encode_expr``), then L2-over-codes via the
      expansion d² = Σs²a² − 2(a·s²)·b + Σs²b², computed as a CHUNKED
      float64 GEMM: each ``chunk_rows`` slice of codes is widened
      transiently (bounded scratch, ~16k×D×8 B), multiplied, and
      discarded — storage stays uint8, so the capacity win is real and
      the latency cost is the widening (~2× the float replica, measured
      in bench).

    Distances equal ``sq_l2_dist_expr`` (the oracle-checked knn_sq_l2
    semantics) to ~1e-8 (float64 expansion-cancellation floor); ranking
    asserted identical in tests on the fixture corpus.

    ``fetch_k`` + ``rerank_mmap_dir`` (K5 at serving speed): the coarse
    uint8 scan keeps its top-``fetch_k`` candidates per query, then the
    EXACT vectors of just those candidates are gathered from the
    memory-mapped float replica (``knn._build_mmap_replica`` — RAM holds
    codes, DISK holds floats, the rerank touches fetch_k rows per query
    as page reads) and exact L2 decides the final top-k. This is the
    reference's quantized-rerank architecture with the float tier
    demoted to disk: measured at 100K×128 vs the exact-L2 truth,
    recall@10 goes 0.98 (coarse codes only) → 1.00 at fetch_k=50, at
    ~3.3 ms/q for a 20-query batch (the float64 chunked GEMM trades ~2×
    the float replica's latency for 4× its capacity)."""
    import os as _os

    import numpy as np
    import pandas as pd
    import pyarrow.parquet as _pq

    paths = tuple(sorted(shard_paths))
    stat_key = tuple((p, st.st_mtime_ns, st.st_size) for p, st in ((p, _os.stat(p)) for p in paths))
    ck = (paths, id_col)
    entry = _SQ_REPLICA_CACHE.get(ck)
    if entry is None or entry[0] != stat_key:
        ids_parts, mat_parts = [], []
        for p in paths:
            names = _pq.read_schema(p).names
            vec_field = "embedding" if "embedding" in names else names[1]
            tbl = _pq.read_table(p, columns=[id_col, vec_field])
            if tbl.num_rows == 0:
                continue
            ids_parts.append(tbl.column(id_col).to_numpy(zero_copy_only=False))
            flat = np.concatenate(
                [c.flatten().to_numpy(zero_copy_only=False) for c in tbl.column(vec_field).chunks]
            )
            mat_parts.append(flat.reshape(len(ids_parts[-1]), -1).astype(np.float64))
        if not ids_parts:
            return pd.DataFrame({"qid": [], id_col: [], dist_col: []})
        ids = np.concatenate(ids_parts)
        mat = np.concatenate(mat_parts)
        minv = mat.min(axis=0)
        maxv = mat.max(axis=0)
        scale = np.where(maxv - minv == 0.0, 1.0, maxv - minv)
        codes = np.floor(
            np.clip((mat - minv) / scale * 255.0, 0.0, 255.0)
        ).astype(np.uint8)
        s = scale / 255.0  # per-dim code→value step
        s2 = (s * s).astype(np.float64)
        cf = codes.astype(np.float64)
        wa2 = (cf * cf * s2).sum(axis=1)  # Σ s² a² per row
        entry = (stat_key, ids, codes, minv, s, wa2)
        _SQ_REPLICA_CACHE[ck] = entry
    _, ids, codes, minv, s, wa2 = entry
    if len(queries_pd) == 0:
        return pd.DataFrame({"qid": [], id_col: [], dist_col: []})

    qids = queries_pd["qid"].to_numpy()
    qmat = np.asarray([np.asarray(v, dtype=np.float64) for v in queries_pd["qvec"]])
    scale = s * 255.0
    qcodes = np.floor(np.clip((qmat - minv) / scale * 255.0, 0.0, 255.0))
    s2 = s * s
    qw = qcodes * s2  # (Q, D): b·s² — cross-term multiplier
    wb2 = (qcodes * qcodes * s2).sum(axis=1)  # Σ s² b² per query
    n = len(ids)
    d2 = np.empty((len(qids), n), dtype=np.float64)
    for lo in range(0, n, chunk_rows):
        hi = min(lo + chunk_rows, n)
        # transient float64 widening: float32 here loses ~7 digits in the
        # cross term, which the expansion's cancellation amplifies to
        # ~1e-3 absolute noise on near-zero DISTANCES (sqrt of a tiny
        # difference of large terms); float64 keeps it ~1e-8 (measured)
        block = codes[lo:hi].astype(np.float64)
        d2[:, lo:hi] = qw @ block.T  # (Q, chunk) cross terms
    d2 *= -2.0
    d2 += wa2[None, :]
    d2 += wb2[:, None]
    np.maximum(d2, 0.0, out=d2)
    np.sqrt(d2, out=d2)
    if fetch_k is not None and rerank_mmap_dir is not None:
        from custom_python_vectordb_spark.operators.knn import _build_mmap_replica

        import os as _os

        paths2 = tuple(sorted(shard_paths))
        stat_key2 = tuple(
            (p, st.st_mtime_ns, st.st_size) for p, st in ((p, _os.stat(p)) for p in paths2)
        )
        built = _build_mmap_replica(paths2, stat_key2, rerank_mmap_dir, id_col, "float64")
        m_ids, m_mat, _n, _s = built
        # id → mmap row index, memoized with the replica (building the
        # 100k-entry dict per call measured ~1.5 ms/q — half the rerank)
        pk = (paths2, rerank_mmap_dir, stat_key2)
        pos = _SQ_POS_CACHE.get(pk)
        if pos is None:
            _SQ_POS_CACHE.clear()  # one live replica per (paths, dir)
            pos = {
                int(v) if isinstance(v, np.integer) else v: i
                for i, v in enumerate(m_ids)
            }
            _SQ_POS_CACHE[pk] = pos
        ck2 = min(fetch_k, n)
        cidx = np.argpartition(d2, ck2 - 1, axis=1)[:, :ck2]
        rows = []
        for qi in range(len(qids)):
            cand = cidx[qi]
            gathered = np.asarray(
                m_mat[[pos[int(ids[c]) if isinstance(ids[c], np.integer) else ids[c]] for c in cand]],
                dtype=np.float64,
            )
            qv = qmat[qi]
            diff = gathered - qv[None, :]
            ed = np.sqrt((diff * diff).sum(axis=1))
            kk2 = min(k, len(cand))
            order_q = sorted(range(len(cand)), key=lambda i: (ed[i], ids[cand[i]]))[:kk2]
            for i in order_q:
                rows.append((qids[qi], ids[cand[i]], float(ed[i])))
        return pd.DataFrame(rows, columns=["qid", id_col, dist_col])
    kk = min(k, n)
    sidx = np.argpartition(d2, kk - 1, axis=1)[:, :kk]
    sel = np.take_along_axis(d2, sidx, axis=1)
    parts = pd.DataFrame(
        {
            "qid": np.repeat(qids, kk),
            id_col: ids[sidx.ravel()],
            dist_col: sel.ravel(),
        }
    )
    order = np.lexsort(
        (parts[id_col].to_numpy(), parts[dist_col].to_numpy(), parts["qid"].to_numpy())
    )
    return parts.iloc[order].reset_index(drop=True)


_BQ_REPLICA_CACHE: dict = {}


def _popcount64(x, t):
    """SWAR popcount on uint64, IN PLACE with one scratch buffer (numpy
    1.x has no bitwise_count; the out=-less version measured
    allocation-bound — 10 × 16 MB temporaries per pass at 100K×Q=20).
    Driver-side only, never pickled to workers."""
    import numpy as np

    np.right_shift(x, np.uint64(1), out=t)
    t &= np.uint64(0x5555555555555555)
    x -= t
    np.right_shift(x, np.uint64(2), out=t)
    t &= np.uint64(0x3333333333333333)
    x &= np.uint64(0x3333333333333333)
    x += t
    np.right_shift(x, np.uint64(4), out=t)
    x += t
    x &= np.uint64(0x0F0F0F0F0F0F0F0F)
    x *= np.uint64(0x0101010101010101)
    x >>= np.uint64(56)
    return x


def _bq_resolve(shard_paths: list[str], *, id_col: str):
    """Resolve (building if stale/absent) the cached BQ tier for a shard
    set: (stat_key, ids, packed uint64 words, per-dim medians, byte pad),
    or None when the shards hold no rows. Same (path, mtime_ns, size)
    coherence contract as the other replica caches."""
    import os as _os

    import numpy as np
    import pyarrow.parquet as _pq

    paths = tuple(sorted(shard_paths))
    stat_key = tuple((p, st.st_mtime_ns, st.st_size) for p, st in ((p, _os.stat(p)) for p in paths))
    ck = (paths, id_col)
    entry = _BQ_REPLICA_CACHE.get(ck)
    if entry is not None and entry[0] == stat_key:
        return entry
    ids_parts, mat_parts = [], []
    for p in paths:
        names = _pq.read_schema(p).names
        vec_field = "embedding" if "embedding" in names else names[1]
        tbl = _pq.read_table(p, columns=[id_col, vec_field])
        if tbl.num_rows == 0:
            continue
        ids_parts.append(tbl.column(id_col).to_numpy(zero_copy_only=False))
        flat = np.concatenate(
            [c.flatten().to_numpy(zero_copy_only=False) for c in tbl.column(vec_field).chunks]
        )
        mat_parts.append(flat.reshape(len(ids_parts[-1]), -1).astype(np.float64))
    if not ids_parts:
        return None
    ids = np.concatenate(ids_parts)
    mat = np.concatenate(mat_parts)
    med = np.median(mat, axis=0)
    packed = np.packbits((mat > med[None, :]).astype(np.uint8), axis=1)
    # pad the byte dim to a multiple of 8 and view as uint64 words for
    # the SWAR popcount scan; resident bytes stay D/8 per row (+pad)
    pad = (-packed.shape[1]) % 8
    if pad:
        packed = np.concatenate(
            [packed, np.zeros((len(packed), pad), dtype=np.uint8)], axis=1
        )
    words = np.ascontiguousarray(packed).view(np.uint64)
    entry = (stat_key, ids, words, med, pad)
    _BQ_REPLICA_CACHE[ck] = entry
    return entry


class BqReplicaHandle:
    """Pre-resolved single-query fast path over the packed BQ tier — the
    quantized sibling of ``partitioned.IvfReplicaHandle`` (same rationale:
    hnswlib-style bare in-process call on a pre-opened index, no per-call
    stat/pandas plumbing; staleness re-checked at the caller's
    ``refresh()`` boundary while :func:`bq_replica_serve` keeps its
    per-call stat check)."""

    __slots__ = ("_paths", "_id_col", "_np", "ids", "words", "med", "pad")

    def __init__(self, shard_paths: list[str], *, id_col: str = "vec_id"):
        import numpy as np

        self._np = np
        self._paths = list(shard_paths)
        self._id_col = id_col
        self.refresh()

    def refresh(self) -> None:
        entry = _bq_resolve(self._paths, id_col=self._id_col)
        if entry is None:
            raise ValueError("empty shard set")
        _, self.ids, self.words, self.med, self.pad = entry

    def save_index(self, out_dir: str) -> None:
        """Persist the packed-word tier (ids + uint64 codes + per-dim
        median thresholds) as ``bq_index.npz`` — same warm-start family
        contract as ``IvfReplicaHandle.save_index``: the build's expensive
        part at scale is the full-corpus decode+binarize pass, which N
        booting serving workers should pay once, not N times. The shard
        stat key rides along for the caller's freshness check."""
        import json
        import os as _os

        np = self._np
        _os.makedirs(out_dir, exist_ok=True)
        meta = {
            "id_col": self._id_col, "pad": int(self.pad),
            "stat_key": [
                [p, _os.stat(p).st_mtime_ns, _os.stat(p).st_size]
                for p in sorted(self._paths)
            ],
        }
        # unique tmp per process: concurrent savers must not share one
        # tmp path (see IvfReplicaHandle.save_index)
        tmp = _os.path.join(out_dir, f"bq_index.npz.tmp.{_os.getpid()}")
        with open(tmp, "wb") as fh:
            np.savez(fh, ids=self.ids, words=self.words, med=self.med,
                     meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8))
        _os.replace(tmp, _os.path.join(out_dir, "bq_index.npz"))

    @classmethod
    def load_index(cls, in_dir: str):
        """Reconstitute from :meth:`save_index` output without reading
        parquet. The shard set is preserved, so ``refresh()`` remains the
        write-visibility boundary; freshness checking against live shards
        is the caller's job (compare ``meta['stat_key']``)."""
        import json
        import os as _os

        import numpy as np

        with np.load(
            _os.path.join(in_dir, "bq_index.npz"), allow_pickle=True
        ) as z:
            meta = json.loads(bytes(z["meta"].tobytes()).decode())
            ids, words, med = z["ids"], z["words"], z["med"]
        self = object.__new__(cls)
        self._np = np
        self._paths = [p for p, _m, _s in meta["stat_key"]]
        self._id_col = meta["id_col"]
        self.ids, self.words, self.med, self.pad = ids, words, med, meta["pad"]
        return self

    def search_one(self, qvec, k: int = 10):
        """Coarse Hamming top-k for ONE query: (ids, hamming) sorted by
        (distance, id). One xor+SWAR-popcount pass per packed word."""
        np = self._np
        q = np.asarray(qvec, dtype=np.float64)
        qp = np.packbits((q > self.med).astype(np.uint8))
        if self.pad:
            qp = np.concatenate([qp, np.zeros(self.pad, dtype=np.uint8)])
        qw = np.ascontiguousarray(qp).view(np.uint64)
        words = self.words
        n = len(self.ids)
        # single-threaded SWAR over 32K-row blocks: the x/t scratch
        # (2 × 256 KB) stays L2-resident across the ~12 per-word passes
        # instead of streaming N×8B through DRAM each pass (measured p50
        # 1.61 → 1.22 ms at 100K×128, r13). Still one thread: at one
        # query the per-slice ops are too small to amortize GIL handoffs
        # (a 2-thread split measured 2.5× SLOWER; the batch path's
        # threads only pay off on its (Q, N) matrices).
        blk = 32768
        n_words = words.shape[1]
        acc = np.empty(n, dtype=np.uint16)
        bw = min(blk, n)
        x = np.empty(bw, dtype=np.uint64)
        t = np.empty(bw, dtype=np.uint64)
        for lo in range(0, n, blk):
            hi = min(lo + blk, n)
            m = hi - lo
            xx, tt, a = x[:m], t[:m], acc[lo:hi]
            np.bitwise_xor(qw[0], words[lo:hi, 0], out=xx)
            a[:] = _popcount64(xx, tt)  # cast-assign uint64→uint16
            for w in range(1, n_words):
                np.bitwise_xor(qw[w], words[lo:hi, w], out=xx)
                np.add(a, _popcount64(xx, tt), out=a, casting="unsafe")
        m = min(k, n)
        if m < n:
            # Hamming lives in [0, bits]: a bincount gives the exact k-th
            # boundary value in one cheap pass (no argpartition), and the
            # (dist, id) lexsort over everything at or below it applies
            # the id tie-break exactly like the batch path (uint16 feeds
            # bincount directly — no widening pass)
            hist = np.bincount(acc)
            thr = int(np.searchsorted(np.cumsum(hist), m))
            cand = np.nonzero(acc <= thr)[0]
            ids, d = self.ids[cand], acc[cand]
        else:
            ids, d = self.ids, acc
        order = np.lexsort((ids, d))[:m]
        return ids[order], d[order].astype(np.float64)


def bq_replica_serve(
    shard_paths: list[str],
    queries_pd,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    dist_col: str = "dist",
    fetch_k: int | None = None,
    rerank_mmap_dir: str | None = None,
):
    """Binary-quantized serving replica — the reference's 32×-compression
    tier (``quantization.py:287`` binary codes + Hamming scan, README
    0.8 ms/query at 100K×128) as an in-process twin of
    :func:`sq_replica_serve`:

    - **build** (once per shard stat): decode vectors, per-dim MEDIAN
      threshold (the same ``bq_train`` convention the oracle-checked
      batch operators use), binarize, ``np.packbits`` → resident
      (N, D/8) uint8 code matrix — **32× less RAM than float32**; a
      100K×128 corpus is 1.6 MB resident.
    - **serve**: binarize+pack the queries with the SAME thresholds, and
      per query one ``bitwise_xor`` against the packed matrix + a
      256-entry popcount LUT sum gives Hamming distances — no float
      arithmetic on the scan at all.
    - ``fetch_k`` + ``rerank_mmap_dir``: same disk-float exact rerank as
      the SQ tier (RAM holds 1-bit codes, disk holds floats) to recover
      exact top-k from the coarse candidates; recall is measured in
      bench every run, matching the reference's 80-85%-coarse /
      rerank-recovered methodology.

    Ties (equal Hamming) break by id ascending, like every top-k here."""
    import numpy as np
    import pandas as pd

    _popcount64_ = _popcount64

    entry = _bq_resolve(shard_paths, id_col=id_col)
    if entry is None:
        return pd.DataFrame({"qid": [], id_col: [], dist_col: []})
    paths = tuple(sorted(shard_paths))
    stat_key, ids, words, med, pad = entry
    if len(queries_pd) == 0:
        return pd.DataFrame({"qid": [], id_col: [], dist_col: []})

    qids = queries_pd["qid"].to_numpy()
    qmat = np.asarray([np.asarray(v, dtype=np.float64) for v in queries_pd["qvec"]])
    qpacked = np.packbits((qmat > med[None, :]).astype(np.uint8), axis=1)
    if pad:
        qpacked = np.concatenate(
            [qpacked, np.zeros((len(qpacked), pad), dtype=np.uint8)], axis=1
        )
    qwords = np.ascontiguousarray(qpacked).view(np.uint64)
    n = len(ids)
    # the scan is memory-bandwidth-bound (10 SWAR passes over a (Q, N)
    # uint64 matrix per word): 4 threads over row slices, each slicing its
    # range into 32K-row column blocks so the x/t scratch (2 × Q×B×8B ≈
    # 10 MB at Q=20) stays cache-warm across the per-word passes instead
    # of round-tripping DRAM. Measured at 100K×128/Q=20 (r13): 8 threads ×
    # full-slice scratch = 1.16 ms/q (DRAM-saturated, HT-contended) vs 4
    # threads × blocked = 0.62 ms/q — past the reference's published
    # 0.8 ms packed-bit row (BASELINE.md:15). numpy releases the GIL on
    # the large elementwise ops, so slices genuinely run in parallel.
    from concurrent.futures import ThreadPoolExecutor

    nq = len(qids)
    dh = np.empty((nq, n), dtype=np.uint16)
    n_threads = 4 if n >= 65536 else 1
    blk = 32768
    bounds = np.linspace(0, n, n_threads + 1, dtype=np.int64)
    n_words = words.shape[1]

    def _scan(slot):
        lo0, hi0 = int(bounds[slot]), int(bounds[slot + 1])
        bw = min(blk, hi0 - lo0)
        x = np.empty((nq, bw), dtype=np.uint64)
        t = np.empty_like(x)
        acc = np.empty((nq, bw), dtype=np.uint16)  # contiguous accumulator
        for lo in range(lo0, hi0, blk):
            hi = min(lo + blk, hi0)
            m = hi - lo
            xx, tt, a = x[:, :m], t[:, :m], acc[:, :m]
            np.bitwise_xor.outer(qwords[:, 0], words[lo:hi, 0], out=xx)
            a[:] = _popcount64_(xx, tt)  # cast-assign uint64→uint16
            for w in range(1, n_words):
                np.bitwise_xor.outer(qwords[:, w], words[lo:hi, w], out=xx)
                np.add(a, _popcount64_(xx, tt), out=a, casting="unsafe")
            dh[:, lo:hi] = a

    if n_threads == 1:
        _scan(0)
    else:
        with ThreadPoolExecutor(n_threads) as ex:
            list(ex.map(_scan, range(n_threads)))
    if fetch_k is not None and rerank_mmap_dir is not None:
        from custom_python_vectordb_spark.operators.knn import _build_mmap_replica

        built = _build_mmap_replica(paths, stat_key, rerank_mmap_dir, id_col, "float64")
        m_ids, m_mat, _n, _s = built
        pk = (paths, rerank_mmap_dir, stat_key)
        pos = _SQ_POS_CACHE.get(pk)
        if pos is None:
            _SQ_POS_CACHE.clear()
            pos = {
                int(v) if isinstance(v, np.integer) else v: i
                for i, v in enumerate(m_ids)
            }
            _SQ_POS_CACHE[pk] = pos
        ck2 = min(fetch_k, n)
        cidx = np.argpartition(dh, ck2 - 1, axis=1)[:, :ck2]
        rows = []
        for qi in range(len(qids)):
            cand = cidx[qi]
            gathered = np.asarray(
                m_mat[[pos[int(ids[c]) if isinstance(ids[c], np.integer) else ids[c]] for c in cand]],
                dtype=np.float64,
            )
            diff = gathered - qmat[qi][None, :]
            ed = np.sqrt((diff * diff).sum(axis=1))
            kk2 = min(k, len(cand))
            order_q = sorted(range(len(cand)), key=lambda i: (ed[i], ids[cand[i]]))[:kk2]
            for i in order_q:
                rows.append((qids[qi], ids[cand[i]], float(ed[i])))
        return pd.DataFrame(rows, columns=["qid", id_col, dist_col])
    kk = min(k, n)
    # Hamming distances live in [0, D]: one bincount pass finds the k-th
    # smallest value per query, a boolean gather takes the <= threshold
    # candidates (a hair more than k on ties), and only those few sort —
    # measured faster than a full introselect argpartition over N
    out_q, out_i, out_d = [], [], []
    for qi in range(len(qids)):
        row = dh[qi]
        counts = np.bincount(row, minlength=1)
        thresh = int(np.searchsorted(np.cumsum(counts), kk))
        cand = np.flatnonzero(row <= thresh)
        order_q = sorted(cand, key=lambda c: (row[c], ids[c]))[:kk]
        out_q.extend([qids[qi]] * len(order_q))
        out_i.extend(ids[c] for c in order_q)
        out_d.extend(float(row[c]) for c in order_q)
    return pd.DataFrame({"qid": out_q, id_col: out_i, dist_col: out_d})


_PQ_REPLICA_CACHE: dict = {}


def _train_pq_books(np, mat, num_subspaces: int, num_centroids: int,
                    train_sample_cap: int = 131_072):
    """(books (M, K, sub_d) float32, codes (N, M) uint8): deterministic
    per-subspace NumPy Lloyd (5 iterations, centroids seeded from the
    lowest-id rows — the ivf_replica_serve recipe, so rebuilds are
    bit-identical). Shared by the PQ and IVF-PQ replica builds.

    Linear in the corpus (r11, the same fix as the IVF trainer): Lloyd
    trains on a deterministic evenly-spaced row sample of at most
    `train_sample_cap` rows (corpora at or under the cap — including the
    100K bench corpus — train on every row), centroid updates are one
    `np.add.at` scatter + bincount instead of K member scans, and the
    final full-corpus encode runs once in ~256 MB chunks. The old
    full-matrix form cost M × (N·K distance blocks ×5 + K boolean scans
    of N) — minutes at 1M rows."""
    from custom_python_vectordb_spark.operators.knn import _blas_threads

    n, d = mat.shape
    m = num_subspaces
    if d % m:
        raise ValueError(f"dim {d} not divisible by num_subspaces {m}")
    sub_d = d // m
    kc = min(num_centroids, n)
    books = np.empty((m, kc, sub_d), dtype=np.float32)
    codes = np.empty((n, m), dtype=np.uint8)
    if n > train_sample_cap:
        tsel = np.linspace(0, n - 1, train_sample_cap).astype(np.int64)
    else:
        tsel = None
    with _blas_threads(16):
        for mi in range(m):
            x = np.ascontiguousarray(mat[:, mi * sub_d : (mi + 1) * sub_d])
            t = x if tsel is None else np.ascontiguousarray(x[tsel])
            cent = t[:kc].copy()
            t2 = (t * t).sum(1)[:, None]
            for _ in range(5):
                assign = (t2 + (cent * cent).sum(1)[None, :] - 2.0 * (t @ cent.T)).argmin(1)
                sums = np.zeros_like(cent)
                np.add.at(sums, assign, t)
                counts = np.bincount(assign, minlength=kc)
                nz = counts > 0
                cent[nz] = sums[nz] / counts[nz, None]
            books[mi] = cent
            codes[:, mi] = _pq_encode_subspace(np, x, cent)
    return books, codes


def _pq_encode_subspace(np, x, cent):
    """uint8 nearest-centroid codes for ONE subspace's rows against its
    book, in ~256 MB distance chunks (shared by training-time encode and
    the IVF-PQ residual encode)."""
    kc = len(cent)
    chunk = max(1, 32_000_000 // max(kc, 1))
    out = np.empty(len(x), dtype=np.uint8)
    cent_sq = (cent * cent).sum(1)[None, :]
    for s in range(0, len(x), chunk):
        blk = x[s : s + chunk]
        d2 = (blk * blk).sum(1)[:, None] + cent_sq - 2.0 * (blk @ cent.T)
        out[s : s + chunk] = d2.argmin(1).astype(np.uint8)
    return out


def _pq_encode(np, mat, books):
    """(N, M) uint8 codes for `mat` against trained `books` — the
    encode-only twin of :func:`_train_pq_books` (the IVF-PQ replica
    encodes per-cell RESIDUALS against globally trained books)."""
    m, kc, sub_d = books.shape
    codes = np.empty((len(mat), m), dtype=np.uint8)
    for mi in range(m):
        x = np.ascontiguousarray(mat[:, mi * sub_d : (mi + 1) * sub_d])
        codes[:, mi] = _pq_encode_subspace(np, x, books[mi])
    return codes


def pq_replica_serve(
    shard_paths: list[str],
    queries_pd,
    k: int = 10,
    num_subspaces: int = 16,
    num_centroids: int = 256,
    *,
    id_col: str = "vec_id",
    dist_col: str = "dist",
    fetch_k: int | None = None,
    rerank_mmap_dir: str | None = None,
):
    """Product-quantized serving replica — the reference's PQ tier
    (``quantization.py:510-578``: M×uint8 codes + asymmetric LUT
    distances, README "~90% recall @ 8-16×") as the third member of the
    quantized serving family (SQ = :func:`sq_replica_serve`, BQ =
    :func:`bq_replica_serve`):

    - **build** (once per shard stat): decode vectors, train per-subspace
      codebooks with deterministic NumPy Lloyd (5 iterations, centroids
      seeded from the lowest-id rows — the ivf_replica_serve recipe, so
      rebuilds are bit-identical), encode to a resident (N, M) uint8 code
      matrix: **32× less RAM than float32** at D=128/M=16 (+128 KB of
      codebooks).
    - **serve**: per query an (M, K) L2² lookup table against the
      codebooks (one tiny GEMM), then ADC: dist²(n) = Σ_m lut[m, c_nm] —
      M column-gathers over the code matrix, sharded across a thread
      pool like the BQ scan (gathers are memory-bound; numpy releases
      the GIL).
    - ``fetch_k`` + ``rerank_mmap_dir``: same disk-float exact rerank as
      SQ/BQ; coarse PQ recall is measured in bench, never assumed.

    Distances are sqrt(ADC sums) — the asymmetric approximation of true
    L2 (quantization error on the corpus side only); ties break by id."""
    import os as _os

    import numpy as np
    import pandas as pd
    import pyarrow.parquet as _pq

    if num_centroids > 256:
        # codes are stored uint8; a larger codebook would silently wrap
        # modulo 256 and produce wrong ADC distances (round-6 ADVICE)
        raise ValueError(
            f"num_centroids={num_centroids} exceeds the uint8 code range (max 256)"
        )
    paths = tuple(sorted(shard_paths))
    stat_key = tuple((p, st.st_mtime_ns, st.st_size) for p, st in ((p, _os.stat(p)) for p in paths))
    ck = (paths, id_col, num_subspaces, num_centroids)
    entry = _PQ_REPLICA_CACHE.get(ck)
    if entry is None or entry[0] != stat_key:
        ids_parts, mat_parts = [], []
        for p in paths:
            names = _pq.read_schema(p).names
            vec_field = "embedding" if "embedding" in names else names[1]
            tbl = _pq.read_table(p, columns=[id_col, vec_field])
            if tbl.num_rows == 0:
                continue
            ids_parts.append(tbl.column(id_col).to_numpy(zero_copy_only=False))
            flat = np.concatenate(
                [c.flatten().to_numpy(zero_copy_only=False) for c in tbl.column(vec_field).chunks]
            )
            mat_parts.append(flat.reshape(len(ids_parts[-1]), -1).astype(np.float32))
        if not ids_parts:
            return pd.DataFrame({"qid": [], id_col: [], dist_col: []})
        ids = np.concatenate(ids_parts)
        mat = np.concatenate(mat_parts)
        order = np.argsort(ids, kind="stable")
        ids, mat = ids[order], mat[order]
        books, codes = _train_pq_books(np, mat, num_subspaces, num_centroids)
        entry = (stat_key, ids, codes, books)
        _PQ_REPLICA_CACHE[ck] = entry
    _, ids, codes, books = entry
    if len(queries_pd) == 0:
        return pd.DataFrame({"qid": [], id_col: [], dist_col: []})

    m, kc, sub_d = books.shape
    n = len(ids)
    qids = queries_pd["qid"].to_numpy()
    qmat = np.asarray(
        [np.asarray(v, dtype=np.float32) for v in queries_pd["qvec"]]
    )
    nq = len(qids)
    # (Q, M, K) lookup tables: L2^2 of each query subvector to each centroid
    qsub = qmat.reshape(nq, m, sub_d)
    luts = (
        (qsub * qsub).sum(2)[:, :, None]
        + (books * books).sum(2)[None, :, :]
        - 2.0 * np.einsum("qms,mks->qmk", qsub, books)
    )
    # ADC: for each query sum M column-gathers over the code matrix,
    # row-sharded across threads (gather is memory-bound, GIL released)
    from concurrent.futures import ThreadPoolExecutor

    d2 = np.zeros((nq, n), dtype=np.float32)
    n_threads = 8 if n >= 65536 else 1
    import numpy as _np

    bounds = _np.linspace(0, n, n_threads + 1, dtype=_np.int64)

    def _scan(slot):
        lo, hi = int(bounds[slot]), int(bounds[slot + 1])
        c = codes[lo:hi]
        acc = d2[:, lo:hi]
        for mi in range(m):
            acc += luts[:, mi, :][:, c[:, mi]]

    if n_threads == 1:
        _scan(0)
    else:
        with ThreadPoolExecutor(n_threads) as ex:
            list(ex.map(_scan, range(n_threads)))
    np.maximum(d2, 0.0, out=d2)
    np.sqrt(d2, out=d2)

    if fetch_k is not None and rerank_mmap_dir is not None:
        from custom_python_vectordb_spark.operators.knn import _build_mmap_replica

        built = _build_mmap_replica(paths, stat_key, rerank_mmap_dir, id_col, "float64")
        m_ids, m_mat, _n, _s = built
        pk = (paths, rerank_mmap_dir, stat_key)
        pos = _SQ_POS_CACHE.get(pk)
        if pos is None:
            _SQ_POS_CACHE.clear()
            pos = {
                int(v) if isinstance(v, np.integer) else v: i
                for i, v in enumerate(m_ids)
            }
            _SQ_POS_CACHE[pk] = pos
        ck2 = min(fetch_k, n)
        cidx = np.argpartition(d2, ck2 - 1, axis=1)[:, :ck2]
        rows = []
        qmat64 = qmat.astype(np.float64)
        for qi in range(nq):
            cand = cidx[qi]
            gathered = np.asarray(
                m_mat[[pos[int(ids[c]) if isinstance(ids[c], np.integer) else ids[c]] for c in cand]],
                dtype=np.float64,
            )
            diff = gathered - qmat64[qi][None, :]
            ed = np.sqrt((diff * diff).sum(axis=1))
            kk2 = min(k, len(cand))
            order_q = sorted(range(len(cand)), key=lambda i: (ed[i], ids[cand[i]]))[:kk2]
            for i in order_q:
                rows.append((qids[qi], ids[cand[i]], float(ed[i])))
        return pd.DataFrame(rows, columns=["qid", id_col, dist_col])
    kk = min(k, n)
    sidx = np.argpartition(d2, kk - 1, axis=1)[:, :kk]
    sel = np.take_along_axis(d2, sidx, axis=1)
    parts = pd.DataFrame(
        {
            "qid": np.repeat(qids, kk),
            id_col: ids[sidx.ravel()],
            dist_col: sel.ravel().astype(np.float64),
        }
    )
    order = np.lexsort(
        (parts[id_col].to_numpy(), parts[dist_col].to_numpy(), parts["qid"].to_numpy())
    )
    return parts.iloc[order].reset_index(drop=True)


# Margin multiplier for the certified float32 coarse-scan error bound.
# The worst-case γ-bound for the non-negative-term L2 expansion GROWS
# with dimension — (D + 8)·2⁻²⁴ (cast of qw/wa2/wb2 to float32, the GEMV
# summation, and the 3 expansion adds, each bounded by the running
# non-negative magnitude) — so the coefficient is computed from the
# corpus D at refresh() (r13, ADVICE medium: a constant tuned to D=128
# undersizes the envelope at 2048/4096-d and can silently drop true
# top-k rows). 12× matches the margin the old D=128 constant carried.
_SQ_F32_MARGIN = 12.0


def _topk_tie_aware(np, ids, d, k: int):
    """(ids, dists) of the k smallest by (dist, id): distance ties break
    by id deterministically. Partitioning at both m-1 and m puts the k-th
    and (k+1)-th order statistics in sorted position, so the common
    no-boundary-tie case needs only an m-element lexsort; only when the
    boundary actually ties does the full widening pass
    (``d <= kth`` scan) run."""
    n = len(ids)
    m = min(k, n)
    if m < n:
        # ONE introselect pass at m: positions [:m] hold the m smallest,
        # position m is the (m+1)-th order statistic in sorted place
        idx = d.argpartition(m)
        head = idx[:m]
        kth = d[head].max()
        if d[idx[m]] > kth:
            sel = head
        else:
            sel = np.nonzero(d <= kth)[0]
        ids, d = ids[sel], d[sel]
    order = np.lexsort((ids, d))[:m]
    return ids[order], d[order].astype(np.float64)


class SqReplicaHandle:
    """Pre-resolved single-query path over the SQ uint8 tier (the
    quantized sibling of ``IvfReplicaHandle``/``BqReplicaHandle``; same
    refresh() staleness contract). Resolution goes through
    :func:`sq_replica_serve`'s own cache, so the code tier and model are
    bit-identical to the batch path's.

    r12 two-phase scan: the coarse pass widens uint8→float32 (half the
    cast cost of float64 — the cast, not the GEMV, dominated the r11
    profile) and keeps a CERTIFIED error envelope per row
    (``_err32 = _SQ_F32_MARGIN·(D+8)·2⁻²⁴`` × the sum of the non-negative term
    magnitudes — every term is ≥0, so absolute float32 error is bounded
    by the envelope with a ~12× margin over the worst-case γ₁₂₈ bound).
    Rows whose envelope-lowered distance can reach the k-th
    envelope-raised distance are recomputed with the EXACT float64
    expansion in the batch path's op order, so the returned (ids, dists)
    are bit-identical to a full float64 scan — the envelope only decides
    *which* rows get the exact treatment, never the output values.

    Latency economics (measured at 100K×128): ~4-5 ms/query coarse+refine
    (was ~7 with the full float64 widening; values unchanged). SQ remains
    the CAPACITY tier (4× corpus per node); latency-sensitive
    single-query traffic belongs on the IVF handle (~0.1 ms) or BQ
    (~1.2 ms), with this tier serving batched/offline reads."""

    __slots__ = (
        "_paths", "_id_col", "_np", "_chunk", "ids", "codes", "minv", "s",
        "s2", "wa2", "_wa2_32", "_err32",
    )

    def __init__(self, shard_paths: list[str], *, id_col: str = "vec_id", chunk_rows: int = 1024):
        import numpy as np

        # chunk_rows sets the float64 EXACT-path chunk geometry only
        # (phase 2 recomputes candidates in these absolute blocks — see
        # _exact_rows); the float32 coarse pass is a single fused einsum
        # and needs no scratch
        self._np = np
        self._paths = list(shard_paths)
        self._id_col = id_col
        self._chunk = chunk_rows
        self.refresh()

    def refresh(self) -> None:
        import pandas as pd

        np = self._np
        sq_replica_serve(
            self._paths, pd.DataFrame({"qid": [], "qvec": []}), k=1, id_col=self._id_col
        )
        entry = _SQ_REPLICA_CACHE[(tuple(sorted(self._paths)), self._id_col)]
        _, self.ids, self.codes, self.minv, self.s, self.wa2 = entry
        self._finish_derived()

    def _finish_derived(self) -> None:
        """Fields derived from (codes, s, wa2) — shared by refresh() and
        load_index() so the certified-envelope coefficient can never
        diverge between a built and a loaded handle."""
        np = self._np
        self.s2 = self.s * self.s
        self._wa2_32 = self.wa2.astype(np.float32)
        # dimension-dependent certified coefficient (see _SQ_F32_MARGIN)
        d_dim = int(self.codes.shape[1]) if self.codes.ndim == 2 else 0
        self._err32 = np.float32(_SQ_F32_MARGIN * (d_dim + 8) * 2.0 ** -24)

    def save_index(self, out_dir: str) -> None:
        """Persist the SQ tier (ids, uint8 codes, per-dim min/scale, row
        norms) as ``sq_index.npz`` — warm-start family contract (see
        ``IvfReplicaHandle.save_index``); derived certified-scan fields
        are recomputed at load through the same helper refresh() uses."""
        import json
        import os as _os

        np = self._np
        _os.makedirs(out_dir, exist_ok=True)
        meta = {
            "id_col": self._id_col, "chunk": int(self._chunk),
            "stat_key": [
                [p, _os.stat(p).st_mtime_ns, _os.stat(p).st_size]
                for p in sorted(self._paths)
            ],
        }
        # unique tmp per process: concurrent savers must not share one
        # tmp path (see IvfReplicaHandle.save_index)
        tmp = _os.path.join(out_dir, f"sq_index.npz.tmp.{_os.getpid()}")
        with open(tmp, "wb") as fh:
            np.savez(fh, ids=self.ids, codes=self.codes, minv=self.minv,
                     s=self.s, wa2=self.wa2,
                     meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8))
        _os.replace(tmp, _os.path.join(out_dir, "sq_index.npz"))

    @classmethod
    def load_index(cls, in_dir: str):
        """Reconstitute from :meth:`save_index` output without reading
        parquet; ``refresh()`` still works (shard set preserved).
        Freshness vs live shards is the caller's job (``meta['stat_key']``)."""
        import json
        import os as _os

        import numpy as np

        with np.load(
            _os.path.join(in_dir, "sq_index.npz"), allow_pickle=True
        ) as z:
            meta = json.loads(bytes(z["meta"].tobytes()).decode())
            ids, codes, minv, s, wa2 = z["ids"], z["codes"], z["minv"], z["s"], z["wa2"]
        self = object.__new__(cls)
        self._np = np
        self._paths = [p for p, _m, _s in meta["stat_key"]]
        self._id_col = meta["id_col"]
        self._chunk = meta["chunk"]
        self.ids, self.codes, self.minv, self.s, self.wa2 = ids, codes, minv, s, wa2
        self._finish_derived()
        return self

    def _exact_rows(self, rows, qw, wb2: float):
        """Float64 L2-expansion distances for a row subset, recomputed IN
        THE ORIGINAL CHUNK GEOMETRY: every candidate's GEMV runs over its
        full ``self._chunk``-aligned block, so shapes/slices equal a full
        float64 chunked scan and results are bit-identical BY CONSTRUCTION
        (BLAS dgemv picks shape-dependent reduction kernels — a gathered
        (C,D) matrix measured 1-ulp cross-term flips vs the same rows
        inside a (chunk,D) block, amplified ~50 ulps by the expansion's
        cancellation on near-duplicate rows)."""
        np = self._np
        n = len(self.ids)
        chunk = self._chunk
        if isinstance(rows, slice):
            cross = np.empty(n, np.float64)
            for lo in range(0, n, chunk):
                hi = min(lo + chunk, n)
                cross[lo:hi] = self.codes[lo:hi].astype(np.float64) @ qw
            wa2 = self.wa2
        else:
            cross = np.empty(len(rows), np.float64)
            for b in np.unique(rows // chunk):
                lo = int(b) * chunk
                hi = min(lo + chunk, n)
                blk = self.codes[lo:hi].astype(np.float64) @ qw
                mask = (rows >= lo) & (rows < hi)
                cross[mask] = blk[rows[mask] - lo]
            wa2 = self.wa2[rows]
        d2 = cross
        d2 *= -2.0
        d2 += wa2
        d2 += wb2
        np.maximum(d2, 0.0, out=d2)
        np.sqrt(d2, out=d2)
        return d2

    def search_one(self, qvec, k: int = 10):
        """Coarse SQ-L2 top-k for ONE query, distances identical to the
        batch path (float32 coarse scan certifies a candidate superset;
        candidates are recomputed with the batch path's exact float64
        expansion)."""
        np = self._np
        q = np.asarray(qvec, dtype=np.float64)
        scale = self.s * 255.0
        qc = np.floor(np.clip((q - self.minv) / scale * 255.0, 0.0, 255.0))
        qw = qc * self.s2
        wb2 = float((qc * qc * self.s2).sum())
        n = len(self.ids)
        m = min(k, n)
        if m == 0:
            return _topk_tie_aware(np, self.ids[:0], np.empty(0, np.float64), k)
        if n <= 4 * k or n <= 2048:
            # tiny tier: phase-1 bookkeeping costs more than the scan
            return _topk_tie_aware(
                np, self.ids, self._exact_rows(slice(None), qw, wb2), k
            )
        # phase 1: float32 coarse scan. einsum with a cast-dtype FUSES the
        # uint8→float32 widening into the dot's own buffered pass — one
        # read of the 12.8 MB code matrix instead of writing+re-reading a
        # 51 MB float image (the widen-then-GEMV loop measured 5.1 ms vs
        # 3.8 here, and it degraded faster under co-tenant cache
        # pressure). Coarse summation order is free to differ from BLAS:
        # the certified envelope below bounds ANY order.
        # scratch is allocated per call (3 × n float32 — small next to
        # the scan cost): handles are served from concurrent REST threads,
        # and shared preallocated buffers corrupted each other's envelopes
        # under reentrancy (r13, ADVICE low)
        qw32 = qw.astype(np.float32)
        codes = self.codes
        cross = np.empty(n, np.float32)
        np.einsum(
            "ij,j->i", codes, qw32, out=cross,
            dtype=np.float32, casting="unsafe",
        )
        # error envelope: every expansion term is non-negative, so
        # |d2_f32 − d2_f64| ≤ _err32 · (wa2 + 2·cross + wb2)
        env = np.empty(n, np.float32)
        np.multiply(cross, np.float32(2.0), out=env)
        env += self._wa2_32
        env += np.float32(wb2)
        env *= self._err32
        # d2_f32 in place of cross
        d2c = cross
        d2c *= np.float32(-2.0)
        d2c += self._wa2_32
        d2c += np.float32(wb2)
        # certified superset: rows whose lower bound reaches the k-th
        # smallest upper bound (boundary ties included by ≤); one
        # preallocated buffer serves as upper bounds, then (scrambled by
        # the in-place introselect — order is irrelevant past the k-th
        # statistic) is overwritten with the lower bounds
        upper = np.empty(n, np.float32)
        np.add(d2c, env, out=upper)
        upper.partition(m - 1)
        tau = upper[m - 1]
        np.subtract(d2c, env, out=upper)  # reuse: now the lower bounds
        cand = np.flatnonzero(upper <= tau)
        # phase 2: exact float64 recompute of the candidates only
        return _topk_tie_aware(np, self.ids[cand], self._exact_rows(cand, qw, wb2), k)


class PqReplicaHandle:
    """Pre-resolved single-query path over the PQ code tier (ADC:
    per-subspace LUT + code gathers). Same refresh() contract; resolution
    through :func:`pq_replica_serve`'s cache so codebooks/codes match the
    batch path bit-for-bit.

    Latency economics (measured at 100K×128, M=16): ~4 ms/query — M/2
    fancy-index gathers over FUSED uint16 pair codes per call (r11: two
    adjacent subspaces share one 64K-entry pair LUT, built per query as
    an outer sum of the two 256-entry tables — 256 KB, L2-resident —
    halving the gather passes; measured 6.4 → 3.9 ms vs the per-subspace
    loop, distances equal within float32 re-association). The
    subspace-major contiguous copy already bought 4-5× vs strided
    columns; batching amortizes to the ~1.4-2.4 ms/q bench row. Like SQ
    this is a capacity tier; bench publishes its batch row only."""

    __slots__ = (
        "_paths", "_kw", "_np", "ids", "codes_t", "books", "books_sq", "_fused",
    )

    def __init__(
        self,
        shard_paths: list[str],
        num_subspaces: int = 16,
        num_centroids: int = 256,
        *,
        id_col: str = "vec_id",
    ):
        import numpy as np

        self._np = np
        self._paths = list(shard_paths)
        self._kw = dict(num_subspaces=num_subspaces, num_centroids=num_centroids, id_col=id_col)
        self.refresh()

    def refresh(self) -> None:
        import pandas as pd

        pq_replica_serve(
            self._paths, pd.DataFrame({"qid": [], "qvec": []}), k=1, **self._kw
        )
        ck = (
            tuple(sorted(self._paths)), self._kw["id_col"],
            self._kw["num_subspaces"], self._kw["num_centroids"],
        )
        np = self._np
        _, self.ids, codes, self.books = _PQ_REPLICA_CACHE[ck]
        # subspace-major contiguous copy: the ADC loop gathers one
        # subspace's column per pass, and a strided (n, M) column walk
        # measured 4-5× slower than contiguous rows
        self.codes_t = np.ascontiguousarray(codes.T)
        self._finish_derived()

    def _finish_derived(self) -> None:
        """Fields derived from (codes_t, books) — shared by refresh() and
        load_index() so the fused-pair gather layout can never diverge
        between a built and a loaded handle."""
        np = self._np
        self.books_sq = (self.books * self.books).sum(2)
        # fused uint16 pair codes (same total bytes as codes_t): feeds the
        # pair-LUT gather path when M is even and K² fits uint16
        m, kc, _ = self.books.shape
        if m % 2 == 0 and kc * kc <= 65536:
            self._fused = np.ascontiguousarray(
                self.codes_t[0::2].astype(np.uint16) * kc
                + self.codes_t[1::2].astype(np.uint16)
            )
        else:
            self._fused = None

    def save_index(self, out_dir: str) -> None:
        """Persist the PQ code tier (ids, subspace-major uint8 codes,
        codebooks) as ``pq_index.npz`` — completing the warm-start family
        contract across every serving handle (IVF / IVF-PQ / SQ / BQ /
        PQ; see ``IvfReplicaHandle.save_index``). The shard stat key
        rides along for the caller's freshness check."""
        import json
        import os as _os

        np = self._np
        _os.makedirs(out_dir, exist_ok=True)
        meta = {
            "kw": dict(self._kw),
            "stat_key": [
                [p, _os.stat(p).st_mtime_ns, _os.stat(p).st_size]
                for p in sorted(self._paths)
            ],
        }
        # unique tmp per process: concurrent savers must not share one
        # tmp path (see IvfReplicaHandle.save_index)
        tmp = _os.path.join(out_dir, f"pq_index.npz.tmp.{_os.getpid()}")
        with open(tmp, "wb") as fh:
            np.savez(fh, ids=self.ids, codes_t=self.codes_t, books=self.books,
                     meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8))
        _os.replace(tmp, _os.path.join(out_dir, "pq_index.npz"))

    @classmethod
    def load_index(cls, in_dir: str):
        """Reconstitute from :meth:`save_index` output without reading
        parquet; ``refresh()`` still works (shard set preserved).
        Freshness vs live shards is the caller's job (``meta['stat_key']``)."""
        import json
        import os as _os

        import numpy as np

        with np.load(
            _os.path.join(in_dir, "pq_index.npz"), allow_pickle=True
        ) as z:
            meta = json.loads(bytes(z["meta"].tobytes()).decode())
            ids, codes_t, books = z["ids"], z["codes_t"], z["books"]
        self = object.__new__(cls)
        self._np = np
        self._paths = [p for p, _m, _s in meta["stat_key"]]
        self._kw = meta["kw"]
        self.ids, self.codes_t, self.books = ids, codes_t, books
        self._finish_derived()
        return self

    def search_one(self, qvec, k: int = 10):
        """Coarse ADC top-k for ONE query: one (M, K) LUT, then M/2
        gathers over fused uint16 pair codes against per-pair outer-sum
        LUTs (or the per-subspace M-gather loop when fusing is off).
        Distances equal the batch path within float32 re-association
        (pairwise instead of sequential subspace adds)."""
        np = self._np
        m, kc, subd = self.books.shape
        q = np.asarray(qvec, dtype=np.float32)
        qsub = q.reshape(m, subd)
        lut = (
            (qsub * qsub).sum(1)[:, None]
            + self.books_sq
            - 2.0 * np.einsum("ms,mks->mk", qsub, self.books)
        )
        acc = np.zeros(len(self.ids), dtype=np.float32)
        if self._fused is not None:
            for p in range(m // 2):
                lut2 = (lut[2 * p][:, None] + lut[2 * p + 1][None, :]).ravel()
                acc += lut2[self._fused[p]]
        else:
            for mi in range(m):
                acc += lut[mi][self.codes_t[mi]]
        np.maximum(acc, 0.0, out=acc)
        np.sqrt(acc, out=acc)
        return _topk_tie_aware(np, self.ids, acc, k)
