"""Quantization queries (SURVEY.md §7 phase 4): SQ / BQ / PQ training aggs,
encode/decode, quantized distances, two-stage rerank, recall harness."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from custom_python_vectordb_spark.operators.quantization import (
    bq_encode_expr,
    bq_train,
    hamming_bits_expr,
    pq_adc_distances,
    pq_encode,
    pq_lut,
    pq_sample_codebook,
    pq_train_kmeans,
    pq_train_lloyd,
    quantized_rerank,
    sq_encode,
    sq_l2_dist_expr,
    sq_dot_dist_expr,
    sq_model,
    sq_train,
)
from custom_python_vectordb_spark.operators.topk import top_k_per_group
from custom_python_vectordb_spark.queries.spine import ROUND, _query_vectors, _t
from custom_python_vectordb_spark.registry import query
from custom_python_vectordb_spark.functions.local_relation import local_df

DIM = 64
M = 8          # PQ subspaces
KCENT = 16     # PQ sample-codebook centroids
SUB = DIM // M

# shared oracle CTEs ------------------------------------------------------
DUCK_EXPL = f"""
dims AS (SELECT CAST(unnest(range({DIM})) AS INTEGER) AS dim),
expl AS (SELECT e.vec_id, d.dim, CAST(e.embedding[d.dim + 1] AS DOUBLE) AS v
         FROM embeddings e, dims d)"""

DUCK_SQ_STATS = """
stats AS (SELECT dim, MIN(v) AS min_val, MAX(v) AS max_val,
                 CASE WHEN MAX(v) - MIN(v) = 0 THEN 1.0 ELSE MAX(v) - MIN(v) END AS scale
          FROM expl GROUP BY dim)"""

DUCK_SQ_CODES = """
codes AS (SELECT e.vec_id, e.dim,
                 CAST(floor(least(greatest((e.v - s.min_val) / s.scale * 255.0, 0.0), 255.0)) AS INTEGER) AS code
          FROM expl e JOIN stats s USING (dim))"""


@query("sq_train", f"""
WITH {DUCK_EXPL.strip()}, {DUCK_SQ_STATS.strip()}
SELECT dim, ROUND(min_val, {ROUND}) AS min_val, ROUND(max_val, {ROUND}) AS max_val,
       ROUND(scale, {ROUND}) AS scale
FROM stats
""")
def sq_train_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sq_train(_t(spark, sf_dir, "embeddings")).select(
        "dim",
        F.round("min_val", ROUND).alias("min_val"),
        F.round("max_val", ROUND).alias("max_val"),
        F.round("scale", ROUND).alias("scale"),
    )


@query("sq_encode", f"""
WITH {DUCK_EXPL.strip()}, {DUCK_SQ_STATS.strip()}, {DUCK_SQ_CODES.strip()}
SELECT vec_id, dim, code FROM codes WHERE vec_id < 3
""")
def sq_encode_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    model = sq_model(emb)
    coded = sq_encode(emb.filter(F.col("vec_id") < 3), model)
    return coded.select("vec_id", F.posexplode("codes").alias("dim", "code"))


@query("sq_roundtrip", f"""
WITH {DUCK_EXPL.strip()}, {DUCK_SQ_STATS.strip()}, {DUCK_SQ_CODES.strip()},
err AS (SELECT abs(e.v - (c.code / 255.0 * s.scale + s.min_val)) AS ae
        FROM expl e JOIN codes c ON e.vec_id = c.vec_id AND e.dim = c.dim
        JOIN stats s ON s.dim = e.dim)
SELECT ROUND(MAX(ae), {ROUND}) AS max_abs_err, ROUND(AVG(ae), {ROUND}) AS avg_abs_err FROM err
""")
def sq_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1+E2 — encode→decode reconstruction error bounds (byte-integrity
    analog of the reference's round-trip suite, test_comprehensive.py:538-548)."""
    from custom_python_vectordb_spark.operators.quantization import sq_decode_expr

    emb = _t(spark, sf_dir, "embeddings")
    coded = sq_encode(emb, sq_model(emb)).withColumn("recon", sq_decode_expr("codes"))
    err = coded.select(
        F.explode(F.zip_with("embedding", "recon", lambda a, b: F.abs(a.cast("double") - b))).alias("ae")
    )
    return err.agg(
        F.round(F.max("ae"), ROUND).alias("max_abs_err"),
        F.round(F.avg("ae"), ROUND).alias("avg_abs_err"),
    )


_DUCK_SQL2 = """
qcodes AS (SELECT vec_id AS qid, dim, code FROM codes WHERE vec_id < 3),
sqd AS (SELECT q.qid, c.vec_id,
               sqrt(SUM(POW((q.code - c.code) * s.scale / 255.0, 2))) AS dist
        FROM qcodes q
        JOIN codes c ON q.dim = c.dim
        JOIN stats s ON s.dim = q.dim
        GROUP BY q.qid, c.vec_id)"""


def _sq_views(spark: SparkSession, sf_dir: str):
    """Memoized SQ index state (model + coded table) — ingest-time views,
    same discipline as the IVF/LSH/gram views (sources/corpus_view.py).
    The DuckDB oracles retrain/re-encode from raw parquet, so the train
    and encode math stays fully correctness-covered."""
    from custom_python_vectordb_spark.sources.corpus_view import (
        sq_coded_view,
        sq_model_view,
    )

    return sq_model_view(spark, sf_dir), sq_coded_view(spark, sf_dir)


@query("knn_sq_l2", f"""
WITH {DUCK_EXPL.strip()}, {DUCK_SQ_STATS.strip()}, {DUCK_SQ_CODES.strip()}, {_DUCK_SQL2.strip()}
SELECT qid, vec_id, ROUND(dist, {ROUND}) + 0.0 AS dist FROM (
    SELECT qid, vec_id, dist,
           row_number() OVER (PARTITION BY qid ORDER BY dist, vec_id) AS rn FROM sqd
) WHERE rn <= 10 ORDER BY qid, dist, vec_id
""")
def knn_sq_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 — approximate L2 entirely on uint8 codes (read from the coded
    index view; queries are corpus rows, so their codes are the same
    table filtered)."""
    model, coded_full = _sq_views(spark, sf_dir)
    coded = coded_full.select("vec_id", "codes")
    qcoded = coded.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("codes").alias("qcodes")
    )
    scored = (
        coded.join(F.broadcast(qcoded))
        .crossJoin(F.broadcast(model))
        .select("qid", "vec_id", sq_l2_dist_expr("qcodes", "codes").alias("dist"))
    )
    out = top_k_per_group(scored, "qid", 10, F.col("dist").asc(), F.col("vec_id").asc())
    return out.withColumn("dist", F.round("dist", ROUND) + F.lit(0.0)).orderBy("qid", "dist", "vec_id")


@query("knn_sq_dot", f"""
WITH {DUCK_EXPL.strip()}, {DUCK_SQ_STATS.strip()}, {DUCK_SQ_CODES.strip()},
rec AS (SELECT c.vec_id, c.dim, c.code / 255.0 * s.scale + s.min_val AS r
        FROM codes c JOIN stats s USING (dim)),
qrec AS (SELECT vec_id AS qid, dim, r FROM rec WHERE vec_id < 3),
sqd AS (SELECT q.qid, c.vec_id, -SUM(q.r * c.r) AS dist
        FROM qrec q JOIN rec c ON q.dim = c.dim GROUP BY q.qid, c.vec_id)
SELECT qid, vec_id, ROUND(dist, {ROUND}) + 0.0 AS dist FROM (
    SELECT qid, vec_id, dist,
           row_number() OVER (PARTITION BY qid ORDER BY dist, vec_id) AS rn FROM sqd
) WHERE rn <= 10 ORDER BY qid, dist, vec_id
""")
def knn_sq_dot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6 — reconstruct-then-dot on codes (coded index view)."""
    model, coded_full = _sq_views(spark, sf_dir)
    coded = coded_full.select("vec_id", "codes")
    qcoded = coded.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("codes").alias("qcodes")
    )
    scored = (
        coded.join(F.broadcast(qcoded))
        .crossJoin(F.broadcast(model))
        .select("qid", "vec_id", sq_dot_dist_expr("qcodes", "codes").alias("dist"))
    )
    out = top_k_per_group(scored, "qid", 10, F.col("dist").asc(), F.col("vec_id").asc())
    return out.withColumn("dist", F.round("dist", ROUND) + F.lit(0.0)).orderBy("qid", "dist", "vec_id")


@query("bq_train", f"""
WITH {DUCK_EXPL.strip()}
SELECT dim, ROUND(median(v), {ROUND}) AS threshold FROM expl GROUP BY dim
""")
def bq_train_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — per-dimension median thresholds."""
    emb = _t(spark, sf_dir, "embeddings")
    return (
        emb.select(F.posexplode("embedding").alias("dim", "v"))
        .groupBy("dim")
        .agg(F.round(F.median("v"), ROUND).alias("threshold"))
    )


@query("knn_hamming", f"""
WITH {DUCK_EXPL.strip()},
th AS (SELECT dim, median(v) AS t FROM expl GROUP BY dim),
bits AS (SELECT e.vec_id, e.dim, CASE WHEN e.v > th.t THEN 1 ELSE 0 END AS b
         FROM expl e JOIN th USING (dim)),
qbits AS (SELECT vec_id AS qid, dim, b FROM bits WHERE vec_id < 3),
hd AS (SELECT q.qid, c.vec_id, CAST(SUM(CASE WHEN q.b <> c.b THEN 1 ELSE 0 END) AS BIGINT) AS dist
       FROM qbits q JOIN bits c ON q.dim = c.dim GROUP BY q.qid, c.vec_id)
SELECT qid, vec_id, dist FROM (
    SELECT qid, vec_id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, vec_id) AS rn FROM hd
) WHERE rn <= 10 ORDER BY qid, dist, vec_id
""")
def knn_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 + D4 — binary-quantize (median thresholds) then Hamming top-k;
    bits read from the BQ index view (E3 is the ingest-time storage
    tier), queries are the same table filtered."""
    from custom_python_vectordb_spark.sources.corpus_view import bq_bits_view

    bits = bq_bits_view(spark, sf_dir)
    qbits = bits.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("bits").alias("qb")
    )
    scored = bits.join(F.broadcast(qbits)).select(
        "qid", "vec_id", hamming_bits_expr("qb", "bits").alias("dist")
    )
    return top_k_per_group(scored, "qid", 10, F.col("dist").asc(), F.col("vec_id").asc()).orderBy(
        "qid", "dist", "vec_id"
    )


# PQ: deterministic sample codebook (code c = subvector of vec_id c) -------
_DUCK_PQ_CB = f"""
subs AS (SELECT CAST(unnest(range({M})) AS INTEGER) AS m),
cbd AS (SELECT s.m, e.vec_id AS code, d.dim AS dl,
               CAST(e.embedding[s.m * {SUB} + d.dim + 1] AS DOUBLE) AS cv
        FROM embeddings e, subs s, (SELECT CAST(unnest(range({SUB})) AS INTEGER) AS dim) d
        WHERE e.vec_id < {KCENT}),
vsub AS (SELECT e.vec_id, s.m, d.dim AS dl,
                CAST(e.embedding[s.m * {SUB} + d.dim + 1] AS DOUBLE) AS v
         FROM embeddings e, subs s, (SELECT CAST(unnest(range({SUB})) AS INTEGER) AS dim) d),
pqd AS (SELECT v.vec_id, v.m, c.code, SUM(POW(v.v - c.cv, 2)) AS d2
        FROM vsub v JOIN cbd c ON v.m = c.m AND v.dl = c.dl
        GROUP BY v.vec_id, v.m, c.code),
pqcodes AS (SELECT vec_id, m, code FROM (
    SELECT vec_id, m, code, row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, code) AS rn
    FROM pqd) WHERE rn = 1)"""


@query("pq_encode", f"""
WITH {_DUCK_PQ_CB.strip()}
SELECT vec_id, m, code FROM pqcodes WHERE vec_id < 20
""")
def pq_encode_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 — nearest-centroid codes, deterministic sample codebook."""
    emb = _t(spark, sf_dir, "embeddings")
    cb = pq_sample_codebook(emb, M, KCENT)
    return pq_encode(emb.filter(F.col("vec_id") < 20), cb, M)


@query("knn_pq_adc", f"""
WITH {_DUCK_PQ_CB.strip()},
qsub AS (SELECT m, dl, v FROM vsub WHERE vec_id = 0),
lut AS (SELECT q.m, c.code, SUM(POW(q.v - c.cv, 2)) AS d2
        FROM qsub q JOIN cbd c ON q.m = c.m AND q.dl = c.dl GROUP BY q.m, c.code),
adc AS (SELECT p.vec_id, sqrt(SUM(l.d2)) AS dist
        FROM pqcodes p JOIN lut l ON p.m = l.m AND p.code = l.code GROUP BY p.vec_id)
SELECT vec_id, ROUND(dist, {ROUND}) + 0.0 AS dist FROM adc
ORDER BY dist, vec_id LIMIT 10
""")
def knn_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D7 — asymmetric PQ distance via broadcast lookup table."""
    emb = _t(spark, sf_dir, "embeddings")
    cb = pq_sample_codebook(emb, M, KCENT)
    codes = pq_encode(emb, cb, M)
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    lut = pq_lut(qv, cb, M)
    out = pq_adc_distances(codes, lut)
    return (
        out.withColumn("dist", F.round("dist", ROUND) + F.lit(0.0))
        .orderBy("dist", "vec_id")
        .limit(10)
    )


@query("knn_sq_rerank", f"""
WITH {DUCK_EXPL.strip()}, {DUCK_SQ_STATS.strip()}, {DUCK_SQ_CODES.strip()}, {_DUCK_SQL2.strip()},
cands AS (SELECT qid, vec_id FROM (
    SELECT qid, vec_id, row_number() OVER (PARTITION BY qid ORDER BY dist, vec_id) AS rn FROM sqd
) WHERE rn <= 50),
exact AS (SELECT c.qid, c.vec_id,
                 sqrt(SUM(POW(qe.v - ce.v, 2))) AS dist
          FROM cands c
          JOIN expl qe ON qe.vec_id = c.qid
          JOIN expl ce ON ce.vec_id = c.vec_id AND ce.dim = qe.dim
          GROUP BY c.qid, c.vec_id)
SELECT qid, vec_id, ROUND(dist, {ROUND}) + 0.0 AS dist FROM (
    SELECT qid, vec_id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist, vec_id) AS rn
    FROM exact
) WHERE rn <= 10 ORDER BY qid, dist, vec_id
""")
def knn_sq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5 — quantized coarse scan (50 candidates) → exact L2 rerank →
    top-10, coarse codes read from the coded index view."""
    emb = _t(spark, sf_dir, "embeddings")
    model, coded = _sq_views(spark, sf_dir)
    out = quantized_rerank(
        emb, _query_vectors(spark, sf_dir, 3), model, k=10, candidates=50,
        metric="l2", coded_corpus=coded,
    )
    return out.withColumn("dist", F.round("dist", ROUND) + F.lit(0.0))


@query("recall_sq_vs_exact", f"""
WITH {DUCK_EXPL.strip()}, {DUCK_SQ_STATS.strip()}, {DUCK_SQ_CODES.strip()}, {_DUCK_SQL2.strip()},
approx AS (SELECT qid, vec_id FROM (
    SELECT qid, vec_id, row_number() OVER (PARTITION BY qid ORDER BY dist, vec_id) AS rn FROM sqd
) WHERE rn <= 10),
exd AS (SELECT q.vec_id AS qid, c.vec_id, sqrt(SUM(POW(q.v - c.v, 2))) AS dist
        FROM expl q JOIN expl c ON q.dim = c.dim
        WHERE q.vec_id < 3 GROUP BY q.vec_id, c.vec_id),
truth AS (SELECT qid, vec_id FROM (
    SELECT qid, vec_id, row_number() OVER (PARTITION BY qid ORDER BY dist, vec_id) AS rn FROM exd
) WHERE rn <= 10),
hits AS (SELECT t.qid, COUNT(*) AS n FROM truth t JOIN approx a ON t.qid = a.qid AND t.vec_id = a.vec_id
         GROUP BY t.qid)
SELECT ROUND(AVG(n) / 10.0, {ROUND}) AS avg_recall FROM hits
""")
def recall_sq_vs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12 — recall@10 of the SQ-coded ranking vs exact L2 ground truth
    (the reference's quality gate, benchmark_quantization.py:874-928)."""
    from custom_python_vectordb_spark.operators.knn import knn

    emb = _t(spark, sf_dir, "embeddings")
    model = sq_model(emb)
    queries = _query_vectors(spark, sf_dir, 3)
    coded = sq_encode(emb, model).select("vec_id", "codes")
    qcoded = (
        sq_encode(emb.filter(F.col("vec_id") < 3), model)
        .select(F.col("vec_id").alias("qid"), F.col("codes").alias("qcodes"))
    )
    approx = top_k_per_group(
        coded.join(F.broadcast(qcoded))
        .crossJoin(F.broadcast(model))
        .select("qid", "vec_id", sq_l2_dist_expr("qcodes", "codes").alias("dist")),
        "qid", 10, F.col("dist").asc(), F.col("vec_id").asc(),
    ).select("qid", "vec_id")
    truth = knn(emb, queries, k=10, metric="l2").select("qid", "vec_id")
    # approx is k·|queries| rows BY CONSTRUCTION (top-k per query) at any
    # corpus scale, but the planner can't see through the rank window and
    # falls back to a SortMergeJoin (2 exchanges + sorts); the explicit
    # hint makes the bounded side broadcast (r13 plan audit, guide §3.1)
    hits = truth.join(F.broadcast(approx), ["qid", "vec_id"]).groupBy("qid").agg(F.count(F.lit(1)).alias("n"))
    return hits.agg(F.round(F.avg("n") / 10.0, ROUND).alias("avg_recall"))


@query("knn_ivfpq", f"""
WITH {_DUCK_PQ_CB.strip()},
cents AS (SELECT CAST(vec_id - 200 AS INTEGER) AS cluster, CAST(embedding AS DOUBLE[]) AS cv
          FROM embeddings WHERE vec_id BETWEEN 200 AND 207),
asgn AS (SELECT vec_id, cluster FROM (
    SELECT e.vec_id, c.cluster,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), c.cv), c.cluster) AS rn
    FROM embeddings e, cents c
) WHERE rn = 1),
qsub AS (SELECT m, dl, v FROM vsub WHERE vec_id = 0),
qprobe AS (SELECT cluster FROM (
    SELECT c.cluster,
           row_number() OVER (ORDER BY list_distance(
               (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0), c.cv), c.cluster) AS rn
    FROM cents c
) WHERE rn <= 2),
lut AS (SELECT q.m, c.code, SUM(POW(q.v - c.cv, 2)) AS d2
        FROM qsub q JOIN cbd c ON q.m = c.m AND q.dl = c.dl GROUP BY q.m, c.code),
cand AS (SELECT a.vec_id FROM asgn a JOIN qprobe p ON a.cluster = p.cluster),
adc AS (SELECT p.vec_id, sqrt(SUM(l.d2)) AS dist
        FROM pqcodes p JOIN cand USING (vec_id) JOIN lut l ON p.m = l.m AND p.code = l.code
        GROUP BY p.vec_id)
SELECT vec_id, ROUND(dist, {ROUND}) + 0.0 AS dist FROM adc
ORDER BY dist, vec_id LIMIT 10
""")
def knn_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC — the classic composed accelerator: coarse IVF cells prune
    the corpus (scan ≈ nprobe/n_cells), PQ lookup-table distances score the
    surviving candidates in O(M) each. At 100 TB: corpus partitioned by
    cluster, codes table 16× smaller than vectors, LUT broadcast."""
    from custom_python_vectordb_spark.operators.similarity import with_ivf_cluster

    from custom_python_vectordb_spark.queries.pipeline import _emb_rows_local, _ivf_cents_local

    emb = _t(spark, sf_dir, "embeddings")
    # centroids + query vector as VALUES local relations (collected once,
    # memoized per sf) — a persisted table subtree still costs a broadcast
    # materialization job per reuse; the codebook subtree stays persisted
    cents = _ivf_cents_local(spark, sf_dir)
    qv = _emb_rows_local(spark, sf_dir, 0, 0, "qid", "qvec").select("qvec")
    cb = pq_sample_codebook(emb, M, KCENT).persist()

    qprobe = (
        qv.crossJoin(F.broadcast(cents))
        .select("cluster",
                F.aggregate(F.zip_with(F.col("cvec"), F.col("qvec"),
                                       lambda a, b: (a.cast("double") - b.cast("double")) * (a.cast("double") - b.cast("double"))),
                            F.lit(0.0), lambda acc, x: acc + x).alias("d2"))
        .orderBy("d2", "cluster").limit(2).select("cluster")
    )
    # ONE full corpus scan: map-only cluster assignment carries the embedding
    # through the probe filter straight into encoding — no join-back, no
    # second scan (round-1 plan re-scanned embeddings ~6×)
    cand_emb = (
        with_ivf_cluster(emb, cents)
        .join(F.broadcast(qprobe), "cluster")
        .select("vec_id", "embedding")
    )
    codes = pq_encode(cand_emb, cb, M)
    lut = pq_lut(qv, cb, M)
    out = pq_adc_distances(codes, lut)
    return (
        out.withColumn("dist", F.round("dist", ROUND) + F.lit(0.0))
        .orderBy("dist", "vec_id")
        .limit(10)
    )


def _pq_kmeans_recall_oracle() -> str:
    """Snapshot oracle for A6 (the embed_mock trick applied to k-means):
    k-means training is not SQL-expressible but IS bit-deterministic
    across session configs (r14: the deterministic driver-side Lloyd
    kernel — RNG-free, hash-stride sample, id-sorted matrix; verified
    local[4]/7 shuffle partitions vs local[32]/32 produce identical
    centroids), so the trained sf0.01
    codebook is FROZEN as literals (`_pq_snapshot.py`) and DuckDB
    independently recomputes everything downstream of training — per-
    subspace argmin encoding (squared L2, lowest code wins ties), the
    query LUT, ADC distances, the exact-L2 top-10, and the recall@10
    intersection. A pytest retrains and asserts snapshot equality, so
    codebook drift fails locally and loudly, never at the driver gate."""
    from custom_python_vectordb_spark.queries._pq_snapshot import PQ_CENTROIDS_SF001

    vals = ", ".join(
        "({}, {}, [{}]::DOUBLE[])".format(m, code, ", ".join(repr(x) for x in c))
        for m, code, c in PQ_CENTROIDS_SF001
    )
    return f"""
WITH cb(m, code, c) AS (VALUES {vals}),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
ms AS (SELECT CAST(unnest(range(0, {M})) AS INTEGER) AS m),
sub AS (SELECT e.vec_id, ms.m, e.v[ms.m * 8 + 1 : ms.m * 8 + 8] AS sv FROM e, ms),
asgn AS (
  SELECT vec_id, m, code FROM (
    SELECT s.vec_id, s.m, cb.code,
           ROW_NUMBER() OVER (
               PARTITION BY s.vec_id, s.m
               ORDER BY list_sum(list_transform(range(1, 9),
                                 i -> (list_extract(s.sv, i) - list_extract(cb.c, i)) * (list_extract(s.sv, i) - list_extract(cb.c, i)))),
                        cb.code) AS rn
    FROM sub s JOIN cb ON cb.m = s.m
  ) WHERE rn = 1
),
q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
qsub AS (SELECT ms.m, q.qv[ms.m * 8 + 1 : ms.m * 8 + 8] AS sv FROM q, ms),
lut AS (
  SELECT qs.m, cb.code,
         list_sum(list_transform(range(1, 9),
                  i -> (list_extract(qs.sv, i) - list_extract(cb.c, i)) * (list_extract(qs.sv, i) - list_extract(cb.c, i)))) AS d2
  FROM qsub qs JOIN cb ON cb.m = qs.m
),
adc AS (
  SELECT a.vec_id, sqrt(SUM(l.d2)) AS dist
  FROM asgn a JOIN lut l USING (m, code) GROUP BY a.vec_id
),
approx AS (SELECT vec_id FROM adc ORDER BY dist, vec_id LIMIT 10),
truth AS (
  SELECT vec_id FROM (SELECT e.vec_id, list_distance(e.v, q.qv) AS d FROM e, q)
  ORDER BY d, vec_id LIMIT 10
)
SELECT ROUND(CAST(COUNT(*) AS DOUBLE) / 10.0, 6) + 0.0 AS recall
FROM truth JOIN approx USING (vec_id)
"""


@query("pq_kmeans_recall", _pq_kmeans_recall_oracle, oracle_sf="sf0.01")
def pq_kmeans_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained-PQ recall@10 of ADC ranking vs exact L2 for one query,
    fully oracle-checked via the frozen-codebook snapshot (see
    `_pq_kmeans_recall_oracle`). r14 (the round's one sanctioned
    declared-output change, VERDICT r13 #4): training switched from M
    per-subspace MLlib fits — each fit maxIter distributed passes over
    the corpus, ~80 jobs, 8.6-9.2 s — to the deterministic driver-side
    Lloyd kernel on a bounded hash-stride sample (`pq_train_lloyd`, ONE
    collect + NumPy), and the snapshot oracle was re-frozen from the new
    codebook. The quality bar is asserted in tests."""
    from custom_python_vectordb_spark.operators.knn import knn

    emb = _t(spark, sf_dir, "embeddings")
    cb = pq_train_lloyd(emb, M, KCENT, iters=10)
    codes = pq_encode(emb, cb, M)
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    lut = pq_lut(qv, cb, M)
    approx = pq_adc_distances(codes, lut).orderBy("dist", "vec_id").limit(10).select("vec_id")
    queries = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    truth = knn(emb, queries, k=10, metric="l2").select("vec_id")
    n_hit = truth.join(approx, "vec_id").count()
    return local_df(spark, [(round(float(n_hit) / 10.0, 6) + 0.0,)], "recall double")
