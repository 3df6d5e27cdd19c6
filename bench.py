"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Methodology mirrors BASELINE.md's comparability note: one warm-up execution
per query (JVM/codegen/parquet-footer warm), then one timed execution —
batch-amortized throughput, not cold-start job latency.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    # vector search (the reference's core): exact kNN, filtered, quantized, rerank
    "knn_cosine",
    "knn_batch",
    "knn_batch_1k",
    "knn_l2",
    "knn_filtered",
    "knn_sq_l2",
    "knn_sq_rerank",
    "knn_ivf",
    # text / hybrid
    "bm25_topk",
    "hybrid_fusion",
    # analytics
    "pricing_summary",
    "top_customers",
    "shipping_priority",
    "regional_volume",
    "asof_join_purchase_view",
    "agg_events_by_type",
    "agg_orders_year_status",
    # graph
    "graph_degree_top",
    "graph_pattern_2hop",
    "graph_semantic_search",
    # pipeline
    "dedup_lsh_pairs",
    "text_quality",
    "events_session_window",
]


VEC100K_ROWS = 100_000
VEC100K_DIM = 128


VEC100K_SHARDS = 32


def _ensure_vec100k(path: str) -> None:
    """Deterministic 100K×128d float32 corpus (seeded PCG64 — bit-identical
    across runs/machines), written once. Exists so the batch-kNN gate is
    measured at the REFERENCE's own scale (BASELINE.md: 100K×128d, batch
    GEMM 1.66 ms/query) instead of the sf0.1 embeddings table (2K rows).

    Written as 32 part files so the scan parallelizes across local[32] —
    a single 51 MB file is one input split under maxPartitionBytes=128M,
    which would serialize the whole GEMM onto one core."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    done = os.path.join(path, "_DONE")
    if os.path.exists(done):
        return
    os.makedirs(path, exist_ok=True)
    rng = np.random.default_rng(42)
    mat = rng.standard_normal((VEC100K_ROWS, VEC100K_DIM), dtype=np.float32)
    rows_per = VEC100K_ROWS // VEC100K_SHARDS
    for s in range(VEC100K_SHARDS):
        lo, hi = s * rows_per, (s + 1) * rows_per
        tbl = pa.table({
            "vec_id": pa.array(np.arange(lo, hi, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat[lo:hi].reshape(-1)), VEC100K_DIM
            ).cast(pa.list_(pa.float32())),
        })
        pq.write_table(tbl, os.path.join(path, f"part-{s:05d}.parquet"), row_group_size=rows_per)
    with open(done, "w") as fh:
        fh.write("ok\n")


def _bench_knn_100k(spark) -> dict[str, float]:
    """Warm batch-amortized ms/query on the 100K corpus, at the reference's
    20-query batch (its GEMM methodology) and at 1000 queries."""
    from custom_python_vectordb_spark.operators.knn import knn_batch_gemm

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench", "vec100k_128d")
    _ensure_vec100k(path)
    # the reference's GEMM benchmark scores an in-RAM matrix; persisting the
    # scanned corpus is the comparable setup (decode parquet once, not per
    # run). 16 partitions: fewer/larger Arrow batches amortize the Python
    # round-trip better than 32 tiny tasks (measured), still >1 task/2 cores
    corpus = spark.read.parquet(path).coalesce(16).persist()
    qpd = (
        corpus.filter("vec_id < 1000")
        .selectExpr("vec_id as qid", "embedding as qvec")
        .toPandas()
    )
    out: dict[str, float] = {}
    for label, nq in (("knn_batch20_100k_ms_per_query", 20), ("knn_batch1k_100k_ms_per_query", 1000)):
        sub = qpd.iloc[:nq]
        knn_batch_gemm(corpus, sub, k=10, dtype="float32").collect()  # warm
        t0 = time.perf_counter()
        rows = knn_batch_gemm(corpus, sub, k=10, dtype="float32").collect()
        assert len(rows) == nq * 10
        out[label] = round((time.perf_counter() - t0) * 1000 / nq, 3)
    corpus.unpersist()
    return out


def main() -> None:
    # one BLAS thread per Python worker: 32 concurrent tasks × multi-threaded
    # OpenBLAS oversubscribes the box and *slows* the GEMM; workers inherit
    # this env through the JVM
    for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")

    from custom_python_vectordb_spark import registry
    from custom_python_vectordb_spark.session import get_spark

    registry.load_all()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in HEADLINE if n in registry.QUERIES]
    timings: dict[str, float] = {}
    for name in names:
        fn = registry.QUERIES[name]
        fn(spark, sf_dir).collect()  # warm-up: JIT, codegen cache, file listing
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    out = {
        "metric": "headline_queries_total_warm",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if "knn_batch" in timings:
        # the baseline's comparable: batch-amortized ms/query (BASELINE.md)
        out["knn_batch_amortized_ms_per_query"] = round(timings["knn_batch"] * 1000 / 100, 3)
    if "knn_batch_1k" in timings and sf == "0.1":
        out["knn_batch_1k_amortized_ms_per_query"] = round(timings["knn_batch_1k"], 3)  # 1000 q
    # reference-scale gate: 100K×128d corpus, vs BASELINE batch GEMM 1.66 ms/q
    out.update(_bench_knn_100k(spark))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
