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


def main() -> None:
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
    print(json.dumps(out))


if __name__ == "__main__":
    main()
