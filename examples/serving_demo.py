"""The serving-tier story in one script: the same shard files answered by
every tier — exact in-RAM replica, filtered (NumPy mask), ANN (IVF
replica), quantized (uint8 codes + exact rerank from the disk-resident
mmap float tier), beyond-RAM (mmap), keyword BM25, hybrid fusion, and
MMR — each with its measured per-query latency, all with Spark as the
build/maintenance path.

    python examples/serving_demo.py
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from custom_python_vectordb_spark.api import VectorDB
from custom_python_vectordb_spark.functions.filters import Filter
from custom_python_vectordb_spark.session import get_spark


def timed(label, fn, n=3):
    fn()  # warm (decode / index build)
    best = min(
        (lambda t0: (fn(), time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(n)
    )
    print(f"{label:34s} {best * 1000:8.2f} ms")
    return best


def main() -> None:
    spark = get_spark("serving-demo")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="vdb_serving_")
    db = VectorDB(spark, root)
    kb = db.create_collection("kb", dimensions=64, overwrite=True)
    texts = [
        "spark shuffles data between executors",
        "broadcast joins avoid shuffling the fact table",
        "hash joins build a table on the smaller side",
        "sort merge joins need both sides sorted",
        "the quick brown fox jumps over the lazy dog",
        "adaptive query execution replans at runtime",
    ]
    kb.add_texts(
        [(f"d{i}", t) for i, t in enumerate(texts)],
        category={f"d{i}": ("eng" if i < 4 else "misc") for i in range(6)},
    )

    q = ["join strategies in spark"]
    print("== every serving tier over the SAME shard files ==")
    timed("exact replica (query_serve)", lambda: kb.query_serve(query_texts=q, n_results=3))
    timed(
        "filtered replica (NumPy mask)",
        lambda: kb.query_serve(
            query_texts=q, n_results=3, where=Filter.where("category", "eq", "eng")
        ),
    )
    timed("ANN / IVF replica (ann_serve)", lambda: kb.ann_serve(query_texts=q, n_results=3))
    timed("keyword BM25 replica", lambda: kb.keyword_serve("join strategies", k=3))
    timed("hybrid fusion replica", lambda: kb.hybrid_serve("join strategies", k=3))

    # operator-level tiers on the raw shards
    from custom_python_vectordb_spark.operators.knn import knn_replica_serve
    from custom_python_vectordb_spark.operators.mmr import mmr_replica_serve
    from custom_python_vectordb_spark.operators.quantization import sq_replica_serve

    import pandas as pd

    paths = db.warehouse.shard_paths("kb")

    from custom_python_vectordb_spark.functions.embeddings import mock_embed_one

    vec = mock_embed_one(q[0], 64).tolist()
    qpd = pd.DataFrame({"qid": [0], "qvec": [vec]})
    mmdir = tempfile.mkdtemp(prefix="vdb_mmap_")
    timed("beyond-RAM mmap replica", lambda: knn_replica_serve(paths, qpd, k=3, id_col="id", mmap_dir=mmdir))
    timed("quantized uint8 replica", lambda: sq_replica_serve(paths, qpd, k=3, id_col="id"))
    timed(
        "quantized + exact mmap rerank",
        lambda: sq_replica_serve(paths, qpd, k=3, id_col="id", fetch_k=6, rerank_mmap_dir=mmdir),
    )
    timed("MMR diversity rerank", lambda: mmr_replica_serve(paths, vec, k=3, fetch_k=6, id_col="id"))
    print("\nresults (exact):", [h["id"] for h in kb.query_serve(query_texts=q, n_results=3)[0]])
    print("results (ann):  ", [h["id"] for h in kb.ann_serve(query_texts=q, n_results=3)[0]])


if __name__ == "__main__":
    main()
