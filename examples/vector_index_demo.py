"""Vector-index lifecycle end to end: stream vectors into the
cell-partitioned IVF layout, run a partition-pruned search over it, then
serve a small batch from the in-process replica — the three tiers of the
same index (build stream, distributed search, serving node).

    python examples/vector_index_demo.py [sf_dir]
"""

from __future__ import annotations

import glob
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from custom_python_vectordb_spark.operators.knn import knn_replica_serve
from custom_python_vectordb_spark.operators.similarity import knn_ivf_pruned
from custom_python_vectordb_spark.plans.explain import plan_of
from custom_python_vectordb_spark.session import get_spark
from custom_python_vectordb_spark.sources.catalog import load_table
from custom_python_vectordb_spark.streaming.vector_index import (
    load_ivf_layout,
    maintain_ivf_layout,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("vector-index-demo")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="vector_index_demo_")

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = emb.filter(F.col("vec_id").between(200, 207)).select(
        (F.col("vec_id") - 200).cast("int").alias("cluster"),
        F.col("embedding").alias("cvec"),
    ).cache()

    # 1. BUILD: stream the vectors in as two micro-batches
    src = os.path.join(work, "arrivals")
    half = emb.count() // 2
    emb.filter(F.col("vec_id") < half).coalesce(1).write.parquet(src)
    emb.filter(F.col("vec_id") >= half).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    layout = os.path.join(work, "ivf_layout")
    q = (
        maintain_ivf_layout(stream, cents, layout)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    print(f"layout rows: {load_ivf_layout(spark, layout).count()} "
          f"(cells: {len(glob.glob(os.path.join(layout, 'cluster=*')))})")

    # 2. SEARCH: partition-pruned IVF over the maintained layout
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    pruned = knn_ivf_pruned(spark, layout, queries, cents, k=5, nprobe=2)
    hits = pruned.collect()
    print(f"pruned search: {len(hits)} hits; first: qid={hits[0]['qid']} "
          f"vec_id={hits[0]['vec_id']} dist={hits[0]['dist']:.4f}")
    pf = [l.strip() for l in plan_of(pruned).splitlines() if "PartitionFilters" in l]
    print(f"plan prunes cells: {pf[0][:100]}..." if pf else "no PartitionFilters!")

    # 3. SERVE: small batch answered by the in-process replica of the
    # SAME layout files (re-decoded automatically if a shard changes)
    shards = sorted(glob.glob(os.path.join(layout, "cluster=*", "batch_id=*", "*.parquet")))
    qpd = queries.toPandas()
    knn_replica_serve(shards, qpd, k=5)  # warm: decode once
    t0 = time.perf_counter()
    served = knn_replica_serve(shards, qpd, k=5)
    ms = (time.perf_counter() - t0) * 1000 / len(qpd)
    print(f"replica serve: {len(served)} rows at {ms:.2f} ms/query over {len(shards)} shard files")

    spark.stop()


if __name__ == "__main__":
    main()
