"""Scale-strategy tests: the plans and layouts we rely on at 100 TB,
demonstrated and asserted at test scale.

- IVF-partitioned corpus layout: writing the corpus partitioned by cluster
  id makes probing prune whole partitions (PartitionFilters in the scan).
- Salted join/count: equal results to the plain plans.
- Global top-k uses TakeOrderedAndProject (partial per-partition select).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from custom_python_vectordb_spark.operators.similarity import ivf_assign
from custom_python_vectordb_spark.operators.skew import salted_count, salted_join
from custom_python_vectordb_spark.plans.explain import plan_of
from custom_python_vectordb_spark.sources.catalog import load_table


def test_ivf_partitioned_layout_prunes(spark, sf_small, tmp_path):
    emb = load_table(spark, sf_small, "embeddings")
    cents = emb.filter(F.col("vec_id").between(200, 207)).select(
        (F.col("vec_id") - 200).cast("int").alias("cluster"), F.col("embedding").alias("cvec")
    )
    assigned = emb.join(ivf_assign(emb, cents), "vec_id")
    path = str(tmp_path / "ivf_corpus")
    assigned.write.partitionBy("cluster").parquet(path)

    probed = spark.read.parquet(path).filter(F.col("cluster").isin(1, 3))
    plan = plan_of(probed)
    assert "PartitionFilters" in plan and "cluster" in plan.split("PartitionFilters")[1][:120]
    # pruned read returns exactly the two cells
    expect = assigned.filter(F.col("cluster").isin(1, 3)).count()
    assert probed.count() == expect > 0


def test_salted_join_equals_plain(spark, sf_small):
    li = load_table(spark, sf_small, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_small, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    plain = li.join(part, "l_partkey").groupBy("p_brand").count()
    salted = salted_join(li, part, "l_partkey", salts=4).groupBy("p_brand").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_count_equals_plain(spark, sf_small):
    ev = load_table(spark, sf_small, "events")
    plain = {r["event_type"]: r["count"] for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("count")).collect()}
    salted = {r["event_type"]: r["count"] for r in salted_count(ev, "event_type", salts=4).collect()}
    assert plain == salted


def test_global_topk_is_take_ordered(spark, sf_small):
    li = load_table(spark, sf_small, "lineitem")
    df = li.orderBy(F.col("l_extendedprice").desc()).limit(5)
    assert "TakeOrderedAndProject" in plan_of(df)


def test_batch_knn_at_reference_scale(spark, sf_small):
    """Reference-scale probe: 100K-vector corpus (offset-union derived),
    1000-query GEMM batch. The baseline's comparable is 1.66 ms/query
    (batch GEMM at 100K, BASELINE.md); assert a generous ceiling so the
    test stays robust on slower machines while catching regressions to the
    per-pair expression path (~50 ms/q)."""
    import time

    from custom_python_vectordb_spark.operators.knn import knn_batch_gemm

    emb = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    parts = [
        emb.select((F.col("vec_id") + F.lit(i * 2000)).alias("vec_id"), "embedding")
        for i in range(50)
    ]
    corpus = parts[0]
    for p in parts[1:]:
        corpus = corpus.union(p)
    corpus = corpus.repartition(16).cache()
    assert corpus.count() == 100_000
    qpd = (
        emb.filter(F.col("vec_id") < 1000)
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
        .toPandas()
    )
    knn_batch_gemm(corpus, qpd, k=10).count()  # warm
    t0 = time.time()
    n = knn_batch_gemm(corpus, qpd, k=10).count()
    dt = time.time() - t0
    corpus.unpersist()
    assert n == 10_000
    assert dt / 1000 * 1000 < 10.0, f"{dt:.2f}s for 1000 queries (> 10 ms/q)"


def test_bulk_insert_throughput_at_reference_scale(spark, tmp_path):
    """Baseline comparable: bulk insert 36,354 vec/s at 100K (BASELINE.md).
    Writing 100K vectors to Parquet measures our bulk-ingest path; assert a
    conservative floor (measured ~48K vec/s on local[8-32])."""
    import time

    emb = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    parts = [
        emb.select((F.col("vec_id") + F.lit(i * 2000)).alias("vec_id"), "embedding")
        for i in range(50)
    ]
    corpus = parts[0]
    for p in parts[1:]:
        corpus = corpus.union(p)
    corpus = corpus.repartition(16).cache()
    corpus.count()
    t0 = time.time()
    corpus.write.parquet(str(tmp_path / "bulk"))
    rate = 100_000 / (time.time() - t0)
    corpus.unpersist()
    assert rate > 10_000, f"bulk insert only {rate:,.0f} vec/s"
