"""Bloom-filter join pruning: no false negatives (result identity with the
plain join), measured false-positive rate, probe stays JVM-side and before
the join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from custom_python_vectordb_spark.operators.bloom import (
    bloom_filtered_join,
    bloom_probe,
    build_bloom_mask,
)


def test_identical_to_plain_join(spark, sf_small):
    orders = spark.read.parquet(f"{sf_small}/orders.parquet")
    li = spark.read.parquet(f"{sf_small}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice"
    )
    hi = orders.filter(F.col("o_totalprice") > 400000).select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    got = sorted(
        bloom_filtered_join(li, hi, "l_orderkey").collect(),
        key=lambda r: (r["l_orderkey"], r["l_extendedprice"]),
    )
    want = sorted(
        li.join(hi, "l_orderkey").collect(),
        key=lambda r: (r["l_orderkey"], r["l_extendedprice"]),
    )
    assert got == want
    assert len(got) > 0


def test_no_false_negatives_and_low_fpr(spark):
    members = spark.range(0, 1000).select(F.col("id").alias("k"))
    mask = build_bloom_mask(members, "k", m_bits=1 << 16, k=5)
    probe = bloom_probe(F.col("k"), mask, k=5)
    # every member passes
    n_members = spark.range(0, 1000).select(F.col("id").alias("k")).filter(probe).count()
    assert n_members == 1000
    # non-members: ~65 bits/key, k=5 → fpr ≈ 2e-4; assert well under 1 %
    outsiders = spark.range(10_000, 30_000).select(F.col("id").alias("k"))
    fp = outsiders.filter(probe).count()
    assert fp / 20_000 < 0.01, fp


def test_probe_is_jvm_side_and_pre_join(spark, sf_small):
    li = spark.read.parquet(f"{sf_small}/lineitem.parquet").select("l_orderkey")
    hi = (
        spark.read.parquet(f"{sf_small}/orders.parquet")
        .filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    plan = bloom_filtered_join(li, hi, "l_orderkey")._jdf.queryExecution().executedPlan().toString()
    # the getbit probe is a plain Filter expression (whole-stage codegen),
    # not a Python eval, and sits below the join
    assert "getbit" in plan
    assert "pythonUDF" not in plan
    join_pos = max(plan.find("Join"), plan.find("join"))
    assert 0 <= join_pos < plan.find("getbit")


def test_outer_join_rejected(spark):
    df = spark.range(10).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="inner/semi"):
        bloom_filtered_join(df, df, "k", how="left")


def test_bad_mask_size_rejected(spark):
    df = spark.range(10).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="multiple of 64"):
        build_bloom_mask(df, "k", m_bits=100)
