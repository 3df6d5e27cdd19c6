"""Bucketed collections: the pay-shuffle-once-at-ingest co-location path.

The assertion style mirrors tests/test_plans.py — the *physical plan* is the
contract: a join or aggregation on the bucket key over bucketed collections
must contain NO shuffle exchange. At 100 TB that is the difference between a
metadata-only plan and re-shuffling the corpus on every query.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from custom_python_vectordb_spark.sources.warehouse import Warehouse


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path))


def test_bucketed_join_has_no_shuffle(spark, wh):
    a = spark.range(2000).select("id", (F.col("id") % 7).alias("x"))
    b = spark.range(2000).select("id", (F.col("id") * 2).alias("y"))
    wh.save_bucketed("bkt_a", a, key="id", buckets=8)
    wh.save_bucketed("bkt_b", b, key="id", buckets=8)
    ta, tb = wh.load_bucketed("bkt_a"), wh.load_bucketed("bkt_b")

    # force sort-merge (broadcast would trivially avoid the exchange too,
    # but SMJ is the plan shape that survives when both sides are huge)
    joined = ta.hint("merge").join(tb, "id")
    assert "Exchange" not in _plan(joined), _plan(joined)
    assert joined.count() == 2000

    # same guarantee for aggregation on the bucket key
    agg = ta.groupBy("id").agg(F.sum("x").alias("sx"))
    assert "Exchange" not in _plan(agg), _plan(agg)
    assert agg.count() == 2000


def test_bucketed_join_correctness_matches_unbucketed(spark, wh):
    a = spark.range(500).select("id", (F.col("id") % 5).alias("x"))
    b = spark.range(0, 500, 2).select("id", (F.col("id") + 1).alias("y"))
    wh.save_bucketed("bkt_c", a, key="id", buckets=4)
    wh.save_bucketed("bkt_d", b, key="id", buckets=4)
    got = {
        (r["id"], r["x"], r["y"])
        for r in wh.load_bucketed("bkt_c").join(wh.load_bucketed("bkt_d"), "id").collect()
    }
    want = {(r["id"], r["x"], r["y"]) for r in a.join(b, "id").collect()}
    assert got == want and len(want) == 250


def test_unbucketed_same_join_does_shuffle(spark, wh):
    """Control: the exact same SMJ over plain parquet saves DOES exchange —
    proving the bucketed plan's absence of Exchange comes from the bucket
    spec, not from some session setting."""
    a = spark.range(2000).select("id", (F.col("id") % 7).alias("x"))
    b = spark.range(2000).select("id", (F.col("id") * 2).alias("y"))
    wh.save("plain_a", a)
    wh.save("plain_b", b)
    joined = wh.load("plain_a").hint("merge").join(wh.load("plain_b"), "id")
    assert "Exchange" in _plan(joined)
