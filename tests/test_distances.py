"""Distance kernels vs NumPy ground truth."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from custom_python_vectordb_spark.functions.distances import (
    cosine_distance,
    dot_distance,
    dot_product,
    hamming_distance,
    l2_distance,
    l2_normalize,
)

RNG = np.random.RandomState(42)


@pytest.fixture(scope="module")
def pairs_df(spark):
    rows = []
    for i in range(20):
        a = RNG.randn(16).astype(np.float32)
        b = RNG.randn(16).astype(np.float32)
        rows.append((i, a.tolist(), b.tolist()))
    return spark.createDataFrame(rows, "id long, a array<float>, b array<float>"), rows


def test_kernels_match_numpy(pairs_df):
    df, rows = pairs_df
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            dot_product("a", "b").alias("dot"),
            cosine_distance("a", "b").alias("cos"),
            l2_distance("a", "b").alias("l2"),
            dot_distance("a", "b").alias("ip"),
        ).collect()
    }
    for i, a, b in rows:
        a64, b64 = np.asarray(a, dtype=np.float64), np.asarray(b, dtype=np.float64)
        assert out[i]["dot"] == pytest.approx(float(a64 @ b64), rel=1e-12)
        expect_cos = 1.0 - float(a64 @ b64) / (np.linalg.norm(a64) * np.linalg.norm(b64))
        assert out[i]["cos"] == pytest.approx(expect_cos, rel=1e-9, abs=1e-12)
        assert out[i]["l2"] == pytest.approx(float(np.linalg.norm(a64 - b64)), rel=1e-12)
        assert out[i]["ip"] == pytest.approx(float(-(a64 @ b64)), rel=1e-12)


def test_l2_normalize(pairs_df):
    df, rows = pairs_df
    got = df.select("id", l2_normalize("a").alias("n")).collect()
    for r in got:
        norm = math.sqrt(sum(x * x for x in r["n"]))
        assert norm == pytest.approx(1.0, rel=1e-9)


def test_hamming(spark):
    df = spark.createDataFrame(
        [(0, [0b1010, 0b1111], [0b0110, 0b1111]), (1, [0, 0], [-1, 0])],
        "id long, a array<long>, b array<long>",
    )
    got = {r["id"]: r["h"] for r in df.select("id", hamming_distance("a", "b").alias("h")).collect()}
    assert got[0] == 2
    assert got[1] == 64
