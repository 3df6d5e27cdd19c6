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


def test_sql_fast_path_bit_identical(pairs_df):
    """Plain-name operands emit a one-shot F.expr SQL string (r10 build-cost
    fix); Column operands keep the lambda path. Same Catalyst nodes, same
    fold order — results must be BIT-identical, not approx-equal, including
    the zero-vector guard rows."""
    from custom_python_vectordb_spark.functions.distances import (
        cosine_distance_prenormed,
        cosine_similarity,
        l2_norm,
        sq_l2_distance,
    )

    df, _ = pairs_df
    # add zero-vector rows to exercise the denom guard on both paths
    zdf = df.sparkSession.createDataFrame(
        [(100, [0.0] * 16, [1.0] * 16), (101, [0.0] * 16, [0.0] * 16)],
        "id long, a array<float>, b array<float>",
    )
    full = df.unionByName(zdf)
    kernels = [
        ("dot", dot_product),
        ("cos", cosine_distance),
        ("sim", cosine_similarity),
        ("l2", l2_distance),
        ("sq", sq_l2_distance),
        ("ip", dot_distance),
    ]
    sql_cols, col_cols = [], []
    for tag, fn in kernels:
        sql_col = fn("a", "b")
        col_col = fn(F.col("a"), F.col("b"))  # Column operand -> lambda path
        sql_cols.append(sql_col.alias(f"s_{tag}"))
        col_cols.append(col_col.alias(f"c_{tag}"))
    sql_cols.append(l2_norm("a").alias("s_norm"))
    col_cols.append(l2_norm(F.col("a")).alias("c_norm"))
    rows = full.select("id", *sql_cols, *col_cols).collect()
    for r in rows:
        for tag in ("dot", "cos", "sim", "l2", "sq", "ip", "norm"):
            assert r[f"s_{tag}"] == r[f"c_{tag}"], (r["id"], tag)

    # prenormed twin: names vs Columns, incl. zero norms
    withn = full.select(
        "id", "a", "b",
        l2_norm("a").alias("na"), l2_norm("b").alias("nb"),
    )
    rows = withn.select(
        "id",
        cosine_distance_prenormed("a", "b", "na", "nb").alias("s"),
        cosine_distance_prenormed(
            F.col("a"), F.col("b"), F.col("na"), F.col("nb")
        ).alias("c"),
    ).collect()
    for r in rows:
        assert r["s"] == r["c"], r["id"]

    # normalize: element-wise bit equality
    rows = full.select(
        "id",
        l2_normalize("a").alias("s"),
        l2_normalize(F.col("a")).alias("c"),
    ).collect()
    for r in rows:
        assert r["s"] == r["c"], r["id"]


def test_hamming_sql_fast_path(spark):
    df = spark.createDataFrame(
        [(0, [0b1010, 0b1111], [0b0110, 0b1111]), (1, [0, 0], [-1, 0])],
        "id long, a array<long>, b array<long>",
    )
    rows = df.select(
        hamming_distance("a", "b").alias("s"),
        hamming_distance(F.col("a"), F.col("b")).alias("c"),
    ).collect()
    for r in rows:
        assert r["s"] == r["c"]
