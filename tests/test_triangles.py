"""Degree-ordered triangle counting: known closed-form graphs + equivalence
with the naive three-way join."""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from custom_python_vectordb_spark.operators.triangles import triangle_count


def _edges_df(spark, pairs):
    return spark.createDataFrame([(int(a), int(b)) for a, b in pairs], "a long, b long")


def test_complete_graph(spark):
    # K6: C(6,3) = 20 triangles, C(6,2) = 15 edges
    row = triangle_count(_edges_df(spark, combinations(range(6), 2))).collect()[0]
    assert (row["n_edges"], row["n_triangles"]) == (15, 20)


def test_triangle_free_graphs(spark):
    path = _edges_df(spark, [(i, i + 1) for i in range(10)])
    assert triangle_count(path).collect()[0]["n_triangles"] == 0
    # complete bipartite K3,3 — dense but triangle-free
    k33 = _edges_df(spark, [(i, 10 + j) for i in range(3) for j in range(3)])
    assert triangle_count(k33).collect()[0]["n_triangles"] == 0


def test_hub_with_one_closure(spark):
    # star with a hub (worst case for naive wedge counting) plus one rim
    # edge → exactly 1 triangle regardless of hub degree
    star = [(0, i) for i in range(1, 50)] + [(1, 2)]
    row = triangle_count(_edges_df(spark, star)).collect()[0]
    assert (row["n_edges"], row["n_triangles"]) == (50, 1)


def test_matches_naive_join_on_random_graph(spark):
    # deterministic pseudo-random graph; naive a<b<c three-way join as oracle
    pairs = sorted(
        {
            tuple(sorted(((7 * i * i + 3 * i) % 40, (11 * i + 5) % 40)))
            for i in range(300)
        }
    )
    pairs = [(a, b) for a, b in pairs if a != b]
    e = _edges_df(spark, pairs)
    got = triangle_count(e).collect()[0]
    e1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
    naive = e1.join(e2, "y").join(e3, ["x", "z"]).count()
    assert got["n_triangles"] == naive
    assert got["n_edges"] == len(pairs)
