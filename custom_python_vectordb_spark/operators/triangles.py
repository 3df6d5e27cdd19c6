"""Triangle counting over an undirected edge table, degree-ordered.

Triangles (3-cliques) are the basic graph-cohesion statistic (clustering
coefficients, community strength, spam/bot subgraph detection).  The naive
count — three-way self-join with ``a < b < c`` — is correct and is what the
DuckDB oracle states, but at scale its wedge step explodes on hubs: a node
of degree d contributes d² wedge rows, so one celebrity node dominates the
whole shuffle.

The standard fix (node-iterator++ / the Cohen MapReduce algorithm): rank
nodes by (degree, id) and orient every undirected edge from the
lower-ranked to the higher-ranked endpoint.  Each triangle then has exactly
ONE vertex with two outgoing oriented edges, so counting (wedge from u) ⋈
(closing oriented edge) counts each triangle exactly once — and every
out-neighborhood is provably O(√m), so no hub ever produces a quadratic
wedge set.  Same answer as the naive join, skew-bounded plan.

Reference parity note: the reference's graph layer (``graph.py``) has no
triangle/cohesion analytics — this is additive pipeline surface, like
PageRank (operators/centrality.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triangle_count(edges: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Count triangles in the undirected simple graph given as distinct
    edges (one row per edge; endpoint order irrelevant, self-loops must be
    absent).  Returns one row: (n_edges, n_triangles).

    Plan shape: one degree aggregation, one re-orientation projection, a
    wedge self-join on src (out-degrees are O(√m) after orientation), and
    a closing semi-join — three shuffles total, none skewed.
    """
    e = edges.select(F.col(a).alias("u"), F.col(b).alias("v")).filter(
        F.col("u") != F.col("v")
    )
    deg = (
        e.select(F.col("u").alias("n"))
        .unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # orient low-rank → high-rank, rank = (deg, id)
    du = deg.select(F.col("n").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("deg").alias("dv"))
    ranked = e.join(du, "u").join(dv, "v")
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ranked.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("ddeg"),
    )
    o1 = oriented.select("src", F.col("dst").alias("w1"), F.col("ddeg").alias("d1"))
    o2 = oriented.select("src", F.col("dst").alias("w2"), F.col("ddeg").alias("d2"))
    wedges = o1.join(o2, "src").filter(
        (F.col("d1") < F.col("d2"))
        | ((F.col("d1") == F.col("d2")) & (F.col("w1") < F.col("w2")))
    )
    # inner join: edges are distinct, so each wedge closes at most once
    closed = wedges.join(
        oriented.select(F.col("src").alias("w1"), F.col("dst").alias("w2")),
        ["w1", "w2"],
    )
    n_edges = e.select(F.count(F.lit(1)).alias("n_edges"))
    n_tri = closed.select(F.count(F.lit(1)).alias("n_triangles"))
    return n_edges.crossJoin(n_tri)
