"""Connected components via iterative min-label propagation.

The missing piece between near-dup *pairs* (operators/dedup.py) and a
usable dedup decision: transitive grouping — if A≈B and B≈C, all three are
one duplicate cluster, keep one representative. GraphFrames ships this;
here it is a driver loop of joins (no dependency):

    label(v) ← min(label(v), min over neighbors(label(u)))   until fixpoint

Each iteration is one join + groupBy on the (small) pair graph; the label
domain shrinks monotonically, so convergence takes ≤ diameter iterations —
near-dup clusters are tiny and dense, so 2-4 in practice. The loop is
bounded (`max_iter`) and checks the fixpoint with a count.

Scale: the input is the VERIFIED near-dup pair list (linear in the number
of duplicates, not corpus size); label propagation shuffles only that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    max_iter: int = 10,
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """(id, component) for every id in `pairs`; component = min id reachable.
    `pairs` is an undirected edge list (a, b)."""
    sym = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .unionByName(pairs.select(F.col(b_col).alias("u"), F.col(a_col).alias("v")))
        .distinct()
    )
    sym = sym.localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels.withColumnRenamed("id", "v"), "v")
            .groupBy(F.col("u").alias("id"))
            .agg(F.min("component").alias("nmin"))
        )
        # carry the previous label through the checkpoint so the fixpoint
        # check is a filter over the already-materialized rows — the former
        # shape re-joined new labels against old labels every iteration,
        # one extra shuffle + job per round for a comparison the row
        # already knows (r13)
        new_labels = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.col("component").alias("old_c"),
                F.least(F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))).alias("component"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = new_labels.filter(F.col("component") != F.col("old_c")).count()
        labels = new_labels.select("id", "component")
        if changed == 0:
            break
    return labels


def dedup_clusters(pairs: DataFrame, a_col: str = "a", b_col: str = "b") -> DataFrame:
    """(component, size, keeper): duplicate clusters from verified pairs;
    keeper = min id (the row a dedup pass retains)."""
    cc = connected_components(pairs, a_col=a_col, b_col=b_col)
    return (
        cc.groupBy("component")
        .agg(F.count(F.lit(1)).alias("size"), F.min("id").alias("keeper"))
        .withColumnRenamed("component", "cluster")
    )
