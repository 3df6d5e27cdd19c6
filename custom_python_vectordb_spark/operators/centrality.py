"""Graph centrality: fixed-iteration PageRank as a pure DataFrame plan.

The reference's graph layer ranks nodes only by degree (``graph.py``
adjacency indexes; `degree_top` here). PageRank is the standard next step
for a 100 TB graph and maps cleanly onto Spark: each iteration is one
join (rank/outdegree contribution along edges) + one aggregation keyed by
destination — the same shuffle pattern as the min-label-propagation
connected components (`operators/components.py`).

Determinism/oracle story: the iteration count is FIXED (unrolled), so the
whole computation is a static plan both engines can state — the DuckDB
oracle is the same K iterations written as chained (non-recursive) CTEs.
Convention (matched EXACTLY on both sides, simplified-dangling variant):

    pr_0(v)     = 1/N
    pr_{i+1}(v) = (1-d)/N + d · Σ_{u→v} pr_i(u) / outdeg(u)

Dangling-node mass (sinks) is dropped rather than redistributed — the
common simplified formulation; both engines implement the same equation,
so results value-hash-match.

At scale: edges pre-partitioned by src make the contribution join
co-located; the per-iteration aggregate combines map-side; lineage is
truncated every few iterations (localCheckpoint) exactly like BFS in
`operators/graph.py`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(id, pr) after `iterations` synchronous PageRank steps."""
    # ids / edges-with-outdeg are reused by EVERY iteration: persist once,
    # or each iteration's plan re-derives the multi-table union scan and the
    # lineage grows multiplicatively (measured 38 s → ~3 s at sf0.01)
    ids = nodes.select(F.col(id_col).alias("id")).distinct().persist()
    n = ids.count()  # one tiny job; the scalar parameterizes the plan — and warms the persist
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ew = e.join(outdeg, "src").persist()

    pr = ids.withColumn("pr", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for _ in range(iterations):
        contrib = (
            ew.join(pr.withColumnRenamed("id", "src"), "src")
            .select(F.col("dst").alias("id"), (F.col("pr") / F.col("outdeg")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("inflow"))
        )
        pr = (
            ids.join(contrib, "id", "left")
            .select(
                "id",
                (F.lit(base) + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))).alias("pr"),
            )
            # one small eager checkpoint per iteration bounds lineage to a
            # single step (the BFS convention in operators/graph.py)
            .localCheckpoint(eager=True)
        )
    # the final pr is already materialized (eager checkpoint), so the
    # iteration inputs can be released instead of leaking cache per call
    ids.unpersist()
    ew.unpersist()
    return pr


def duck_pagerank_sql(
    n_expr: str = "(SELECT COUNT(DISTINCT id) FROM nodes)",
    iterations: int = 5,
    damping: float = 0.85,
) -> str:
    """The SAME K unrolled iterations as chained DuckDB CTEs, over `nodes`
    (id) / `edges` (src, dst) CTEs the caller provides. Yields CTE text
    defining `pr{iterations}`; embed after the graph CTEs."""
    parts = [
        f"nn AS (SELECT CAST({n_expr} AS DOUBLE) AS n)",
        "odeg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src)",
        "pr0 AS (SELECT DISTINCT id, 1.0 / (SELECT n FROM nn) AS pr FROM nodes)",
    ]
    for i in range(iterations):
        parts.append(
            f"""pr{i + 1} AS (
    SELECT a.id,
           (1 - {damping}) / (SELECT n FROM nn)
           + {damping} * COALESCE(SUM(p.pr / o.outdeg), 0) AS pr
    FROM (SELECT DISTINCT id FROM nodes) a
    LEFT JOIN edges e ON e.dst = a.id
    LEFT JOIN pr{i} p ON p.id = e.src
    LEFT JOIN odeg o ON o.src = e.src
    GROUP BY a.id
)"""
        )
    return ",\n".join(parts)
