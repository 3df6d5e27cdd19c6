"""Graph queries (SURVEY.md §7 phase 3) over the derived property-graph view.

DuckDB oracles rebuild the identical nodes/edges CTEs from the relational
tables; traversals use recursive CTEs (bounded depth, cycle check) so even
the iterative operators are value-hash-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from custom_python_vectordb_spark.functions.distances import duck_cosine_distance
from custom_python_vectordb_spark.operators.graph import (
    degree_top,
    find_nodes,
    hyperedges_with_all,
    hyperedges_with_any,
    match_2hop,
    neighbors,
    semantic_graph_search,
    shortest_path,
    traverse_paths,
)
from custom_python_vectordb_spark.queries.spine import ROUND, _t
from custom_python_vectordb_spark.registry import query
from custom_python_vectordb_spark.session import tune_session
from custom_python_vectordb_spark.sources.graph_view import (
    DUCK_EDGES,
    DUCK_MEMBERSHIP,
    DUCK_NODES,
    edges_layout_df,
    hyperedge_membership,
    nodes_df,
)

GRAPH_CTES = f"WITH {DUCK_NODES.strip()}, {DUCK_EDGES.strip()}"

# both-direction pairs, deduped (matches bfs over distinct neighbor sets)
DUCK_DPAIRS = """
dpairs AS (
    SELECT src AS frm, dst AS nxt FROM edges
    UNION
    SELECT dst AS frm, src AS nxt FROM edges
)"""

DUCK_OPAIRS = """
opairs AS (SELECT DISTINCT src AS frm, dst AS nxt FROM edges)"""


def _graph(spark: SparkSession, sf_dir: str):
    # edges come from the type-partitioned persisted layout (r12): typed
    # traversals partition-prune to the probed type's directory, untyped
    # ones read one pre-computed scan instead of the 6-branch union
    tune_session(spark)
    return nodes_df(spark, sf_dir), edges_layout_df(spark, sf_dir)


# ------------------------------------------------------------- J4 neighbors

@query("graph_neighbors", f"""
{GRAPH_CTES}, {DUCK_DPAIRS.strip()}
SELECT n.id, n.label, n.name FROM nodes n
JOIN (SELECT DISTINCT nxt FROM dpairs WHERE frm = 'c:1') x ON n.id = x.nxt
""")
def graph_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes, edges = _graph(spark, sf_dir)
    return neighbors(nodes, edges, "c:1", direction="both").select(
        "id", F.element_at("labels", 1).alias("label"), "name"
    )


@query("graph_neighbors_typed", f"""
{GRAPH_CTES}
SELECT n.id, n.name FROM nodes n
JOIN (SELECT DISTINCT dst FROM edges WHERE type = 'CONTAINS' AND src = 'o:5') x ON n.id = x.dst
""")
def graph_neighbors_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes, edges = _graph(spark, sf_dir)
    return neighbors(nodes, edges, "o:5", direction="out", edge_type="CONTAINS").select("id", "name")


# ------------------------------------------------------------- J3/P7/P8/P9

@query("graph_find_nodes", f"""
{GRAPH_CTES}
SELECT id, name FROM nodes
WHERE label = 'Customer' AND (mktsegment IS NOT NULL AND mktsegment = 'BUILDING')
""")
def graph_find_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes, _ = _graph(spark, sf_dir)
    return find_nodes(nodes, labels=["Customer"], prop_filter=F.col("mktsegment") == "BUILDING").select("id", "name")


@query("graph_prop_range", f"""
{GRAPH_CTES}
SELECT id, label, ROUND(acctbal, 2) AS acctbal FROM nodes
WHERE acctbal IS NOT NULL AND acctbal BETWEEN 500.0 AND 600.0
""")
def graph_prop_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 — property range across ALL labels holding the property (the
    reference's property index is label-agnostic, graph.py:385-402)."""
    nodes, _ = _graph(spark, sf_dir)
    return (
        find_nodes(nodes, prop_filter=F.col("acctbal").between(500.0, 600.0))
        .select("id", F.element_at("labels", 1).alias("label"), F.round("acctbal", 2).alias("acctbal"))
    )


# ------------------------------------------------------------- A9/K7 degree

@query("graph_degree_top", f"""
{GRAPH_CTES}
SELECT dst AS id, COUNT(*) AS degree FROM edges WHERE type = 'CONTAINS'
GROUP BY dst ORDER BY degree DESC, id LIMIT 10
""")
def graph_degree_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, edges = _graph(spark, sf_dir)
    return degree_top(edges, k=10, edge_type="CONTAINS", direction="in")


# ------------------------------------------------------------- J5 pattern

@query("graph_pattern_2hop", f"""
{GRAPH_CTES}
SELECT DISTINCT e1.src AS a_id, e1.dst AS b_id, e2.dst AS c_id
FROM edges e1 JOIN edges e2 ON e1.dst = e2.src
WHERE e1.type = 'PLACED' AND e2.type = 'CONTAINS'
  AND e1.src IN (SELECT id FROM nodes WHERE label = 'Customer'
                 AND mktsegment IS NOT NULL AND mktsegment = 'BUILDING')
  AND e2.dst IN (SELECT id FROM nodes WHERE label = 'Part' AND size IS NOT NULL AND size <= 5)
""")
def graph_pattern_2hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(c:Customer {mktsegment})-[:PLACED]->(o)-[:CONTAINS]->(p:Part {size})"""
    nodes, edges = _graph(spark, sf_dir)
    return match_2hop(
        nodes, edges, "PLACED", "CONTAINS",
        start_filter=F.array_contains("labels", "Customer") & F.col("mktsegment").isNotNull() & (F.col("mktsegment") == "BUILDING"),
        end_filter=F.array_contains("labels", "Part") & F.col("size").isNotNull() & (F.col("size") <= 5),
    )


# ------------------------------------------------------------- J6 traverse

@query("graph_traverse", f"""
{GRAPH_CTES.replace("WITH ", "WITH RECURSIVE ", 1)}, {DUCK_OPAIRS.strip()},
paths(path, last, depth) AS (
    SELECT ['c:1']::VARCHAR[], 'c:1', 0
    UNION ALL
    SELECT p.path || [e.nxt], e.nxt, p.depth + 1
    FROM paths p JOIN opairs e ON e.frm = p.last
    WHERE p.depth < 2 AND NOT list_contains(p.path, e.nxt)
)
SELECT array_to_string(path, '->') AS path_str, CAST(depth AS INTEGER) AS depth
FROM paths WHERE depth >= 1
""")
def graph_traverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All simple paths from c:1, out-direction, depth ≤ 2."""
    _, edges = _graph(spark, sf_dir)
    return traverse_paths(edges, "c:1", max_depth=2, direction="out").select("path_str", "depth")


# ------------------------------------------------------------- J8 shortest path

@query("graph_shortest_path", f"""
{GRAPH_CTES.replace("WITH ", "WITH RECURSIVE ", 1)}, {DUCK_OPAIRS.strip()},
paths(path, last, depth) AS (
    SELECT ['c:1']::VARCHAR[], 'c:1', 0
    UNION ALL
    SELECT p.path || [e.nxt], e.nxt, p.depth + 1
    FROM paths p JOIN opairs e ON e.frm = p.last
    WHERE p.depth < 4 AND NOT list_contains(p.path, e.nxt) AND p.last <> 'r:0'
)
SELECT array_to_string(path, '->') AS path_str, CAST(depth AS INTEGER) AS length
FROM paths WHERE last = 'r:0'
ORDER BY depth, path_str LIMIT 1
""")
def graph_shortest_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS shortest path c:1 → r:0 (deterministic refinement: lexicographic
    min among minimum-length paths)."""
    _, edges = _graph(spark, sf_dir)
    return shortest_path(edges, "c:1", "r:0", max_depth=4, direction="out")


# ------------------------------------------------------------- J7 hyperedges

@query("graph_hyperedge_any", f"""
WITH {DUCK_MEMBERSHIP.strip()}
SELECT DISTINCT hyperedge_id FROM membership WHERE node_id IN ('p:260', 'p:625')
""")
def graph_hyperedge_any(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    return hyperedges_with_any(hyperedge_membership(spark, sf_dir), ["p:260", "p:625"])


@query("graph_hyperedge_all", f"""
WITH {DUCK_MEMBERSHIP.strip()}
SELECT hyperedge_id FROM membership WHERE node_id IN ('p:260', 'p:625')
GROUP BY hyperedge_id HAVING COUNT(DISTINCT node_id) = 2
""")
def graph_hyperedge_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    return hyperedges_with_all(hyperedge_membership(spark, sf_dir), ["p:260", "p:625"])


# ------------------------------------------------------------- D8 semantic graph search

def _duck_semantic(k: int, hops_unused: int, wv: float, wg: float, label_where: str | None = None) -> str:
    cos = duck_cosine_distance("CAST(e.embedding AS DOUBLE[])", "qv.v")
    lbl = f"AND s.id IN (SELECT id FROM nodes WHERE {label_where})" if label_where else ""
    return f"""
{GRAPH_CTES}, {DUCK_DPAIRS.strip()},
qv AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 0),
sims AS (SELECT 'c:' || e.vec_id AS id, 1.0 - {cos} AS sim FROM embeddings e CROSS JOIN qv),
seeds AS (SELECT id, sim FROM sims ORDER BY sim DESC, id LIMIT {2 * k}),
maxsim AS (SELECT MAX(sim) AS m FROM seeds),
hop1 AS (
    SELECT DISTINCT p.nxt AS id FROM dpairs p JOIN seeds s ON p.frm = s.id
    WHERE p.nxt NOT IN (SELECT id FROM seeds)
),
hop2 AS (
    SELECT DISTINCT p.nxt AS id FROM dpairs p JOIN hop1 h ON p.frm = h.id
    WHERE p.nxt NOT IN (SELECT id FROM seeds) AND p.nxt NOT IN (SELECT id FROM hop1)
),
scored AS (
    SELECT id, sim AS vector_score, 0 AS graph_distance, sim AS combined_score FROM seeds
    UNION ALL SELECT id, m / 2.0, 1, {wv} * m / 2.0 + {wg} / 1.0 FROM hop1, maxsim
    UNION ALL SELECT id, m / 3.0, 2, {wv} * m / 3.0 + {wg} / 2.0 FROM hop2, maxsim
)
SELECT s.id, ROUND(s.vector_score, {ROUND}) + 0.0 AS vector_score,
       CAST(s.graph_distance AS INTEGER) AS graph_distance,
       ROUND(s.combined_score, {ROUND}) + 0.0 AS combined_score
FROM scored s WHERE TRUE {lbl}
ORDER BY s.combined_score DESC, s.id LIMIT {k}
"""


def _node_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return emb.select(
        F.concat(F.lit("c:"), F.col("vec_id").cast("string")).alias("id"), "embedding"
    )


def _qv(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qvec")
    )


@query("graph_semantic_search", _duck_semantic(10, 2, 0.7, 0.3))
def graph_semantic_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes, edges = _graph(spark, sf_dir)
    return semantic_graph_search(
        nodes, edges, _node_vectors(spark, sf_dir), _qv(spark, sf_dir),
        k=10, expand_hops=2, vector_weight=0.7, graph_weight=0.3, round_to=ROUND,
    ).withColumn("graph_distance", F.col("graph_distance").cast("int"))


@query("graph_semantic_search_filtered", _duck_semantic(10, 2, 0.7, 0.3, label_where="label = 'Order'"))
def graph_semantic_search_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label filter applied AFTER expansion (hybrid_graph_vector.py:434-448):
    seeds are all Customers, so only expanded Order nodes survive."""
    nodes, edges = _graph(spark, sf_dir)
    return semantic_graph_search(
        nodes, edges, _node_vectors(spark, sf_dir), _qv(spark, sf_dir),
        k=10, expand_hops=2, vector_weight=0.7, graph_weight=0.3,
        label_filter=["Order"], round_to=ROUND,
    ).withColumn("graph_distance", F.col("graph_distance").cast("int"))


# ------------------------------------------------------------- PageRank

from custom_python_vectordb_spark.operators.centrality import (  # noqa: E402
    duck_pagerank_sql,
    pagerank,
)


@query("graph_pagerank", f"""
{GRAPH_CTES},
{duck_pagerank_sql(iterations=5)}
SELECT id, ROUND(pr, {ROUND}) + 0.0 AS pr
FROM pr5 ORDER BY pr DESC, id LIMIT 20
""")
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration (K=5) PageRank over the property-graph view, fully
    oracle-checked: the DuckDB side is the SAME five unrolled iterations as
    chained CTEs (operators/centrality.py). Top-20 ranks surface the hub
    structure (nations/regions aggregate in-link mass from the whole
    customer/supplier population)."""
    nodes, edges = _graph(spark, sf_dir)
    pr = pagerank(nodes, edges, iterations=5)
    out = pr.withColumn("pr", F.round("pr", ROUND) + F.lit(0.0))
    return out.orderBy(F.col("pr").desc(), "id").limit(20)


from custom_python_vectordb_spark.operators.centrality import (  # noqa: E402
    duck_bellman_sql,
    weighted_shortest_paths,
)


@query("graph_weighted_shortest", f"""
{GRAPH_CTES},
{duck_bellman_sql('c:1', 4)}
SELECT id, ROUND(dist, {ROUND}) + 0.0 AS dist
FROM d4 ORDER BY dist, id LIMIT 25
""")
def graph_weighted_shortest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted cheapest paths from customer c:1 over <= 4 edges (quantity-
    weighted CONTAINS edges, unit weight elsewhere) — bounded Bellman-Ford
    whose oracle is the SAME four relaxation rounds as unrolled CTEs, so
    even the iterative weighted algorithm is value-hash-verified (the
    pagerank discipline applied to path costs). The reference's shortest
    path is hop-count BFS only (``graph.py:871-902``); edge-weighted
    routing is additive surface."""
    _, edges = _graph(spark, sf_dir)
    d = weighted_shortest_paths(edges, "c:1", iterations=4)
    return (
        d.withColumn("dist", F.round("dist", ROUND) + F.lit(0.0))
        .orderBy("dist", "id")
        .limit(25)
    )


from custom_python_vectordb_spark.operators.centrality import (  # noqa: E402
    duck_kcore_sql,
    kcore_nodes,
)


@query("graph_kcore", f"""
{GRAPH_CTES},
{duck_kcore_sql(k=3, rounds=3)}
SELECT v AS id FROM k3
""")
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the property graph after 3 peeling rounds — the density
    filter cohesion analyses start from (operators/centrality.kcore_nodes;
    same unrolled-CTE oracle discipline as graph_pagerank). Tests assert
    the bounded peel has converged on this fixture (round 5 == round 4),
    so the emitted set IS the true 3-core here (round 3 == round 2).
    Round 6: peels the shared materialized undirected-pair view
    (graph_view.undirected_pairs) instead of re-normalizing the 6-branch
    edge union per run."""
    from custom_python_vectordb_spark.sources.graph_view import undirected_pairs

    pairs = undirected_pairs(spark, sf_dir)
    return kcore_nodes(pairs, k=3, rounds=3, src_col="a", dst_col="b", pre_deduped=True)
