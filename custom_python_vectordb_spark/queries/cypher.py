"""Cypher-subset queries (SURVEY.md §2.11) — the translator compiled
against the graph view, oracle-checked with plain SQL joins / recursive
CTEs over the same pattern semantics."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from custom_python_vectordb_spark.plans.cypher import cypher
from custom_python_vectordb_spark.queries.graph import GRAPH_CTES, _graph
from custom_python_vectordb_spark.registry import query


@query("cypher_node", f"""
{GRAPH_CTES}
SELECT id AS n_id, name AS n_name FROM nodes
WHERE label = 'Customer' AND mktsegment IS NOT NULL AND mktsegment = 'BUILDING'
  AND acctbal IS NOT NULL AND acctbal > 1000
""")
def cypher_node(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes, edges = _graph(spark, sf_dir)
    return cypher(
        nodes, edges,
        "MATCH (n:Customer {mktsegment: 'BUILDING'}) WHERE n.acctbal > 1000 RETURN n, n.name",
    )


@query("cypher_edge", f"""
{GRAPH_CTES}
SELECT DISTINCT e.src AS c_id, e.dst AS o_id FROM edges e
WHERE e.type = 'PLACED'
  AND e.src IN (SELECT id FROM nodes WHERE label = 'Customer'
                AND mktsegment IS NOT NULL AND mktsegment = 'MACHINERY'
                AND acctbal IS NOT NULL AND acctbal < 500)
""")
def cypher_edge(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes, edges = _graph(spark, sf_dir)
    return cypher(
        nodes, edges,
        "MATCH (c:Customer {mktsegment: 'MACHINERY'})-[:PLACED]->(o:Order) "
        "WHERE c.acctbal < 500 RETURN c, o",
    )


@query("cypher_varlen", f"""
{GRAPH_CTES.replace("WITH ", "WITH RECURSIVE ", 1)},
opairs AS (SELECT DISTINCT src, dst FROM edges),
starts AS (SELECT id FROM nodes WHERE label = 'Customer'
           AND mktsegment IS NOT NULL AND mktsegment = 'AUTOMOBILE'
           AND acctbal IS NOT NULL AND acctbal > 4900),
walk(start, last, path, depth) AS (
    SELECT s.id, s.id, [s.id]::VARCHAR[], 0 FROM starts s
    UNION ALL
    SELECT w.start, e.dst, w.path || [e.dst], w.depth + 1
    FROM walk w JOIN opairs e ON e.src = w.last
    WHERE w.depth < 2 AND NOT list_contains(w.path, e.dst)
)
SELECT DISTINCT start AS a_id, last AS b_id FROM walk WHERE depth BETWEEN 1 AND 2
""")
def cypher_varlen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variable-length any-type pattern: distinct (a, b) reachable in 1–2
    simple-path hops from a filtered start set."""
    nodes, edges = _graph(spark, sf_dir)
    return cypher(
        nodes, edges,
        "MATCH (a:Customer {mktsegment: 'AUTOMOBILE'})-[*1..2]->(b) "
        "WHERE a.acctbal > 4900 RETURN a, b",
    )
