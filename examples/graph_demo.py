"""Graph capabilities walkthrough on the derived property-graph view.

    python examples/graph_demo.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from custom_python_vectordb_spark.operators.graph import (
    degree_top,
    neighbors,
    semantic_graph_search,
    shortest_path,
    traverse_paths,
)
from custom_python_vectordb_spark.plans.cypher import cypher
from custom_python_vectordb_spark.session import get_spark
from custom_python_vectordb_spark.sources.catalog import load_table
from custom_python_vectordb_spark.sources.graph_view import edges_df, nodes_df


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("graph-demo")
    spark.sparkContext.setLogLevel("ERROR")
    nodes, edges = nodes_df(spark, sf_dir), edges_df(spark, sf_dir)

    print("— neighbors of customer c:1 (both directions) —")
    for r in neighbors(nodes, edges, "c:1", "both").orderBy("id").limit(5).collect():
        print(f"  {r['id']}  [{r['labels'][0]}]  {r['name']}")

    print("\n— busiest parts (CONTAINS in-degree) —")
    for r in degree_top(edges, k=3, edge_type="CONTAINS").collect():
        print(f"  {r['id']}: {r['degree']} order lines")

    print("\n— all simple paths from c:1, depth ≤ 2 (first 5) —")
    for r in traverse_paths(edges, "c:1", max_depth=2).orderBy("path_str").limit(5).collect():
        print(f"  {r['path_str']}")

    print("\n— shortest path c:1 → r:0 —")
    for r in shortest_path(edges, "c:1", "r:0", max_depth=4).collect():
        print(f"  {r['path_str']}  (length {r['length']})")

    print("\n— cypher: machinery customers' orders (first 3) —")
    q = "MATCH (c:Customer {mktsegment: 'MACHINERY'})-[:PLACED]->(o:Order) RETURN c, o"
    for r in cypher(nodes, edges, q).orderBy("c_id", "o_id").limit(3).collect():
        print(f"  {r['c_id']} -> {r['o_id']}")

    print("\n— semantic graph search (vector seeds + 2-hop expansion) —")
    emb = load_table(spark, sf_dir, "embeddings")
    node_vecs = emb.select(
        F.concat(F.lit("c:"), F.col("vec_id").cast("string")).alias("id"), "embedding"
    )
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    for r in semantic_graph_search(nodes, edges, node_vecs, qv, k=5).collect():
        print(f"  {r['id']}  hop={r['graph_distance']}  score={r['combined_score']:.4f}")


if __name__ == "__main__":
    main()
