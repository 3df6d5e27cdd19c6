"""End-to-end demo of the client facade: the workflow a user of the
reference (FastPyVectorDB) runs today, on the Spark engine.

    python examples/demo.py [warehouse_dir]
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, "/root/repo")

from custom_python_vectordb_spark.api import VectorDB
from custom_python_vectordb_spark.functions.filters import Filter
from custom_python_vectordb_spark.session import get_spark


def main() -> None:
    spark = get_spark("demo")
    spark.sparkContext.setLogLevel("ERROR")
    root = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="vdb_demo_")

    db = VectorDB(spark, root)
    kb = db.create_collection("articles", dimensions=64, overwrite=True)

    kb.add_texts(
        [
            ("a1", "spark shuffles data between executors during wide transformations"),
            ("a2", "broadcast joins avoid shuffling the large fact table"),
            ("a3", "the quick brown fox jumps over the lazy dog"),
            ("a4", "columnar parquet scans prune columns and push down filters"),
            ("a5", "hash join and sort merge join are spark's main strategies"),
        ],
        category={"a1": "spark", "a2": "spark", "a3": "animals", "a4": "storage", "a5": "spark"},
    )
    print(f"collection {kb.name!r}: {kb.count()} docs at {root}")

    print("\n— batch semantic query (2 texts, one plan) —")
    for r in kb.query(query_texts=["how do joins avoid shuffles", "fast animals"], n_results=2).collect():
        print(f"  q{r['qid']}  {r['id']}  dist={r['dist']:.4f}  [{r['category']}]")

    print("\n— filtered search (exact: never starves) —")
    for r in kb.search(query_text="join strategies", k=3, where={"category": "spark"}).collect():
        print(f"  {r['id']}  dist={r['dist']:.4f}")

    print("\n— keyword (BM25) —")
    for r in kb.keyword_search("merge join", k=2).collect():
        print(f"  {r['id']}  score={r['score']:.4f}")

    print("\n— hybrid fusion —")
    for r in kb.hybrid("columnar scans and pushdown", k=2).collect():
        print(f"  {r['id']}  fused={r['score']:.4f}  vec={r['vector_score']:.4f}  kw={r['keyword_score']:.4f}")

    print("\n— upsert + delete-by-filter —")
    kb.upsert(
        spark.createDataFrame(
            [("a3", [0.0] * 64, "replaced: slow turtles", "animals")],
            "id string, embedding array<float>, _document string, category string",
        )
    )
    kb.delete_by_filter(Filter.where("category", "eq", "storage").column)
    print(f"  after: {kb.count()} docs, ids={kb.list_ids()}")

    db2 = VectorDB(spark, root)
    print(f"\nreloaded from disk: {db2.get_collection('articles').count()} docs — done.")


if __name__ == "__main__":
    main()
