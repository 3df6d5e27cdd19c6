"""Mutation-operator queries (M1-M7) in pure form: each derives a mutation
batch from the tables, applies the rewrite plan, and returns a checkable
slice of the result — side-effect-free, so the driver can value-hash them.
The write path (temp+swap commit) is exercised in tests/test_api.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from custom_python_vectordb_spark.functions.embeddings import embed_column
from custom_python_vectordb_spark.operators.mutations import (
    cascade_delete_nodes,
    delete_by_filter,
    delete_ids,
    update_merge,
    upsert,
)
from custom_python_vectordb_spark.queries.spine import _t
from custom_python_vectordb_spark.registry import query
from custom_python_vectordb_spark.sources.graph_view import DUCK_EDGES, DUCK_NODES, edges_df, nodes_df
from custom_python_vectordb_spark.functions.local_relation import local_df


@query("mutation_upsert", """
WITH batch AS (
    SELECT doc_id, 'updated:' || lang AS lang FROM documents WHERE doc_id < 10
),
merged AS (
    SELECT d.doc_id, d.lang FROM documents d
    WHERE d.doc_id NOT IN (SELECT doc_id FROM batch)
    UNION ALL
    SELECT doc_id, lang FROM batch
)
SELECT doc_id, lang FROM merged WHERE doc_id < 15
""")
def mutation_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3 — delete-then-insert replace of 10 rows."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    batch = docs.filter(F.col("doc_id") < 10).select(
        "doc_id", F.concat(F.lit("updated:"), F.col("lang")).alias("lang")
    )
    return upsert(docs, batch, "doc_id").filter(F.col("doc_id") < 15)


@query("mutation_delete_ids", """
SELECT COUNT(*) AS n, MIN(doc_id) AS min_id FROM documents WHERE doc_id NOT IN (0,1,2,3,4,5,6,7,8,9)
""")
def mutation_delete_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 — anti-join rewrite."""
    docs = _t(spark, sf_dir, "documents")
    remaining = delete_ids(docs, list(range(10)), "doc_id")
    return remaining.agg(F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("min_id"))


@query("mutation_delete_by_filter", """
SELECT lang, COUNT(*) AS n FROM documents
WHERE NOT COALESCE(lang IS NOT NULL AND lang = 'en', FALSE)
GROUP BY lang
""")
def mutation_delete_by_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5 — delete WHERE lang='en' (missing-field rows are kept)."""
    from custom_python_vectordb_spark.functions.filters import Filter

    docs = _t(spark, sf_dir, "documents")
    remaining = delete_by_filter(docs, Filter.where("lang", "eq", "en").column)
    return remaining.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))


@query("mutation_update_merge", """
WITH changes AS (
    SELECT doc_id, 'bulk' AS source, NULL::BIGINT AS n_chars FROM documents WHERE doc_id < 10
)
SELECT d.doc_id,
       CASE WHEN c.doc_id IS NOT NULL THEN COALESCE(c.source, d.source) ELSE d.source END AS source,
       CASE WHEN c.doc_id IS NOT NULL THEN COALESCE(c.n_chars, d.n_chars) ELSE d.n_chars END AS n_chars
FROM documents d LEFT JOIN changes c USING (doc_id)
WHERE d.doc_id < 15
""")
def mutation_update_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6 — column-merge update: `source` overwritten, NULL `n_chars`
    means keep-existing."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    changes = docs.filter(F.col("doc_id") < 10).select(
        "doc_id", F.lit("bulk").alias("source"), F.lit(None).cast("long").alias("n_chars")
    )
    return update_merge(docs, changes, "doc_id").filter(F.col("doc_id") < 15)


@query("mutation_cascade_delete", f"""
WITH {DUCK_NODES.strip()}, {DUCK_EDGES.strip()},
gone(id) AS (VALUES ('c:1'), ('n:0')),
kept_edges AS (
    SELECT * FROM edges
    WHERE src NOT IN (SELECT id FROM gone) AND dst NOT IN (SELECT id FROM gone)
)
SELECT type, COUNT(*) AS n FROM kept_edges GROUP BY type
""")
def mutation_cascade_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M7 — deleting nodes c:1 and n:0 drops their PLACED/IN_NATION edges."""
    from custom_python_vectordb_spark.session import tune_session

    tune_session(spark)
    nodes = nodes_df(spark, sf_dir)
    edges = edges_df(spark, sf_dir)
    _, kept = cascade_delete_nodes(nodes, edges, ["c:1", "n:0"])
    return kept.groupBy("type").agg(F.count(F.lit(1)).alias("n"))


def _semantic_search_oracle() -> str | None:
    """Oracle for the embed→kNN pipeline (round-2 verdict #10). The mock
    embedder (sha256-seeded RandomState) is not SQL-expressible, but it IS
    deterministic — so the embedding stage is SNAPSHOTTED: at import time
    the sf0.01 document texts are embedded with the same provider twin and
    inlined as a VALUES table; DuckDB then independently recomputes the
    cosine top-10 from those vectors. Scoped to the driver's gate scale
    (sf0.01): at any other sf the comparison fails LOUDLY rather than
    passing vacuously. Returns None (→ rows-only check) if the snapshot
    inputs are unavailable."""
    import os

    p = "/root/testdata/sf0.01/documents.parquet"
    if not os.path.exists(p):
        return None
    try:
        import duckdb

        from custom_python_vectordb_spark.functions.embeddings import mock_embed_one

        rows = duckdb.sql(
            f"SELECT doc_id, text FROM '{p}' WHERE doc_id < 200 ORDER BY doc_id"
        ).fetchall()
    except Exception:
        return None
    vals = ", ".join(
        "({}, [{}]::DOUBLE[])".format(
            did, ", ".join(repr(float(x)) for x in mock_embed_one(t, 64))
        )
        for did, t in rows
    )
    qv = ", ".join(repr(float(x)) for x in mock_embed_one("fast hash join merge sort", 64))
    return f"""
WITH emb(doc_id, v) AS (VALUES {vals}),
q AS (SELECT [{qv}]::DOUBLE[] AS qv),
scored AS (
    SELECT e.doc_id,
           1 - list_inner_product(e.v, q.qv)
               / (sqrt(list_inner_product(e.v, e.v)) * sqrt(list_inner_product(q.qv, q.qv))) AS dist
    FROM emb e, q)
SELECT doc_id, ROUND(dist, 6) + 0.0 AS dist FROM scored
ORDER BY dist, doc_id LIMIT 10
"""


@query("semantic_text_search", _semantic_search_oracle, oracle_sf="sf0.01")
def semantic_text_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full text pipeline in one plan: embed raw documents with the
    deterministic provider, embed a query string, exact cosine top-10.
    RandomState generation is not SQL-expressible, so the oracle inlines a
    deterministic embedding snapshot (see _semantic_search_oracle) and
    recomputes the ranking independently; embedding bit-parity with the
    reference's MockEmbedder is separately pinned in tests/test_embeddings.py."""
    from custom_python_vectordb_spark.functions.embeddings import mock_embed_one
    from custom_python_vectordb_spark.operators.knn import knn

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200).select("doc_id", "text")
    corpus = embed_column(docs, "text", "embedding", dimensions=64)
    qv = mock_embed_one("fast hash join merge sort", 64).tolist()
    queries = local_df(spark, [(0, qv)], "qid long, qvec array<float>")
    return knn(
        corpus, queries, k=10, id_col="doc_id", round_to=6
    ).select("doc_id", "dist")


def _mmr_oracle_sql(k: int = 5, fetch_k: int = 30) -> str:
    """DuckDB twin of the MMR greedy loop, UNROLLED: k is small and fixed,
    so the 'iterative' argmax is k chained CTEs, each selecting
    argmax(λ·rel − (1−λ)·max_sim_to_selected) over the not-yet-selected
    candidates (score DESC, id ASC tie-break = the operator's contract).
    (1 - 0.7) is written as the SQL expression, not 0.3, so both engines
    use the same IEEE double 0.30000000000000004."""
    stages, prev = [], []
    for t in range(1, k + 1):
        if prev:
            red = "GREATEST(" + ", ".join(
                f"(SELECT list_inner_product(n.u, s.u) FROM s{j} s)" for j in prev
            ) + ")"
            score = f"0.7 * n.rel - (1 - 0.7) * {red}"
            excl = "WHERE n.vec_id NOT IN (" + " UNION ALL ".join(
                f"SELECT vec_id FROM s{j}" for j in prev
            ) + ")"
        else:
            score = "0.7 * n.rel"
            excl = ""
        stages.append(
            f"s{t} AS (SELECT n.vec_id, n.rel, n.u, {score} AS score FROM nrm n {excl} "
            f"ORDER BY score DESC, n.vec_id ASC LIMIT 1)"
        )
        prev.append(t)
    finals = " UNION ALL ".join(
        f'SELECT {t - 1} AS "rank", vec_id, ROUND(rel, 6) + 0.0 AS relevance, '
        f"ROUND(score, 6) + 0.0 AS mmr_score FROM s{t}"
        for t in range(1, k + 1)
    )
    return f"""
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
qn AS (SELECT list_transform(qv, x -> x / CASE WHEN sqrt(list_inner_product(qv, qv)) = 0
                                          THEN 1 ELSE sqrt(list_inner_product(qv, qv)) END) AS u FROM q),
cand AS (
    SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v,
           1 - list_inner_product(CAST(e.embedding AS DOUBLE[]), q.qv)
               / (sqrt(list_inner_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
                  * sqrt(list_inner_product(q.qv, q.qv))) AS dist
    FROM embeddings e, q ORDER BY dist ASC, e.vec_id ASC LIMIT {fetch_k}),
nrm AS (
    SELECT c.vec_id,
           list_transform(c.v, x -> x / CASE WHEN sqrt(list_inner_product(c.v, c.v)) = 0
                                        THEN 1 ELSE sqrt(list_inner_product(c.v, c.v)) END) AS u
           , list_inner_product(
               list_transform(c.v, x -> x / CASE WHEN sqrt(list_inner_product(c.v, c.v)) = 0
                                            THEN 1 ELSE sqrt(list_inner_product(c.v, c.v)) END),
               (SELECT u FROM qn)) AS rel
    FROM cand c),
{", ".join(stages)}
SELECT "rank", vec_id, relevance, mmr_score FROM ({finals})
"""


@query("mmr_rerank", _mmr_oracle_sql())
def mmr_rerank_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-aware top-5 for query vector 0 (λ=0.7 over 30 candidates).
    The greedy argmax is inherently sequential, but k=5 is FIXED — so the
    oracle unrolls it into 5 chained CTEs (round-2 verdict #10): one fewer
    rows-only query."""
    from custom_python_vectordb_spark.operators.mmr import mmr_rerank
    from custom_python_vectordb_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    picks = mmr_rerank(emb, list(qv), k=5, lam=0.7, fetch_k=30)
    return local_df(
        spark,
        # + 0.0 canonicalizes IEEE −0.0, same as the oracle's ROUND(x,6)+0.0
        [(i, int(p[0]), round(p[1], 6) + 0.0, round(p[2], 6) + 0.0) for i, p in enumerate(picks)],
        "rank int, vec_id long, relevance double, mmr_score double",
    )


def _embed_mock_oracle() -> str | None:
    """Snapshot oracle for the embedding provider (same trick as
    `_semantic_search_oracle`): RandomState generation is not
    SQL-expressible but IS deterministic, so the sf0.01 vectors are inlined
    as VALUES and DuckDB independently recomputes the query's derived
    columns (dim + L2 norm) from them — verifying the Spark-side
    cast-to-double fold bit-for-bit. Scale-pinned to sf0.01."""
    import os

    p = "/root/testdata/sf0.01/documents.parquet"
    if not os.path.exists(p):
        return None
    try:
        import duckdb

        from custom_python_vectordb_spark.functions.embeddings import mock_embed_one

        rows = duckdb.sql(
            f"SELECT doc_id, text FROM '{p}' WHERE doc_id < 20 ORDER BY doc_id"
        ).fetchall()
    except Exception:
        return None
    vals = ", ".join(
        "({}, [{}]::DOUBLE[])".format(
            did, ", ".join(repr(float(x)) for x in mock_embed_one(t, 64))
        )
        for did, t in rows
    )
    return f"""
WITH emb(doc_id, v) AS (VALUES {vals})
SELECT doc_id, CAST(len(v) AS INTEGER) AS dim,
       ROUND(sqrt(list_inner_product(v, v)), 4) AS norm
FROM emb
"""


@query("embed_mock", _embed_mock_oracle, oracle_sf="sf0.01")
def embed_mock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mock embeddings for the first 20 docs: verifies the
    pandas-UDF provider path end-to-end; exact parity with the reference's
    MockEmbedder is asserted bit-for-bit in tests/test_embeddings.py. The
    oracle recomputes dim + norm from a snapshot of the same deterministic
    vectors (see _embed_mock_oracle)."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 20).select("doc_id", "text")
    out = embed_column(docs, "text", "embedding", dimensions=64)
    return out.select(
        "doc_id",
        F.size("embedding").alias("dim"),
        F.round(
            F.sqrt(
                F.aggregate(
                    F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
            ),
            4,
        ).alias("norm"),
    )


@query("change_feed_documents", """
WITH v0 AS (SELECT doc_id, text FROM documents),
v1 AS (
    SELECT doc_id, CASE WHEN doc_id < 10 THEN 'EDITED ' || text ELSE text END AS text
    FROM documents WHERE doc_id % 7 <> 3
    UNION ALL
    SELECT doc_id + 100000 AS doc_id, 'NEW ' || CAST(doc_id AS VARCHAR) AS text
    FROM documents WHERE doc_id < 5
),
ins AS (
    SELECT v1.doc_id, 'insert' AS _change FROM v1
    WHERE v1.doc_id NOT IN (SELECT doc_id FROM v0)
),
del AS (
    SELECT v0.doc_id, 'delete' AS _change FROM v0
    WHERE v0.doc_id NOT IN (SELECT doc_id FROM v1)
),
upd AS (
    SELECT v1.doc_id, 'update_postimage' AS _change
    FROM v1 JOIN v0 USING (doc_id) WHERE v1.text <> v0.text
)
SELECT doc_id, _change FROM ins
UNION ALL SELECT doc_id, _change FROM del
UNION ALL SELECT doc_id, _change FROM upd
""")
def change_feed_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed SEMANTICS driver-checked in pure form (the store's
    `VersionedWarehouse.diff` runs this logic over pinned manifests): v1
    derives from v0 by editing doc_id<10, dropping doc_id%7==3, and
    inserting 5 re-keyed rows; the feed = two key anti-joins + a
    changed-row semi-join — exactly diff()'s plan shape, hash-matched
    against the oracle's NOT IN / join formulation."""
    v0 = _t(spark, sf_dir, "documents").select("doc_id", "text")
    v1 = (
        v0.filter(F.col("doc_id") % 7 != 3)
        .select(
            "doc_id",
            F.when(F.col("doc_id") < 10, F.concat(F.lit("EDITED "), F.col("text")))
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionByName(
            v0.filter(F.col("doc_id") < 5).select(
                (F.col("doc_id") + 100000).alias("doc_id"),
                F.concat(F.lit("NEW "), F.col("doc_id").cast("string")).alias("text"),
            )
        )
    )
    ins = v1.join(v0.select("doc_id"), "doc_id", "left_anti").select(
        "doc_id", F.lit("insert").alias("_change")
    )
    dele = v0.join(v1.select("doc_id"), "doc_id", "left_anti").select(
        "doc_id", F.lit("delete").alias("_change")
    )
    upd = (
        v1.alias("b")
        .join(v0.alias("a"), "doc_id")
        .filter(F.col("b.text") != F.col("a.text"))
        .select("doc_id", F.lit("update_postimage").alias("_change"))
    )
    return ins.unionByName(dele).unionByName(upd)
