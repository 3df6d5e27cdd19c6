"""End-to-end client API: the reference's tests/test_client.py coverage —
add/query/filter/update/upsert/delete/delete-by-filter/peek/persistence
reload — against the Spark engine facade."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from custom_python_vectordb_spark.api import VectorDB
from custom_python_vectordb_spark.functions.embeddings import mock_embed_one
from custom_python_vectordb_spark.functions.filters import Filter
from custom_python_vectordb_spark.operators.mutations import DuplicateIdError

TEXTS = [
    ("d1", "spark shuffles data between stages"),
    ("d2", "broadcast joins avoid the shuffle"),
    ("d3", "the quick brown fox jumps"),
    ("d4", "hash join and merge join strategies"),
]


@pytest.fixture()
def db(spark, tmp_path):
    return VectorDB(spark, str(tmp_path / "wh"))


@pytest.fixture()
def coll(db):
    c = db.create_collection("docs", dimensions=64)
    c.add_texts(TEXTS, category={"d1": "eng", "d2": "eng", "d3": "animals", "d4": "eng"})
    return c


def test_create_list_drop(db):
    db.create_collection("a", 8)
    db.create_collection("b", 8)
    assert db.list_collections() == ["a", "b"]
    assert db.delete_collection("a") is True
    assert db.list_collections() == ["b"]
    with pytest.raises(ValueError):
        db.create_collection("b", 8)


def test_count_get_peek(coll):
    assert coll.count() == 4
    got = coll.get("d2")
    assert got["_document"].startswith("broadcast")
    assert "embedding" not in got
    assert coll.get("d2", include_vector=True)["embedding"] is not None
    assert coll.get("nope") is None
    assert coll.list_ids(limit=2) == ["d1", "d2"]
    assert coll.peek(2).count() == 2


def test_search_text_and_vector(coll):
    hits = coll.search(query_text="spark shuffles data between stages", k=2).collect()
    assert hits[0]["id"] == "d1" and hits[0]["dist"] == pytest.approx(0.0, abs=1e-6)
    vec = mock_embed_one("broadcast joins avoid the shuffle", 64).tolist()
    hits = coll.search(vector=vec, k=1).collect()
    assert hits[0]["id"] == "d2"
    with pytest.raises(ValueError):
        coll.search()


def test_search_filtered_exact(coll):
    hits = coll.search(query_text="anything at all", k=4, where={"category": "animals"}).collect()
    # exact engine: filter-then-rank returns every match, never starves
    assert [h["id"] for h in hits] == ["d3"]


def test_insert_dup_gate_and_upsert(coll, spark):
    batch = spark.createDataFrame(
        [("d1", mock_embed_one("x", 64).tolist(), "replacement", "eng")],
        "id string, embedding array<float>, _document string, category string",
    )
    with pytest.raises(DuplicateIdError):
        coll.insert_batch(batch)
    coll.upsert(batch)
    assert coll.count() == 4
    assert coll.get("d1")["_document"] == "replacement"


def test_delete_and_delete_by_filter(coll):
    coll.delete(["d3"])
    assert coll.count() == 3
    coll.delete_by_filter(Filter.where("category", "eq", "eng").column)
    assert coll.count() == 0


def test_update_metadata_merge(coll, spark):
    changes = spark.createDataFrame([("d1", "updated")], "id string, category string")
    coll.update_metadata(changes)
    assert coll.get("d1")["category"] == "updated"
    assert coll.get("d2")["category"] == "eng"  # untouched


def test_persistence_reload(db, coll):
    again = db.get_collection("docs")
    assert again.count() == 4
    hits = again.search(query_text="hash join and merge join strategies", k=1).collect()
    assert hits[0]["id"] == "d4"


def test_keyword_and_hybrid(coll):
    kw = coll.keyword_search("merge join strategies", k=2).collect()
    assert kw[0]["id"] == "d4"
    hy = coll.hybrid("spark shuffles data between stages", k=2).collect()
    assert hy[0]["id"] == "d1"


def test_search_ivf_mode(spark, tmp_path):
    """IVF mode returns sane neighbors on a clustered corpus and never
    throws; with nprobe == n_cells it equals exact search."""
    db = VectorDB(spark, str(tmp_path / "wh2"))
    c = db.create_collection("vecs", dimensions=4)
    rows = [(f"v{i}", [float(i % 4 == j) for j in range(4)], f"doc {i}") for i in range(20)]
    c.insert_batch(
        spark.createDataFrame(rows, "id string, embedding array<float>, _document string")
    )
    exact = [r["id"] for r in c.search(vector=[1.0, 0.0, 0.0, 0.0], k=5).collect()]
    full_probe = [
        r["id"]
        for r in c.search(vector=[1.0, 0.0, 0.0, 0.0], k=5, mode="ivf", n_cells=4, nprobe=4).collect()
    ]
    assert full_probe == exact
    partial = c.search(vector=[1.0, 0.0, 0.0, 0.0], k=5, mode="ivf", n_cells=4, nprobe=1).collect()
    assert 0 < len(partial) <= 5
    with pytest.raises(ValueError):
        c.search(vector=[1.0, 0.0, 0.0, 0.0], mode="hnsw")


def test_batch_query_entry_point(coll):
    """ChromaDB-style query(): many texts, one plan, qid-indexed results."""
    out = coll.query(
        query_texts=["spark shuffles data between stages", "the quick brown fox jumps"],
        n_results=2,
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["qid"], []).append(r["id"])
    assert by_q[0][0] == "d1" and by_q[1][0] == "d3"
    with pytest.raises(ValueError):
        coll.query()
    emb = [mock_embed_one("hash join and merge join strategies", 64).tolist()]
    hits = coll.query(query_embeddings=emb, n_results=1).collect()
    assert hits[0]["id"] == "d4"


def test_upsert_with_new_column_schema_evolution(coll, spark):
    batch = spark.createDataFrame(
        [("d9", mock_embed_one("new", 64).tolist(), "brand new", "eng", 0.9)],
        "id string, embedding array<float>, _document string, category string, quality double",
    )
    coll.upsert(batch)
    assert coll.count() == 5
    assert coll.get("d9")["quality"] == pytest.approx(0.9)
    assert coll.get("d1")["quality"] is None  # old rows take NULL for the new column


def test_delete_empty_and_missing_ids(coll):
    coll.delete([])
    assert coll.count() == 4
    coll.delete(["does-not-exist"])
    assert coll.count() == 4


def test_warehouse_drop_missing(db):
    assert db.delete_collection("ghost") is False


def test_query_serve_equals_plan_query(coll):
    """The replica serving path must return exactly the declarative plan's
    results (ids, order, distances) for a text batch, and stay correct
    after a mutation rewrites the table (cache re-keys on file stats)."""
    texts = ["shuffle strategies", "fox"]
    plan_rows = coll.query(query_texts=texts, n_results=3).collect()
    plan: dict[int, list] = {}
    for r in plan_rows:
        plan.setdefault(int(r["qid"]), []).append((r["id"], r["dist"]))
    served = coll.query_serve(query_texts=texts, n_results=3)
    assert len(served) == 2
    for qid, hits in enumerate(served):
        assert [h["id"] for h in hits] == [i for i, _ in plan[qid]]
        for h, (_, d) in zip(hits, plan[qid]):
            assert h["dist"] == pytest.approx(d, abs=1e-6)

    coll.delete(["d1"])  # rewrite → different shard files
    served2 = coll.query_serve(query_texts=["shuffle strategies"], n_results=4)
    assert "d1" not in {h["id"] for h in served2[0]}
    assert len(served2[0]) == 3  # only 3 docs remain


def test_query_serve_filtered_equals_plan_query(coll):
    """Filtered serving (NumPy mask over replica-resident metadata — the
    reference's P5 pattern) must return exactly the declarative filtered
    plan's results, for dict shorthand AND composed Filter specs, and
    missing-field predicates must behave as missing⇒False."""
    texts = ["shuffle strategies", "fox"]
    for where in (
        {"category": "eng"},
        Filter.where("category", "ne", "eng"),
        Filter.where("category", "eq", "eng") | Filter.where("category", "eq", "animals"),
        ~Filter.where("category", "eq", "eng"),
        Filter.where("category", "in", ["animals"]),
        Filter.where("_document", "contains", "join"),
        Filter.where("_document", "regex", "jo.n"),
    ):
        plan_rows = coll.query(query_texts=texts, n_results=3, where=where).collect()
        plan: dict[int, list] = {}
        for r in plan_rows:
            plan.setdefault(int(r["qid"]), []).append((r["id"], r["dist"]))
        served = coll.query_serve(query_texts=texts, n_results=3, where=where)
        assert len(served) == 2
        for qid, hits in enumerate(served):
            assert [h["id"] for h in hits] == [i for i, _ in plan.get(qid, [])], where
            for h, (_, d) in zip(hits, plan.get(qid, [])):
                assert h["dist"] == pytest.approx(d, abs=1e-6)

    # missing field ⇒ False everywhere ⇒ empty result slots
    assert coll.query_serve(query_texts=texts, n_results=3, where={"nope": 1}) == [[], []]
    # ...but NOT(missing) ⇒ True (two-state logic, matching the Column twin)
    served = coll.query_serve(
        query_texts=texts, n_results=10, where=~Filter.where("nope", "eq", 1)
    )
    assert {h["id"] for h in served[0]} == {"d1", "d2", "d3", "d4"}

    # raw-Column filters cannot be masked: loud error, not silent wrong data
    with pytest.raises(ValueError, match="spec"):
        coll.query_serve(query_texts=texts, where=Filter(F.col("category") == "eng"))


def test_lr_snapshot_matches_retrained_coefficients(spark):
    """The quality_model_score oracle pins sf0.01 LR coefficients as
    literals; retrain and assert bit-equality so drift (Spark/MLlib
    version change, fixture regeneration) fails here, not at the gate."""
    from custom_python_vectordb_spark.queries._lr_snapshot import LR_COEFS_SF001
    from custom_python_vectordb_spark.queries.cleaning import train_quality_lr
    from custom_python_vectordb_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    assert train_quality_lr(docs) == LR_COEFS_SF001


def test_keyword_serve_equals_plan_keyword_search(coll):
    """The in-process BM25 replica must reproduce the declarative plan's
    keyword ranking and scores (float tolerance), stay correct after a
    mutation rewrites the table, and return [] for no-hit queries."""
    for q in ("join strategies", "shuffle", "quick brown fox"):
        plan = [(r["id"], r["score"]) for r in coll.keyword_search(q, k=5).collect()]
        served = coll.keyword_serve(q, k=5)
        assert [h["id"] for h in served] == [i for i, _ in plan], q
        for h, (_, s) in zip(served, plan):
            assert h["score"] == pytest.approx(s, rel=1e-9)
    assert coll.keyword_serve("zzz nothing matches") == []

    coll.delete(["d4"])  # rewrite → replica re-keys on shard stats
    served = coll.keyword_serve("join strategies", k=5)
    assert "d4" not in {h["id"] for h in served}


def test_ann_serve_recall_vs_exact(coll):
    """The IVF-replica accelerated tier must return high-overlap results
    vs the exact serving path (on a 4-doc corpus with every cell probed,
    identical), keep the positional contract, and fall back to exact
    while deletion vectors are active."""
    texts = ["shuffle strategies", "fox"]
    exact = coll.query_serve(query_texts=texts, n_results=2)
    ann = coll.ann_serve(query_texts=texts, n_results=2)
    assert len(ann) == 2
    for e_hits, a_hits in zip(exact, ann):
        assert [h["id"] for h in a_hits] == [h["id"] for h in e_hits]
        for e, a in zip(e_hits, a_hits):
            assert a["dist"] == pytest.approx(e["dist"], abs=1e-6)
    coll.delete(["d1"])  # rewrite → replica re-keys
    ann2 = coll.ann_serve(query_texts=["shuffle strategies"], n_results=4)
    assert "d1" not in {h["id"] for h in ann2[0]}


def test_serve_capacity_fallback_to_declarative(coll, monkeypatch):
    """A corpus above the replica's max_bytes budget must fall back to the
    declarative plan (round-4 ADVICE #2) — same results, never an error —
    on all three serving facades."""
    from custom_python_vectordb_spark.operators import bm25 as bm25_mod
    from custom_python_vectordb_spark.operators import knn as knn_mod

    # vector: max_bytes=1 forces the real capacity raise inside the decode
    texts = ["shuffle strategies"]
    plan_rows = coll.query(query_texts=texts, n_results=3).collect()
    served = coll.query_serve(query_texts=texts, n_results=3, max_bytes=1)
    assert [h["id"] for h in served[0]] == [r["id"] for r in plan_rows]

    def _boom(*a, **k):
        raise knn_mod.ReplicaCapacityError("test: over budget")

    # keyword / hybrid budgets are operator-level defaults: simulate the
    # raise and assert the facade degrades to the plan path
    monkeypatch.setattr(bm25_mod, "keyword_replica_serve", _boom)
    plan_k = [r["id"] for r in coll.keyword_search("join strategies", k=5).collect()]
    assert [h["id"] for h in coll.keyword_serve("join strategies", k=5)] == plan_k

    monkeypatch.setattr(knn_mod, "replica_distance_vector", _boom)
    plan_h = [r["id"] for r in coll.hybrid("broadcast joins", k=3).collect()]
    assert [h["id"] for h in coll.hybrid_serve("broadcast joins", k=3)] == plan_h


def test_hybrid_serve_equals_plan_hybrid(coll):
    """In-process hybrid fusion (vector replica + keyword replica + numpy
    fusion) must reproduce the declarative hybrid plan: same ids, same
    order, same fused/branch scores to float tolerance, at several alphas."""
    for alpha in (0.5, 0.2, 0.8):
        plan = coll.hybrid("broadcast joins", k=3, alpha=alpha).collect()
        served = coll.hybrid_serve("broadcast joins", k=3, alpha=alpha)
        assert [h["id"] for h in served] == [r["id"] for r in plan], alpha
        for h, r in zip(served, plan):
            for c in ("score", "vector_score", "keyword_score"):
                assert h[c] == pytest.approx(float(r[c]), rel=1e-6, abs=1e-9), (alpha, c)


def test_bq_serve_hamming_tier(coll):
    """The binary-quantized serving tier: positional contract, Hamming
    ranking on self-queries puts the query's own doc first (its bits
    match exactly), fetch_k rerank returns exact L2 order, and deletions
    re-key the replica."""
    texts = ["shuffle strategies", "fox"]
    bq = coll.bq_serve(query_texts=texts, n_results=2)
    assert len(bq) == 2 and all(len(h) == 2 for h in bq)
    exact = coll.query_serve(query_texts=texts, n_results=2, metric="l2")
    # coarse tier contract: Hamming distances are integral and ascending
    # per query (1-bit codes tie heavily on a 4-doc corpus, so hit IDENTITY
    # is only guaranteed by the rerank tier below)
    for hits in bq:
        ds = [h["dist"] for h in hits]
        assert ds == sorted(ds) and all(float(d).is_integer() for d in ds)
    # rerank tier equals the exact-L2 serving path entirely
    rer = coll.bq_serve(query_texts=texts, n_results=2, fetch_k=50)
    for e_hits, r_hits in zip(exact, rer):
        assert [h["id"] for h in r_hits] == [h["id"] for h in e_hits]
    coll.delete(["d2"])  # rewrite -> replica re-keys on shard stats
    after = coll.bq_serve(query_texts=["shuffle strategies"], n_results=4)
    assert "d2" not in {h["id"] for h in after[0]}


def test_ivfpq_serve_tier(coll):
    """The cell-pruned PQ serving tier (r11): positional contract,
    ascending distances, full-probe + full fetch_k rerank equals the
    exact-L2 serving path, and deletions re-key the replica (stat-keyed
    cache)."""
    texts = ["shuffle strategies", "fox"]
    # tiny corpus: probe every cell so only the PQ ranking is approximate
    pq = coll.ivfpq_serve(query_texts=texts, n_results=2, n_cells=2, nprobe=2)
    assert len(pq) == 2 and all(len(h) == 2 for h in pq)
    for hits in pq:
        ds = [h["dist"] for h in hits]
        assert ds == sorted(ds)
    exact = coll.query_serve(query_texts=texts, n_results=2, metric="l2")
    rer = coll.ivfpq_serve(
        query_texts=texts, n_results=2, n_cells=2, nprobe=2, fetch_k=50
    )
    for e_hits, r_hits in zip(exact, rer):
        assert [h["id"] for h in r_hits] == [h["id"] for h in e_hits]
    coll.delete(["d2"])
    after = coll.ivfpq_serve(
        query_texts=["shuffle strategies"], n_results=4, n_cells=2, nprobe=2
    )
    assert "d2" not in {h["id"] for h in after[0]}


def test_ivfpq_serve_all_empty_shards(db):
    """r12 (ADVICE r11): shard paths can be non-empty while every parquet
    file holds zero rows (Spark writes empty part files). ivfpq_serve must
    match its bq_serve/ann_serve siblings — empty result lists, not a
    ValueError('empty shard set') surfaced as a 400."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    c = db.create_collection("hollow", dimensions=8)
    schema = pa.schema(
        [("id", pa.string()), ("embedding", pa.list_(pa.float32()))]
    )
    pq.write_table(
        pa.Table.from_pylist([], schema=schema),
        os.path.join(db.warehouse.root, "hollow", "part-empty.parquet"),
    )
    assert db.warehouse.shard_paths("hollow")  # the premise: paths exist
    out = c.ivfpq_serve(query_embeddings=[[0.0] * 8, [1.0] * 8], n_results=3)
    assert out == [[], []]


def test_dim_discovery_skips_null_embeddings(tmp_path):
    """r13 ADVICE (low): dimension discovery must scan past NULL
    embeddings (and empty leading shards) for the first real vector — a
    spark-less worker that breaks at the first non-empty shard silently
    fell back to dim=64 and embedded query_texts at the wrong width. A
    collection with rows but NO readable embedding must raise, not
    default."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from custom_python_vectordb_spark.api import VectorDB

    root = tmp_path / "wh"
    cdir = root / "vecs"
    cdir.mkdir(parents=True)
    emb_type = pa.list_(pa.float64())
    # shard 0: rows exist, every embedding NULL (e.g. text-only ingests)
    pq.write_table(
        pa.table({
            "id": pa.array(["a", "b"]),
            "embedding": pa.array([None, None], type=emb_type),
        }),
        str(cdir / "part-0.parquet"),
    )
    # shard 1: first real vector, 16-d
    pq.write_table(
        pa.table({
            "id": pa.array(["c"]),
            "embedding": pa.array([list(np.arange(16, dtype=float))], type=emb_type),
        }),
        str(cdir / "part-1.parquet"),
    )
    db = VectorDB(None, str(root))
    assert db.get_collection("vecs").dimensions == 16

    # all-null collection: loud error beats a silent 64
    cdir2 = root / "nulls"
    cdir2.mkdir()
    pq.write_table(
        pa.table({
            "id": pa.array(["x"]),
            "embedding": pa.array([None], type=emb_type),
        }),
        str(cdir2 / "part-0.parquet"),
    )
    db2 = VectorDB(None, str(root))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no readable embedding"):
        db2.get_collection("nulls")
