"""BM25 + hybrid fusion semantics on a hand-checkable corpus."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from custom_python_vectordb_spark.functions.text import tokenize_py
from custom_python_vectordb_spark.operators.bm25 import (
    K1,
    B,
    bm25_scores,
    bm25_topk,
    corpus_stats,
    hybrid_search,
    postings,
    weights_to_alpha,
)

DOCS = [
    (0, "spark shuffles data between stages"),
    (1, "spark spark spark broadcast join"),
    (2, "the quick brown fox"),
    (3, "hash join and merge join strategies"),
]


def ref_bm25(query: str) -> dict[int, float]:
    """Independent scorer: Okapi BM25 with idf=ln((N-df+.5)/(df+.5)+1),
    query terms scored per-occurrence."""
    toks = {d: tokenize_py(t) for d, t in DOCS}
    n = len(DOCS)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {}
    for ts in toks.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    out = {}
    for d, ts in toks.items():
        s = 0.0
        for q in tokenize_py(query):
            tf = ts.count(q)
            if tf == 0:
                continue
            idf = math.log((n - df[q] + 0.5) / (df[q] + 0.5) + 1)
            s += idf * tf * (K1 + 1) / (tf + K1 * (1 - B + B * len(ts) / avgdl))
        if s > 0:
            out[d] = s
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_postings(docs_df):
    got = {(r["doc_id"], r["term"]): r["tf"] for r in postings(docs_df).collect()}
    assert got[(1, "spark")] == 3
    assert got[(3, "join")] == 2
    assert (2, "spark") not in got


def test_corpus_stats(docs_df):
    r = corpus_stats(docs_df).collect()[0]
    assert r["n_docs"] == 4
    assert r["avgdl"] == pytest.approx(sum(len(tokenize_py(t)) for _, t in DOCS) / 4)


@pytest.mark.parametrize("query", ["spark join", "join join spark", "quick fox the", "zzz"])
def test_scores_match_reference_formula(docs_df, query):
    got = {r["doc_id"]: r["score"] for r in bm25_scores(docs_df, query).collect()}
    exp = ref_bm25(query)
    assert set(got) == set(exp)
    for d in exp:
        assert got[d] == pytest.approx(exp[d], rel=1e-12)


def test_topk_order(docs_df):
    rows = bm25_topk(docs_df, "spark join", k=2).collect()
    exp = sorted(ref_bm25("spark join").items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    assert [(r["doc_id"]) for r in rows] == [d for d, _ in exp]


def test_weights_to_alpha():
    assert weights_to_alpha(2.0, 1.0) == pytest.approx(2 / 3)
    assert weights_to_alpha(0.0, 0.0) == 0.5


def test_hybrid_union_and_zero_fill(spark, docs_df):
    # vectors only for docs 0..2; doc 3 is keyword-only -> vector_score 0
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    qv = spark.createDataFrame([([1.0, 0.0],)], "qvec array<float>")
    out = hybrid_search(emb, docs_df, qv, "hash join", k=4, alpha=0.5).collect()
    by_id = {r["id"]: r for r in out}
    assert by_id[3]["vector_score"] == 0.0 and by_id[3]["keyword_score"] == 1.0
    # doc 0: best vector (dist 0 -> norm 1), no keyword match
    assert by_id[0]["vector_score"] == pytest.approx(1.0)
    assert by_id[0]["keyword_score"] == 0.0
    # fused = mean of the two sides at alpha 0.5
    for r in out:
        assert r["score"] == pytest.approx(0.5 * r["vector_score"] + 0.5 * r["keyword_score"])


def test_phrase_search_semantics(spark):
    """Exact adjacency, multi-occurrence counting, duplicate phrase terms,
    and no-match behavior."""
    from custom_python_vectordb_spark.operators.bm25 import phrase_search

    rows = [
        (1, "hash join beats nested loop hash join"),   # 2 matches
        (2, "hash but not join adjacent"),              # terms present, no phrase
        (3, "join hash"),                               # reversed, no match
        (4, "a hash join b"),                           # 1 match
        (5, "the big the cat"),                         # for dup-term phrase
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["doc_id"], r["n_matches"]) for r in phrase_search(docs, "hash join").collect()}
    assert got == {(1, 2), (4, 1)}
    # duplicate term in the phrase: every offset needs its own position
    got = {(r["doc_id"], r["n_matches"]) for r in phrase_search(docs, "the big the").collect()}
    assert got == {(5, 1)}
    assert phrase_search(docs, "absent words").collect() == []
    assert phrase_search(docs, "") .collect() == []


def test_phrase_replica_serve_equals_declarative(spark, tmp_path):
    """The in-process positional index must reproduce phrase_search exactly
    (matches, counts, ranking), including the cross-doc underflow guard
    (a phrase tail at one doc's start must not combine with the previous
    doc's trailing tokens)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from custom_python_vectordb_spark.operators.bm25 import (
        phrase_replica_serve,
        phrase_search,
    )

    rows = [
        (1, "hash join beats nested loop hash join"),
        (2, "hash but not join adjacent"),
        (3, "join hash"),          # ends with 'hash'...
        (4, "join b c d e f g"),   # ...starts with 'join': adjacency across
                                   # docs 3→4 must NOT match
        (5, "a hash join b"),
        (6, "the big the cat"),
    ]
    shard = str(tmp_path / "docs.parquet")
    pq.write_table(
        pa.table({"id": [r[0] for r in rows], "_document": [r[1] for r in rows]}),
        shard,
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for phrase in ("hash join", "the big the", "join b", "zzz none"):
        plan = [
            (r["doc_id"], r["n_matches"])
            for r in phrase_search(docs, phrase, k=10).collect()
        ]
        served = phrase_replica_serve([shard], phrase, k=10)
        assert served == plan, phrase
    assert phrase_replica_serve([shard], "") == []
