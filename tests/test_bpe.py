"""BPE tokenizer training: greedy-merge semantics, retrain-vs-snapshot
equality (the frozen oracle of `bpe_train_merges`/`bpe_encode`), and an
INDEPENDENT pure-Python BPE reimplementation that must agree with the
Spark pipeline merge-for-merge — so the snapshot oracle is anchored to
something other than the code that produced it."""

from __future__ import annotations

import re

import pyarrow.parquet as pq

from custom_python_vectordb_spark.operators import bpe

SF001 = "/root/testdata/sf0.01"


def _py_tokenize(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9_]+", text.lower()) if t]


def _py_word_counts(texts, top_words):
    freq: dict[str, int] = {}
    for t in texts:
        for w in _py_tokenize(t):
            freq[w] = freq.get(w, 0) + 1
    ordered = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:top_words]
    return dict(ordered)


def _py_apply(syms, left, right):
    out = []
    for s in syms:
        if out and out[-1] == left and s == right:
            out[-1] = left + right
        else:
            out.append(s)
    return out


def _py_train(word_freq, num_merges, min_pair_count=2):
    vocab = {w: list(w) + [bpe.END_OF_WORD] for w in word_freq}
    merges = []
    for rank in range(num_merges):
        counts: dict[tuple, int] = {}
        for w, f in word_freq.items():
            syms = vocab[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (left, right), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_pair_count:
            break
        merges.append((rank, left, right, cnt))
        for w in vocab:
            vocab[w] = _py_apply(vocab[w], left, right)
    return merges


def _py_encode(text, merges):
    out = []
    for w in _py_tokenize(text):
        syms = list(w) + [bpe.END_OF_WORD]
        for _, left, right, _c in merges:
            syms = _py_apply(syms, left, right)
        out.extend(syms)
    return out


def test_apply_merge_greedy(spark):
    df = spark.createDataFrame(
        [(["a", "a", "a"],), (["a", "b", "a", "b"],)], "symbols array<string>"
    )
    assert [r[0] for r in df.select(bpe.apply_merge("symbols", "a", "a")).collect()] == [
        ["aa", "a"],
        ["a", "b", "a", "b"],
    ]
    assert [r[0] for r in df.select(bpe.apply_merge("symbols", "a", "b")).collect()] == [
        ["a", "a", "a"],
        ["ab", "ab"],
    ]


def test_retrain_matches_snapshot_and_pure_python(spark):
    from custom_python_vectordb_spark.queries._bpe_snapshot import BPE_MERGES_SF001
    from custom_python_vectordb_spark.sources.catalog import load_table

    texts = pq.read_table(f"{SF001}/documents.parquet", columns=["text"]).column(
        "text"
    ).to_pylist()
    py_merges = _py_train(_py_word_counts(texts, 500), 24)
    assert py_merges == [tuple(m) for m in BPE_MERGES_SF001]

    docs = load_table(spark, SF001, "documents")
    spark_merges = bpe.train_bpe(bpe.word_counts(docs, top_words=500), num_merges=24)
    assert [tuple(m) for m in spark_merges] == py_merges


def test_encode_matches_snapshot_and_pure_python(spark):
    from pyspark.sql import functions as F

    from custom_python_vectordb_spark.queries._bpe_snapshot import (
        BPE_ENCODE_SF001,
        BPE_MERGES_SF001,
    )
    from custom_python_vectordb_spark.sources.catalog import load_table

    docs = (
        load_table(spark, SF001, "documents")
        .filter(F.col("doc_id") < 5)
        .select("doc_id", "text")
        .orderBy("doc_id")
    )
    merges = [tuple(m) for m in BPE_MERGES_SF001]
    toks = bpe.encode_expr("text", merges)
    rows = docs.select("doc_id", toks.alias("toks"), "text").collect()
    got = [
        (r["doc_id"], len(r["toks"]), " ".join(r["toks"][:12])) for r in rows
    ]
    assert got == [tuple(s) for s in BPE_ENCODE_SF001]
    # full token streams (not just the 12-token preview) vs pure python
    for r in rows:
        assert r["toks"] == _py_encode(r["text"], merges)


def test_encode_reconstruction_property(spark):
    """Property (Hypothesis): for any corpus of ASCII words and any
    merge table trained on it, concatenating a word's encoded symbols
    and stripping the end-of-word marker reconstructs the word exactly —
    merges can regroup characters but never create, drop, or reorder
    them."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    word = st.text(alphabet="abcdef", min_size=1, max_size=8)

    @settings(max_examples=25, deadline=None)
    @given(st.lists(word, min_size=1, max_size=20))
    def check(words):
        freq: dict[str, int] = {}
        for w in words:
            freq[w] = freq.get(w, 0) + 1
        merges = _py_train(freq, num_merges=10, min_pair_count=2)
        for w in words:
            syms = list(w) + [bpe.END_OF_WORD]
            for _, left, right, _c in merges:
                syms = _py_apply(syms, left, right)
            joined = "".join(syms)
            assert joined == w + bpe.END_OF_WORD

    check()


def test_spark_python_train_parity_property(spark):
    """Spark train_bpe must agree with the pure-Python reference on an
    adversarial tiny corpus with heavy tie pressure (every word has the
    same frequency, so arg-max tie-breaks decide most merges)."""
    words = ["abab", "baba", "aabb", "bbaa", "abba", "baab"]
    df = spark.createDataFrame([(i, w) for i, w in enumerate(words)],
                               "doc_id long, text string")
    from custom_python_vectordb_spark.operators.bpe import train_bpe, word_counts

    got = [tuple(m) for m in train_bpe(word_counts(df), num_merges=6, checkpoint_every=3)]
    want = _py_train({w: 1 for w in words}, num_merges=6)
    assert got == want


def test_encode_udf_parity_with_expr(spark):
    """The Arrow-batched encode (per-worker word cache) must produce
    BIT-IDENTICAL token streams to the declarative fold encode and the
    pure-Python reference over real corpus text, including NULL text."""
    from pyspark.sql import functions as F

    from custom_python_vectordb_spark.queries._bpe_snapshot import BPE_MERGES_SF001
    from custom_python_vectordb_spark.sources.catalog import load_table

    merges = [tuple(m) for m in BPE_MERGES_SF001]
    docs = load_table(spark, SF001, "documents").filter(F.col("doc_id") < 40)
    rows = docs.select(
        "doc_id",
        bpe.encode_expr("text", merges).alias("a"),
        bpe.encode_udf("text", merges).alias("b"),
        "text",
    ).collect()
    assert len(rows) == 40
    for r in rows:
        assert r["a"] == r["b"]
        assert r["b"] == _py_encode(r["text"], merges)
    null_df = spark.createDataFrame([(None,)], "text string")
    assert null_df.select(bpe.encode_udf("text", merges)).collect()[0][0] == []


def test_encode_expr_merge_depth_guard(spark):
    """encode_expr's nested fold tree is depth-K; above MAX_EXPR_MERGES it
    must refuse with a pointer at encode_udf instead of building an
    unanalyzable expression. encode_udf itself must handle a large merge
    list fine (it is flat in K)."""
    import pytest

    big = [(i, f"x{i}", f"y{i}", 1) for i in range(bpe.MAX_EXPR_MERGES + 1)]
    with pytest.raises(ValueError, match="encode_udf"):
        bpe.encode_expr("text", big)

    # the Arrow path takes a 500-merge vocab without blinking: train a
    # real 500-merge list pure-Python over synthetic words, then encode
    words = {f"w{i}xyzq{i % 7}": i + 1 for i in range(300)}
    merges = _py_train(words, num_merges=500)
    assert len(merges) > bpe.MAX_EXPR_MERGES  # genuinely deep vocab
    df = spark.createDataFrame(
        [(0, " ".join(list(words) * 3))], "doc_id long, text string"
    )
    [row] = df.select(bpe.encode_udf("text", merges).alias("t")).collect()
    assert row["t"] == _py_encode(" ".join(list(words) * 3), merges)
