"""Hot-band salting (r14, VERDICT r13 #3): the banded pair generators
split pathological buckets over n_salts sub-tasks. These tests pin the
correctness contract — the pair set must be BYTE-IDENTICAL with salting
forced on (tiny hot_threshold) vs effectively off (huge threshold) — on
the worst case the salting exists for: a large block of identical
signatures (constant documents / constant images), plus distinct rows
mixed in so cold buckets coexist with the hot one.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from custom_python_vectordb_spark.operators.dedup import (
    perceptual_hash_pairs,
    simhash_pairs,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_simhash_salting_pairset_identical_on_hot_bucket(spark, sf_small):
    # 60 identical docs -> every band is one hot bucket of 60; plus 20
    # organic docs for cold buckets
    base = spark.read.parquet(f"{sf_small}/documents.parquet").select(
        "doc_id", "text"
    ).limit(20)
    hot = spark.range(1000, 1060).select(
        F.col("id").alias("doc_id"), F.lit("spark spark fast data").alias("text")
    )
    corpus = base.unionByName(hot)
    plain = simhash_pairs(corpus, max_hamming=3, hot_threshold=1 << 30)
    salted = simhash_pairs(corpus, max_hamming=3, hot_threshold=8, n_salts=4)
    p, s = _rows(plain), _rows(salted)
    assert p == s
    # the injected block guarantees C(60,2) = 1770 identical-doc pairs
    assert len([r for r in s if r[0] >= 1000 and r[1] >= 1000]) >= 1770


def test_simhash_salting_noop_below_threshold(spark, sf_small):
    # healthy corpus, no bucket anywhere near the default threshold: the
    # salted plan's hot leg is empty and results match the plain join
    docs = spark.read.parquet(f"{sf_small}/documents.parquet").select(
        "doc_id", "text"
    ).limit(80)
    plain = simhash_pairs(docs, max_hamming=3, hot_threshold=1 << 30)
    deflt = simhash_pairs(docs, max_hamming=3)
    assert _rows(plain) == _rows(deflt)


def test_phash_salting_pairset_identical_on_hot_bucket(spark):
    # constant-image block: 50 identical 4x16-bit signatures (the
    # documented web-scale pathological case) + distinct organic rows
    rows = [(i, 7, 11, 13, 17) for i in range(50)]
    rows += [(100 + i, 1000 + i, 2000 + i, 3000 + i, 4000 + i) for i in range(30)]
    hashes = spark.createDataFrame(
        rows, "doc_id long, dh0 long, dh1 long, dh2 long, dh3 long"
    )
    plain = perceptual_hash_pairs(hashes, max_hamming=3, hot_threshold=1 << 30)
    salted = perceptual_hash_pairs(hashes, max_hamming=3, hot_threshold=8, n_salts=4)
    p, s = _rows(plain), _rows(salted)
    assert p == s
    assert len(s) == 50 * 49 // 2  # the constant block's full pair set
