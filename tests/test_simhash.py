"""SimHash pair generation: the r13 packed-word formulation must equal the
original per-bit formulation exactly (pairs AND hamming values).

The optimization (operators/dedup.simhash_pairs): pack the 48-bit
signature into one long, band by bit-slicing, and verify with
bit_count(siga XOR sigb) INLINE in the bucket join — so the |bucket|²
candidate enumeration never shuffles. These tests pin the equivalence the
optimization relies on.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from custom_python_vectordb_spark.operators.dedup import simhash_bits, simhash_pairs


def _per_bit_reference(bits, max_hamming: int, rpb: int):
    """The pre-r13 formulation: per-(doc, band) aggregate, materialized
    candidates, distinct, per-bit verify join."""
    banded = (
        bits.withColumn("band", F.floor(F.col("bit") / rpb).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.sum(F.col("b") * F.pow(F.lit(2.0), F.col("bit") % rpb))
            .cast("long")
            .alias("band_val")
        )
    )
    la = banded.select(F.col("doc_id").alias("a"), "band", "band_val")
    lb = banded.select(F.col("doc_id").alias("b"), "band", "band_val")
    cands = (
        la.join(lb, ["band", "band_val"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    ba = bits.select(F.col("doc_id").alias("a"), "bit", F.col("b").alias("ba"))
    bb = bits.select(F.col("doc_id").alias("b"), "bit", F.col("b").alias("bb"))
    return (
        cands.join(ba, "a")
        .join(bb, ["b", "bit"])
        .groupBy("a", "b")
        .agg(F.sum((F.col("ba") != F.col("bb")).cast("long")).alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def test_packed_simhash_pairs_equal_per_bit_form(spark, sf_small):
    docs = (
        spark.read.parquet(f"{sf_small}/documents.parquet")
        .select("doc_id", "text")
        .limit(120)
    )
    # inject exact dupes so near-pairs certainly exist
    dupes = docs.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 5000).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(dupes)
    bits = simhash_bits(corpus).localCheckpoint(eager=True)

    new = simhash_pairs(corpus, max_hamming=3, bits=bits)
    ref = _per_bit_reference(bits, max_hamming=3, rpb=12)

    new_rows = {(r["a"], r["b"], r["hamming"]) for r in new.collect()}
    ref_rows = {(r["a"], r["b"], r["hamming"]) for r in ref.collect()}
    assert new_rows == ref_rows
    assert new_rows  # the injected dupes guarantee a non-empty result
    # schema parity: hamming stays a long (the oracle hash covers types)
    assert dict(new.dtypes)["hamming"] == "bigint"


def test_packed_simhash_pairs_hamming_zero_for_exact_dupes(spark, sf_small):
    docs = (
        spark.read.parquet(f"{sf_small}/documents.parquet")
        .select("doc_id", "text")
        .limit(40)
    )
    dupes = docs.filter(F.col("doc_id") < 5).select(
        (F.col("doc_id") + 5000).alias("doc_id"), "text"
    )
    out = simhash_pairs(docs.unionByName(dupes), max_hamming=0)
    got = {(r["a"], r["b"]): r["hamming"] for r in out.collect()}
    for i in range(5):
        assert got.get((i, i + 5000)) == 0


def test_packed_simhash_rejects_wide_signatures(spark, sf_small):
    """num_bits > 52 would overflow the double-exact packed sum — the
    guard must fail loudly instead of silently corrupting band values
    (r13 ADVICE)."""
    import pytest

    docs = spark.read.parquet(f"{sf_small}/documents.parquet").select(
        "doc_id", "text"
    ).limit(5)
    with pytest.raises(ValueError, match="num_bits <= 52"):
        simhash_pairs(docs, max_hamming=3, num_bits=60, bands=4)
