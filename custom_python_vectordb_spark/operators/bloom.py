"""Bloom-filter join pruning: probe the big side before it shuffles.

The classic 100 TB join problem: ``fact ⋈ dim_subset`` where the dim subset
is selective (a few thousand keys) but too unpredictable to hard-code a
predicate on the fact table.  A plain shuffle join moves EVERY fact row to
a reducer just to discard the ~98 % that match nothing; a broadcast join
avoids the fact shuffle but still streams every fact row through the hash
probe and carries them through any downstream exchange.

The runtime-filter remedy (what Spark's own
``spark.sql.optimizer.runtime.bloomFilter.enabled`` injects for DPP-shaped
plans, built here explicitly so it works on ANY plan shape):

1. aggregate the small side's join keys into an m-bit Bloom bitmask
   (k xxhash64 probes per key, one ``bit_or`` aggregation, m/64 longs
   collected to the driver — a few KiB),
2. attach the mask to the big side as a LITERAL array<long> and keep only
   rows passing all k ``getbit`` probes — a pure map-side projection that
   runs inside whole-stage codegen, BEFORE the exchange,
3. run the real join on the survivors.

Bloom filters have no false negatives, so the result is row-identical to
the plain join (oracle-checked by `bloom_filtered_join` in
queries/extras.py); false positives only cost a little extra shuffle.
With m/n ≈ 64 bits/key and k = 5 the false-positive rate is ≈ 2e-4 —
at 100 TB the exchange moves ~2 % of the fact table instead of all of it.

The reference engine has no analog (a single process never shuffles); this
is pure scale-path machinery.  Everything is JVM-side: no UDF, no Python
in the probe.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["build_bloom_mask", "bloom_probe", "bloom_filtered_join"]


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k Bloom positions in [0, m_bits) for one key expression.  Seeded by
    hashing (key, seed_i) together — xxhash64 mixes the extra literal into
    an independent hash per seed."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)).cast("long")
        for i in range(1, k + 1)
    ]


def build_bloom_mask(small: DataFrame, key: str, m_bits: int, k: int = 5) -> list[int]:
    """Aggregate `small[key]`'s Bloom bitmask: m_bits bits as m_bits/64
    longs.  One distributed pass (explode k positions → bit_or per word),
    then a ≤ m_bits/64-row collect.  m_bits must be a multiple of 64."""
    if m_bits <= 0 or m_bits % 64:
        raise ValueError(f"m_bits must be a positive multiple of 64, got {m_bits}")
    pos = F.explode(F.array(*_positions(F.col(key), m_bits, k))).alias("h")
    words = (
        small.select(pos)
        .select(
            F.shiftright("h", 6).alias("w"),
            F.col("h").bitwiseAND(F.lit(63)).cast("int").alias("b"),
        )
        .groupBy("w")
        .agg(
            F.bit_or(
                F.call_function("shiftleft", F.lit(1).cast("long"), F.col("b"))
            ).alias("mask")
        )
        .collect()
    )
    out = [0] * (m_bits // 64)
    for row in words:
        out[row["w"]] = row["mask"]
    return out


def bloom_probe(key: Column, mask: list[int], k: int = 5) -> Column:
    """Membership-test expression: True iff all k bits for `key` are set in
    `mask` (a list of longs from build_bloom_mask, attached as one array
    literal — Catalyst treats it as a constant, so the probe stays inside
    whole-stage codegen)."""
    m_bits = 64 * len(mask)
    lit_mask = F.lit(mask)
    tests = [
        F.getbit(
            F.element_at(lit_mask, (F.shiftright(h, 6) + F.lit(1)).cast("int")),
            h.bitwiseAND(F.lit(63)).cast("int"),
        )
        == F.lit(1)
        for h in _positions(key, m_bits, k)
    ]
    return reduce(lambda a, b: a & b, tests)


def bloom_filtered_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    m_bits: int = 1 << 17,
    k: int = 5,
    how: str = "inner",
) -> DataFrame:
    """`large ⋈ small` on `key` with the large side Bloom-pruned before its
    exchange.  Row-identical to ``large.join(small, key, how)`` for inner
    and semi joins (no false negatives; false positives are removed by the
    join itself).  Outer joins must keep non-matching rows, so the pruning
    would change them — rejected loudly."""
    if how not in ("inner", "semi", "left_semi", "leftsemi"):
        raise ValueError(
            f"bloom pruning preserves inner/semi joins only, got {how!r}"
        )
    mask = build_bloom_mask(small, key, m_bits, k)
    pruned = large.filter(bloom_probe(F.col(key), mask, k))
    return pruned.join(small, key, how)
