"""Z-order (Morton-curve) clustering: multi-column file pruning.

Parquet pruning is interval arithmetic: a file (or row group) is skipped
when the predicate can't intersect its column [min, max].  Range-clustering
on ONE column makes that column's intervals tight and every other column's
intervals full-width — a layout that prunes on `user_id` reads everything
for a `value` predicate.  Interleaving the bits of several columns into one
Morton z-value and range-clustering on THAT gives every interleaved column
locality: each file covers a small hyper-rectangle of the key space, so its
[min, max] stays narrow on ALL of them and point/range predicates on any
single dimension skip most files.

This is the layout trick behind Delta/Iceberg `OPTIMIZE ZORDER BY`; at
100 TB it's how one physical sort order serves several filter columns at
once.  Everything here is JVM expressions (shift/and/or chains inside
whole-stage codegen) — no UDF — and deterministic, so the layout is stable
run-to-run.

The z-value math (`zvalue`) is plain integer arithmetic and therefore
DuckDB-expressible: the `zorder_values` query in queries/extras.py
hash-checks it bit-for-bit.  The prunability win is measured, not assumed:
`file_minmax` reads back per-file [min, max] and tests assert the z-ordered
layout's average interval coverage is narrow on BOTH dimensions where a
single-column sort is narrow on one and full-width on the other.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["zvalue", "write_zordered", "file_minmax"]


def zvalue(cols: list[Column], bits: int = 8) -> Column:
    """Morton-interleave the low `bits` bits of each column (non-negative
    integral expressions; callers bucket/clamp first).  Bit i of column j
    lands at output bit i*n + j, so output width = bits*n ≤ 63."""
    n = len(cols)
    if n < 2:
        raise ValueError("zvalue needs ≥2 columns to interleave")
    if bits * n > 63:
        raise ValueError(f"{bits} bits × {n} cols exceeds a signed long")
    parts = []
    for j, c in enumerate(cols):
        v = c.cast("long")
        for i in range(bits):
            # ((v >> i) & 1) << (i*n + j): one codegen'd term per bit
            parts.append(
                F.call_function(
                    "shiftleft",
                    F.shiftright(v, i).bitwiseAND(F.lit(1)),
                    F.lit(i * n + j),
                )
            )
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


def write_zordered(
    df: DataFrame,
    path: str,
    z: Column,
    n_files: int,
) -> None:
    """Write `df` as `n_files` parquet files range-clustered by the z-value:
    repartitionByRange gives each file a contiguous z-interval (= a small
    hyper-rectangle of the interleaved key space) and the within-file sort
    tightens row-group stats the same way."""
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_minmax(spark: SparkSession, path: str, cols: list[str]) -> DataFrame:
    """Per-file [min, max] of `cols` — the same stats parquet footers carry,
    read back explicitly so prunability is measurable: the fraction of
    files whose interval contains a probe value IS the fraction of files a
    point predicate must read."""
    df = spark.read.parquet(path).withColumn("__f", F.input_file_name())
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return df.groupBy("__f").agg(*aggs)
