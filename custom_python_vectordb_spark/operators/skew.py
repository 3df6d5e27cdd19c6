"""Skew-mitigation utilities for 100 TB-scale joins and aggregations.

AQE's skew-join splitting (on in session defaults) handles sort-merge skew
at runtime; these helpers cover the cases AQE can't:

- `salted_join`: explicit key salting for a hot-key equi-join where the
  small side fits in memory per salt replica (e.g. joining a postings table
  against a handful of ultra-common terms).
- `salted_count`: two-stage aggregation for heavily-skewed groupBy keys —
  partial count on (key, salt), then final rollup. Spark's map-side partial
  aggregation already does this for simple aggregates; the explicit form is
  for list/set collectors that would otherwise OOM a single reducer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated
    `salts`×, spreading each hot key over `salts` reducers. Output schema
    equals a plain `big.join(small, key, how)`."""
    spark = big.sparkSession
    salted_big = big.withColumn("__salt", (F.rand(seed=42) * salts).cast("int"))
    replicas = spark.range(salts).select(F.col("id").cast("int").alias("__salt"))
    salted_small = small.crossJoin(F.broadcast(replicas))
    return salted_big.join(salted_small, [key, "__salt"], how).drop("__salt")


def salted_count(df: DataFrame, key: str, salts: int = 8) -> DataFrame:
    """Skew-safe groupBy(key).count(): partial per (key, salt) then final
    rollup — no single reducer ever sees a whole hot key."""
    partial = (
        df.withColumn("__salt", (F.rand(seed=42) * salts).cast("int"))
        .groupBy(key, "__salt")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    return partial.groupBy(key).agg(F.sum("__n").alias("count"))
