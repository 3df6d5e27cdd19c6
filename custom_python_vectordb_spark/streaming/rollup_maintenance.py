"""Incremental materialized-view maintenance: streaming rollups.

A dashboard aggregate (counts/sums by key) over an append-only stream
should not re-scan history per refresh. The standard incremental design,
in the same replay-idempotent style as the other maintenance sinks here:

- each micro-batch writes its PARTIAL aggregate (key, cnt, sum) under a
  ``batch_id=<n>`` partition with dynamic partition overwrite — a replay
  overwrites its own partition, so the view never double-counts;
- the VIEW READ is one groupBy-sum over the stored partials — cost is
  O(batches × keys-per-batch) small rows, never the raw stream; compact
  the partials with the same groupBy whenever batch count grows
  (`compact_rollup`), which is safe because the merge is associative;
- correctness contract: additive aggregates only (count / sum — avg is
  derived sum/cnt at read time). Non-additive aggregates (exact
  distinct, percentiles) need the sketch family (`queries/analytics.py`
  HLL/KLL), whose merge IS associative — same pattern, sketch column.

Convergence to the batch groupBy over the union of all batches is
asserted in tests, including after a replay and after compaction.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _partials_path(root: str, name: str) -> str:
    return os.path.join(root, name)


def process_rollup_batch(
    batch_df: DataFrame,
    batch_id: int,
    root: str,
    name: str,
    keys: list[str],
    value_col: str,
) -> None:
    """Aggregate ONE micro-batch and write its partial under batch_id."""
    partial = batch_df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("cnt"), F.sum(value_col).alias("total")
    )
    (
        partial.withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(_partials_path(root, name))
    )


def maintain_rollup(
    stream_df: DataFrame, root: str, name: str, keys: list[str], value_col: str
):
    """foreachBatch writer; configure trigger/checkpoint then ``.start()``."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        process_rollup_batch(batch_df, batch_id, root, name, keys, value_col)

    return stream_df.writeStream.foreachBatch(write)


def read_rollup(
    spark: SparkSession, root: str, name: str, keys: list[str]
) -> DataFrame:
    """The maintained view: (keys..., cnt, total, avg) merged across all
    partials — one small aggregate, the raw stream is never re-read."""
    partials = spark.read.parquet(_partials_path(root, name))
    return (
        partials.groupBy(*keys)
        .agg(F.sum("cnt").alias("cnt"), F.sum("total").alias("total"))
        .withColumn("avg", F.col("total") / F.col("cnt"))
    )


def compact_rollup(
    spark: SparkSession, root: str, name: str, keys: list[str]
) -> None:
    """Fold all partials into a single batch_id=-1 partition (associative
    merge, so the view is unchanged) and drop the per-batch partitions —
    bounds read cost when batch count grows. Replays of already-folded
    batches would re-add their partial AFTER a compact; run compaction
    only past the stream's checkpointed progress (the same single-writer
    contract as the other maintenance sinks)."""
    import shutil

    path = _partials_path(root, name)
    folded = (
        spark.read.parquet(path)
        .groupBy(*keys)
        .agg(F.sum("cnt").alias("cnt"), F.sum("total").alias("total"))
    )
    staged = path + ".compact"
    folded.withColumn("batch_id", F.lit(-1)).write.mode("overwrite").partitionBy(
        "batch_id"
    ).parquet(staged)
    shutil.rmtree(path)
    os.rename(staged, path)
