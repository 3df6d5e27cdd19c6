"""Scalable global ranking: total-order row numbers without a global window.

`ROW_NUMBER() OVER (ORDER BY ...)` with no PARTITION BY is the classic
Spark scale-killer: Catalyst compiles it to a SINGLE-partition window —
every row shuffles to one task, one core sorts the corpus (fine at 60K
rows, dead at 100 TB). The standard distributed construction replaces it
with three bounded steps, all shuffles range- or key-local:

1. range-partition + sort WITHIN partitions on the rank key — Spark's
   own distributed-sort machinery (sampled range boundaries), each task
   sorts only its slice;
2. count rows per partition (tiny: one row per partition) and prefix-sum
   the counts into per-partition OFFSETS on the driver-side broadcastable
   table;
3. local `row_number` windowed BY PARTITION ID (each window sees one
   already-sorted task slice) + the broadcast offset = the exact global
   rank.

The sorted input is materialized once before branching (the counts branch
and the rank branch must observe the SAME partitioning — recomputing a
sampled range partitioner in two jobs is not guaranteed to draw identical
boundaries).

The DuckDB oracle states the single-window form — same total order, so
ranks value-hash-match row for row (callers must make the key total,
e.g. tie-break on a unique id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    order_cols: list,
    rank_col: str = "rank",
    num_partitions: int = 32,
) -> DataFrame:
    """Append `rank_col`: 1-based dense global row number in the total
    order given by `order_cols` (pass Columns, e.g. ``[F.desc("score"),
    F.asc("id")]``; the order must be TOTAL — include a unique
    tie-breaker). Scales as a distributed sort: no single-partition
    window anywhere in the plan."""
    sorted_df = (
        df.repartitionByRange(num_partitions, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        # one materialization, shared by the counts and rank branches —
        # see module docstring (executor-local is fine here: the block is
        # consumed by the same bounded job cascade, not held across jobs)
        .localCheckpoint(eager=True)
    )
    counts = sorted_df.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    woff = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    # the window below runs over #partitions rows, not data rows
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_n").over(woff), F.lit(0))
    ).select("_pid", "_off")
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        sorted_df.join(F.broadcast(offsets), "_pid")
        .withColumn(rank_col, (F.row_number().over(w) + F.col("_off")).cast("long"))
        .drop("_pid", "_off")
    )
