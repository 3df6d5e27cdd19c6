"""Incremental SemDeDup over streaming embedding ingest.

The batch operator (`queries/pipeline.semdedup_keep`) re-assigns and
re-joins the whole corpus per run. At ingest scale the semantic-dedup
index must be INCREMENTAL, mirroring `neardup_maintenance.py`:

1. each micro-batch assigns ITS vectors to cells (map-only broadcast
   argmin against FIXED centroids — production SemDeDup trains centroids
   once on a seed sample, then holds them fixed for ingest so cell
   membership is stable);
2. probes the STORED cell index for within-cell cosine partners among
   everything previously ingested (equi-join on `cluster` — exactly the
   batch path's only shuffle, now new-vs-history instead of self);
3. records the HIGHER id of every >= tau pair as a loser (the batch
   path's min-id-representative rule: a pair discovered when its second
   member arrives yields the same loser the batch join would, even when
   the newcomer has the SMALLER id — then the historical partner is the
   loser);
4. appends its (vec_id, cluster, embedding) rows and its loser ids
   replay-idempotently (``batch_id=<n>`` partitions under dynamic
   partition overwrite).

Convergence to the batch operator's keep set over the union of all
batches — including cross-batch near-duplicates and replays — is
asserted in tests.

Scale: per-batch cost is one map-only assignment over the batch plus a
cluster-keyed join whose history side is partition-pruned by the batch's
own cells; state lives in the table layout (no state store), so a
crashed query resumes from its checkpoint and overwrites its partition.
The stored index is the corpus itself bucketed by cell — the same
layout `write_ivf_layout` uses for ANN serving, so one ingest pipeline
feeds both.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from custom_python_vectordb_spark.functions.distances import cosine_similarity
from custom_python_vectordb_spark.operators.similarity import with_ivf_cluster


def _cells_path(root: str) -> str:
    return os.path.join(root, "cells")


def _losers_path(root: str) -> str:
    return os.path.join(root, "losers")


def process_semdedup_batch(
    batch_vecs: DataFrame,
    batch_id: int,
    index_root: str,
    centroids: DataFrame,
    *,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """One micro-batch through the incremental semantic-dedup index.
    Ids must be globally unique across batches (ingest invariant, as in
    the other maintenance sinks). `centroids`: (cluster, cvec), fixed
    across the stream's lifetime."""
    spark = batch_vecs.sparkSession
    assigned = with_ivf_cluster(
        batch_vecs.select(id_col, vec_col), centroids, id_col=id_col, vec_col=vec_col
    ).persist()

    cells_dir = _cells_path(index_root)
    history_exists = os.path.isdir(cells_dir) and any(
        d.startswith("batch_id=") for d in os.listdir(cells_dir)
    )
    if history_exists:
        # exclude THIS batch's partition: a replay must not treat its own
        # about-to-be-overwritten rows as history
        history = (
            spark.read.parquet(cells_dir)
            .filter(F.col("batch_id") != batch_id)
            .drop("batch_id")
        )
        probe = history.unionByName(assigned)
    else:
        probe = assigned
    new = assigned.select(
        "cluster", F.col(id_col).alias("__n"), F.col(vec_col).alias("__nv")
    )
    other = probe.select(
        "cluster", F.col(id_col).alias("__o"), F.col(vec_col).alias("__ov")
    )
    losers = (
        new.join(other, "cluster")
        .filter(
            (F.col("__n") != F.col("__o"))
            & (cosine_similarity("__nv", "__ov") >= threshold)
        )
        .select(F.greatest("__n", "__o").alias(id_col))
        .distinct()
    )

    def _write(df: DataFrame, path: str) -> None:
        (
            df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(path)
        )

    # losers first: its plan lazily reads the cells dir, which the cells
    # write below overwrites (same replay-ordering rule as neardup)
    _write(losers, _losers_path(index_root))
    _write(assigned, cells_dir)
    assigned.unpersist()


def maintain_semdedup_index(
    vec_stream: DataFrame, index_root: str, centroids: DataFrame, **kwargs
):
    """foreachBatch writer keeping the semantic-dedup index current;
    configure trigger/checkpoint then ``.start()``."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        process_semdedup_batch(batch_df, batch_id, index_root, centroids, **kwargs)

    return vec_stream.writeStream.foreachBatch(write_batch)


def load_semdedup_keep(
    spark: SparkSession, index_root: str, id_col: str = "vec_id"
) -> DataFrame:
    """(vec_id, cluster) kept so far: everything ingested minus recorded
    losers — converges to `semdedup_keep`'s batch semantics over the
    union of all batches."""
    cells = spark.read.parquet(_cells_path(index_root)).drop("batch_id")
    losers_dir = _losers_path(index_root)
    kept = cells.select(id_col, "cluster")
    if os.path.isdir(losers_dir):
        losers = spark.read.parquet(losers_dir).select(id_col).distinct()
        kept = kept.join(losers, id_col, "left_anti")
    return kept
