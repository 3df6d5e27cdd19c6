"""Incremental near-duplicate detection over streaming ingest.

The batch near-dup stack (wide MinHash signatures → banded LSH buckets →
Jaccard verify, `operators/dedup.py`) re-shingles the whole corpus per
run. At ingest scale the index must be INCREMENTAL: each micro-batch

1. computes signatures + band keys for ITS documents only (one pass over
   the batch's shingles — the corpus is never re-read),
2. probes the STORED band-key index for candidate partners among all
   previously ingested documents (equi-join on (band, band_key) — the
   exact bucket join the batch path uses, now new-vs-history instead of
   self),
3. exact-verifies candidates with shingle Jaccard over just the candidate
   pairs' texts, and
4. appends its own signatures/band keys (and its verified pairs) to the
   index, replay-idempotently (``batch_id=<n>`` partitions under dynamic
   partition overwrite — the pattern hardened by round-2 ADVICE in
   `streaming/index_maintenance.py`).

Within-batch duplicates are caught by the same probe (the batch's own
band keys are unioned into the probe side with `a < b` dedup), so the
result converges to exactly the batch path's pair set over the union of
all batches (asserted in tests).

Scale: per micro-batch cost is O(batch shingles) + one bucket join whose
history side is partitioned by band_key on disk; the stored index is
O(corpus × bands) small rows. No state store — idempotence and history
live in the table layout, so a crashed query resumes from its checkpoint
and overwrites its partition.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from custom_python_vectordb_spark.operators.dedup import (
    jaccard_pairs,
    lsh_band_keys,
    minhash_signatures_wide,
)


def _index_path(root: str) -> str:
    return os.path.join(root, "bands")


def _pairs_path(root: str) -> str:
    return os.path.join(root, "pairs")


def process_neardup_batch(
    batch_docs: DataFrame,
    batch_id: int,
    index_root: str,
    *,
    num_hashes: int = 16,
    bands: int = 4,
    rows_per_band: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """One micro-batch through the incremental near-dup index. Documents
    must carry (id, text); ids must be globally unique across batches
    (an ingest invariant, same as `index_maintenance.maintain_postings`)."""
    spark = batch_docs.sparkSession
    docs = batch_docs.select(id_col, text_col)
    wide = minhash_signatures_wide(
        docs, num_hashes=num_hashes, shingle_n=shingle_n, id_col=id_col, text_col=text_col
    )
    banded = lsh_band_keys(wide, bands=bands, rows_per_band=rows_per_band, id_col=id_col).persist()

    bands_dir = _index_path(index_root)
    history_exists = os.path.isdir(bands_dir) and any(
        d.startswith("batch_id=") for d in os.listdir(bands_dir)
    )
    if history_exists:
        # exclude THIS batch's partition: a replay must not treat its own
        # previous (about-to-be-overwritten) rows as history
        history = (
            spark.read.parquet(bands_dir)
            .filter(F.col("batch_id") != batch_id)
            .drop("batch_id")
        )
        probe = history.unionByName(banded)
    else:
        probe = banded
    cands = (
        banded.select(F.col(id_col).alias("__new"), "band", "band_key")
        .join(probe.select(F.col(id_col).alias("__other"), "band", "band_key"), ["band", "band_key"])
        .filter(F.col("__new") != F.col("__other"))
        .select(
            F.least("__new", "__other").alias("a"), F.greatest("__new", "__other").alias("b")
        )
        .distinct()
    )
    # exact verify needs both sides' texts: batch texts + previously stored
    # pair-partner texts are all reachable from the caller's corpus table;
    # here we verify against the batch ∪ history TEXTS snapshot the caller
    # passes via closure-free storage — the signatures table stores no text,
    # so verification reads the docs table (the one source of truth).
    docs_dir = os.path.join(index_root, "docs")
    docs_all = (
        spark.read.parquet(docs_dir).drop("batch_id") if os.path.isdir(docs_dir) else docs
    )
    verified = jaccard_pairs(
        docs_all.unionByName(docs).dropDuplicates([id_col]),
        threshold=threshold,
        shingle_n=shingle_n,
        id_col=id_col,
        text_col=text_col,
        restrict_pairs=cands,
    )

    # idempotent writes: each batch owns its batch_id partition
    def _write(df: DataFrame, path: str) -> None:
        (
            df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(path)
        )

    # ORDER MATTERS on replay: `verified` lazily reads the bands/docs dirs,
    # so it must fully materialize (its write is the action) BEFORE those
    # dirs' partitions are overwritten — writing bands/docs first would
    # yank files out from under the still-unexecuted verify plan. After
    # the verified write, `banded` is persisted+materialized and `docs`
    # derives from the batch source only, so neither re-reads the index.
    _write(verified, _pairs_path(index_root))
    _write(banded, bands_dir)
    _write(docs, os.path.join(index_root, "docs"))
    banded.unpersist()


def maintain_neardup_index(doc_stream: DataFrame, index_root: str, **kwargs):
    """foreachBatch writer keeping the near-dup index current; start with
    ``.start()`` after configuring trigger/checkpoint."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        process_neardup_batch(batch_df, batch_id, index_root, **kwargs)

    return doc_stream.writeStream.foreachBatch(write_batch)


def load_neardup_pairs(spark: SparkSession, index_root: str) -> DataFrame:
    """All verified near-dup pairs found so far (distinct across batches —
    a pair discovered when its second member arrived is recorded once by
    that batch; a pair re-discovered by a replay overwrites in place)."""
    return (
        spark.read.parquet(_pairs_path(index_root)).drop("batch_id").distinct()
    )
