"""Mutation / maintenance operators (SURVEY.md §2.9 M1-M8).

The reference mutates in place under a lock (insert/upsert/delete with
tombstones, ``vectordb_optimized.py:337-501``); with immutable DataFrames
every mutation is a *batch rewrite plan*:

- M1/M2 insert(+batch): uniqueness gate = inner-join count against existing
  ids (raises, like ``:343-344``), then append
- M3 upsert: existing ⟕anti new ∪ new (delete+insert, ``:418-423``)
- M4 delete ids: left-anti join rewrite (tombstones unnecessary)
- M5 delete-by-filter: keep ¬pred
- M6 update/merge: join + per-column coalesce(new, old) — metadata merge of
  ``fastpyvectordb/client.py:357-394``
- M7 graph cascade delete: nodes anti-join + edges dropped when either
  endpoint is gone (``graph.py:620-658``)

All are pure DataFrame→DataFrame so they compose and test without I/O; the
warehouse layer (sources/warehouse.py) does the write-temp-then-swap commit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from custom_python_vectordb_spark.functions.local_relation import local_df


class DuplicateIdError(ValueError):
    pass


def check_new_ids(existing: DataFrame, batch: DataFrame, id_col: str = "id") -> None:
    """M1 dup gate: raise if any batch id already exists."""
    n = batch.select(id_col).join(existing.select(id_col), id_col).count()
    if n:
        raise DuplicateIdError(f"{n} id(s) already exist. Use upsert() to update.")


def insert_batch(existing: DataFrame, batch: DataFrame, id_col: str = "id") -> DataFrame:
    check_new_ids(existing, batch, id_col)
    # open metadata schema: new columns appear as NULL on old rows (the
    # reference's dict metadata is schemaless; unionByName evolves ours)
    return existing.unionByName(batch, allowMissingColumns=True)


def upsert(existing: DataFrame, batch: DataFrame, id_col: str = "id") -> DataFrame:
    """M3 — delete-then-insert: batch rows replace same-id rows."""
    kept = existing.join(batch.select(id_col), id_col, "left_anti")
    return kept.unionByName(batch, allowMissingColumns=True)


def delete_ids(existing: DataFrame, ids: DataFrame | list, id_col: str = "id") -> DataFrame:
    """M4 — anti-join rewrite."""
    if isinstance(ids, list):
        ids = local_df(
            existing.sparkSession, list(ids), f"{id_col} {dict(existing.dtypes)[id_col]}"
        )
    return existing.join(F.broadcast(ids.select(id_col)), id_col, "left_anti")


def delete_by_filter(existing: DataFrame, predicate: Column) -> DataFrame:
    """M5 — keep rows NOT matching (missing-field semantics of the
    predicate library apply: a row with a missing field never matches the
    delete predicate, so it is kept)."""
    return existing.filter(~F.coalesce(predicate, F.lit(False)))


def update_merge(
    existing: DataFrame,
    changes: DataFrame,
    id_col: str = "id",
    merge_cols: list[str] | None = None,
) -> DataFrame:
    """M6 — per-column merge: changes win where present, else keep old
    (metadata-merge semantics; a NULL in changes means 'leave as is')."""
    cols = merge_cols or [c for c in changes.columns if c != id_col]
    renamed = changes.select(
        F.col(id_col), *[F.col(c).alias(f"__new_{c}") for c in cols]
    )
    out = existing.join(F.broadcast(renamed), id_col, "left")
    for c in cols:
        out = out.withColumn(c, F.coalesce(F.col(f"__new_{c}"), F.col(c))).drop(f"__new_{c}")
    return out


def cascade_delete_nodes(
    nodes: DataFrame,
    edges: DataFrame,
    node_ids: list[str],
) -> tuple[DataFrame, DataFrame]:
    """M7 — drop nodes and every edge touching them (graph.py:620-658's
    index maintenance collapses to two anti-joins)."""
    spark = nodes.sparkSession
    ids = local_df(spark, list(node_ids), "id string")
    new_nodes = nodes.join(F.broadcast(ids), "id", "left_anti")
    new_edges = (
        edges.join(F.broadcast(ids.select(F.col("id").alias("src"))), "src", "left_anti")
        .join(F.broadcast(ids.select(F.col("id").alias("dst"))), "dst", "left_anti")
    )
    return new_nodes, new_edges
