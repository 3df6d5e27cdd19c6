"""Top-k patterns (SURVEY.md §2.4).

The reference's argpartition top-k (``vectordb_optimized.py:694-707``) and
chunked parallel top-k + merge (``parallel_search.py:313-368,137-156``) are
both the SAME distributed algorithm Spark already implements:

- global top-k      → `ORDER BY … LIMIT k` → TakeOrderedAndProject
  (per-partition partial top-k, merge at driver — exactly K4's chunked merge)
- per-group top-k   → `row_number() OVER (PARTITION BY g ORDER BY …) <= k`
  → Spark ≥3.5 rewrites via WindowGroupLimit into per-partition partial
  limiting BEFORE the shuffle, so the full corpus never shuffles.

Both verified via .explain in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, k: int, *order: Column) -> DataFrame:
    """Global top-k → TakeOrderedAndProject (O(n) select, per-partition)."""
    return df.orderBy(*order).limit(k)


def top_k_per_group(
    df: DataFrame,
    group: str | list[str],
    k: int,
    *order: Column,
    rank_col: str | None = None,
) -> DataFrame:
    """Per-group top-k via row_number window (WindowGroupLimit pushes the
    limit below the shuffle). `order` must be deterministic — callers always
    pass a unique tie-breaker column last."""
    groups = [group] if isinstance(group, str) else list(group)
    w = Window.partitionBy(*groups).orderBy(*order)
    name = rank_col or "__rank"
    out = df.withColumn(name, F.row_number().over(w)).filter(F.col(name) <= k)
    return out if rank_col else out.drop(name)
