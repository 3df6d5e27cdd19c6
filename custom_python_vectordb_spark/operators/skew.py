"""Skew mitigation: salted joins and salted aggregation.

A shuffle join/agg hashes rows to reducers by key, so one hot key (a viral
document, a null-ish default, one dominant event_type) lands its ENTIRE
volume on one task — the classic straggler that turns a 1000-executor
cluster into a 1-executor cluster for the tail of the stage.

Two public remedies, both deterministic (no rand(): results and partition
membership are stable run-to-run, which the whole repo's oracle-checking
depends on):

- ``salted_join(large, small, key, salts)`` — the large side gets a salt
  derived from a unique column's hash, the small side is replicated once
  per salt value, and the join key becomes (key, salt): the hot key's rows
  spread over `salts` reducers. Result is row-identical to the plain join.
  Use when the small side is too big to broadcast AND AQE's skew-join
  splitting can't kick in (e.g. the skewed side feeds an aggregation, or
  the join is bucketed so AQE won't re-split). For genuinely small dims,
  prefer ``F.broadcast`` — zero shuffle beats a salted shuffle.

- ``salted_agg(df, key, salts, aggs)`` — two-phase aggregation for
  holistic-ish aggregates that Spark can't partially combine well (e.g.
  exact COUNT(DISTINCT x) per hot key, collect-heavy aggs): phase 1 groups
  by (key, salt) so each reducer sees 1/salts of the hot key, phase 2
  merges the partials by key alone. For algebraic aggs (sum/count/min/max)
  Spark's map-side partial aggregation already neutralizes skew — don't
  salt those.

The reference engine never needs this: a single process has no shuffle
(``parallel_search.py`` chunks one in-RAM matrix). On a cluster it is the
difference between a join that finishes and one that spills forever.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str | Sequence[str],
    salts: int = 16,
    *,
    salt_source: str | Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join `large` ⋈ `small` on `key`, spreading each key over `salts`
    reducers. Row-identical to ``large.join(small, key, how)``.

    `salt_source`: column/expression on the LARGE side whose hash picks the
    salt bucket (default: the whole row's remaining columns via xxhash64 —
    deterministic, no rand()). `how`: inner or left/left_outer (the small
    side is replicated, so right/full joins would duplicate its unmatched
    rows; use the plain join for those).
    """
    keys = [key] if isinstance(key, str) else list(key)
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    if salt_source is None:
        non_key = [c for c in large.columns if c not in keys]
        if not non_key:
            raise ValueError("large side needs ≥1 non-key column to derive a salt")
        src = F.xxhash64(*[F.col(c) for c in non_key])
    else:
        src = F.xxhash64(F.col(salt_source) if isinstance(salt_source, str) else salt_source)
    l_salted = large.withColumn(_SALT, F.pmod(src, F.lit(salts)).cast("int"))
    r_replicated = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    return l_salted.join(r_replicated, keys + [_SALT], how).drop(_SALT)


def salted_count(df: DataFrame, key: str | Sequence[str], salts: int = 8) -> DataFrame:
    """Skew-safe ``groupBy(key).count()``: partial count per (key, salt),
    then final rollup — no single reducer ever sees a whole hot key. (For
    plain count Spark's map-side partial aggregation already neutralizes
    skew; this form is the template for collectors that don't combine.)"""
    keys = [key] if isinstance(key, str) else list(key)
    non_key = [c for c in df.columns if c not in keys]
    src = F.xxhash64(*[F.col(c) for c in non_key]) if non_key else F.lit(0)
    partial = (
        df.withColumn(_SALT, F.pmod(src, F.lit(salts)).cast("int"))
        .groupBy(*keys, _SALT)
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    return partial.groupBy(*keys).agg(F.sum("__n").alias("count"))


def salted_agg(
    df: DataFrame,
    key: str | Sequence[str],
    partial_aggs: dict[str, Column],
    final_aggs: dict[str, Column],
    salts: int = 16,
    *,
    salt_source: str | Column | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    Phase 1 groups by (key, salt) applying `partial_aggs` (alias → agg
    column over the raw rows); phase 2 groups by key applying `final_aggs`
    (alias → agg column over the phase-1 partial columns). Example — exact
    distinct users per hot event_type::

        salted_agg(events, "event_type",
                   partial_aggs={"part_users": F.collect_set("user_id")},
                   final_aggs={"n_users": F.size(F.array_distinct(
                       F.flatten(F.collect_list("part_users"))))},
                   salt_source="user_id")

    Salting by the DISTINCT target (user_id) keeps each user in one salt
    bucket, so phase-2 distinct-merge is exact.
    """
    keys = [key] if isinstance(key, str) else list(key)
    if salt_source is None:
        non_key = [c for c in df.columns if c not in keys]
        src = F.xxhash64(*[F.col(c) for c in non_key]) if non_key else F.lit(0)
    else:
        src = F.xxhash64(F.col(salt_source) if isinstance(salt_source, str) else salt_source)
    salted = df.withColumn(_SALT, F.pmod(src, F.lit(salts)).cast("int"))
    partial = salted.groupBy(*keys, _SALT).agg(
        *[c.alias(a) for a, c in partial_aggs.items()]
    )
    return partial.groupBy(*keys).agg(*[c.alias(a) for a, c in final_aggs.items()])
