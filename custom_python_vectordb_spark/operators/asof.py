"""As-of (time-travel) join — a custom operator Spark lacks natively.

For each left row, attach the most recent right row with right.ts ≤ left.ts
within the same key (backward as-of). Implemented as the classic
union-sort-window composition — NO range/theta join, one shuffle on
(key), per-partition sorted window:

    union(left tagged 1, right tagged 0)
    window by key ordered (ts, tag) rows unbounded-preceding..current
    left rows read last_value(right payload, ignorenulls=True)

Right rows sort before left rows at equal ts, so ties are inclusive
(right.ts == left.ts matches), matching DuckDB's `ASOF JOIN … ON l.ts >=
r.ts` oracle semantics.

Scale: cost = one hash shuffle on the key + a sort within partitions —
same shape as any windowed aggregation; no per-row probing, no broadcast
needed, skew bounded by the hottest key (salt via operators/skew.py if a
key dominates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Left rows + `prefix`-ed columns of the latest right row with
    right.ts ≤ left.ts (NULLs when no prior right row exists)."""
    right_cols = right_cols or [c for c in right.columns if c not in (key, ts_col)]

    l_tagged = left.withColumn("__is_left", F.lit(1))
    r_payload = right.select(
        F.col(key),
        F.col(ts_col),
        F.lit(0).alias("__is_left"),
        F.struct(F.col(ts_col).alias("__rts"), *[F.col(c) for c in right_cols]).alias("__r"),
    )
    for c in left.columns:
        if c not in (key, ts_col):
            r_payload = r_payload.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    l_tagged = l_tagged.withColumn("__r", F.lit(None).cast(r_payload.schema["__r"].dataType))

    unioned = l_tagged.select(r_payload.columns).unionByName(r_payload)
    # Third sort key: the right payload struct itself, so that when several
    # right rows share (key, ts) the carried row is the max payload —
    # deterministic across runs/partitionings (repo convention: every ordered
    # operator has a total order), instead of whichever row the sort left last.
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts_col).asc(), F.col("__is_left").asc(), F.col("__r").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("__last_r", F.last("__r", ignorenulls=True).over(w))
    out = carried.filter(F.col("__is_left") == 1).drop("__is_left", "__r")
    out = out.withColumn(f"{prefix}ts", F.col("__last_r.__rts"))
    for c in right_cols:
        out = out.withColumn(f"{prefix}{c}", F.col(f"__last_r.{c}"))
    return out.drop("__last_r")
