"""Fuzzy record linkage: blocked edit-distance matching.

The training-data-pipeline operator for entity dedup across catalogs
(near-identical product/author/source names that exact dedup misses). The
reference has no linkage layer; this follows the standard blocking+verify
architecture every record-linkage system at scale uses:

- **block**: records join ONLY within a cheap equality key — here
  (first token, length band). Blocking turns the O(n²) all-pairs problem
  into Σ block² — the same never-all-pairs discipline as the LSH banded
  dedup (`operators/dedup.py`).
- **cap**: blocks larger than ``max_block`` are skipped entirely (the
  df-cap trick from `operators/spans.py`): a degenerate key ("the",
  empty string) can make one block quadratic at 100 TB; the cap bounds
  per-block fan-out at max_block² and the skip is DETERMINISTIC, so the
  DuckDB oracle states the same cap and results hash-match.
- **verify**: surviving pairs are scored with real Levenshtein distance
  (JVM `levenshtein`, whole-stage codegen — no UDF) and cut at
  ``max_distance``.

Blocking recall is approximate BY DESIGN (a pair whose first tokens
differ is never compared — the standard trade); both engines state the
same blocking, so the comparison is exact about the approximation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_pairs(
    records: DataFrame,
    id_col: str,
    name_col: str,
    *,
    max_distance: int = 2,
    max_block: int = 1000,
    length_band: int = 4,
) -> DataFrame:
    """(a, b, d): id pairs (a < b) whose lowercased `name_col` values are
    within `max_distance` edits, compared only inside
    (first-token, length div `length_band`) blocks of ≤ `max_block` rows."""
    t = records.select(
        F.col(id_col).alias("id"), F.lower(F.col(name_col)).alias("name")
    )
    b = t.select(
        "id",
        "name",
        F.split("name", " ").getItem(0).alias("tok0"),
        F.expr(f"length(name) div {length_band}").alias("lb"),
    )
    # qualifying blocks: a map-side-combined count whose RESULT is bounded
    # by the token vocabulary × length bands (sublinear in the corpus) —
    # like the LM tables, no broadcast hint: AQE sizes the join
    ok = (
        b.groupBy("tok0", "lb")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") <= max_block)
        .select("tok0", "lb")
    )
    bb = b.join(ok, ["tok0", "lb"])
    x = bb.select(
        "tok0", "lb", F.col("id").alias("a"), F.col("name").alias("na")
    )
    y = bb.select(
        "tok0", "lb", F.col("id").alias("b"), F.col("name").alias("nb")
    )
    return (
        x.join(y, ["tok0", "lb"])
        .filter(F.col("a") < F.col("b"))
        .select(
            "a", "b", F.levenshtein(F.col("na"), F.col("nb")).alias("d")
        )
        .filter(F.col("d") <= max_distance)
    )
