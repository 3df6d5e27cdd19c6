"""Distance / similarity kernels as Catalyst column expressions.

Re-expresses the reference's scalar "expression library" (SURVEY.md §2.3):
cosine / L2 / inner-product over float vectors (``vectordb_optimized.py:
669-683``, ``parallel_search.py:119-134``) and Hamming over packed bits
(``quantization.py:356-374``).

Design rules:
- **JVM-side only.** Every kernel is `zip_with` + `aggregate` (higher-order
  functions execute inside codegen; no Python round-trip, no UDF in the hot
  path). A GEMM-style pandas-UDF batch path exists in ``operators/knn.py``
  for throughput benchmarking, asserted equal to these expressions in tests.
- **Canonical double math.** Elements are cast to double BEFORE any multiply
  so the exact same arithmetic is expressible in the DuckDB oracle
  (`CAST(v AS DOUBLE[])` + `list_inner_product`); float32 accumulation would
  drift between engines.
- Scores are *distances* (lower = better), matching the reference's contract
  (hnswlib convention, ``vectordb_optimized.py:49-53``).
- **One py4j call per kernel.** When operands are plain column names, the
  kernel is emitted as a single ``F.expr(...)`` SQL string parsed JVM-side
  — the Column-API lambda path costs ~40 py4j round trips PER higher-order
  function (~13 ms each, measured; plan build rivaled plan exec on the knn
  family before r10). The SQL parses to the same Catalyst nodes
  (ArrayTransform / ZipWith / ArrayAggregate) with the same arithmetic
  order, so results are bit-identical (asserted in tests/test_distances
  parity cases). Column operands fall back to the lambda path.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from custom_python_vectordb_spark.functions.expr import let_once

ColumnOrName = Column | str

_PLAIN_NAME = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _c(col: ColumnOrName) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _ref(col: ColumnOrName) -> str | None:
    """Backtick-quoted SQL reference for a plain column name; None for
    Column objects / dotted / exotic names (→ lambda-path fallback)."""
    if isinstance(col, str) and _PLAIN_NAME.match(col):
        return f"`{col}`"
    return None


def _refs(*cols: ColumnOrName) -> list[str] | None:
    out = [_ref(c) for c in cols]
    return None if any(r is None for r in out) else out  # type: ignore[return-value]


def _dbl(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def _dbl_sql(ref: str) -> str:
    return f"transform({ref}, x -> CAST(x AS DOUBLE))"


def _dot_sql(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({_dbl_sql(a)}, {_dbl_sql(b)}, (x, y) -> x * y), "
        f"0.0D, (acc, x) -> acc + x)"
    )


def dot_product(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Σ a_i·b_i in double precision (sequential fold, oracle-reproducible)."""
    if refs := _refs(a, b):
        return F.expr(_dot_sql(*refs))
    prods = F.zip_with(_dbl(_c(a)), _dbl(_c(b)), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: ColumnOrName) -> Column:
    if (r := _ref(a)) is not None:
        return F.expr(f"sqrt({_dot_sql(r, r)})")
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Zero-norm operands ⇒ similarity 0 (distance 1): NumPy would emit
    nan-with-warning, ANSI Spark would THROW on the 0/0 — neither is usable
    when a 100 TB corpus inevitably contains a zero vector.

    Single-pass struct accumulator: (a·b, a·a, b·b) in ONE array traversal
    instead of three separate aggregates. Each component is the same
    sequential left-fold of doubles as the three-pass form, so results
    (and the DuckDB oracle hash) are bit-identical. The accumulator is
    let-bound: HOF-bearing expressions evaluate interpreted (no CSE), so
    referencing `s` three times without the binding would re-run the whole
    fold three times per row."""
    if refs := _refs(a, b):
        ra, rb = refs
        return F.expr(
            "element_at(transform(array(aggregate("
            f"zip_with({_dbl_sql(ra)}, {_dbl_sql(rb)}, "
            "(x, y) -> named_struct('x', x, 'y', y)), "
            "named_struct('ab', 0.0D, 'aa', 0.0D, 'bb', 0.0D), "
            "(acc, p) -> named_struct("
            "'ab', acc.ab + p.x * p.y, "
            "'aa', acc.aa + p.x * p.x, "
            "'bb', acc.bb + p.y * p.y))), "
            "s -> CASE WHEN (sqrt(s.aa) * sqrt(s.bb)) > 0.0D "
            "THEN s.ab / (sqrt(s.aa) * sqrt(s.bb)) ELSE 0.0D END), 1)"
        )
    zipped = F.zip_with(
        _dbl(_c(a)), _dbl(_c(b)), lambda x, y: F.struct(x.alias("x"), y.alias("y"))
    )
    acc0 = F.struct(
        F.lit(0.0).alias("ab"), F.lit(0.0).alias("aa"), F.lit(0.0).alias("bb")
    )
    s = F.aggregate(
        zipped,
        acc0,
        lambda acc, p: F.struct(
            (acc["ab"] + p["x"] * p["y"]).alias("ab"),
            (acc["aa"] + p["x"] * p["x"]).alias("aa"),
            (acc["bb"] + p["y"] * p["y"]).alias("bb"),
        ),
    )

    def _sim(sb: Column) -> Column:
        denom = F.sqrt(sb["aa"]) * F.sqrt(sb["bb"])
        return F.when(denom > 0.0, sb["ab"] / denom).otherwise(F.lit(0.0))

    return let_once(s, _sim)


def cosine_distance(a: ColumnOrName, b: ColumnOrName) -> Column:
    """1 − cos(a,b), as in ``vectordb_optimized.py:669-676``."""
    return F.lit(1.0) - cosine_similarity(a, b)


def cosine_distance_prenormed(
    a: ColumnOrName, b: ColumnOrName, a_norm: ColumnOrName, b_norm: ColumnOrName
) -> Column:
    """1 − cos(a,b) given PRE-COMPUTED row norms.

    Bit-identical to :func:`cosine_distance` (`dot/(‖a‖·‖b‖)` with the same
    multiply order), but the norms are projected once per ROW below the
    join instead of re-aggregated per PAIR — in a Q-query kNN cross join
    this cuts the per-pair array passes from 3 (dot + both norms) to 1,
    and the corpus-side norm from N·Q aggregations to N."""
    if refs := _refs(a, b, a_norm, b_norm):
        ra, rb, rn, qn = refs
        return F.expr(
            f"1.0D - (CASE WHEN ({rn} * {qn}) > 0.0D "
            f"THEN {_dot_sql(ra, rb)} / ({rn} * {qn}) ELSE 0.0D END)"
        )
    denom = _c(a_norm) * _c(b_norm)
    return F.lit(1.0) - F.when(
        denom > 0.0, dot_product(a, b) / denom
    ).otherwise(F.lit(0.0))


def _sq_l2_sql(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({_dbl_sql(a)}, {_dbl_sql(b)}, "
        f"(x, y) -> (x - y) * (x - y)), 0.0D, (acc, x) -> acc + x)"
    )


def l2_distance(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Euclidean distance (``vectordb_optimized.py:677-680``)."""
    if refs := _refs(a, b):
        return F.expr(f"sqrt({_sq_l2_sql(*refs)})")
    diffs = F.zip_with(_dbl(_c(a)), _dbl(_c(b)), lambda x, y: (x - y) * (x - y))
    return F.sqrt(F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x))


def sq_l2_distance(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Squared L2 — cheaper when only ordering matters."""
    if refs := _refs(a, b):
        return F.expr(_sq_l2_sql(*refs))
    diffs = F.zip_with(_dbl(_c(a)), _dbl(_c(b)), lambda x, y: (x - y) * (x - y))
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def dot_distance(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Inner-product 'distance' = −a·b (``vectordb_optimized.py:681-683``)."""
    return -dot_product(a, b)


def l2_normalize(a: ColumnOrName) -> Column:
    """v / ‖v‖ (pervasive pre-processing in the reference, e.g.
    ``parallel_search.py:270-276``). Zero vectors pass through unchanged.

    Both the vector cast and the norm are let-bound: un-bound, the norm
    subtree (itself a full array fold) sits inside the divide lambda and
    interpreted HOF evaluation recomputes it PER ELEMENT — O(D²) per row."""
    if (r := _ref(a)) is not None:
        return F.expr(
            f"element_at(transform(array({_dbl_sql(r)}), v -> "
            "element_at(transform(array(sqrt(aggregate("
            "zip_with(v, v, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x))), "
            "n -> CASE WHEN n = 0.0D THEN v "
            "ELSE transform(v, x -> x / n) END), 1)), 1)"
        )

    def _norm_then(vec: Column) -> Column:
        norm = F.sqrt(
            F.aggregate(F.zip_with(vec, vec, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
        )
        return let_once(
            norm,
            lambda n: F.when(n == 0.0, vec).otherwise(F.transform(vec, lambda x: x / n)),
        )

    return let_once(_dbl(_c(a)), _norm_then)


def hamming_distance(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Popcount of XOR over arrays of packed 64-bit words
    (``quantization.py:356-374`` packs bits with np.packbits; we pack into
    BIGINT words — `bit_count(x ^ y)` is a single codegen intrinsic)."""
    if refs := _refs(a, b):
        ra, rb = refs
        return F.expr(
            f"aggregate(zip_with({ra}, {rb}, (x, y) -> bit_count(x ^ y)), "
            "CAST(0 AS BIGINT), (acc, x) -> acc + CAST(x AS BIGINT))"
        )
    words = F.zip_with(_c(a), _c(b), lambda x, y: F.bit_count(x.bitwiseXOR(y)))
    return F.aggregate(words, F.lit(0).cast("long"), lambda acc, x: acc + x.cast("long"))


_METRICS = {
    "cosine": cosine_distance,
    "l2": l2_distance,
    "ip": dot_distance,
    "dot": dot_distance,
}


def distance_expr(metric: str, a: ColumnOrName, b: ColumnOrName) -> Column:
    """Dispatch by metric name (enum parity with ``vectordb_optimized.py:49-53``)."""
    try:
        fn = _METRICS[metric]
    except KeyError:
        raise ValueError(f"unknown metric {metric!r}; one of {sorted(_METRICS)}") from None
    return fn(a, b)


# DuckDB-oracle equivalents of the kernels above, as SQL snippet builders.
# Kept next to the Spark definitions so the two stay in lockstep.

def duck_dot(a: str, b: str) -> str:
    return f"list_inner_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"


def duck_cosine_distance(a: str, b: str) -> str:
    return (
        f"(1.0 - {duck_dot(a, b)} / "
        f"(sqrt({duck_dot(a, a)}) * sqrt({duck_dot(b, b)})))"
    )


def duck_l2_distance(a: str, b: str) -> str:
    return f"list_distance(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"


def duck_dot_distance(a: str, b: str) -> str:
    return f"(-{duck_dot(a, b)})"


DUCK_METRICS = {
    "cosine": duck_cosine_distance,
    "l2": duck_l2_distance,
    "ip": duck_dot_distance,
    "dot": duck_dot_distance,
}
