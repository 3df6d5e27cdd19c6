"""Expression-level let-binding for Catalyst columns.

Higher-order functions (transform / filter / aggregate / zip_with) are
CodegenFallback: any expression tree containing one is evaluated
INTERPRETED, where there is no runtime subexpression elimination — every
reference to a shared Column re-walks and re-computes its whole subtree,
and a reference from inside another HOF's lambda re-computes it PER
ELEMENT. Python-side Column reuse looks free and is not.

`let_once(value, body)` gives the bound expression exactly one evaluation
site: the value is wrapped in a single-element array and `body` is mapped
over it, so every reference inside `body` is a lambda-variable read.

Measured effects in this repo (sf0.1, local[32]):
- langid argmax (folded when/otherwise chain, 2^langs duplication — 88
  tokenize subtrees): 5.4 s → 0.5 s once let-bound;
- cosine_similarity's (a·b, a·a, b·b) accumulator struct referenced three
  times = three full array passes per pair until let-bound.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def let_once(value: Column, body) -> Column:
    """Single-evaluation let-binding: `body` (Column -> Column) sees `value`
    as a lambda variable, evaluated exactly once per row regardless of how
    many times `body` references it."""
    return F.element_at(F.transform(F.array(value), body), 1)
