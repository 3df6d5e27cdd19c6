"""Metadata predicate library (SURVEY.md §2.2).

Reproduces the reference's filter semantics (``FilterOp``
``vectordb_optimized.py:59-69``, ``FilterCondition.evaluate``
``vectordb_optimized.py:79-105``) as Catalyst Column expressions:

- ops: EQ NE GT GTE LT LTE IN NIN CONTAINS REGEX
- **missing field ⇒ predicate is False** — including NE/NIN. This is NOT SQL
  NULL semantics (SQL `x <> v` on NULL yields NULL → filtered, which happens
  to agree; but `NOT (x = v)` under our combinators must also be False for
  missing, so every leaf is wrapped `col IS NOT NULL AND …` to make the
  tri-state logic collapse to the reference's two-state logic).
- combinators AND / OR / NOT compose as Column `& | ~`
  (``Filter.and_/or_/not_`` ``vectordb_optimized.py:167-177``).

Because every leaf is null-guarded, NOT over a missing field yields True —
matching `Filter.not_` over a False leaf. The closure tree of the reference
IS Catalyst's expression tree here; pushdown to the Parquet scan is free.
"""

from __future__ import annotations

from enum import Enum
from functools import reduce
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F


class FilterOp(str, Enum):
    EQ = "eq"
    NE = "ne"
    GT = "gt"
    GTE = "gte"
    LT = "lt"
    LTE = "lte"
    IN = "in"
    NIN = "nin"
    CONTAINS = "contains"
    REGEX = "regex"


def _leaf(field: str, op: FilterOp, value: Any) -> Column:
    c = F.col(field)
    if op is FilterOp.EQ:
        pred = c == F.lit(value)
    elif op is FilterOp.NE:
        pred = c != F.lit(value)
    elif op is FilterOp.GT:
        pred = c > F.lit(value)
    elif op is FilterOp.GTE:
        pred = c >= F.lit(value)
    elif op is FilterOp.LT:
        pred = c < F.lit(value)
    elif op is FilterOp.LTE:
        pred = c <= F.lit(value)
    elif op is FilterOp.IN:
        pred = c.isin(list(value))
    elif op is FilterOp.NIN:
        pred = ~c.isin(list(value))
    elif op is FilterOp.CONTAINS:
        pred = c.contains(value)
    elif op is FilterOp.REGEX:
        pred = c.rlike(value)
    else:  # pragma: no cover
        raise ValueError(f"unknown op {op}")
    # missing field ⇒ False, for every op (vectordb_optimized.py:80-81)
    return c.isNotNull() & pred


class Filter:
    """Composable predicate; mirrors the reference's Filter builder API
    (``vectordb_optimized.py:108-184``) but compiles to a Catalyst Column."""

    def __init__(self, column: Column):
        self.column = column

    # -- construction -----------------------------------------------------
    @classmethod
    def where(cls, field: str, op: FilterOp | str, value: Any) -> "Filter":
        return cls(_leaf(field, FilterOp(op), value))

    @classmethod
    def from_dict(cls, conditions: dict[str, Any]) -> "Filter":
        """`{k: v, …}` → AND of equality (``vectordb_optimized.py:179-184``)."""
        if not conditions:
            return cls(F.lit(True))
        leaves = [_leaf(k, FilterOp.EQ, v) for k, v in conditions.items()]
        return cls(reduce(lambda a, b: a & b, leaves))

    # -- combinators ------------------------------------------------------
    def and_(self, other: "Filter") -> "Filter":
        return Filter(self.column & other.column)

    def or_(self, other: "Filter") -> "Filter":
        return Filter(self.column | other.column)

    def not_(self) -> "Filter":
        return Filter(~self.column)

    __and__ = and_
    __or__ = or_
    __invert__ = not_


def compile_filter(field: str, op: FilterOp | str, value: Any) -> Column:
    return Filter.where(field, op, value).column


def filter_from_dict(conditions: dict[str, Any]) -> Column:
    return Filter.from_dict(conditions).column


# DuckDB oracle equivalents — leaf predicate as SQL text with the same
# missing⇒False guard.
_DUCK_OPS = {
    FilterOp.EQ: lambda f, v: f"({f} IS NOT NULL AND {f} = {v})",
    FilterOp.NE: lambda f, v: f"({f} IS NOT NULL AND {f} <> {v})",
    FilterOp.GT: lambda f, v: f"({f} IS NOT NULL AND {f} > {v})",
    FilterOp.GTE: lambda f, v: f"({f} IS NOT NULL AND {f} >= {v})",
    FilterOp.LT: lambda f, v: f"({f} IS NOT NULL AND {f} < {v})",
    FilterOp.LTE: lambda f, v: f"({f} IS NOT NULL AND {f} <= {v})",
    FilterOp.IN: lambda f, v: f"({f} IS NOT NULL AND {f} IN {v})",
    FilterOp.NIN: lambda f, v: f"({f} IS NOT NULL AND {f} NOT IN {v})",
    FilterOp.CONTAINS: lambda f, v: f"({f} IS NOT NULL AND contains({f}, {v}))",
    FilterOp.REGEX: lambda f, v: f"({f} IS NOT NULL AND regexp_matches({f}, {v}))",
}


def duck_leaf(field: str, op: FilterOp | str, value_sql: str) -> str:
    return _DUCK_OPS[FilterOp(op)](field, value_sql)
