"""Missing-field (NULL) semantics parity with the reference:
every predicate — including NE/NIN — is False on a missing field, and NOT
over a missing-field leaf is therefore True (vectordb_optimized.py:79-105)."""

from __future__ import annotations

import pytest

from custom_python_vectordb_spark.functions.filters import Filter


@pytest.fixture(scope="module")
def meta_df(spark):
    return spark.createDataFrame(
        [
            (0, "news", 5),
            (1, "blog", None),
            (2, None, 3),
        ],
        "id long, category string, score int",
    )


def ids(df, cond):
    return sorted(r["id"] for r in df.filter(cond).collect())


def test_eq_missing_false(meta_df):
    assert ids(meta_df, Filter.where("category", "eq", "news").column) == [0]


def test_ne_missing_false(meta_df):
    # row 2 has category NULL -> NE must NOT match (not SQL IS DISTINCT FROM)
    assert ids(meta_df, Filter.where("category", "ne", "news").column) == [1]


def test_nin_missing_false(meta_df):
    assert ids(meta_df, Filter.where("category", "nin", ["news"]).column) == [1]


def test_not_eq_missing_true(meta_df):
    # NOT(eq) over missing field: leaf False -> NOT True (reference combinator)
    assert ids(meta_df, (~Filter.where("category", "eq", "news")).column) == [1, 2]


def test_numeric_ops(meta_df):
    assert ids(meta_df, Filter.where("score", "gt", 3).column) == [0]
    assert ids(meta_df, Filter.where("score", "gte", 3).column) == [0, 2]
    assert ids(meta_df, Filter.where("score", "lt", 5).column) == [2]
    assert ids(meta_df, Filter.where("score", "lte", 5).column) == [0, 2]


def test_combinators(meta_df):
    f = Filter.where("category", "eq", "news") | Filter.where("score", "eq", 3)
    assert ids(meta_df, f.column) == [0, 2]
    f = Filter.where("category", "in", ["news", "blog"]) & ~Filter.where("score", "gte", 5)
    assert ids(meta_df, f.column) == [1]


def test_from_dict(meta_df):
    assert ids(meta_df, Filter.from_dict({"category": "news", "score": 5}).column) == [0]
    assert ids(meta_df, Filter.from_dict({}).column) == [0, 1, 2]


def test_contains_regex(meta_df):
    assert ids(meta_df, Filter.where("category", "contains", "log").column) == [1]
    assert ids(meta_df, Filter.where("category", "regex", "^n.*s$").column) == [0]
