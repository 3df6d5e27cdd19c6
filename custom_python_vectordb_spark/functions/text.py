"""Text expression library (SURVEY.md §2.8 E6/E7/E12).

Tokenizer parity: the reference tokenizes with lowercase + ``\\b\\w+\\b``
(``hybrid_search.py:71-75``). For the ASCII corpora used in tests this is
exactly "split on non-[a-z0-9_] and drop empties", which both Spark and the
DuckDB oracle express identically — so that split form is our canonical
tokenizer (documented divergence: non-ASCII word chars).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT = "[^a-z0-9_]+"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokenize(col: Column | str) -> Column:
    """lowercase → split on non-word runs → drop empties. Array<string>."""
    return F.filter(F.split(F.lower(_c(col)), TOKEN_SPLIT), lambda x: x != F.lit(""))


def tokenize_py(text: str) -> list[str]:
    """Driver-side twin of :func:`tokenize` for constant query strings."""
    import re

    return [t for t in re.split(TOKEN_SPLIT, text.lower()) if t]


def duck_tokenize(col: str) -> str:
    """DuckDB-SQL twin of :func:`tokenize`."""
    return f"list_filter(regexp_split_to_array(lower({col}), '{TOKEN_SPLIT}'), x -> x <> '')"


def extract_text(*cols: Column | str, sep: str = " ") -> Column:
    """E7 — concat string fields into the indexable document text
    (``hybrid_search.py:266-281``)."""
    return F.concat_ws(sep, *[_c(c) for c in cols])


def slugify(col: Column | str) -> Column:
    """E12 — the reference's id-slugging (lower + spaces→underscores,
    ``query_news_db.py:329,336``)."""
    return F.regexp_replace(F.lower(_c(col)), " ", "_")
