"""Query registry backing ``__spark_entry__.py``.

Every implemented operator from SURVEY.md §2 registers here as a named query
(callable (spark, sf_dir) → DataFrame) plus, when SQL-expressible, a DuckDB
oracle string over the pre-registered views (region nation customer supplier
part orders lineitem events documents embeddings).

Contract notes (driver compares row-count + schema + order-insensitive
value-hash at sf0.01):
- every computed column is aliased IDENTICALLY in Spark and SQL;
- float scores are computed in double and rounded to a fixed precision on
  both sides;
- every top-k / limit query has a total deterministic order (unique
  tie-breaker column).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

QUERIES: dict[str, Callable[[Any, str], Any]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a named query; `oracle` is the DuckDB-SQL equivalent (omit
    for genuinely non-SQL-expressible ops → driver does a rows-only check)."""

    def deco(fn):
        if name in QUERIES and QUERIES[name] is not fn:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query-defining module (idempotent)."""
    import custom_python_vectordb_spark.queries.spine  # noqa: F401
    for mod in (
        "text",
        "graph",
        "quantization",
        "pipeline",
        "mutation",
        "streaming",
        "cypher",
        "multimodal",
        "extras",
    ):
        try:
            __import__(f"custom_python_vectordb_spark.queries.{mod}")
        except ImportError:
            pass  # phase not built yet
