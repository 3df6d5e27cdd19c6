"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``custom_python_vectordb_spark``; this file only
adapts the registry to the driver's interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from custom_python_vectordb_spark import registry

registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: filtered exact cosine kNN over sf0.001 embeddings
    (scan → pushed-down filter → broadcast queries → distance expression →
    per-query top-k via WindowGroupLimit)."""
    return registry.QUERIES["knn_filtered"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    return registry.resolved_oracles()
