"""custom_python_vectordb_spark — a PySpark-native analytics/vector engine.

A from-scratch re-expression of the query and data-processing capabilities of
``jcolano/custom-python-vectordb`` (single-node Python/NumPy/hnswlib vector DB)
as an idiomatic Apache Spark engine: DataFrame/SQL logical plans, Catalyst
optimization, Parquet storage, Structured Streaming for the realtime layer.

Nothing here is a port: the reference defines WHAT to compute (operator
semantics, see SURVEY.md §2); execution strategy is Spark-first — broadcast
joins for small sides, partition-parallel top-k (TakeOrderedAndProject /
WindowGroupLimit), predicate pushdown to Parquet, Arrow-batched pandas UDFs
only where built-ins cannot express the semantics.
"""

from custom_python_vectordb_spark.session import get_spark
from custom_python_vectordb_spark.sources.catalog import TABLES, load_table, load_tables, register_views

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "__version__",
]
