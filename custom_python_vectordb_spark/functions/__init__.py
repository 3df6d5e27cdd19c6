from custom_python_vectordb_spark.functions.distances import (
    cosine_distance,
    cosine_similarity,
    dot_distance,
    dot_product,
    hamming_distance,
    l2_distance,
    l2_norm,
    l2_normalize,
    distance_expr,
)
from custom_python_vectordb_spark.functions.filters import Filter, FilterOp, compile_filter, filter_from_dict

__all__ = [
    "cosine_distance",
    "cosine_similarity",
    "dot_distance",
    "dot_product",
    "hamming_distance",
    "l2_distance",
    "l2_norm",
    "l2_normalize",
    "distance_expr",
    "Filter",
    "FilterOp",
    "compile_filter",
    "filter_from_dict",
]
