from spark_nnd_spark.functions.vector import (
    similarity_expr,
    subtract_expr,
    l2_distance_expr,
    cosine_similarity_expr,
    dot_expr,
    norm_expr,
)

__all__ = [
    "similarity_expr",
    "subtract_expr",
    "l2_distance_expr",
    "cosine_similarity_expr",
    "dot_expr",
    "norm_expr",
]
