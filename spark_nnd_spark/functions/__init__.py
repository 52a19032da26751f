from spark_nnd_spark.functions.numeric import (
    round_half_up_expr,
    round_half_up_sql,
)
from spark_nnd_spark.functions.vector import (
    similarity_expr,
    subtract_expr,
    l2_distance_expr,
    cosine_similarity_expr,
    dot_expr,
    norm_expr,
)

__all__ = [
    "round_half_up_expr",
    "round_half_up_sql",
    "similarity_expr",
    "subtract_expr",
    "l2_distance_expr",
    "cosine_similarity_expr",
    "dot_expr",
    "norm_expr",
]
