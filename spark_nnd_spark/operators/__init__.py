from spark_nnd_spark.operators.relational import (
    group_top_k,
    dedup_with_preference,
    sample_per_group,
)

__all__ = ["group_top_k", "dedup_with_preference", "sample_per_group"]
