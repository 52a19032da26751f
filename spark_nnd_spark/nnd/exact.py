"""Exact K-NN graph — brute force, partition-local.

The Phase-1 vertical slice (SURVEY.md §7): answers the same question as
``build_graph`` (NND.scala:66) exactly, and doubles as the correctness
oracle for the approximate NN-Descent implementation.

Semantics reproduced from the reference:

- similarity = ``1/(1 + L2)``; cross-``partition`` pairs are -inf, i.e.
  excluded (NND.scala:296-306) — expressed here as a join *on*
  ``partition``, which also tells Catalyst the search space is
  partition-local (shuffle keys on `partition`, no cross-partition
  traffic at all rather than scored-then-discarded pairs).
- ``finished`` rows are excluded from the build and come back with
  ``neighbors = NULL`` via the final left join (NND.scala:71,277).
- no self-edges (NND.scala:99); ≤ K neighbors; lists sorted by
  similarity desc, id asc (id tiebreak added for determinism —
  SURVEY.md §4 defect 3).
- a point alone in its partition gets an empty (not null) neighbor list.

Scale: O(N² / P) pairs per partition — this is the oracle, not the scale
path (that's ``build_graph``). Still written shuffle-consciously: one
self-join keyed on ``partition`` + one window + one final left join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spark_nnd_spark.functions.vector import similarity_expr
from spark_nnd_spark.schemas import normalize_points, validate_points


def build_graph_exact(
    df: DataFrame, k: int, validate: bool = True, blocks: int | None = None
) -> DataFrame:
    """Exact K-NN graph under the reference similarity.

    Returns the input columns plus ``neighbors
    ARRAY<STRUCT<id BIGINT, similarity DOUBLE>>`` (null for finished rows).

    The all-pairs product is block-decomposed: joining on ``partition``
    alone puts every pair of a logical partition in ONE task (with the
    common single-`partition` input, the whole N² product serializes).
    Instead the left side is hashed into ``blocks`` buckets and the
    right side replicated to each, so the join key (partition, block)
    spreads the product over ``blocks`` tasks — the standard
    replicate-side nested-loop decomposition.
    """
    points = normalize_points(df)
    if validate:
        validate_points(points)

    spark = df.sparkSession
    if blocks is None:
        blocks = spark.sparkContext.defaultParallelism

    active = points.filter(~F.col("finished")).select("id", "features", "partition")

    left = active.select(
        F.col("id").alias("a_id"),
        F.col("features").alias("a_features"),
        F.col("partition").alias("partition"),
        F.pmod(F.xxhash64("id"), F.lit(blocks)).alias("block"),
    )
    right = active.select(
        F.col("id").alias("b_id"),
        F.col("features").alias("b_features"),
        F.col("partition").alias("partition"),
        F.explode(F.sequence(F.lit(0), F.lit(blocks - 1))).alias("block"),
    )
    # force a shuffle join on (partition, block) — a broadcast of the
    # replicated side would leave the stream side's (often single) input
    # split as the only task
    pairs = (
        left.repartition(blocks, "partition", "block")
        .join(right, on=["partition", "block"])
        .filter(F.col("a_id") != F.col("b_id"))
        .withColumn("similarity", similarity_expr("a_features", "b_features"))
    )

    w = Window.partitionBy("a_id").orderBy(F.desc("similarity"), F.asc("b_id"))
    topk = (
        pairs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .groupBy("a_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("__rn"), F.col("b_id"), F.col("similarity")))
            ).alias("__ranked")
        )
        .select(
            F.col("a_id").alias("id"),
            F.transform(
                "__ranked",
                lambda s: F.struct(
                    s["b_id"].alias("id"), s["similarity"].alias("similarity")
                ),
            ).alias("neighbors"),
        )
    )

    # Active singletons (alone in their partition) must get [] not null;
    # finished rows must get null. Left join + coalesce gated on finished.
    return (
        points.join(topk, on="id", how="left")
        .withColumn(
            "neighbors",
            F.when(F.col("finished"), F.lit(None).cast(topk.schema["neighbors"].dataType))
            .otherwise(
                F.coalesce(
                    F.col("neighbors"),
                    F.array().cast(topk.schema["neighbors"].dataType),
                )
            ),
        )
    )
