"""Graph operators over edge DataFrames.

Extension layer (SURVEY.md §7 Phase 4): near-duplicate *clustering* —
thresholded similarity pairs (MinHash-LSH / embedding near-dup / K-NNG
edges from ``build_graph``) grouped into transitive components, the
standard final step of corpus dedup (keep one doc per component).

``connected_components`` is iterative min-label propagation, the same
driver-loop-with-checkpoint shape as NN-Descent (descent.py A12/A13):
each round is one join + one min-aggregate, so a round costs two
shuffles of (id, label) pairs — O(E) longs, never payloads — and the
loop runs until labels stop changing (≤ graph diameter rounds; near-dup
components are shallow, so typically 2-4). ``localCheckpoint`` truncates
the per-round plan growth exactly as in the NND loop.

DuckDB-oracle-checkable: a recursive CTE computes min-reachable-id per
node (queries/pipeline.py q31).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 50,
) -> DataFrame:
    """Label every node reachable through ``pairs`` with the smallest id
    in its component.

    Returns (id, component) for each distinct node in the edge list.
    """
    half = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = half.unionByName(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()

    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iterations):
        msgs = edges.join(
            labels.withColumnRenamed("id", "src"), "src"
        ).select(F.col("dst").alias("id"), "component")
        new_labels = (
            msgs.unionByName(labels)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.withColumnRenamed("component", "new_component")
            .join(labels, "id")
            .filter(F.col("new_component") != F.col("component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break

    edges.unpersist()
    return labels.select("id", "component")
