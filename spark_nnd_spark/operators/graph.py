"""Graph operators over edge DataFrames.

Extension layer (SURVEY.md §7 Phase 4): near-duplicate *clustering* —
thresholded similarity pairs (MinHash-LSH / embedding near-dup / K-NNG
edges from ``build_graph``) grouped into transitive components, the
standard final step of corpus dedup (keep one doc per component).

``connected_components`` is iterative min-label propagation, the same
driver-loop-with-checkpoint shape as NN-Descent (descent.py A12/A13):
each round is one join + one min-aggregate + one pointer-jump self-join,
so a round costs three shuffles of (id, label) pairs — O(E) longs, never
payloads — and the loop runs until labels stop changing. Pointer jumping
(path compression) makes the round count O(log diameter), so worst-case
chain graphs converge in ~log₂(N) rounds while shallow near-dup
components still finish in 2-4. ``localCheckpoint`` truncates the
per-round plan growth exactly as in the NND loop.

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
    on_round=None,
) -> DataFrame:
    """Label every node reachable through ``pairs`` with the smallest id
    in its component.

    ``on_round``, if given, is called with ``(round_index,
    changed_count)`` after each round — progress/telemetry hook (same
    contract as ``build_graph``'s ``on_iteration``).

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

    for it in range(max_iterations):
        msgs = edges.join(
            labels.withColumnRenamed("id", "src"), "src"
        ).select(F.col("dst").alias("id"), "component")
        # Materialized (same discipline as the labels checkpoint): the
        # pointer-jump self-join below consumes `propagated` on BOTH
        # sides, and without a cut Catalyst re-executes the
        # join+min-aggregate subtree once per consumer.
        propagated = (
            msgs.unionByName(labels)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        # Pointer jumping (path compression): component ids are always
        # real node ids within the same component, so follow one level —
        # component(v) <- component(component(v)). Label chains halve
        # each round, making convergence O(log diameter) instead of
        # O(diameter): a 1e6-node chain needs ~20 rounds, not 1e6. Costs
        # one extra id-only shuffle per round (the self-join).
        new_labels = (
            propagated.join(
                propagated.select(
                    F.col("id").alias("component"), F.col("component").alias("__cc")
                ),
                "component",
                "left",
            )
            .select("id", F.coalesce("__cc", "component").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.withColumnRenamed("component", "new_component")
            .join(labels, "id")
            .filter(F.col("new_component") != F.col("component"))
            .count()
        )
        labels = new_labels
        if on_round is not None:
            on_round(it + 1, int(changed))
        if changed == 0:
            break

    edges.unpersist()
    return labels.select("id", "component")
