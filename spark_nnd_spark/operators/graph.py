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
    # Hash-partition the cached edges on the per-round join key: every
    # round joins edges⋈labels on src, and a persisted repartition lets
    # Catalyst reuse this distribution so only the (much smaller) labels
    # side shuffles per round instead of the full edge list.
    edges = (
        half.unionByName(
            half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .repartition("src")
        .persist()
    )

    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )
    # Convergence metric: labels are strictly non-increasing per node
    # (min-propagation can only lower a label; the pointer jump follows
    # a node to its component's label, which is ≤ the component id), so
    # the label sum is strictly decreasing until the fixpoint and
    # "sum unchanged" ⇔ "no node changed". One map-side-combined
    # aggregate per round — no join, no second action. DECIMAL(38,0)
    # keeps the sum exact for any realistic node count (int64 ids
    # could overflow a bigint sum at billions of nodes).
    label_sum = labels.agg(
        F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
    ).collect()[0]["s"]

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
        if on_round is not None:
            # Telemetry path: the hook contract reports an exact
            # changed-node count, which needs the label-vs-label join.
            changed = (
                new_labels.withColumnRenamed("component", "new_component")
                .join(labels, "id")
                .filter(F.col("new_component") != F.col("component"))
                .count()
            )
            labels = new_labels
            on_round(it + 1, int(changed))
            if changed == 0:
                break
        else:
            new_sum = new_labels.agg(
                F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
            ).collect()[0]["s"]
            labels = new_labels
            # NULL sum (decimal overflow under non-ANSI mode, or an
            # empty input) must never masquerade as a fixpoint: treat
            # it as not-converged and keep iterating — the loop is then
            # bounded by max_rounds instead of a spurious None == None.
            if new_sum is not None and new_sum == label_sum:
                break
            label_sum = new_sum

    edges.unpersist()
    return labels.select("id", "component")


def pagerank(
    pairs: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Fixed-iteration PageRank over an undirected pair list — the
    centrality layer on top of the near-dup graph (which documents are
    the 'hubs' of a duplication cluster — the canonical copies other
    docs orbit). Undirected pairs become two directed edges; ranks
    start uniform at 1/N and update ``iterations`` times with the
    standard damped rule r(v) = 0.15/N + damping·Σ r(u)/deg(u).

    A FIXED iteration count (not convergence-tested) keeps the result
    an exact closed-form arithmetic expression, so a DuckDB oracle can
    replay it by unrolling the same iterations (queries/pipeline.py
    q96). Returns (id, deg, rank) for every node that appears in a
    pair; rank unrounded.

    Scale: edges are distributed by src once and checkpointed (per
    round, only (id, rank/deg) doubles shuffle — O(E) per iteration,
    the same budget as one connected-components round); N comes from
    one O(nodes) aggregate collapsed to a driver literal so the base
    term folds into codegen. Each iteration checkpoints to stop plan
    growth — the descent.py A13 discipline.
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .repartition("src")
        .localCheckpoint(eager=True)
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("deg")).localCheckpoint(eager=True)
    n = deg.count()
    if n == 0:
        return deg.select(
            F.col("src").alias("id"), "deg", F.lit(0.0).alias("rank")
        )
    nodes = deg.select(F.col("src").alias("id"), "deg")
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iterations):
        inflow = (
            edges.join(ranks.withColumnRenamed("id", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("inflow"))
        )
        ranks = (
            nodes.join(inflow.withColumnRenamed("dst", "id"), "id", "left")
            .withColumn(
                "rank",
                F.lit(0.15 / n)
                + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0)),
            )
            .select("id", "deg", "rank")
            .localCheckpoint(eager=True)
        )
    return ranks


def label_propagation(
    pairs: DataFrame,
    iterations: int = 2,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Deterministic synchronous label propagation: every node starts
    as its own label; each round, a node adopts the MOST FREQUENT label
    among its neighbors, ties broken by the smallest label (the
    determinism the classic randomized LPA lacks — and what lets a
    fixed-iteration run be replayed exactly by the SQL oracle).
    Communities differ from connected components: a weakly-attached
    bridge node joins its denser side rather than fusing both sides,
    which is the distinction that matters when near-dup 'components'
    are chains of borderline pairs.

    Scale: per round, one join of the (id, label) table against the
    pre-partitioned edge list + one (dst, label) count aggregate + one
    per-node argmax window over O(distinct neighbor labels) rows —
    labels-only shuffles, edges exchanged once up front, the
    connected_components layout. Fixed iteration count keeps it
    oracle-replayable (the PageRank q96 convention).
    """
    from pyspark.sql import Window  # noqa: PLC0415

    half = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = (
        half.unionByName(
            half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .repartition("src")
        .persist()
    )
    labels = edges.select(F.col("src").alias("id")).distinct().withColumn(
        "label", F.col("id")
    )
    for _ in range(iterations):
        votes = (
            edges.join(labels, edges.src == labels.id)
            .groupBy(F.col("dst"), F.col("label"))
            .agg(F.count("*").alias("n"))
        )
        w = Window.partitionBy("dst").orderBy(F.desc("n"), F.asc("label"))
        labels = (
            votes.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("dst").alias("id"), "label")
            .localCheckpoint(eager=True)
        )
    edges.unpersist()
    return labels


def triangle_counts(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """Per-node triangle participation over an undirected edge list.

    Classic oriented wedge-join: orient every edge low-id → high-id,
    join wedges (a<b, a<c with b<c) on the shared low endpoint, then
    probe the oriented edge list for the closing (b, c) edge. Each
    triangle a<b<c is found exactly once, at its smallest vertex, so no
    dedup pass is needed. Orientation is the scale trick: wedge count
    is Σ deg_out(v)², and out-degree under low→high orientation is
    bounded by √(2E) for any graph — the skew cap that makes this
    tractable where a naive 3-way self-join explodes on hub nodes.
    Returns (id, n_triangles) for every node in ≥1 triangle.
    """
    e = pairs.select(
        F.least(F.col(id_a), F.col(id_b)).alias("lo"),
        F.greatest(F.col(id_a), F.col(id_b)).alias("hi"),
    ).distinct()
    w1 = e.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    w2 = e.select(F.col("lo").alias("a"), F.col("hi").alias("c"))
    wedges = w1.join(w2, "a").filter(F.col("b") < F.col("c"))
    closing = e.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
    tris = wedges.join(closing, ["b", "c"])  # rows (a, b, c), a<b<c
    per_node = (
        tris.select(F.explode(F.array("a", "b", "c")).alias("id"))
        .groupBy("id")
        .agg(F.count("*").alias("n_triangles"))
    )
    return per_node
