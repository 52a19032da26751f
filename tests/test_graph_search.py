"""Graph-served ANN search (nnd/search.py): recall on the clustered
fixture, same-seed determinism, partition-wall entry coverage,
tombstone-masked candidate dropout, and the no-corpus-shuffle plan
contract of the expand/score step."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from spark_nnd_spark.nnd.descent import build_graph
from spark_nnd_spark.nnd.search import (
    _expand_score,
    brute_topk_l2,
    entry_points,
    graph_search_topk,
)
from tests.conftest import make_clustered_points


pytestmark = pytest.mark.slow  # heavy tier: deselected from the default fast run

_SCHEMA = (
    "id long, features array<double>, label long, partition long, "
    "finished boolean"
)


def _fixture(spark, n_partitions: int = 1):
    rows = make_clustered_points(
        n_clusters=8, per_cluster=25, dim=8, n_partitions=n_partitions
    )
    return spark.createDataFrame(rows, _SCHEMA)


def test_recall_on_clustered_fixture(spark):
    pts = _fixture(spark)
    queries = pts.filter(F.col("id") % 40 == 0).select(
        F.col("id").alias("query_id"), F.col("features").alias("q_vec")
    )
    corpus = pts.join(
        queries.select(F.col("query_id").alias("id")), "id", "left_anti"
    ).localCheckpoint(eager=True)
    g = build_graph(corpus, k=10, max_iterations=5, seed=42, validate=False)
    # n_entry must cover the graph's connected components: a K-NNG of
    # well-separated clusters is one component PER CLUSTER, and greedy
    # search can never cross between them (nnd/search.py docstring) —
    # 32 seeds over 8 clusters makes a missed cluster ~(7/8)^32 rare.
    res = graph_search_topk(g, queries, k=5, ef=64, beam=16, n_entry=32, seed=42)
    brute = brute_topk_l2(corpus, queries, k=5).select("query_id", "nb_id")
    total = brute.count()
    hits = res.select("query_id", "nb_id").join(
        brute, ["query_id", "nb_id"]
    ).count()
    assert total == 5 * queries.count()
    assert hits / total >= 0.9


def test_same_seed_is_deterministic(spark):
    pts = _fixture(spark)
    queries = pts.filter(F.col("id") < 4).select(
        F.col("id").alias("query_id"), F.col("features").alias("q_vec")
    )
    corpus = pts.filter(F.col("id") >= 4).localCheckpoint(eager=True)
    g = build_graph(corpus, k=10, max_iterations=3, seed=42, validate=False)
    g = g.localCheckpoint(eager=True)
    a = graph_search_topk(g, queries, k=5, ef=32, beam=8, seed=7).collect()
    b = graph_search_topk(g, queries, k=5, ef=32, beam=8, seed=7).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_entry_points_cover_every_partition(spark):
    pts = _fixture(spark, n_partitions=4)
    ep = entry_points(
        pts.select("id", "features", "partition"), n_entry=3, seed=42
    )
    with_part = ep.join(pts.select("id", "partition"), "id")
    per_part = {
        r.partition: r.n
        for r in with_part.groupBy("partition").agg(F.count("*").alias("n")).collect()
    }
    assert set(per_part) == {0, 1, 2, 3}
    assert all(n == 3 for n in per_part.values())


def test_search_reaches_across_partition_walls(spark):
    """Edges never cross partitions, but SERVING is global: per-
    partition entry seeding makes every walled component reachable, so
    a query lands on its true cluster regardless of which partition
    holds it."""
    pts = _fixture(spark, n_partitions=4)
    # one query per cluster-partition combination, held out of the graph
    queries = pts.filter(F.col("id").isin([0, 26, 52, 78])).select(
        F.col("id").alias("query_id"),
        F.col("features").alias("q_vec"),
        F.col("label").alias("q_label"),
    )
    corpus = pts.join(
        queries.select(F.col("query_id").alias("id")), "id", "left_anti"
    ).localCheckpoint(eager=True)
    g = build_graph(corpus, k=10, max_iterations=5, seed=42, validate=False)
    res = graph_search_topk(
        g,
        queries.select("query_id", "q_vec"),
        k=5,
        ef=64,
        beam=16,
        n_entry=4,
        seed=42,
    )
    labeled = res.join(
        pts.select(F.col("id").alias("nb_id"), "label"), "nb_id"
    ).join(queries.select("query_id", "q_label"), "query_id")
    rows = labeled.collect()
    assert len(rows) == 4 * 5
    # every neighbor comes from the query's own Gaussian cluster
    assert all(r.label == r.q_label for r in rows)


def test_masked_ids_never_surface(spark):
    """Tombstone-read semantics: masking rows out of the graph removes
    them from adjacency AND the vector table, so stale in-list
    references to them drop out at the vector-fetch join — results
    never contain a masked id."""
    pts = _fixture(spark)
    g = build_graph(pts, k=10, max_iterations=3, seed=42, validate=False)
    g = g.localCheckpoint(eager=True)
    masked = g.filter(F.col("id") % 5 != 0)  # mask every 5th node
    queries = pts.filter(F.col("id") < 3).select(
        F.col("id").alias("query_id"), F.col("features").alias("q_vec")
    )
    res = graph_search_topk(masked, queries, k=5, ef=32, beam=8, seed=42)
    assert res.filter(F.col("nb_id") % 5 == 0).count() == 0
    assert res.count() == 3 * 5  # still k results each


def test_expand_score_plan_has_no_corpus_shuffle(spark):
    """The only corpus-touching step broadcast-joins the frontier; a
    SortMergeJoin here would mean the corpus shuffles per iteration."""
    pts = _fixture(spark)
    g = build_graph(pts, k=5, max_iterations=2, seed=42, validate=False)
    # materialized inputs, as graph_search_topk's loop sees them
    adj = g.filter(F.col("neighbors").isNotNull()).select(
        "id", F.transform("neighbors", lambda s: s["id"]).alias("nb_ids")
    ).localCheckpoint(eager=True)
    q = spark.createDataFrame(
        [(0, [0.0] * 8)], "query_id long, q_vec array<double>"
    )
    f_pairs = spark.createDataFrame([(0, 1)], "query_id long, id long")
    plan = (
        _expand_score(adj, pts.select("id", "features"), q, f_pairs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
