"""NN-Descent correctness: recall vs brute-force oracle, invariants,
determinism, convergence behaviors (SURVEY.md §5)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_nnd_spark import build_graph, build_graph_exact
from tests.conftest import POINT_DDL, knn_oracle, make_clustered_points

K = 10


@pytest.fixture(scope="module")
def clustered(spark):
    rows = make_clustered_points(n_clusters=10, per_cluster=40, dim=8, seed=42)
    return rows, spark.createDataFrame(rows, POINT_DDL)


@pytest.fixture(scope="module")
def built(clustered):
    rows, df = clustered
    g = build_graph(df, k=K, max_iterations=5, early_termination=0.01, seed=7)
    return rows, {r["id"]: r for r in g.collect()}


def test_recall_vs_oracle(built):
    rows, by_id = built
    oracle = knn_oracle(rows, K)
    hits = total = 0
    for i, expected in oracle.items():
        got = {n["id"] for n in (by_id[i]["neighbors"] or [])}
        want = {j for j, _ in expected}
        hits += len(got & want)
        total += len(want)
    recall = hits / total
    assert recall >= 0.9, f"recall {recall:.3f} < 0.9"


def test_invariants(built):
    rows, by_id = built
    part = {r[0]: r[3] for r in rows}
    assert set(by_id) == {r[0] for r in rows}  # ids preserved
    for r in by_id.values():
        nbs = r["neighbors"]
        assert nbs is not None  # no finished rows in this fixture
        assert len(nbs) <= K
        ids = [n["id"] for n in nbs]
        sims = [n["similarity"] for n in nbs]
        assert r["id"] not in ids  # no self-edges
        assert len(set(ids)) == len(ids)  # no duplicate neighbors
        assert all(0 < s <= 1 for s in sims)
        assert sims == sorted(sims, reverse=True)  # sorted desc
        assert all(part[i] == r["partition"] for i in ids)  # partition wall


def test_determinism_same_seed(clustered):
    rows, df = clustered
    a = build_graph(df, k=5, max_iterations=2, seed=99).collect()
    b = build_graph(df, k=5, max_iterations=2, seed=99).collect()
    key = lambda rs: sorted(
        (r["id"], tuple((n["id"], n["similarity"]) for n in (r["neighbors"] or [])))
        for r in rs
    )
    assert key(a) == key(b)


def test_finished_and_partition_walls(spark):
    rows = make_clustered_points(
        n_clusters=8, per_cluster=20, dim=6, seed=3, n_partitions=4, finished_mod=10
    )
    df = spark.createDataFrame(rows, POINT_DDL)
    g = {r["id"]: r for r in build_graph(df, k=5, max_iterations=3, seed=11).collect()}
    part = {r[0]: r[3] for r in rows}
    fin = {r[0] for r in rows if r[4]}
    for i, r in g.items():
        if i in fin:
            assert r["neighbors"] is None  # finished → null (NND.scala:277)
        else:
            assert r["neighbors"] is not None
            for n in r["neighbors"]:
                assert part[n["id"]] == part[i]
                assert n["id"] not in fin  # finished excluded from build


def test_max_iterations_zero_returns_init(spark):
    rows = make_clustered_points(n_clusters=4, per_cluster=15, dim=4, seed=5)
    df = spark.createDataFrame(rows, POINT_DDL)
    g = build_graph(df, k=3, max_iterations=0, seed=1).collect()
    assert len(g) == len(rows)
    # init graph exists but is random — just check shape invariants
    for r in g:
        assert r["neighbors"] is not None
        assert len(r["neighbors"]) <= 3


def test_early_termination_one_stops_fast(spark):
    rows = make_clustered_points(n_clusters=4, per_cluster=15, dim=4, seed=5)
    df = spark.createDataFrame(rows, POINT_DDL)
    # δ=1.0 → updated ≤ K·N always → exactly one iteration; just verify it runs
    g = build_graph(df, k=3, max_iterations=5, early_termination=1.0, seed=1).collect()
    assert len(g) == len(rows)


def test_exact_graph_matches_numpy_oracle(spark):
    rows = make_clustered_points(n_clusters=5, per_cluster=12, dim=4, seed=13)
    df = spark.createDataFrame(rows, POINT_DDL)
    got = {r["id"]: [(n["id"], n["similarity"]) for n in r["neighbors"]]
           for r in build_graph_exact(df, k=4).collect()}
    oracle = knn_oracle(rows, 4)
    for i in oracle:
        assert [j for j, _ in got[i]] == [j for j, _ in oracle[i]], f"node {i}"
        np.testing.assert_allclose(
            [s for _, s in got[i]], [s for _, s in oracle[i]], rtol=1e-12
        )


def test_singleton_partition_empty_neighbors(spark):
    rows = [
        (0, [0.0, 0.0], None, 0, False),
        (1, [1.0, 0.0], None, 0, False),
        (2, [9.0, 9.0], None, 7, False),  # alone in partition 7
    ]
    df = spark.createDataFrame(rows, POINT_DDL)
    g = {r["id"]: r for r in build_graph(df, k=2, max_iterations=2, seed=1).collect()}
    assert g[2]["neighbors"] == []
    assert {n["id"] for n in g[0]["neighbors"]} == {1}


def test_update_graph_incremental(spark):
    from spark_nnd_spark.nnd.descent import update_graph

    rows = make_clustered_points(n_clusters=8, per_cluster=30, dim=8, seed=21)
    half = [r for r in rows if r[0] % 2 == 0]
    df_half = spark.createDataFrame(half, POINT_DDL)
    df_all = spark.createDataFrame(rows, POINT_DDL)

    g0 = build_graph(df_half, k=5, max_iterations=4, seed=3)
    g1 = update_graph(g0, df_all, k=5, max_iterations=3, seed=3)
    by_id = {r["id"]: r for r in g1.collect()}
    assert set(by_id) == {r[0] for r in rows}

    # every new node found neighbors, and quality holds: recall vs the
    # exact oracle over the full set
    oracle = knn_oracle(rows, 5)
    new_ids = {r[0] for r in rows if r[0] % 2 == 1}
    hits = total = 0
    for i in new_ids:
        got = {n["id"] for n in (by_id[i]["neighbors"] or [])}
        want = {j for j, _ in oracle[i]}
        hits += len(got & want)
        total += len(want)
    assert total > 0 and hits / total >= 0.7, f"new-node recall {hits/total:.3f}"

    # old nodes keep valid lists (<= K, no self, sorted)
    for i, r in by_id.items():
        nbs = r["neighbors"]
        assert nbs is not None and len(nbs) <= 5
        sims = [n["similarity"] for n in nbs]
        assert sims == sorted(sims, reverse=True)
        assert i not in {n["id"] for n in nbs}


def test_update_graph_noop_without_new_points(spark):
    from spark_nnd_spark.nnd.descent import update_graph

    rows = make_clustered_points(n_clusters=4, per_cluster=15, dim=4, seed=9)
    df = spark.createDataFrame(rows, POINT_DDL)
    g0 = build_graph(df, k=3, max_iterations=2, seed=5)
    g1 = update_graph(g0, df, k=3, max_iterations=3, seed=5)
    key = lambda rs: sorted(
        (r["id"], tuple((n["id"], round(n["similarity"], 9)) for n in (r["neighbors"] or [])))
        for r in rs
    )
    assert key(g0.collect()) == key(g1.collect())
