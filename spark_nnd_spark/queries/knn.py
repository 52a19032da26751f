"""K-NN graph queries — the engine's flagship surface.

``q24_knn_exact`` is DuckDB-oracle-checkable (same L2→1/(1+d) math in
portable SQL). ``q25_nnd_graph`` (NN-Descent) is deliberately omitted
from oracle_sql: it is an iterative approximate algorithm — the honest
check is recall against the exact graph (tests/test_nnd.py), not SQL
equality; the driver records rows-only for it.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_nnd_spark.nnd.descent import build_graph
from spark_nnd_spark.nnd.exact import build_graph_exact
from spark_nnd_spark.operators.similarity import ann_ivf_topk, ann_lsh_topk
from spark_nnd_spark.sources import load_table

K = 10


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("features"),
        F.col("label").cast("long").alias("label"),
    )


def _explode_graph(g: DataFrame) -> DataFrame:
    return (
        g.select("id", F.posexplode("neighbors").alias("pos", "nb"))
        .select(
            "id",
            F.col("nb.id").alias("nb_id"),
            (F.col("pos") + 1).alias("rank"),
            F.round(F.col("nb.similarity"), 6).alias("sim"),
        )
        .orderBy("id", "rank")
    )


def q24_knn_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact K-NN graph over the embeddings table, exploded to
    (id, nb_id, rank, sim) integer-plus-rounded rows."""
    return _explode_graph(build_graph_exact(_points(spark, sf_dir), k=K, validate=False))


def q25_nnd_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NN-Descent approximate K-NN graph (seeded, deterministic);
    rows-only driver check, recall-vs-exact checked in tests.

    Runs the reference README's published params (K=10, maxIter=5,
    δ=0.01, ρ=1.0, b=4 — README.md:44-48). Recall after the 5-round cap
    depends on the corpus (≥0.9 on the FIXTURES clustered tier; lower on
    this 64-dim synthetic table, where `updated` is still halving per
    round at the cap — raise max_iterations for more)."""
    g = build_graph(
        _points(spark, sf_dir),
        k=K,
        max_iterations=5,
        early_termination=0.01,
        sample_rate=1.0,
        buckets_per_instance=4,
        seed=42,
        validate=False,
    )
    return _explode_graph(g)


def q26_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate cosine top-k (scale path); rows-only,
    recall-vs-brute checked in tests."""
    emb = load_table(spark, sf_dir, "embeddings")
    # self-search shape: query_pred reuses corpus-side signatures (one
    # Arrow stage; query probes built driver-side from the 10 rows)
    out = ann_lsh_topk(
        emb, None, k=5, n_planes=8, seed=42, query_pred=F.col("vec_id") < 10, dim=64
    )
    return out.select(
        "query_id", "nb_id", "rank", F.round("cosine", 6).alias("cosine")
    ).orderBy("query_id", "rank")


def q30_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-cell approximate cosine top-k (scale path #2: inverted-file
    index, sample-trained spherical k-means); rows-only, recall-vs-brute
    checked in tests."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = ann_ivf_topk(
        emb, emb.filter(F.col("vec_id") < 10), k=5, n_centroids=16, n_probe=4, seed=42
    )
    return out.select(
        "query_id", "nb_id", "rank", F.round("cosine", 6).alias("cosine")
    ).orderBy("query_id", "rank")


KNN_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q24_knn_exact": q24_knn_exact,
    "q25_nnd_graph": q25_nnd_graph,
    "q26_ann_lsh_topk": q26_ann_lsh_topk,
    "q30_ann_ivf_topk": q30_ann_ivf_topk,
}

KNN_ORACLES: dict[str, str] = {
    "q24_knn_exact": f"""
        WITH t AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
        pairs AS (
            SELECT a.id AS id, b.id AS nb_id,
                   1.0 / (1.0 + sqrt(list_sum(
                       list_transform(range(1, len(a.v) + 1),
                                      i -> (a.v[i] - b.v[i]) * (a.v[i] - b.v[i])))))
                   AS sim
            FROM t a JOIN t b ON a.id <> b.id
        ),
        ranked AS (
            SELECT id, nb_id, sim,
                   ROW_NUMBER() OVER (PARTITION BY id ORDER BY sim DESC, nb_id) AS rank
            FROM pairs
        )
        SELECT id, nb_id, rank, round(sim, 6) AS sim
        FROM ranked WHERE rank <= {K} ORDER BY id, rank
    """,
}
