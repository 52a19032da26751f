"""Deterministic k-means operators over embedding columns.

Extension layer (the reference has no clustering surface; SURVEY.md
§2.3): corpus-curation pipelines cluster embeddings to balance topic
mixtures, pick diverse training subsets, and seed IVF-style indexes.
The primitive both uses need is one exact, replayable Lloyd step:
assign every vector to its nearest centroid, then re-average.

Scale design — the corpus is never shuffled for the *assignment*:
centroids are k·dim doubles (plan metadata, exactly like the IVF
trained centroids in operators/similarity.py), so they are inlined as
a LITERAL array of structs and the nearest-centroid choice becomes a
single projection: ``array_min(transform(centroids, c ->
struct(dist(c), cid)))``. The alternative — crossJoin with a centroid
table and a groupBy/window argmin — ships N·k rows through an
exchange; the literal form ships zero. Re-averaging (``kmeans_step``)
is a posexplode + hash aggregate on (cluster, dim): Catalyst applies
map-side partial aggregation, so the exchange carries at most
``k·dim`` partial sums per task regardless of N.

All arithmetic is plain double sums evaluated left-to-right, so a SQL
engine replays it bit-for-bit (the q59 DuckDB oracle does).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Centroids = list[tuple[int, list[float]]]


def seed_centroids(
    df: DataFrame, k: int, vec_col: str = "embedding", id_col: str = "vec_id"
) -> Centroids:
    """First-k-ids seeding: centroid j = the vector with id j. A tiny
    driver collect (k rows — the same O(small) class as the partition
    histogram and the IVF training sample), deterministic across runs
    and engines; no RNG state."""
    rows = (
        df.filter(F.col(id_col) < k)
        .select(F.col(id_col).cast("long").alias("cid"), F.col(vec_col).cast("array<double>").alias("v"))
        .collect()
    )
    return [(int(r["cid"]), [float(x) for x in r["v"]]) for r in sorted(rows)]


def _sq_l2(vec: Column, center: list[float]) -> Column:
    """Squared L2 distance to a literal centroid, as a sequential
    left fold (same evaluation order as DuckDB's list_sum)."""
    lit_center = F.array(*[F.lit(float(x)) for x in center])
    return F.aggregate(
        F.zip_with(vec, lit_center, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def nearest_centroid_expr(centroids: Centroids, vec_col: Column | str) -> Column:
    """Argmin over literal centroids — a pure projection, no shuffle.
    ``array_min`` orders struct elements lexicographically, so
    (distance, cid) breaks distance ties on the smaller cluster id."""
    vec = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    vec = vec.cast("array<double>")
    candidates = [
        F.struct(_sq_l2(vec, center).alias("dist"), F.lit(int(cid)).alias("cid"))
        for cid, center in centroids
    ]
    return F.array_min(F.array(*candidates)).getField("cid")


def kmeans_assign(
    df: DataFrame,
    centroids: Centroids,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, cluster_id) assignment — one narrow map over the corpus."""
    return df.select(
        F.col(id_col),
        nearest_centroid_expr(centroids, vec_col).cast("long").alias("cluster_id"),
    )


def kmeans_step(
    df: DataFrame,
    centroids: Centroids,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """One exact Lloyd iteration: assignment (narrow) + re-average via
    posexplode → hash aggregate on (cluster_id, i). Returns one row per
    (cluster_id, dimension) with the new centroid mean and the member
    count — the re-aggregation shape that survives 100× because only
    k·dim partials cross the exchange."""
    assigned = df.select(
        nearest_centroid_expr(centroids, vec_col).cast("long").alias("cluster_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    exploded = assigned.select("cluster_id", F.posexplode("v").alias("i", "x"))
    return (
        exploded.groupBy("cluster_id", "i")
        .agg(F.avg("x").alias("centroid"), F.count("*").alias("n"))
        .select("cluster_id", F.col("i").cast("long").alias("i"), "centroid", "n")
    )
