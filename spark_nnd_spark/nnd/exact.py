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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_nnd_spark.schemas import normalize_points, validate_points

_TOPK_SCHEMA = "id long, rank int, nb_id long, similarity double"


def _exact_topk_kernel(k: int):
    """Per-(partition, block) cogroup kernel: BLAS all-pairs distances,
    in-kernel top-k. The left pdf holds the block's points, the right
    pdf the complete logical partition, so the emitted k rows per left
    point are the GLOBAL top-k — no cross-block merge needed.

    Numerics: candidates are selected with the O(mn) matmul identity
    ||a-b||² = |a|² + |b|² - 2ab (cancellation error ~1e-13 — selection
    ties at that scale are float-order-fragile in any engine), then the
    selected k+8 candidates per row are recomputed with the exact
    difference sum, so emitted similarities carry full float64 accuracy
    (they must round-trip against the DuckDB oracle at 6 decimals)."""

    def fn(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "id": pd.Series(dtype=np.int64),
                "rank": pd.Series(dtype=np.int32),
                "nb_id": pd.Series(dtype=np.int64),
                "similarity": pd.Series(dtype=np.float64),
            }
        )
        if len(left) == 0 or len(right) == 0:
            return empty
        A = np.stack(left["a_features"].to_numpy()).astype(np.float64)
        B = np.stack(right["b_features"].to_numpy()).astype(np.float64)
        a_ids = left["a_id"].to_numpy().astype(np.int64)
        b_ids = right["b_id"].to_numpy().astype(np.int64)
        n = len(B)
        d2 = (
            np.einsum("ij,ij->i", A, A)[:, None]
            + np.einsum("ij,ij->i", B, B)[None, :]
            - 2.0 * (A @ B.T)
        )
        np.maximum(d2, 0.0, out=d2)
        d2[a_ids[:, None] == b_ids[None, :]] = np.inf  # no self-edges
        kk = min(k + 8, n)
        if kk < n:
            idx = np.argpartition(d2, kk - 1, axis=1)[:, :kk]
            # Tie-safety: if candidates beyond the cut tie the kk-th
            # boundary distance (duplicate vectors are routine in
            # dedup-oriented corpora), argpartition splits the tied set
            # arbitrarily and the documented (sim desc, id asc) order
            # could emit the wrong ids. Detect boundary ties within an
            # epsilon and fall back to scoring the full row for those
            # rows only.
            rows = np.arange(len(A))
            boundary = d2[rows[:, None], idx].max(axis=1)
            eps = 1e-9 * (1.0 + np.abs(boundary))
            tied = (d2 <= (boundary + eps)[:, None]).sum(axis=1) > kk
        else:
            idx = np.broadcast_to(np.arange(n), (len(A), n)).copy()
            tied = np.zeros(len(A), dtype=bool)
        cand_ids = b_ids[idx]
        diff = A[:, None, :] - B[idx]
        d2x = np.einsum("mkd,mkd->mk", diff, diff)
        sim = 1.0 / (1.0 + np.sqrt(d2x))
        # Tied rows exact-score every candidate so the id-ascending
        # tiebreak sees the whole tied set. Batched (chunked to bound
        # the (rows × n × d) diff tensor at ~64 MB) rather than per-row:
        # in a mass-duplicate block every row trips the fallback, and a
        # per-row O(n·d) rescan inside the i-loop degraded the kernel
        # to Python-loop speed. Same einsum reduction order per row, so
        # the scores are bitwise-identical to the per-row computation.
        tied_sim: dict[int, np.ndarray] = {}
        tied_rows = np.flatnonzero(tied)
        if len(tied_rows):
            d = A.shape[1]
            chunk = max(1, (8 << 20) // max(1, n * d))
            for s in range(0, len(tied_rows), chunk):
                sel = tied_rows[s : s + chunk]
                diff_t = A[sel][:, None, :] - B[None, :, :]
                d2_t = np.einsum("mkd,mkd->mk", diff_t, diff_t)
                st = 1.0 / (1.0 + np.sqrt(d2_t))
                for j, i in enumerate(sel):
                    tied_sim[int(i)] = st[j]
        out_id, out_rank, out_nb, out_sim = [], [], [], []
        for i in range(len(A)):
            if tied[i]:
                row_ids, row_sim = b_ids, tied_sim[i]
            else:
                row_ids, row_sim = cand_ids[i], sim[i]
            valid = row_ids != a_ids[i]
            order = np.lexsort((row_ids[valid], -row_sim[valid]))[:k]
            ids, sims = row_ids[valid][order], row_sim[valid][order]
            out_id.extend([a_ids[i]] * len(ids))
            out_rank.extend(range(1, len(ids) + 1))
            out_nb.extend(ids)
            out_sim.extend(sims)
        return pd.DataFrame(
            {
                "id": np.asarray(out_id, np.int64),
                "rank": np.asarray(out_rank, np.int32),
                "nb_id": np.asarray(out_nb, np.int64),
                "similarity": np.asarray(out_sim, np.float64),
            }
        )

    return fn


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
        # long sequence: must match the left side's LONG block key —
        # cogroup does not coerce mismatched grouping-key types
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.lit(blocks - 1).cast("long"))
        ).alias("block"),
    )
    # Cogrouped Arrow kernel instead of a row-level join: the previous
    # join+window formulation materialized all O(N²/P) scored pairs as
    # JVM rows and ran a 400M-row window at N=20k; the kernel scores
    # blocks with BLAS and emits only k rows per point, so the only
    # wide exchanges are the id-only output and the blocks-replicated
    # feature shuffle the join needed anyway.
    cand = (
        left.groupBy("partition", "block")
        .cogroup(right.groupBy("partition", "block"))
        .applyInPandas(_exact_topk_kernel(k), _TOPK_SCHEMA)
    )
    topk = (
        cand.groupBy("id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("rank"), F.col("nb_id"), F.col("similarity")))
            ).alias("__ranked")
        )
        .select(
            "id",
            F.transform(
                "__ranked",
                lambda s: F.struct(
                    s["nb_id"].alias("id"), s["similarity"].alias("similarity")
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
