"""First-class relational/dataflow primitives.

These are the building blocks the reference's algorithm is composed of
(SURVEY.md §2.2), exposed as reusable DataFrame→DataFrame operators.
Each is a thin, Catalyst-friendly composition — windows and groupBys the
optimizer plans as single shuffles with partial aggregation.

Scale notes (100 TB): every operator here shuffles exactly once on its
key columns; none collects to the driver; window functions use
``row_number`` (streaming rank, no full-partition buffering beyond the
sort Spark already does for the window).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _cols(cs: Sequence[Column | str]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in cs]


def group_top_k(
    df: DataFrame,
    keys: Sequence[Column | str],
    order: Sequence[Column],
    k: int,
    rank_col: str | None = None,
) -> DataFrame:
    """Per-group top-K (reference in-group ``sortBy(-sim).take(K)``,
    NND.scala:106-108,241-242).

    ``order`` must be a total order for determinism — callers append an
    id tiebreak (the reference doesn't; SURVEY.md §4 defect 3).
    """
    w = Window.partitionBy(*_cols(keys)).orderBy(*order)
    ranked = df.withColumn("__rn", F.row_number().over(w))
    out = ranked.filter(F.col("__rn") <= k)
    if rank_col is not None:
        return out.withColumnRenamed("__rn", rank_col)
    return out.drop("__rn")


def dedup_with_preference(
    df: DataFrame,
    keys: Sequence[Column | str],
    preference: Sequence[Column],
) -> DataFrame:
    """Keep one row per key, preferring rows that sort first under
    ``preference`` (reference B-preferred candidate dedup,
    NND.scala:228-239).
    """
    w = Window.partitionBy(*_cols(keys)).orderBy(*preference)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def sample_per_group(
    df: DataFrame,
    keys: Sequence[Column | str],
    rate: float,
    seed: int,
    tag_col: str = "sampled",
    salt: Column | str = "id",
) -> DataFrame:
    """Deterministic per-group sampling without replacement: tag
    ``max(ceil(rate * |group|), 1)`` rows per group (reference reverse
    sampling, NND.scala:146-152 — unseeded there; deterministic here by
    hash-ordering on ``xxhash64(seed, salt)``, an intentional fix of
    SURVEY.md §4 defect 2).

    Adds a boolean ``tag_col`` instead of filtering, mirroring the
    reference's S/U tags so unsampled rows can still flow (A9/A10).
    """
    key_cols = _cols(keys)
    hash_col = F.xxhash64(F.lit(seed), F.col(salt) if isinstance(salt, str) else salt)
    w = Window.partitionBy(*key_cols).orderBy(hash_col)
    cnt = Window.partitionBy(*key_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(cnt))
        .withColumn(
            tag_col,
            F.col("__rn") <= F.greatest(F.ceil(F.lit(rate) * F.col("__n")), F.lit(1)),
        )
        .drop("__rn", "__n")
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_src: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the skewed (left/fact) side into
    ``n_salts`` sub-keys, replicate the small (right/dim) side once per
    salt, and join on (key, salt).

    The explicit alternative to AQE's skew-join splitting for the case
    AQE can't fix: ONE key holding a large share of the fact table
    (a null-ish sentinel id, a bot user, a default partition). A plain
    hash join puts that key's every row in one task; salting spreads it
    across ``n_salts`` tasks at the cost of replicating the dim side
    ``n_salts``× (dim rows are the cheap side by assumption — it just
    must not also be the skewed one).

    The salt is ``xxhash64(salt_src) % n_salts`` — deterministic, so
    retries and re-runs place rows identically. Result set is exactly
    the plain join's (asserted by the q52 oracle, which IS the plain
    join).

    Only ``inner``/``left`` joins are supported: the right side is
    replicated ``n_salts``×, so a right/full outer join would emit each
    unmatched right row once per salt copy — a different result set
    than the plain join.
    """
    if how.replace("_", "").lower() in {"right", "rightouter", "full", "fullouter", "outer"}:
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r}: "
            "the replicated right side would duplicate unmatched right rows"
        )
    l = left.withColumn("__salt", F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salts)))
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("long"))
    return l.join(r, [key, "__salt"], how).drop("__salt")
