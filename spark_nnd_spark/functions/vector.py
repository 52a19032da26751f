"""Vector column expressions — pure Spark SQL, JVM-side, codegen'd.

Re-expresses the reference's two public helpers (SURVEY.md A15/A16):

- ``subtract`` (NND.scala:287-294): element-wise vector difference.
- ``similarity`` (NND.scala:296-306): ``1 / (1 + ||x - y||_2)``, gated on
  partition equality — cross-partition pairs score ``-Infinity`` so
  partitions are hard walls in the K-NN graph.

All builders return :class:`pyspark.sql.Column` over ``ARRAY<DOUBLE>``
(or ``ARRAY<FLOAT>``) inputs, built from ``zip_with``/``aggregate`` so
they run inside whole-stage codegen — no Python on the hot path. The
same math is re-implemented in numpy inside the NN-Descent local-join
kernel (spark_nnd_spark/nnd/descent.py), where batched BLAS wins.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

def neg_inf() -> Column:
    """-Infinity literal (requires an active session, hence a function)."""
    return F.lit(float("-inf"))


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def subtract_expr(a: Column | str, b: Column | str) -> Column:
    """Element-wise ``a - b`` (reference `subtract`, NND.scala:287-294).

    The reference asserts equal sizes at call time; here mismatched sizes
    surface as nulls from ``zip_with``'s missing-element padding, and the
    points contract is enforced up front by ``validate_points``.
    """
    return F.zip_with(_col(a), _col(b), lambda x, y: x - y)


def dot_expr(a: Column | str, b: Column | str) -> Column:
    """Dot product via zip_with + aggregate (stays in codegen)."""
    return F.aggregate(
        F.zip_with(_col(a), _col(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column | str) -> Column:
    """L2 norm."""
    a = _col(a)
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def l2_distance_expr(a: Column | str, b: Column | str) -> Column:
    """Euclidean distance ``||a - b||_2``."""
    return F.sqrt(
        F.aggregate(
            F.zip_with(_col(a), _col(b), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def similarity_expr(
    a: Column | str,
    b: Column | str,
    a_partition: Column | str | None = None,
    b_partition: Column | str | None = None,
) -> Column:
    """Reference similarity: ``1 / (1 + L2(a, b))`` in (0, 1].

    With partitions supplied, cross-partition pairs score ``-Infinity``
    (NND.scala:296-306) — the sentinel sorts below every real similarity
    so such pairs can never enter a top-K neighbor list.
    """
    sim = F.lit(1.0) / (F.lit(1.0) + l2_distance_expr(a, b))
    if a_partition is None or b_partition is None:
        return sim
    return F.when(_col(a_partition) == _col(b_partition), sim).otherwise(neg_inf())


def cosine_similarity_expr(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 when either norm is 0 (instead of NaN)."""
    a, b = _col(a), _col(b)
    denom = norm_expr(a) * norm_expr(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot_expr(a, b) / denom)
