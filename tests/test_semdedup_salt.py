"""semantic_dedup hot-cell salt knob (the BENCH_SEMDEDUP_SKEW fix,
promoted from a bench-script AQE conf to the operator): identical
verdicts, and the hot cell's pair join keyed by (cell, salt) so the
explosion splits across reducers without any session-global conf."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from spark_nnd_spark.operators.similarity import fixed_centroids, semantic_dedup


def _skewed_fixture(spark, n=400, dim=8, hot_frac=0.9):
    """hot_frac of vectors land in one centroid's cell (tight cluster),
    the rest spread over the others — the skew-bench shape, sized for
    a unit test."""
    rng = np.random.default_rng(7)
    cents = fixed_centroids(dim, 4, 7)
    rows = []
    for i in range(n):
        if i < int(n * hot_frac):
            v = cents[0] + rng.normal(0, 0.01, dim)
        else:
            v = cents[1 + i % 3] + rng.normal(0, 0.01, dim)
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df, cents


def test_salted_verdicts_equal_plain(spark):
    df, cents = _skewed_fixture(spark)
    plain = sorted(
        tuple(r) for r in semantic_dedup(df, cents, tau=0.95).collect()
    )
    salted = sorted(
        tuple(r)
        for r in semantic_dedup(
            df, cents, tau=0.95, hot_cell_salt=8, hot_cell_threshold=50
        ).collect()
    )
    assert salted == plain
    # the fixture actually exercises both branches: >1 drop and >1 keep
    keeps = [t[2] for t in plain]
    assert any(keeps) and not all(keeps)


def test_salted_join_partitions_by_cell_and_salt(spark):
    """With broadcast disabled (the 100 TB shape), the hot branch's
    exchange must hash on (cell, salt) — S reducers share the hot
    cell's pair enumeration instead of one."""
    df, cents = _skewed_fixture(spark)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            semantic_dedup(
                df, cents, tau=0.95, hot_cell_salt=8, hot_cell_threshold=50
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    import re

    assert re.search(r"hashpartitioning\(cell#\d+L?, salt#\d+", plan), (
        plan[:2000]
    )


def test_no_salt_when_threshold_not_exceeded(spark):
    """A threshold above every cell's occupancy routes all pairs down
    the cold branch — verdicts still identical to the plain plan."""
    df, cents = _skewed_fixture(spark, n=120)
    plain = sorted(
        tuple(r) for r in semantic_dedup(df, cents, tau=0.95).collect()
    )
    cold = sorted(
        tuple(r)
        for r in semantic_dedup(
            df, cents, tau=0.95, hot_cell_salt=8, hot_cell_threshold=10**9
        ).collect()
    )
    assert cold == plain
