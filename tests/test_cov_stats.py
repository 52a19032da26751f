"""Mergeable covariance-statistics sidecar (the algebraic index
family): exact integer sums make extend ADDITION and retraction
SUBTRACTION, so extend == fresh-rebuild and retract == never-added
hold EXACTLY, and the q179 index-served spectrum equals the inline
q177 computation value-for-value."""

from __future__ import annotations

import pytest

import numpy as np
from pyspark.sql import functions as F

from spark_nnd_spark.operators.clustering import (
    build_cov_stats,
    cov_from_stats,
    extend_cov_stats,
    int_covariance,
    retract_cov_stats,
    top_eigen_power,
)


pytestmark = pytest.mark.slow  # heavy tier: deselected from the default fast run

DIM = 16


def _vecs(spark, lo: int, hi: int):
    rows = [
        (i, np.random.default_rng(i).normal(0, 0.2, DIM).tolist())
        for i in range(lo, hi)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _mat(df) -> dict:
    return {(r.i, r.j): r.c for r in df.collect()}


def test_extend_equals_fresh_build(spark, tmp_path):
    a = _vecs(spark, 0, 300)
    b = _vecs(spark, 300, 400)
    p1 = str(tmp_path / "inc")
    build_cov_stats(a, p1, dim=DIM)
    extend_cov_stats(spark, p1, b)
    p2 = str(tmp_path / "fresh")
    build_cov_stats(a.unionByName(b), p2, dim=DIM)
    assert _mat(cov_from_stats(spark, p1)) == _mat(cov_from_stats(spark, p2))
    # and both equal the inline operator on the union
    assert _mat(cov_from_stats(spark, p1)) == _mat(
        int_covariance(a.unionByName(b), dim=DIM)
    )


def test_retract_equals_never_added(spark, tmp_path):
    a = _vecs(spark, 0, 300)
    b = _vecs(spark, 300, 400)
    p = str(tmp_path / "ret")
    build_cov_stats(a, p, dim=DIM)
    extend_cov_stats(spark, p, b)
    retract_cov_stats(spark, p, b)
    p_a = str(tmp_path / "only_a")
    build_cov_stats(a, p_a, dim=DIM)
    assert _mat(cov_from_stats(spark, p)) == _mat(cov_from_stats(spark, p_a))


def test_indexed_spectrum_equals_inline(spark, tmp_path):
    v = _vecs(spark, 0, 400)
    p = str(tmp_path / "spec")
    build_cov_stats(v, p, dim=DIM)
    inline = top_eigen_power(int_covariance(v, dim=DIM), dim=DIM, iters=3).collect()
    served = top_eigen_power(cov_from_stats(spark, p), dim=DIM, iters=3).collect()
    assert [tuple(r) for r in inline] == [tuple(r) for r in served]
    rows = [tuple(r) for r in inline]
    assert [r[0] for r in rows] == [1, 2, 3]
    # Rayleigh estimates climb toward the top eigenvalue
    assert rows[0][1] <= rows[1][1] <= rows[2][1]


def test_extend_with_batch_id_is_replay_idempotent(spark, tmp_path):
    a = _vecs(spark, 0, 300)
    b = _vecs(spark, 300, 400)
    p = str(tmp_path / "replay")
    build_cov_stats(a, p, dim=DIM)
    extend_cov_stats(spark, p, b, batch_id=7)
    once = _mat(cov_from_stats(spark, p))
    extend_cov_stats(spark, p, b, batch_id=7)  # replayed delivery: no-op
    assert _mat(cov_from_stats(spark, p)) == once
    # a NEW batch id still applies
    extend_cov_stats(spark, p, b, batch_id=8)
    assert _mat(cov_from_stats(spark, p)) != once


def test_crash_leftovers_are_invisible_and_commit_is_atomic(spark, tmp_path):
    """The r11-ADVICE atomicity contract: a crashed merge can leave a
    staging dir or an unrenamed version dir WITHOUT _COMMITTED — both
    must be invisible to readers, and a subsequent merge must succeed
    and publish moments + applied marker in ONE version directory (one
    rename), so 'applied but unmarked' cannot exist."""
    import pathlib

    a = _vecs(spark, 0, 300)
    b = _vecs(spark, 300, 400)
    p = str(tmp_path / "atomic")
    build_cov_stats(a, p, dim=DIM)
    before = _mat(cov_from_stats(spark, p))

    state = pathlib.Path(p) / "state"
    (state / "_staging_v=1" / "second").mkdir(parents=True)  # crashed attempt
    (state / "v=99").mkdir()  # renamed-but-never-committed cannot happen;
    # an empty uncommitted dir stands in for any torn state
    assert _mat(cov_from_stats(spark, p)) == before  # leftovers invisible

    extend_cov_stats(spark, p, b, batch_id=3)
    committed = sorted(d.name for d in state.iterdir() if (d / "_COMMITTED").exists())
    assert committed == ["v=0", "v=1"]
    # moments AND the applied marker live in the same committed unit
    assert (state / "v=1" / "second").exists()
    assert (state / "v=1" / "applied").exists()
    applied = spark.read.parquet(str(state / "v=1" / "applied")).collect()
    assert [r.batch_id for r in applied] == [3]
    # replay of batch 3 is a no-op and creates no new version
    extend_cov_stats(spark, p, b, batch_id=3)
    assert sorted(
        d.name for d in state.iterdir() if (d / "_COMMITTED").exists()
    ) == ["v=0", "v=1"]


def test_version_gc_keeps_at_most_two(spark, tmp_path):
    import pathlib

    p = str(tmp_path / "gc")
    build_cov_stats(_vecs(spark, 0, 100), p, dim=DIM)
    for i in range(4):
        extend_cov_stats(spark, p, _vecs(spark, 100 + i * 50, 150 + i * 50),
                         batch_id=i)
    state = pathlib.Path(p) / "state"
    committed = sorted(d.name for d in state.iterdir() if (d / "_COMMITTED").exists())
    assert committed == ["v=3", "v=4"]
    fresh = str(tmp_path / "gc_fresh")
    build_cov_stats(_vecs(spark, 0, 300), fresh, dim=DIM)
    assert _mat(cov_from_stats(spark, p)) == _mat(cov_from_stats(spark, fresh))


def test_cov_stats_stream_maintains_exact_stats(spark, tmp_path):
    """Streaming moment maintenance: draining 3 micro-batches of
    vectors into the sidecar must leave EXACTLY the stats of a fresh
    build over seed+everything; a second drain of the same files
    (replay) must change nothing (applied markers)."""
    import os

    from spark_nnd_spark.streaming.streams import cov_stats_stream

    seed = _vecs(spark, 0, 100)
    p = str(tmp_path / "stream_stats")
    build_cov_stats(seed, p, dim=DIM)

    d = tmp_path / "vec_chunks"
    d.mkdir()
    pdf = _vecs(spark, 100, 400).toPandas()
    for i in range(3):
        f = d / f"chunk{i}.parquet"
        pdf.iloc[i * 100 : (i + 1) * 100].to_parquet(f, index=False)
        os.utime(f, (1_700_000_000 + i, 1_700_000_000 + i))
    schema = spark.read.parquet(str(d)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    cov_stats_stream(stream, p)
    fresh = str(tmp_path / "fresh_all")
    build_cov_stats(_vecs(spark, 0, 400), fresh, dim=DIM)
    assert _mat(cov_from_stats(spark, p)) == _mat(cov_from_stats(spark, fresh))

    # replay the same files through a NEW stream (fresh checkpoint):
    # the applied markers make every batch a no-op
    import shutil

    shutil.rmtree(f"{p}/_stream_checkpoint")
    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    cov_stats_stream(stream2, p)
    assert _mat(cov_from_stats(spark, p)) == _mat(cov_from_stats(spark, fresh))
