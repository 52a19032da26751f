"""Mergeable token-statistics sidecar (the 9th index family, second
algebraic one): exact integer counts make extend ADDITION and
retraction SUBTRACTION, so extend == fresh-rebuild and retract ==
never-added hold EXACTLY; the q194 index-served divergence equals the
inline q188 computation value-for-value; commits are atomic
(operators/state_commit, shared with the covariance family)."""

from __future__ import annotations

import pytest

from spark_nnd_spark.operators.text_stats import (
    _token_counts,
    build_token_stats,
    extend_token_stats,
    js_divergence_pairs,
    retract_token_stats,
    token_counts_from_stats,
)



pytestmark = pytest.mark.slow  # heavy tier: deselected from the default fast run

def _docs(spark, lo: int, hi: int):
    rows = [
        (i, f"w{i % 7} w{i % 3} common tail{i % 11}", f"src{i % 4}")
        for i in range(lo, hi)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def _tbl(spark, path) -> dict:
    return {
        (r.source, r.token): r.n
        for r in token_counts_from_stats(spark, path).collect()
    }


def test_extend_equals_fresh_build(spark, tmp_path):
    a, b = _docs(spark, 0, 300), _docs(spark, 300, 400)
    p1, p2 = str(tmp_path / "inc"), str(tmp_path / "fresh")
    build_token_stats(a, p1)
    extend_token_stats(spark, p1, b)
    build_token_stats(a.unionByName(b), p2)
    assert _tbl(spark, p1) == _tbl(spark, p2)
    # and both equal the inline counts on the union
    inline = {
        (r.source, r.token): r.n
        for r in _token_counts(a.unionByName(b)).collect()
    }
    assert _tbl(spark, p1) == inline


def test_retract_equals_never_added_and_no_ghost_rows(spark, tmp_path):
    a, b = _docs(spark, 0, 300), _docs(spark, 300, 400)
    p, p_a = str(tmp_path / "ret"), str(tmp_path / "only_a")
    build_token_stats(a, p)
    extend_token_stats(spark, p, b)
    retract_token_stats(spark, p, b)
    build_token_stats(a, p_a)
    assert _tbl(spark, p) == _tbl(spark, p_a)
    # a token seen ONLY in the retracted batch leaves no zero-count row
    assert all(n > 0 for n in _tbl(spark, p).values())


def test_extend_with_batch_id_is_replay_idempotent(spark, tmp_path):
    a, b = _docs(spark, 0, 300), _docs(spark, 300, 400)
    p = str(tmp_path / "replay")
    build_token_stats(a, p)
    extend_token_stats(spark, p, b, batch_id=7)
    once = _tbl(spark, p)
    extend_token_stats(spark, p, b, batch_id=7)  # replayed delivery: no-op
    assert _tbl(spark, p) == once
    extend_token_stats(spark, p, b, batch_id=8)  # a NEW batch applies
    assert _tbl(spark, p) != once


def test_served_divergence_equals_inline(spark, tmp_path):
    d = _docs(spark, 0, 400)
    p = str(tmp_path / "js")
    build_token_stats(d, p)
    inline = sorted(
        tuple(r) for r in js_divergence_pairs(_token_counts(d)).collect()
    )
    served = sorted(
        tuple(r)
        for r in js_divergence_pairs(
            token_counts_from_stats(spark, p)
        ).collect()
    )
    assert inline == served and len(inline) == 6  # C(4,2) source pairs
    # JS is bounded by ln 2 and non-negative
    assert all(0.0 <= row[3] <= 0.6931472 for row in inline)


def test_token_stats_stream_maintains_exact_counts(spark, tmp_path):
    """Draining 3 micro-batches must leave EXACTLY the counts of a
    fresh build over seed+everything; a replayed drain (fresh stream
    checkpoint, same files) changes nothing (applied markers in the
    same atomic commit as the counts)."""
    import os
    import shutil

    from spark_nnd_spark.streaming.streams import token_stats_stream

    seed = _docs(spark, 0, 100)
    p = str(tmp_path / "stream_stats")
    build_token_stats(seed, p)

    d = tmp_path / "doc_chunks"
    d.mkdir()
    pdf = _docs(spark, 100, 400).toPandas()
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
    token_stats_stream(stream, p)
    fresh = str(tmp_path / "fresh_all")
    build_token_stats(_docs(spark, 0, 400), fresh)
    assert _tbl(spark, p) == _tbl(spark, fresh)

    shutil.rmtree(f"{p}/_stream_checkpoint")
    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    token_stats_stream(stream2, p)
    assert _tbl(spark, p) == _tbl(spark, fresh)


# ----------------------- bigram family (the LM tables)

def test_bigram_extend_retract_exact(spark, tmp_path):
    from spark_nnd_spark.operators.text_stats import (
        bigram_counts,
        bigram_counts_from_stats,
        build_bigram_stats,
        doc_bigrams,
        extend_bigram_stats,
        retract_bigram_stats,
    )

    a, b = _docs(spark, 0, 300), _docs(spark, 300, 400)
    p, fresh = str(tmp_path / "bg"), str(tmp_path / "bg_fresh")
    build_bigram_stats(a, p)
    extend_bigram_stats(spark, p, b, batch_id=1)
    build_bigram_stats(a.unionByName(b), fresh)
    tbl = lambda q: {  # noqa: E731
        (r.w1, r.w2): r.n for r in bigram_counts_from_stats(spark, q).collect()
    }
    assert tbl(p) == tbl(fresh)
    # inline counts == stored counts
    inline = {
        (r.w1, r.w2): r.n
        for r in bigram_counts(
            doc_bigrams(a.unionByName(b), checkpoint=False)
        ).collect()
    }
    assert tbl(p) == inline
    # replay is a no-op; retraction is exact
    extend_bigram_stats(spark, p, b, batch_id=1)
    assert tbl(p) == inline
    retract_bigram_stats(spark, p, b)
    build_bigram_stats(a, fresh := str(tmp_path / "bg_only_a"))
    assert tbl(p) == tbl(fresh)
    assert all(n > 0 for n in tbl(p).values())
