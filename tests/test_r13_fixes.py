"""Round-13 hardening (ADVICE r12):

1. chunk-id packing guard — a document with >= CHUNK_ID_MUL chunks
   fails the index build loudly instead of silently aliasing its
   chunks into the next doc_id's id space;
2. dsir_score / ref_lm_score OOV floor — tokens absent from the
   served vocab receive the documented add-one smoothing floor (left
   join) instead of silently dropping from score AND n_tokens;
3. commit_state collision fail-fast + next_version — rebuilding over
   an existing state path commits latest+1 instead of nesting a
   staging dir inside the stale version;
4. derived_df_cap refreshes its observability dict on the empty-input
   early return.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------- 1. chunk-id guard

def test_packed_chunk_id_normal_and_order_preserving(spark):
    from spark_nnd_spark.queries.pipeline import CHUNK_ID_MUL, packed_chunk_id

    df = spark.createDataFrame(
        [(7, 0), (7, 1023), (8, 0)], "doc_id long, chunk_idx long"
    )
    got = [
        r.cid
        for r in df.select(
            packed_chunk_id("doc_id", "chunk_idx").alias("cid")
        ).orderBy("doc_id", "chunk_idx").collect()
    ]
    assert got == [7 * CHUNK_ID_MUL, 7 * CHUNK_ID_MUL + 1023, 8 * CHUNK_ID_MUL]
    assert got == sorted(got)  # packing preserves (doc, idx) order


def test_packed_chunk_id_rejects_overflow(spark):
    from spark_nnd_spark.queries.pipeline import packed_chunk_id

    df = spark.createDataFrame(
        [(7, 0), (7, 1024)], "doc_id long, chunk_idx long"
    )
    with pytest.raises(Exception, match="CHUNK_ID_MUL"):
        df.select(packed_chunk_id("doc_id", "chunk_idx").alias("cid")).collect()


def test_long_document_fails_chunk_index_build(spark, tmp_path):
    """A book-length document (> ~49k tokens at the RAG stride) makes
    chunk_tokens emit chunk_idx >= 1024; the packed-id build must fail
    with the guard's message, not alias ids (VERDICT r12 weak #1)."""
    from spark_nnd_spark.operators import sampling as SA
    from spark_nnd_spark.queries.pipeline import (
        CHUNK_ID_MUL,
        RAG_CHUNK_SIZE,
        RAG_CHUNK_STRIDE,
        packed_chunk_id,
    )

    n_tokens = CHUNK_ID_MUL * RAG_CHUNK_STRIDE + RAG_CHUNK_SIZE  # ≈49k
    text = " ".join(f"w{i % 97}" for i in range(n_tokens))
    d = spark.createDataFrame([(1, text)], "doc_id long, text string")
    ch = SA.chunk_tokens(
        d, size=RAG_CHUNK_SIZE, stride=RAG_CHUNK_STRIDE
    ).select(packed_chunk_id("doc_id", "chunk_idx").alias("chunk_id"))
    # NOTE: .count() would let Catalyst prune the guarded projection;
    # evaluate the id the way the index build does.
    with pytest.raises(Exception, match="CHUNK_ID_MUL"):
        ch.agg(F.max("chunk_id")).collect()


# --------------------------------------- 2. OOV add-one floor (DSIR)

def test_dsir_score_oov_token_gets_smoothing_floor(spark):
    from spark_nnd_spark.operators.sampling import dsir_score

    vocab = spark.createDataFrame(
        [("a", 6, 2), ("b", 3, 4)], "token string, raw_cnt long, tgt_cnt long"
    )
    toks = spark.createDataFrame(
        [(1, "a"), (1, "zzz")], "doc_id long, token string"
    )
    row = dsir_score(toks, vocab).collect()[0]
    # OOV token still counts toward n_tokens …
    assert row.n_tokens == 2
    # … and contributes the alpha-floor log weight: cnt -> 0.
    v, raw_t, tgt_t, a = 2, 9, 6, 1.0
    lw_a = math.log((2 + a) / (tgt_t + a * v)) - math.log(
        (6 + a) / (raw_t + a * v)
    )
    lw_oov = math.log((0 + a) / (tgt_t + a * v)) - math.log(
        (0 + a) / (raw_t + a * v)
    )
    assert row.log_weight == pytest.approx(lw_a + lw_oov, abs=1e-6)


def test_ref_lm_score_oov_token_gets_smoothing_floor(spark):
    from spark_nnd_spark.operators.sampling import ref_lm_score

    vocab = spark.createDataFrame(
        [("a", 6), ("b", 3)], "token string, ref_cnt long"
    )
    toks = spark.createDataFrame(
        [(1, "en", "a"), (1, "en", "zzz")], "doc_id long, lang string, token string"
    )
    row = ref_lm_score(toks, vocab).collect()[0]
    assert row.n_tokens == 2
    v, ref_t = 2, 9
    lp = (
        math.log((6 + 1.0) / (ref_t + v)) + math.log((0 + 1.0) / (ref_t + v))
    ) / 2
    assert row.logprob == pytest.approx(lp, abs=1e-6)


def test_dsir_full_coverage_vocab_unchanged_by_left_join(spark):
    """With a vocab covering the stream (the inline tier) the left
    join is byte-identical to the old inner join — the oracles of
    q171/q196 rely on this."""
    from spark_nnd_spark.operators.sampling import dsir_score

    vocab = spark.createDataFrame(
        [("a", 6, 2), ("b", 3, 4)], "token string, raw_cnt long, tgt_cnt long"
    )
    toks = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "b")], "doc_id long, token string"
    )
    rows = {r.doc_id: r for r in dsir_score(toks, vocab).collect()}
    v, raw_t, tgt_t, a = 2, 9, 6, 1.0

    def lw(raw, tgt):
        return math.log((tgt + a) / (tgt_t + a * v)) - math.log(
            (raw + a) / (raw_t + a * v)
        )

    assert rows[1].n_tokens == 2
    assert rows[1].log_weight == pytest.approx(lw(6, 2) + lw(3, 4), abs=1e-6)
    assert rows[2].log_weight == pytest.approx(lw(3, 4), abs=1e-6)


# ------------------------------- 3. versioned-state rebuild semantics

def test_commit_state_rejects_existing_version(spark, tmp_path):
    from spark_nnd_spark.operators.state_commit import commit_state

    p = str(tmp_path / "st")
    t = spark.createDataFrame([(1,)], "x long")
    commit_state(spark, p, 0, {"t": t})
    with pytest.raises(ValueError, match="already exists"):
        commit_state(spark, p, 0, {"t": t})


def test_next_version_and_rebuild_over_existing_path(spark, tmp_path):
    from spark_nnd_spark.operators.state_commit import (
        committed_versions,
        next_version,
    )
    from spark_nnd_spark.operators.text_stats import (
        build_token_stats,
        token_counts_from_stats,
    )

    p = str(tmp_path / "ts")
    assert next_version(spark, p) == 0
    a = spark.createDataFrame(
        [(1, "x x y", "s")], "doc_id long, text string, source string"
    )
    b = spark.createDataFrame(
        [(2, "z", "s")], "doc_id long, text string, source string"
    )
    build_token_stats(a, p)
    assert committed_versions(spark, p) == [0]
    assert next_version(spark, p) == 1
    # rebuild over the SAME path: no nesting, readers serve the new build
    build_token_stats(b, p)
    assert committed_versions(spark, p)[-1] == 1
    got = {
        (r.source, r.token): r.n
        for r in token_counts_from_stats(spark, p).collect()
    }
    assert got == {("s", "z"): 1}


def test_build_cov_stats_rebuild_over_existing_path(spark, tmp_path):
    from spark_nnd_spark.operators.clustering import (
        build_cov_stats,
        cov_state_dir,
    )

    p = str(tmp_path / "cov")
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0, 4.0])], "id long, embedding array<double>"
    )
    build_cov_stats(df, p, dim=2)
    build_cov_stats(df, p, dim=2)  # was: rename-into-dir nesting / stale serve
    assert cov_state_dir(spark, p).endswith("v=1")


# --------------------------- 4. derived_df_cap empty-input observability

def test_derived_df_cap_empty_input_refreshes_observability(spark):
    from spark_nnd_spark.operators.dedup import LAST_DERIVED_CAP, derived_df_cap

    full = spark.createDataFrame([(5,), (5,), (1,)], "df long")
    derived_df_cap(full)
    assert LAST_DERIVED_CAP["total_postings"] > 0
    empty = spark.createDataFrame([], "df long")
    cap = derived_df_cap(empty, floor=3)
    assert cap == 3
    assert LAST_DERIVED_CAP["cap"] == 3
    assert LAST_DERIVED_CAP["total_postings"] == 0
    assert LAST_DERIVED_CAP["keys_cut"] == 0
