"""Streaming curation gate (the ingest twin of q155/q159): per-batch
keep/drop boards with reasons, probed against the persisted near-dup
index — replay==batch, planted duplicate rejected in every replay."""

from __future__ import annotations

import pytest

import os

import pandas as pd
from pyspark.sql import functions as F

from spark_nnd_spark.operators.dedup import (
    build_neardup_index,
    neardup_query_index,
)
from spark_nnd_spark.queries.pipeline import board_compose, board_gates
from spark_nnd_spark.streaming.streams import curation_gate_stream
from tests.conftest import SF_SMOKE



pytestmark = pytest.mark.slow  # heavy tier: deselected from the default fast run

def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_curation_gate_stream_replay_equals_batch(spark, tmp_path):
    corpus = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "text"
    )
    idx = str(tmp_path / "ndidx")
    build_neardup_index(corpus, idx, num_hashes=16, bands=4, n=3)

    # candidates: two verbatim copies of indexed docs (must drop with
    # reason 'neardup') + four fresh texts that exercise the text gates
    base = {r.doc_id: r.text for r in corpus.limit(4).collect()}
    ids = sorted(base)
    cands = [
        (9000, base[ids[0]]),                   # exact dup of indexed doc
        (9001, base[ids[1]]),                   # exact dup of indexed doc
        (9002, base[ids[2]] + " novel tail marker words"),  # near-but-edited
        (9003, "zz zz zz zz zz zz zz zz zz zz"),  # repetition + entropy fail
        (9004, " ".join(f"w{i}" for i in range(40))),  # clean synthetic
        (9005, base[ids[3]][: len(base[ids[3]]) // 2] + " trailing bits"),
    ]
    src = tmp_path / "cands"
    src.mkdir()
    for b in range(2):  # two micro-batches of three candidates
        p = src / f"chunk{b}.parquet"
        pd.DataFrame(
            cands[3 * b : 3 * b + 3], columns=["doc_id", "text"]
        ).to_parquet(p, index=False)
        os.utime(p, (1_700_000_000 + b, 1_700_000_000 + b))
    out = str(tmp_path / "boards")

    def run(ckpt: str):
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        curation_gate_stream(
            stream, idx, out, checkpoint=str(tmp_path / ckpt), threshold=0.9
        )
        return _rows(spark.read.parquet(out).drop("board_batch"))

    streamed = run("ck1")
    assert sorted(
        p for p in os.listdir(out) if p.startswith("board_batch=")
    ) == ["board_batch=0", "board_batch=1"]
    by_id = {r[0]: r for r in streamed}
    # schema: doc_id, margin, entropy, quality_keep, rep_keep,
    #         entropy_keep, dedup_keep, keep, reasons
    for planted in (9000, 9001):
        assert by_id[planted][6] is False, "exact dup must fail dedup gate"
        assert by_id[planted][7] is False
        assert "neardup" in by_id[planted][8]
    assert by_id[9003][4] is False, "zz-spam must fail the repetition gate"
    assert by_id[9003][7] is False
    assert by_id[9004][6] is True, "fresh synthetic doc passes dedup"

    # replay from a fresh checkpoint: identical boards
    assert run("ck2") == streamed

    # stream == batch twin: shared gate expressions + one-shot probe
    docs = spark.createDataFrame(cands, "doc_id long, text string")
    drops = (
        neardup_query_index(spark, idx, docs, threshold=0.9)
        .filter(F.col("verdict") != "novel")
        .select("doc_id")
    )
    batch = _rows(board_compose(board_gates(docs), drops))
    assert streamed == batch


def test_model_scored_gate_stream_and_board(spark, tmp_path):
    """q170's model gate at ingest: curation_gate_stream(model_w=...)
    inherits model_score/model_keep and the 'model' reason through the
    shared board helpers; stream == batch twin with the same weights;
    an out-of-band all-negative model drops everything with 'model'."""
    corpus = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "text"
    )
    idx = str(tmp_path / "ndidx")
    build_neardup_index(corpus, idx, num_hashes=16, bands=4, n=3)
    cands = [
        (9100, " ".join(f"w{i}" for i in range(40))),
        (9101, "zz zz zz zz zz zz zz zz zz zz"),
    ]
    src = tmp_path / "cands"
    src.mkdir()
    p = src / "chunk0.parquet"
    pd.DataFrame(cands, columns=["doc_id", "text"]).to_parquet(p, index=False)
    out = str(tmp_path / "boards")
    w = {"bias": 0.2, "ntok": 0.1, "stop": -0.2, "ttr": 0.3}

    def run(ckpt: str, weights):
        stream = spark.readStream.schema("doc_id long, text string").parquet(
            str(src)
        )
        curation_gate_stream(
            stream, idx, out, checkpoint=str(tmp_path / ckpt),
            threshold=0.9, model_w=weights,
        )
        return _rows(spark.read.parquet(out).drop("board_batch"))

    streamed = run("ck1", w)
    # schema now: doc_id, margin, entropy, quality_keep, rep_keep,
    #   entropy_keep, dedup_keep, model_score, model_keep, keep, reasons
    assert all(len(r) == 11 for r in streamed)
    assert run("ck2", w) == streamed  # replay == first run

    docs = spark.createDataFrame(cands, "doc_id long, text string")
    drops = (
        neardup_query_index(spark, idx, docs, threshold=0.9)
        .filter(F.col("verdict") != "novel")
        .select("doc_id")
    )
    batch = _rows(board_compose(board_gates(docs, model_w=w), drops))
    assert streamed == batch

    # a certain-negative model (huge negative bias) fails every doc
    # with the 'model' reason folded into the verdict
    wneg = {"bias": -100.0, "ntok": 0.0, "stop": 0.0, "ttr": 0.0}
    rejected = run("ck3", wneg)
    assert all(r[8] is False and r[9] is False for r in rejected)
    assert all("model" in r[10] for r in rejected)
