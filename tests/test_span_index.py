"""Span index family (q162) — full lifecycle: probe == inline kernel,
extend == fresh build, retraction immediate, compaction == fresh build,
re-admission upsert. Mirrors the near-dup index discipline."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from spark_nnd_spark.operators.dedup import (
    build_span_index,
    compact_span_index,
    exact_span_pairs,
    extend_span_index,
    retract_from_span_index,
    span_query_index,
)


pytestmark = pytest.mark.slow  # heavy tier: deselected from the default fast run

PASSAGE = "p0 p1 p2 p3 p4 p5 p6 p7 p8 p9 p10 p11"  # 12 tokens


def _fill(prefix: str, n: int) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


def _corpus(spark):
    rows = [
        (1, _fill("a", 30) + " " + PASSAGE),
        (2, _fill("b", 40)),
        (3, PASSAGE + " " + _fill("c", 25)),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _batch(spark):
    rows = [
        (100, _fill("q", 20) + " " + PASSAGE + " " + _fill("r", 10)),
        (101, _fill("s", 35)),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _probe(spark, idx, batch):
    return sorted(
        tuple(r)
        for r in span_query_index(
            spark, idx, batch, min_span_tokens=12
        ).collect()
    )


def test_probe_matches_inline_kernel(spark, tmp_path):
    idx = str(tmp_path / "sidx")
    build_span_index(_corpus(spark), idx, gram_len=6)
    got = _probe(spark, idx, _batch(spark))
    # inline twin: exact_span_pairs over corpus+batch, cut to the
    # cross (batch, corpus) pairs — the kernel the probe must equal
    both = _corpus(spark).unionByName(_batch(spark))
    inline = sorted(
        (r.id_b, r.id_a, r.n_spans, r.max_span_tokens, r.matched_tokens)
        for r in exact_span_pairs(both, gram_len=6, min_span_tokens=12).collect()
        if r.id_b >= 100 and r.id_a < 100  # batch x corpus only
    )
    assert got == inline
    assert {(b, c) for b, c, *_ in got} == {(100, 1), (100, 3)}
    assert all(row[3] == 12 for row in got)  # the planted passage


def test_extend_equals_fresh_build(spark, tmp_path):
    base, grown, fresh = (str(tmp_path / n) for n in ("b", "g", "f"))
    c = _corpus(spark)
    extra = spark.createDataFrame(
        [(4, PASSAGE + " " + _fill("d", 18))], "doc_id long, text string"
    )
    build_span_index(c, base, gram_len=6)
    build_span_index(c, grown, gram_len=6)
    extend_span_index(spark, grown, extra)
    build_span_index(c.unionByName(extra), fresh, gram_len=6)
    b = _batch(spark)
    assert _probe(spark, grown, b) == _probe(spark, fresh, b)
    # stats refreshed: df counts equal the fresh build's
    gs = lambda p: sorted(  # noqa: E731
        tuple(r) for r in spark.read.parquet(f"{p}/gram_stats").collect()
    )
    assert gs(grown) == gs(fresh)


def test_retract_immediate_and_compact_equals_fresh(spark, tmp_path):
    idx, fresh = str(tmp_path / "i"), str(tmp_path / "f")
    build_span_index(_corpus(spark), idx, gram_len=6)
    b = _batch(spark)
    assert {(r[1]) for r in _probe(spark, idx, b)} == {1, 3}
    # retract doc 1: its spans must stop matching immediately
    retract_from_span_index(
        spark, idx, spark.createDataFrame([(1,)], "doc_id long")
    )
    after = _probe(spark, idx, b)
    assert {(r[1]) for r in after} == {3}
    # compaction folds the log; probe unchanged, tables == fresh build
    compact_span_index(spark, idx)
    assert _probe(spark, idx, b) == after
    build_span_index(
        _corpus(spark).filter(F.col("doc_id") != 1), fresh, gram_len=6
    )
    assert _probe(spark, idx, b) == _probe(spark, fresh, b)
    rows = lambda p: sorted(  # noqa: E731
        tuple(r) for r in spark.read.parquet(f"{p}/grams").collect()
    )
    assert rows(idx) == rows(fresh)


def test_readmission_upsert(spark, tmp_path):
    idx = str(tmp_path / "i")
    build_span_index(_corpus(spark), idx, gram_len=6)
    retract_from_span_index(
        spark, idx, spark.createDataFrame([(3,)], "doc_id long")
    )
    b = _batch(spark)
    assert {(r[1]) for r in _probe(spark, idx, b)} == {1}
    # re-admit doc 3 with NEW content (no passage): old grams must be
    # purged, tombstone cleared — doc 3 stays a non-match on spans but
    # is physically present with only the new rows
    extend_span_index(
        spark,
        idx,
        spark.createDataFrame(
            [(3, _fill("z", 28))], "doc_id long, text string"
        ),
    )
    assert {(r[1]) for r in _probe(spark, idx, b)} == {1}
    n3 = (
        spark.read.parquet(f"{idx}/grams")
        .filter(F.col("doc_id") == 3)
        .count()
    )
    assert n3 == 28 - 6 + 1  # grams of the NEW 28-token text only


def test_span_gate_stream_replay_equals_batch(spark, tmp_path):
    """Streaming span gate: planted verbatim passage rejected in every
    replay; verdicts == one-shot batch probe; retraction flips the
    verdict to admit."""
    import os

    import pandas as pd

    from spark_nnd_spark.streaming.streams import span_gate_stream

    idx = str(tmp_path / "sidx")
    build_span_index(_corpus(spark), idx, gram_len=6)
    cands = [
        (200, _fill("m", 15) + " " + PASSAGE),  # contains indexed passage
        (201, _fill("n", 30)),                  # clean
        (202, PASSAGE + " " + _fill("o", 22)),  # contains indexed passage
        (203, _fill("t", 26)),                  # clean
    ]
    src = tmp_path / "cands"
    src.mkdir()
    for b in range(2):
        p = src / f"chunk{b}.parquet"
        pd.DataFrame(
            cands[2 * b : 2 * b + 2], columns=["doc_id", "text"]
        ).to_parquet(p, index=False)
        os.utime(p, (1_700_000_000 + b, 1_700_000_000 + b))
    out = str(tmp_path / "gates")

    def run(ckpt: str):
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        span_gate_stream(
            stream, idx, out, checkpoint=str(tmp_path / ckpt),
            min_span_tokens=12,
        )
        return sorted(
            tuple(r)
            for r in spark.read.parquet(out).drop("span_batch").collect()
        )

    streamed = run("ck1")
    v = {r[0]: r[4] for r in streamed}
    assert v == {200: True, 201: False, 202: True, 203: False}
    assert run("ck2") == streamed  # replay == first run

    # retraction lifecycle: retract every doc carrying the passage ->
    # the gate admits previously-rejected candidates immediately
    retract_from_span_index(
        spark, idx, spark.createDataFrame([(1,), (3,)], "doc_id long")
    )
    after = run("ck3")
    assert {r[0]: r[4] for r in after} == {
        200: False, 201: False, 202: False, 203: False
    }


def test_span_scrub_index_cuts_indexed_spans(spark, tmp_path):
    """q172's kernel: a batch doc sharing the indexed passage gets it
    CUT (surrounding text byte-identical), clean docs pass through
    0/0, and the scrub agrees with the probe's flags doc-for-doc."""
    from spark_nnd_spark.operators.dedup import span_scrub_index

    idx = str(tmp_path / "sidx")
    build_span_index(_corpus(spark), idx, gram_len=6)
    b = _batch(spark)  # 100 carries the passage, 101 clean
    out = {
        r.doc_id: r
        for r in span_scrub_index(
            spark, idx, b, min_span_tokens=12
        ).collect()
    }
    assert set(out) == {100, 101}
    assert out[100].n_spans_cut == 1 and out[100].tokens_cut == 12
    assert PASSAGE not in out[100].cleaned_text
    assert out[100].cleaned_text == _fill("q", 20) + " " + _fill("r", 10)
    assert out[101].n_spans_cut == 0 and out[101].tokens_cut == 0
    assert out[101].cleaned_text == _fill("s", 35)
    # scrub flags == probe flags
    flagged = {
        r.batch_id
        for r in span_query_index(
            spark, idx, b, min_span_tokens=12
        ).collect()
    }
    assert {i for i, r in out.items() if r.n_spans_cut > 0} == flagged
    # retraction reaches the scrub immediately: retract every indexed
    # passage carrier -> nothing cut any more
    retract_from_span_index(
        spark, idx, spark.createDataFrame([(1,), (3,)], "doc_id long")
    )
    after = {
        r.doc_id: r
        for r in span_scrub_index(
            spark, idx, b, min_span_tokens=12
        ).collect()
    }
    assert after[100].n_spans_cut == 0
    assert PASSAGE in after[100].cleaned_text


def test_span_scrub_stream_replay_equals_batch(spark, tmp_path):
    """Streaming scrub: leaky candidates are admitted MINUS the leak in
    every replay; output == one-shot batch scrub; retraction restores
    the text immediately."""
    import os

    import pandas as pd

    from spark_nnd_spark.operators.dedup import span_scrub_index
    from spark_nnd_spark.streaming.streams import span_scrub_stream

    idx = str(tmp_path / "sidx")
    build_span_index(_corpus(spark), idx, gram_len=6)
    cands = [
        (300, _fill("m", 15) + " " + PASSAGE),
        (301, _fill("n", 30)),
        (302, PASSAGE + " " + _fill("o", 22)),
        (303, _fill("t", 26)),
    ]
    src = tmp_path / "cands"
    src.mkdir()
    for b in range(2):
        p = src / f"chunk{b}.parquet"
        pd.DataFrame(
            cands[2 * b : 2 * b + 2], columns=["doc_id", "text"]
        ).to_parquet(p, index=False)
        os.utime(p, (1_700_000_000 + b, 1_700_000_000 + b))
    out = str(tmp_path / "scrubs")

    def run(ckpt: str):
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        span_scrub_stream(
            stream, idx, out, checkpoint=str(tmp_path / ckpt),
            min_span_tokens=12,
        )
        return sorted(
            tuple(r)
            for r in spark.read.parquet(out).drop("scrub_batch").collect()
        )

    streamed = run("ck1")
    by_id = {r[0]: r for r in streamed}
    assert by_id[300][1] == _fill("m", 15) and by_id[300][3] == 12
    assert by_id[302][1] == _fill("o", 22) and by_id[302][3] == 12
    assert by_id[301][1] == _fill("n", 30) and by_id[301][3] == 0
    assert run("ck2") == streamed  # replay == first run
    # stream == one-shot batch twin
    docs = spark.createDataFrame(cands, "doc_id long, text string")
    batch = sorted(
        tuple(r)
        for r in span_scrub_index(
            spark, idx, docs, min_span_tokens=12
        ).collect()
    )
    assert streamed == batch
    # retraction: spans stop being cut immediately
    retract_from_span_index(
        spark, idx, spark.createDataFrame([(1,), (3,)], "doc_id long")
    )
    after = {r[0]: r for r in run("ck3")}
    assert after[300][1] == cands[0][1] and after[300][3] == 0


def test_duplicate_submission_extend_is_upsert(spark, tmp_path):
    """Extending a doc that is already LIVE in the index (duplicate
    submission / crashed re-extension) purges its old positional grams
    first — no duplicate rows survive (duplicates would corrupt probe
    span extents), and the grown index equals a fresh build. The
    live-overlap check reads the O(docs) ids roster."""
    grown, fresh = str(tmp_path / "g"), str(tmp_path / "f")
    c = _corpus(spark)
    extra = spark.createDataFrame(
        [(4, PASSAGE + " " + _fill("d", 18))], "doc_id long, text string"
    )
    build_span_index(c, grown, gram_len=6)
    extend_span_index(spark, grown, extra)
    n_once = spark.read.parquet(f"{grown}/grams").count()
    extend_span_index(spark, grown, extra)  # duplicate submission
    assert spark.read.parquet(f"{grown}/grams").count() == n_once
    build_span_index(c.unionByName(extra), fresh, gram_len=6)
    rows = lambda p: sorted(  # noqa: E731
        tuple(r) for r in spark.read.parquet(f"{p}/grams").collect()
    )
    assert rows(grown) == rows(fresh)
    ids = lambda p: sorted(  # noqa: E731
        r[0] for r in spark.read.parquet(f"{p}/ids").collect()
    )
    assert ids(grown) == ids(fresh) == [1, 2, 3, 4]
