"""Winnow index family (q205) — full lifecycle: probe == inline
winnow_pairs twin, extend == fresh build, retraction immediate,
compaction == fresh build, re-admission upsert. Mirrors the span-index
discipline (the eleventh persisted family)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from spark_nnd_spark.operators.dedup import (
    build_winnow_index,
    compact_winnow_index,
    extend_winnow_index,
    retract_from_winnow_index,
    winnow_pairs,
    winnow_query_index,
)

# 20 tokens: 17 pure passage shingles at n=4 — enough selected minima
# to clear min_shared=2 on every shared-passage pair

pytestmark = pytest.mark.slow  # heavy tier: deselected from the default fast run

PASSAGE = " ".join(f"p{i}" for i in range(20))


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
        for r in winnow_query_index(spark, idx, batch, min_shared=2).collect()
    )


def test_probe_matches_inline_kernel(spark, tmp_path):
    idx = str(tmp_path / "widx")
    build_winnow_index(_corpus(spark), idx, n=4, w=4)
    got = _probe(spark, idx, _batch(spark))
    # inline twin: winnow_pairs over corpus+batch (no df-cut), cut to
    # the cross (batch, corpus) pairs — the kernel the probe must equal
    both = _corpus(spark).unionByName(_batch(spark))
    inline = sorted(
        (r.id_b, r.id_a, r.n_shared)
        for r in winnow_pairs(both, n=4, w=4, min_shared=2).collect()
        if r.id_b >= 100 and r.id_a < 100  # batch x corpus only
    )
    assert got == inline
    assert {(b, c) for b, c, _ in got} == {(100, 1), (100, 3)}
    assert all(n >= 2 for _, _, n in got)


def test_extend_equals_fresh_build(spark, tmp_path):
    base, grown, fresh = (str(tmp_path / n) for n in ("b", "g", "f"))
    c = _corpus(spark)
    extra = spark.createDataFrame(
        [(4, PASSAGE + " " + _fill("d", 18))], "doc_id long, text string"
    )
    build_winnow_index(c, base, n=4, w=4)
    build_winnow_index(c, grown, n=4, w=4)
    extend_winnow_index(spark, grown, extra)
    build_winnow_index(c.unionByName(extra), fresh, n=4, w=4)
    b = _batch(spark)
    assert _probe(spark, grown, b) == _probe(spark, fresh, b)
    # new doc matches the batch's planted passage via the grown index
    assert 4 in {r[1] for r in _probe(spark, grown, b)}
    # stats refreshed: df counts equal the fresh build's
    st = lambda p: sorted(  # noqa: E731
        tuple(r) for r in spark.read.parquet(f"{p}/fp_stats").collect()
    )
    assert st(grown) == st(fresh)


def test_retract_immediate_and_compact_equals_fresh(spark, tmp_path):
    idx, fresh = str(tmp_path / "i"), str(tmp_path / "f")
    build_winnow_index(_corpus(spark), idx, n=4, w=4)
    b = _batch(spark)
    assert {r[1] for r in _probe(spark, idx, b)} == {1, 3}
    # retract doc 1: its fingerprints must stop matching immediately
    retract_from_winnow_index(
        spark, idx, spark.createDataFrame([(1,)], "doc_id long")
    )
    after = _probe(spark, idx, b)
    assert {r[1] for r in after} == {3}
    # compaction folds the log; probe unchanged, tables == fresh build
    compact_winnow_index(spark, idx)
    assert _probe(spark, idx, b) == after
    build_winnow_index(
        _corpus(spark).filter(F.col("doc_id") != 1), fresh, n=4, w=4
    )
    assert _probe(spark, idx, b) == _probe(spark, fresh, b)
    rows = lambda p: sorted(  # noqa: E731
        tuple(r) for r in spark.read.parquet(f"{p}/fps").collect()
    )
    assert rows(idx) == rows(fresh)


def test_readmission_upsert(spark, tmp_path):
    idx = str(tmp_path / "i")
    build_winnow_index(_corpus(spark), idx, n=4, w=4)
    retract_from_winnow_index(
        spark, idx, spark.createDataFrame([(3,)], "doc_id long")
    )
    b = _batch(spark)
    assert {r[1] for r in _probe(spark, idx, b)} == {1}
    # re-admit doc 3 with NEW content (no passage): old fps must be
    # purged, tombstone cleared — doc 3 stays a non-match but is
    # physically present with only the new rows
    new3 = spark.createDataFrame(
        [(3, _fill("z", 28))], "doc_id long, text string"
    )
    extend_winnow_index(spark, idx, new3)
    assert {r[1] for r in _probe(spark, idx, b)} == {1}
    stored = (
        spark.read.parquet(f"{idx}/fps").filter(F.col("doc_id") == 3).count()
    )
    # exactly the NEW text's selected fingerprints, none of the old
    from spark_nnd_spark.functions import text as TX

    expect = (
        new3.withColumn("_hs", TX.ordered_shingle_hashes_expr("text", 4))
        .select(F.explode(TX.winnow_select_expr(F.col("_hs"), 4)))
        .count()
    )
    assert stored == expect


def test_df_cut_uses_stored_stats(spark, tmp_path):
    """A fingerprint present in > max_fp_freq indexed docs is cut from
    the probe — boilerplate never generates candidate pairs."""
    idx = str(tmp_path / "i")
    boiler = " ".join(f"w{i}" for i in range(8))
    rows = [(i, boiler + " " + _fill(f"u{i}_", 12)) for i in range(1, 6)]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    build_winnow_index(corpus, idx, n=4, w=4)
    batch = spark.createDataFrame(
        [(100, boiler + " " + _fill("v", 12))], "doc_id long, text string"
    )
    # boilerplate fps sit in all 5 docs: cap=4 cuts them, cap=None keeps
    cut = winnow_query_index(spark, idx, batch, min_shared=1, max_fp_freq=4)
    raw = winnow_query_index(spark, idx, batch, min_shared=1)
    assert raw.count() == 5
    assert cut.count() == 0


def test_winnow_gate_stream_replay_equals_batch(spark, tmp_path):
    """Streaming winnow gate: planted copied passage rejected in every
    replay; verdicts == pure function of (batch, index); retraction
    flips the verdict to admit."""
    import os

    import pandas as pd

    from spark_nnd_spark.streaming.streams import winnow_gate_stream

    idx = str(tmp_path / "widx")
    build_winnow_index(_corpus(spark), idx, n=4, w=4)
    cands = [
        (200, _fill("m", 15) + " " + PASSAGE),  # copies indexed passage
        (201, _fill("n", 30)),                  # clean
        (202, PASSAGE + " " + _fill("o", 22)),  # copies indexed passage
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
        winnow_gate_stream(
            stream, idx, out, checkpoint=str(tmp_path / ckpt), min_shared=2
        )
        return sorted(
            tuple(r)
            for r in spark.read.parquet(out).drop("winnow_batch").collect()
        )

    streamed = run("ck1")
    v = {r[0]: r[4] for r in streamed}
    assert v == {200: True, 201: False, 202: True, 203: False}
    # best match is a passage carrier and counts agree with the probe
    probe = winnow_query_index(
        spark,
        idx,
        spark.createDataFrame(cands, "doc_id long, text string"),
        min_shared=2,
    ).collect()
    by_cand = {}
    for r in probe:
        by_cand.setdefault(r.batch_id, []).append(r)
    for doc_id, best_id, max_shared, n_matches, copied in streamed:
        if not copied:
            assert doc_id not in by_cand
            assert (best_id, max_shared, n_matches) == (-1, 0, 0)
            continue
        rows = by_cand[doc_id]
        top = max(rows, key=lambda r: (r.n_shared, -r.index_id))
        assert (best_id, max_shared, n_matches) == (
            top.index_id,
            top.n_shared,
            len(rows),
        )
    assert run("ck2") == streamed  # replay == first run

    # retraction lifecycle: retract every passage carrier -> admit all
    retract_from_winnow_index(
        spark, idx, spark.createDataFrame([(1,), (3,)], "doc_id long")
    )
    after = run("ck3")
    assert {r[0]: r[4] for r in after} == {
        200: False, 201: False, 202: False, 203: False
    }


def test_gapfill_guard_rejects_pathological_span(spark):
    """gap_fill_locf fails fast (clear ValueError) when one series
    would explode into more grid slots than max_slots_per_series —
    instead of dying as an executor OOM inside the sequence-explode."""
    import datetime

    import pytest

    from spark_nnd_spark.operators.events import gap_fill_locf

    rows = [
        (0, datetime.datetime(2014, 1, 1), 1, "click", 1.0, "{}"),
        (1, datetime.datetime(2024, 1, 1), 1, "click", 2.0, "{}"),
    ]
    e = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    with pytest.raises(ValueError, match="max_slots_per_series"):
        gap_fill_locf(e, grain_seconds=3600, max_slots_per_series=1000)
    # under the cap the same data fills fine
    out = gap_fill_locf(e, grain_seconds=3600, max_slots_per_series=100_000)
    assert out.count() == 10 * 365 * 24 + 2 * 24 + 1  # 2014->2024 hourly span


def test_pairs_index_equals_inline_and_guards_capped_tombstones(spark, tmp_path):
    """winnow_pairs_index == inline winnow_pairs on the same corpus
    (served-from-storage assertion); capped path refuses while
    tombstones pend; uncapped path stays exact under tombstones."""
    import pytest

    from spark_nnd_spark.operators.dedup import winnow_pairs_index

    idx = str(tmp_path / "widx")
    both = _corpus(spark).unionByName(_batch(spark))
    build_winnow_index(both, idx, n=4, w=4)
    served = sorted(
        tuple(r) for r in winnow_pairs_index(spark, idx, min_shared=2).collect()
    )
    inline = sorted(
        tuple(r)
        for r in winnow_pairs(both, n=4, w=4, min_shared=2).collect()
    )
    assert served == inline and len(served) > 0
    # retract doc 1 -> capped sweep refuses, uncapped equals a fresh
    # build over the surviving docs
    retract_from_winnow_index(
        spark, idx, spark.createDataFrame([(1,)], "doc_id long")
    )
    with pytest.raises(ValueError, match="tombstones"):
        winnow_pairs_index(spark, idx, min_shared=2, max_fp_freq=10)
    after = sorted(
        tuple(r) for r in winnow_pairs_index(spark, idx, min_shared=2).collect()
    )
    want = sorted(
        tuple(r)
        for r in winnow_pairs(
            both.filter(F.col("doc_id") != 1), n=4, w=4, min_shared=2
        ).collect()
    )
    assert after == want


def test_winnow_gate_admit_novel_closes_ingest_loop(spark, tmp_path):
    """admit_novel: a clean doc admitted in batch N is matched by its
    copier in batch N+1; a full replay with existing markers is a
    no-op (verdict dirs unchanged); the copier itself is NOT admitted."""
    import os

    import pandas as pd

    from spark_nnd_spark.streaming.streams import winnow_gate_stream

    idx = str(tmp_path / "widx")
    build_winnow_index(_corpus(spark), idx, n=4, w=4)  # docs 1,2,3
    new_passage = " ".join(f"np{i}" for i in range(20))
    cands = [
        (300, _fill("g", 12) + " " + new_passage),   # clean -> admitted
        (301, new_passage + " " + _fill("h", 14)),   # copies 300 (later batch)
    ]
    src = tmp_path / "cands"
    src.mkdir()
    for b in range(2):
        p = src / f"chunk{b}.parquet"
        pd.DataFrame([cands[b]], columns=["doc_id", "text"]).to_parquet(
            p, index=False
        )
        os.utime(p, (1_700_000_000 + b, 1_700_000_000 + b))
    out = str(tmp_path / "gates")

    def run(ckpt: str):
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        winnow_gate_stream(
            stream, idx, out, checkpoint=str(tmp_path / ckpt),
            min_shared=2, admit_novel=True,
        )
        return sorted(
            tuple(r)
            for r in spark.read.parquet(out).drop("winnow_batch").collect()
        )

    first = run("ck1")
    v = {r[0]: (r[1], r[4]) for r in first}
    assert v[300] == (-1, False)   # novel at probe time -> admitted
    assert v[301] == (300, True)   # caught by the doc admitted one batch earlier
    # 301 (copied) must NOT be in the index; 300 must be
    ids = {
        r[0]
        for r in spark.read.parquet(f"{idx}/fps").select("doc_id").distinct().collect()
    }
    assert 300 in ids and 301 not in ids
    # replay with fresh checkpoint: markers make every batch a no-op
    assert run("ck2") == first
    assert {
        r[0]
        for r in spark.read.parquet(f"{idx}/fps").select("doc_id").distinct().collect()
    } == ids


def test_duplicate_submission_extend_is_upsert(spark, tmp_path):
    """Extending a doc that is already LIVE in the index (duplicate
    submission / crashed re-extension) purges its old rows first — no
    duplicate postings survive, and the grown index stays byte-equal
    to a fresh build (the compact==fresh invariant the r13 advice
    flagged as drifting)."""
    grown, fresh = str(tmp_path / "g"), str(tmp_path / "f")
    c = _corpus(spark)
    extra = spark.createDataFrame(
        [(4, PASSAGE + " " + _fill("d", 18))], "doc_id long, text string"
    )
    build_winnow_index(c, grown, n=4, w=4)
    extend_winnow_index(spark, grown, extra)
    n_once = spark.read.parquet(f"{grown}/fps").count()
    extend_winnow_index(spark, grown, extra)  # duplicate submission
    assert spark.read.parquet(f"{grown}/fps").count() == n_once
    build_winnow_index(c.unionByName(extra), fresh, n=4, w=4)
    rows = lambda p: sorted(  # noqa: E731
        tuple(r) for r in spark.read.parquet(f"{p}/fps").collect()
    )
    assert rows(grown) == rows(fresh)
    st = lambda p: sorted(  # noqa: E731
        tuple(r) for r in spark.read.parquet(f"{p}/fp_stats").collect()
    )
    assert st(grown) == st(fresh)


def test_df_cut_replay_purity_under_partial_admission(spark, tmp_path):
    """The admit-novel gate's replay contract with max_fp_freq set: a
    probe that masks the batch's ids (exclude_ids) must return the
    same verdicts BEFORE and AFTER a crashed partial admission of that
    batch — the boilerplate cut is computed from the masked postings,
    not the stored fp_stats the partial admission refreshed."""
    idx = str(tmp_path / "i")
    boiler = " ".join(f"w{i}" for i in range(8))
    rows = [(i, boiler + " " + _fill(f"u{i}_", 12)) for i in range(1, 5)]
    build_winnow_index(
        spark.createDataFrame(rows, "doc_id long, text string"), idx, n=4, w=4
    )
    # batch of boilerplate-carrying docs; cap=4 sits exactly at the
    # pre-batch df (4 docs), so any admitted batch doc pushing stored
    # df to 5 would flip the cut if stats were trusted
    batch = spark.createDataFrame(
        [(100, boiler + " " + _fill("v", 12)),
         (101, boiler + " " + _fill("x", 12))],
        "doc_id long, text string",
    )
    ex = batch.select("doc_id")
    probe = lambda: sorted(  # noqa: E731
        tuple(r)
        for r in winnow_query_index(
            spark, idx, batch, min_shared=1, max_fp_freq=4, exclude_ids=ex
        ).collect()
    )
    before = probe()
    # crash simulation: doc 100 admitted, marker never written
    extend_winnow_index(spark, idx, batch.filter(F.col("doc_id") == 100))
    assert probe() == before
