"""exact_span_pairs (q156) — verbatim-span dedup the set-based tiers miss.

The planted-passage test is the operator's reason to exist (VERDICT r9
missing #1, Lee et al. 2022): a short copied passage inside two
otherwise-unrelated documents is invisible to whole-document MinHash
(the verify step computes exact shingle Jaccard, so the miss is
deterministic, not a banding accident) but is exactly what
exact_span_pairs reports.
"""

from __future__ import annotations

from spark_nnd_spark.operators import dedup as DD

PASSAGE = "p0 p1 p2 p3 p4 p5 p6 p7 p8 p9 p10 p11"  # 12 tokens


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _filler(prefix: str, n: int) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_planted_passage_found_where_minhash_misses(spark):
    a = _filler("a", 30) + " " + PASSAGE + " " + _filler("b", 30)
    b = _filler("c", 30) + " " + PASSAGE + " " + _filler("d", 30)
    docs = _docs(spark, [(1, a), (2, b)])

    spans = DD.exact_span_pairs(docs, gram_len=6, min_span_tokens=12).collect()
    assert len(spans) == 1
    r = spans[0]
    assert (r.id_a, r.id_b) == (1, 2)
    assert r.n_spans == 1
    assert r.max_span_tokens == 12
    assert r.matched_tokens == 12

    # Whole-document MinHash at a realistic dedup threshold: the two
    # docs share 12/72 tokens => shingle Jaccard ~= 0.09, and the LSH
    # pipeline's exact-Jaccard verify step rejects the pair regardless
    # of banding luck — the deterministic "MinHash provably misses" half.
    mh = DD.minhash_lsh_pairs(
        docs, num_hashes=16, bands=4, n=3, threshold=0.3
    ).collect()
    assert mh == []


def test_two_separate_spans_and_edit_split(spark):
    # doc pair sharing TWO disjoint verbatim runs (12 and 14 tokens);
    # island merge must report them as separate maximal spans, never
    # bridged, with exact lengths.
    run2 = " ".join(f"q{i}" for i in range(14))
    a = PASSAGE + " " + _filler("a", 20) + " " + run2
    b = PASSAGE + " " + _filler("c", 20) + " " + run2
    r = (
        DD.exact_span_pairs(
            _docs(spark, [(1, a), (2, b)]), gram_len=6, min_span_tokens=12
        )
        .collect()[0]
    )
    assert r.n_spans == 2
    assert r.max_span_tokens == 14
    assert r.matched_tokens == 26

    # a single-token edit inside a 25-token run splits it into two
    # maximal 12-token spans (tokens 1-12 and 14-25) — the gap ends the
    # island on its diagonal.
    run = [f"r{i}" for i in range(25)]
    edited = list(run)
    edited[12] = "XX"
    r2 = (
        DD.exact_span_pairs(
            _docs(spark, [(1, " ".join(run)), (2, " ".join(edited))]),
            gram_len=6,
            min_span_tokens=12,
        )
        .collect()[0]
    )
    assert r2.n_spans == 2
    assert r2.max_span_tokens == 12
    assert r2.matched_tokens == 24


def test_min_span_threshold_excludes_short_runs(spark):
    # an 11-token shared run produces gram matches (11 >= gram_len) but
    # sits below min_span_tokens=12 — excluded, so the pair emits no row.
    short = " ".join(f"s{i}" for i in range(11))
    a = _filler("a", 25) + " " + short
    b = _filler("c", 25) + " " + short
    out = DD.exact_span_pairs(
        _docs(spark, [(1, a), (2, b)]), gram_len=6, min_span_tokens=12
    ).collect()
    assert out == []
    # the same run IS reported once the threshold admits it
    out11 = DD.exact_span_pairs(
        _docs(spark, [(1, a), (2, b)]), gram_len=6, min_span_tokens=11
    ).collect()
    assert len(out11) == 1 and out11[0].max_span_tokens == 11


def test_max_gram_freq_drops_boilerplate(spark):
    # the same 12-token "license header" on every doc: with the df-cut
    # at 3 docs, all its grams are dropped and no pairs emit — the
    # 100 TB skew guard for template text.
    rows = [(i, PASSAGE + " " + _filler(f"u{i}x", 20)) for i in range(6)]
    capped = DD.exact_span_pairs(
        _docs(spark, rows), gram_len=6, min_span_tokens=12, max_gram_freq=3
    ).collect()
    assert capped == []
    uncapped = DD.exact_span_pairs(
        _docs(spark, rows), gram_len=6, min_span_tokens=12
    ).collect()
    assert len(uncapped) == 15  # C(6,2) — every pair shares the header


def test_span_removal_keeps_exactly_one_copy(spark):
    # q167's kernel: a passage planted in three docs must survive the
    # rewrite in EXACTLY the smallest doc_id and be cut (with correct
    # token accounting) from the other two; untouched docs pass
    # through byte-identical with 0/0 counters.
    docs = _docs(
        spark,
        [
            (2, _filler("a", 20) + " " + PASSAGE + " " + _filler("b", 20)),
            (5, _filler("c", 20) + " " + PASSAGE + " " + _filler("d", 20)),
            (9, PASSAGE + " " + _filler("e", 20)),
            (7, _filler("z", 30)),  # untouched
        ],
    )
    out = {
        r.doc_id: r
        for r in DD.span_remove_rewrite(
            docs, gram_len=6, min_span_tokens=12
        ).collect()
    }
    assert len(out) == 4
    survivors = [i for i in (2, 5, 9) if PASSAGE in out[i].cleaned_text]
    assert survivors == [2]
    assert out[2].n_spans_cut == 0 and out[2].tokens_cut == 0
    for i in (5, 9):
        assert out[i].n_spans_cut == 1 and out[i].tokens_cut == 12
    # the cut is a token slice, not a blank: surrounding text survives
    assert out[5].cleaned_text == _filler("c", 20) + " " + _filler("d", 20)
    assert out[9].cleaned_text == _filler("e", 20)
    assert out[7].cleaned_text == _filler("z", 30)
    assert out[7].n_spans_cut == 0 and out[7].tokens_cut == 0


def test_span_removal_merges_overlapping_cut_intervals(spark):
    # doc 9 shares an 18-token run with doc 1 and the last 12 tokens of
    # that run with doc 2: its two cut intervals overlap and must union
    # into ONE merged cut (tokens_cut=18, n_spans_cut=1), not
    # double-count the overlap.
    run18 = " ".join(f"r{i}" for i in range(18))
    tail12 = " ".join(f"r{i}" for i in range(6, 18))
    docs = _docs(
        spark,
        [
            (1, _filler("a", 20) + " " + run18),
            (2, _filler("b", 20) + " " + tail12 + " " + _filler("c", 8)),
            (9, _filler("d", 20) + " " + run18 + " " + _filler("e", 8)),
        ],
    )
    out = {
        r.doc_id: r
        for r in DD.span_remove_rewrite(
            docs, gram_len=6, min_span_tokens=12
        ).collect()
    }
    assert out[9].n_spans_cut == 1
    assert out[9].tokens_cut == 18
    assert out[9].cleaned_text == _filler("d", 20) + " " + _filler("e", 8)
    # doc 2 (id_b of pair 1-2) loses its tail12 copy; doc 1 keeps run18
    assert run18 in out[1].cleaned_text
    assert tail12 not in out[2].cleaned_text
