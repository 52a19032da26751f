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
