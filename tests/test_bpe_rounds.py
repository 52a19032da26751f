"""q157 iterative BPE merge rounds — hand-solved fixture.

Corpus: "abab" x3, "ab" x2, "ba" x1.
Round 1 census: (a,b) = 3*2 + 2 = 8, (b,a) = 3 + 1 = 4 -> merge a+b (8).
Round 2: "abab"->[ab,ab], "ab"->[ab], "ba"->[b,a]:
         (ab,ab) = 3, (b,a) = 1 -> merge ab+ab (3).
Round 3: only (b,a) = 1 survives -> merge b+a (1).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_nnd_spark.queries.pipeline import (
    BPE_MERGE_ROUNDS,
    _bpe_apply_merge,
    _bpe_pair_census,
)


def _vocab(spark):
    rows = [("abab", 3), ("ab", 2), ("ba", 1)]
    return spark.createDataFrame(rows, "tok string, c long").select(
        "c", F.split("tok", "").alias("syms")
    )


def test_bpe_rounds_hand_solved(spark):
    cur = _vocab(spark)
    merges = []
    for _ in range(BPE_MERGE_ROUNDS):
        best = (
            _bpe_pair_census(cur)
            .orderBy(F.desc("n"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()[0]
        )
        merges.append((best.l + "+" + best.r, best.n))
        cur = _bpe_apply_merge(cur, best.l, best.r)
    assert merges == [("a+b", 8), ("ab+ab", 3), ("b+a", 1)]


def test_bpe_merge_greedy_on_runs(spark):
    # greedy left-to-right non-overlap: 'aaa' + merge(a,a) -> [aa, a],
    # 'aaaa' -> [aa, aa] — the case a string replace() would get wrong.
    df = spark.createDataFrame(
        [("aaa", 1), ("aaaa", 1)], "tok string, c long"
    ).select("c", F.split("tok", "").alias("syms"))
    out = {
        tuple(r.syms)
        for r in _bpe_apply_merge(df, "a", "a").collect()
    }
    assert out == {("aa", "a"), ("aa", "aa")}


def test_bpe_single_char_words_pass_through(spark):
    df = spark.createDataFrame([("a", 5)], "tok string, c long").select(
        "c", F.split("tok", "").alias("syms")
    )
    assert _bpe_pair_census(df).collect() == []
    assert _bpe_apply_merge(df, "a", "a").collect()[0].syms == ["a"]
