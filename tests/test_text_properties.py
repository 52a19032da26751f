"""Property tests (hypothesis): the JVM-side text expressions agree
with independent plain-Python models on arbitrary ASCII token streams,
not just the synthetic corpus (SURVEY.md §5 item 2)."""

from __future__ import annotations

import string

import pytest

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from spark_nnd_spark.functions import text as TX

P = TX.P

# the corpus format: single-space-separated non-empty lowercase tokens
token = st.text(alphabet=string.ascii_lowercase + string.digits, min_size=1, max_size=8)
doc = st.lists(token, min_size=1, max_size=12).map(" ".join)


def py_token_hash(tok: str) -> int:
    h = 0
    for ch in tok:
        h = (h * TX.TOKEN_BASE + ord(ch)) % P
    return h


def py_fingerprint(text: str) -> int:
    h = 0
    for tok in text.split(" "):
        h = (h * TX.DOC_BASE + py_token_hash(tok)) % P
    return h


def py_shingles(text: str, n: int = 3) -> list[str]:
    toks = text.split(" ")
    if len(toks) < n:
        return []
    seen, out = set(), []
    for i in range(len(toks) - n + 1):
        s = " ".join(toks[i : i + n])
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


def py_minhash(text: str, num_hashes: int = 16, n: int = 3) -> list[int]:
    hs = [py_token_hash(s) for s in py_shingles(text, n)]
    return [
        min(((h * (2 * j + 3) + j * 7919) % P for h in hs), default=P)
        for j in range(num_hashes)
    ]


def _eval(spark, docs, expr):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)], "i long, text string")
    return [r["v"] for r in df.select(expr.alias("v")).orderBy("i").collect()]


@given(st.lists(doc, min_size=1, max_size=8))
@settings(max_examples=20, deadline=None)
def test_fingerprint_matches_python(spark, docs):
    got = _eval(spark, docs, TX.fingerprint_expr("text"))
    assert got == [py_fingerprint(d) for d in docs]


@given(st.lists(doc, min_size=1, max_size=8))
@settings(max_examples=20, deadline=None)
def test_minhash_matches_python(spark, docs):
    got = _eval(spark, docs, TX.minhash_expr("text", 8, 3))
    assert got == [py_minhash(d, 8, 3) for d in docs]


@given(st.lists(doc, min_size=1, max_size=8))
@settings(max_examples=20, deadline=None)
def test_shingles_match_python(spark, docs):
    got = _eval(spark, docs, TX.shingles_expr("text", 3))
    assert got == [py_shingles(d, 3) for d in docs]


@given(st.lists(doc, min_size=1, max_size=8))
@settings(max_examples=15, deadline=None)
def test_token_stats_match_python(spark, docs):
    got = _eval(spark, docs, TX.token_count_expr("text"))
    assert got == [len(d.split(" ")) for d in docs]
    ttr = _eval(spark, docs, TX.type_token_ratio_expr("text"))
    for g, d in zip(ttr, docs):
        toks = d.split(" ")
        assert abs(g - len(set(toks)) / len(toks)) < 1e-12
