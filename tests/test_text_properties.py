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
from tests.conftest import SF_SMOKE


pytestmark = pytest.mark.slow  # heavy tier: deselected from the default fast run

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


# --------------------------------------------------------- sampling


@given(
    st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
    st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
)
@settings(max_examples=50, deadline=None)
def test_threshold_hex_monotone_and_bounded(r1, r2):
    """Thresholds are fixed-width (comparable bytewise), ordered like
    their rates, and saturate correctly at the endpoints."""
    from spark_nnd_spark.operators.sampling import HEX_WIDTH, threshold_hex

    t1, t2 = threshold_hex(r1), threshold_hex(r2)
    for t in (t1, t2):
        assert t == "g" or (len(t) == HEX_WIDTH and all(c in "0123456789abcdef" for c in t))
    if r1 <= r2:
        assert t1 <= t2  # lexicographic order == rate order ("g" > hex)
    assert threshold_hex(0.0) == "0" * HEX_WIDTH
    assert threshold_hex(1.0) == "g"


@given(st.integers(min_value=1, max_value=10**9), st.floats(min_value=0.05, max_value=0.95))
@settings(max_examples=50, deadline=None)
def test_sample_decision_matches_python_md5(doc_id, rate):
    """The engine-side predicate equals the plain-Python model: the
    cross-engine replayability the operator's determinism rests on."""
    import hashlib

    from spark_nnd_spark.operators.sampling import threshold_hex

    key = hashlib.md5(str(doc_id).encode()).hexdigest()[:8]
    keep = key < threshold_hex(rate)
    # duckdb replays the oracle predicate verbatim
    import duckdb

    (dkeep,) = duckdb.sql(
        f"SELECT substr(md5(CAST({doc_id} AS VARCHAR)), 1, 8) < '{threshold_hex(rate)}'"
    ).fetchone()
    assert keep == dkeep


# ---- cross-engine rounding (functions/numeric.py) --------------------

ratio = st.fractions(min_value=0, max_value=1).map(float)


@given(x=ratio)
@settings(max_examples=200, deadline=None)
def test_round_half_up_sql_matches_python(x):
    """The DuckDB rendering of round_half_up must compute bit-identical
    doubles to the same floor arithmetic in Python (which is what the
    Spark expression compiles to): this is the property that made q56's
    engine-tie bug impossible to reintroduce."""
    import duckdb

    from spark_nnd_spark.functions.numeric import round_half_up_sql

    py = __import__("math").floor(x * 1000000.0 + 0.5) / 1000000.0
    # CAST: a bare decimal literal parses as DECIMAL in DuckDB; the real
    # oracles always feed DOUBLE expressions (quotients) to the helper.
    (dk,) = duckdb.sql(
        f"SELECT {round_half_up_sql(f'CAST({x!r} AS DOUBLE)')} AS v"
    ).fetchone()
    assert dk == py


def test_winnow_window_guarantee_and_python_parity(spark):
    """Winnowing contract (Schleimer et al.): every window of W
    consecutive shingle hashes contains at least one selected
    fingerprint, and the Spark array-lambda selection equals a plain
    Python reimplementation on the same hashes."""
    from pyspark.sql import functions as F

    from spark_nnd_spark.functions import text as TX

    n, w = 4, 4
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(50)
    rows = (
        docs.withColumn("hs", TX.ordered_shingle_hashes_expr("text", n))
        .select("doc_id", "hs", TX.winnow_select_expr(F.col("hs"), w).alias("sel"))
        .collect()
    )
    assert any(len(r["hs"]) >= w for r in rows)
    for r in rows:
        hs, sel = list(r["hs"]), set(r["sel"])
        expected = (
            {min(hs[s : s + w]) for s in range(0, max(1, len(hs) - w + 1))}
            if hs
            else set()
        )
        assert sel == expected, f"doc {r['doc_id']}"
        # window guarantee: every w-window holds a selected hash
        for s in range(0, len(hs) - w + 1):
            assert any(h in sel for h in hs[s : s + w]), f"doc {r['doc_id']} window {s}"


def py_repetition_stats(text: str, n: int) -> tuple[int, int]:
    """Counter-based recount of (best, dup) — a third independent
    strategy beside the Spark fold and the q128 oracle's GROUP BY."""
    from collections import Counter

    toks = text.split(" ")
    grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    counts = Counter(grams)
    best = max(counts.values(), default=0)
    dup = sum(c for c in counts.values() if c >= 2)
    return best, dup


@given(st.lists(doc, min_size=1, max_size=8))
@settings(max_examples=20, deadline=None)
def test_repetition_stats_match_python(spark, docs):
    for n in (2, 3):
        got = _eval(spark, docs, TX.repetition_stats_expr(TX.ngrams_expr("text", n)))
        want = [py_repetition_stats(d, n) for d in docs]
        assert [(g["best"], g["dup"]) for g in got] == want


def test_pii_detect_redact_cross_engine(spark):
    """q151 helpers on adversarial fixtures: counts and the ORDERED
    redaction chain (email first — its numeric-host domain would
    otherwise be clipped by the ip rule) agree between Spark's Java
    regex and DuckDB's RE2 character-for-character."""
    import duckdb

    docs = [
        "mail bob@example.com from 10.0.0.1 call 415-555-1234",
        "two mails a@b.co c.d-e@f.org and 255.255.255.255",
        "no pii here just words",
        "edge 999-999-9999 and 1.2.3.4.5 trailing",  # 5 octets: ip hits first 4
        "bob@sub.domain.co.uk then 0.0.0.0",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(docs)], "i long, t string")
    got = (
        df.select(
            "i",
            TX.pii_count_expr("t", "email").alias("e"),
            TX.pii_count_expr("t", "ip").alias("p"),
            TX.pii_count_expr("t", "phone").alias("f"),
            TX.pii_redact_expr("t").alias("red"),
        )
        .orderBy("i")
        .collect()
    )
    assert [r["e"] for r in got] == [1, 2, 0, 0, 1]
    assert [r["p"] for r in got] == [1, 1, 0, 1, 1]
    assert [r["f"] for r in got] == [1, 0, 0, 1, 0]
    assert got[0]["red"] == "mail <EMAIL> from <IP> call <PHONE>"
    for i, t in enumerate(docs):
        (de, dp, df_, dred) = duckdb.sql(
            f"SELECT {TX.pii_count_sql('email', 't')},"
            f" {TX.pii_count_sql('ip', 't')},"
            f" {TX.pii_count_sql('phone', 't')},"
            f" {TX.pii_redact_sql('t')}"
            f" FROM (SELECT ?::VARCHAR AS t)",
            params=[t],
        ).fetchone()
        assert (de, dp, df_) == (got[i]["e"], got[i]["p"], got[i]["f"]), t
        assert dred == got[i]["red"], t


def test_char_pairs_cross_engine(spark):
    """q152 helper: adjacent 2-char windows agree with Python and the
    DuckDB slice rendering (callers filter len >= 2 first)."""
    import duckdb

    words = ["spark", "ab", "xyz", "qq"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {
        r["w"]: list(r["p"])
        for r in df.select("w", TX.char_pairs_expr("w").alias("p")).collect()
    }
    for w in words:
        want = [w[i : i + 2] for i in range(len(w) - 1)]
        assert got[w] == want, w
        (dp,) = duckdb.sql(
            f"SELECT {TX.char_pairs_sql('w')} FROM (SELECT ?::VARCHAR AS w)",
            params=[w],
        ).fetchone()
        assert list(dp) == want, w


@given(st.lists(st.lists(token, min_size=0, max_size=40).map(" ".join), min_size=1, max_size=8),
       st.integers(2, 8), st.integers(1, 8))
@settings(max_examples=15, deadline=None)
def test_chunk_tokens_covers_every_token_exactly(spark, texts, size, stride):
    """Property: on arbitrary token streams and (size, stride) with
    stride <= size, concatenating each doc's chunks at stride offsets
    reconstructs the doc exactly — every token in >= 1 chunk, order
    preserved, tail lengths true, empty docs absent."""
    from spark_nnd_spark.operators.sampling import chunk_tokens

    if stride > size:
        stride = size  # coverage requires stride <= size
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = chunk_tokens(df, size=size, stride=stride).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, text in enumerate(texts):
        toks = text.split(" ") if text else []
        got = sorted(by_doc.get(i, []), key=lambda r: r.chunk_idx)
        if not text:
            assert not got
            continue
        # every chunk equals exactly the slice it claims
        for r in got:
            ctoks = r.chunk_text.split(" ")
            assert len(ctoks) == r.n_tokens <= size
            assert r.start == r.chunk_idx * stride
            assert ctoks == toks[r.start : r.start + size]
        covered = set()
        for r in got:
            covered.update(range(r.start, r.start + r.n_tokens))
        assert covered == set(range(len(toks)))
