"""Scale invariants for the persisted winnow-fingerprint index,
asserted on the committed sweep record (scripts/bench_winnow.py →
BENCH_WINNOW_SCALE.json) — the BENCH_SPAN_SCALE convention: shuffle
BYTES are asserted, not wall seconds (bytes are exact and immune to
host weather).

The contract under test (q205 / winnow_gate_stream at 100 TB):
- index BUILD shuffle is linear in corpus size (one fp exchange over
  a ~2/(w+1)-selected fingerprint stream — and measurably SMALLER
  than the span index's full gram exchange on the same corpus);
- a FIXED-size batch's PROBE shuffle is ~flat as the corpus doubles
  (the batch fingerprint set broadcasts; only matching postings move,
  and match volume is pinned by the plant density, not N);
- detection parity: the probe's pair counts equal the span index's on
  the SAME generated corpus/probe (BENCH_SPAN_SCALE.json) — the
  winnowing window guarantee holding at bench densities.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

HERE = Path(__file__).resolve().parent.parent
RECORD = HERE / "BENCH_WINNOW_SCALE.json"
SPAN_RECORD = HERE / "BENCH_SPAN_SCALE.json"


@pytest.fixture(scope="module")
def record():
    if not RECORD.exists():
        pytest.skip("BENCH_WINNOW_SCALE.json not committed; run scripts/bench_winnow.py")
    rows = sorted(json.loads(RECORD.read_text()), key=lambda r: r["n"])
    if len(rows) < 3:
        pytest.skip("need >= 3 sizes for scaling assertions")
    return rows


def test_build_shuffle_linear_in_corpus(record):
    for a, b in zip(record, record[1:]):
        step = b["n"] / a["n"]
        ratio = b["build_shuffle_mb"] / a["build_shuffle_mb"]
        assert ratio < step * 1.25, (a, b)
        assert ratio > step * 0.6, (a, b)


def test_probe_shuffle_flat_as_corpus_doubles(record):
    first, last = record[0], record[-1]
    assert last["n"] >= 4 * first["n"]
    # corpus 4x -> probe shuffle within 1.5x (flat modulo plant noise)
    assert last["probe_shuffle_mb"] <= first["probe_shuffle_mb"] * 1.5, (
        first,
        last,
    )


def test_probe_matches_are_plant_bounded_not_n_bounded(record):
    pairs = [r["probe_pairs"] for r in record]
    assert max(pairs) <= min(pairs) * 1.25, pairs


def test_detection_parity_with_span_index(record):
    if not SPAN_RECORD.exists():
        pytest.skip("BENCH_SPAN_SCALE.json not committed")
    span = {r["n"]: r for r in json.loads(SPAN_RECORD.read_text())}
    for r in record:
        if r["n"] in span:
            assert r["probe_pairs"] == span[r["n"]]["probe_pairs"], (
                r,
                span[r["n"]],
            )


def test_fingerprint_stream_smaller_than_gram_stream(record):
    if not SPAN_RECORD.exists():
        pytest.skip("BENCH_SPAN_SCALE.json not committed")
    span = {r["n"]: r for r in json.loads(SPAN_RECORD.read_text())}
    for r in record:
        if r["n"] in span:
            assert r["build_shuffle_mb"] < span[r["n"]]["build_shuffle_mb"], (
                r,
                span[r["n"]],
            )
