"""Scale invariants for the persisted near-dup index, asserted on the
committed sweep record (scripts/bench_dedup.py → BENCH_DEDUP_SCALE.json).

Shuffle BYTES are asserted, not wall seconds: this guest's wall times
swing ~3x with host scheduling weather (SURVEY/bench notes), while
shuffle volume is exact and stable. The claims:

- index build and the verified-pairs self-join shuffle O(N) — the
  banded-LSH posture (never all-pairs; banding tuned to the corpus's
  random-pair similarity, see the script docstring);
- probing a FIXED batch shuffles O(batch), INDEPENDENT of indexed
  corpus size — the broadcast discipline in neardup_query_index (the
  corpus tables stream, they never shuffle). Before that discipline
  the probe shuffle measured ~O(N); this test pins the fix.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

RECORD = Path(__file__).resolve().parent.parent / "BENCH_DEDUP_SCALE.json"


@pytest.fixture(scope="module")
def record():
    if not RECORD.exists():
        pytest.skip("BENCH_DEDUP_SCALE.json not committed; run scripts/bench_dedup.py")
    rows = sorted(json.loads(RECORD.read_text()), key=lambda r: r["n"])
    if len(rows) < 3:
        pytest.skip("need >= 3 sizes for scaling assertions")
    return rows


def test_build_shuffle_linear_in_n(record):
    for a, b in zip(record, record[1:]):
        scale = b["n"] / a["n"]
        ratio = b["build_shuffle_mb"] / a["build_shuffle_mb"]
        assert ratio <= scale * 1.3, (
            f"build shuffle grew {ratio:.2f}x for {scale:.0f}x docs "
            f"({a['n']}->{b['n']}): super-linear"
        )


def test_pairs_shuffle_linear_in_n(record):
    for a, b in zip(record, record[1:]):
        scale = b["n"] / a["n"]
        ratio = b["pairs_shuffle_mb"] / a["pairs_shuffle_mb"]
        assert ratio <= scale * 1.3, (
            f"pairs-join shuffle grew {ratio:.2f}x for {scale:.0f}x docs: "
            "banding no longer suppresses the random-collision quadratic"
        )


def test_probe_shuffle_independent_of_corpus_size(record):
    """Fixed 2000-doc batch against every index size: probe shuffle
    must stay flat (O(batch)), not track the corpus."""
    vols = [r["probe_shuffle_mb"] for r in record]
    assert max(vols) <= min(vols) * 1.5, (
        f"probe shuffle tracks corpus size: {vols} MB over "
        f"{[r['n'] for r in record]} docs"
    )


def test_verified_pairs_linear_in_n(record):
    """Every 10th doc is an injected near-dup: verified pairs must grow
    ~linearly (the verify tier never admits the quadratic noise)."""
    for a, b in zip(record, record[1:]):
        scale = b["n"] / a["n"]
        ratio = b["pairs"] / a["pairs"]
        assert scale * 0.7 <= ratio <= scale * 1.3
