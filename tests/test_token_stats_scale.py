"""Scale invariants for the mergeable token-stats family, asserted on
the committed sweep record (scripts/bench_token_stats.py →
BENCH_TOKENSTATS_SCALE.json) — the BENCH_COV_SCALE convention: shuffle
BYTES are asserted, not wall seconds (bytes are exact and immune to
host weather).

The contracts (the family's whole reason to exist at 100 TB):
- BUILD shuffle is vocab-bounded: the token explode is map-side
  combined, so the exchange carries O(sources · vocab · partitions)
  partial counts — FLAT as the corpus grows;
- EXTEND of a fixed-size batch is ~independent of corpus size;
- the divergence PROBE reads only the stored counts — zero shuffle,
  zero corpus I/O.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

RECORD = Path(__file__).resolve().parent.parent / "BENCH_TOKENSTATS_SCALE.json"


@pytest.fixture(scope="module")
def record():
    if not RECORD.exists():
        pytest.skip(
            "BENCH_TOKENSTATS_SCALE.json not committed; "
            "run scripts/bench_token_stats.py"
        )
    rows = sorted(json.loads(RECORD.read_text()), key=lambda r: r["n"])
    if len(rows) < 3:
        pytest.skip("need >= 3 sizes for scaling assertions")
    return rows


def test_build_shuffle_vocab_bounded(record):
    first, last = record[0], record[-1]
    growth = last["n"] / first["n"]
    assert growth >= 4
    # flat within 2x while the corpus grows >= 4x
    assert last["build_shuffle_mb"] <= max(2 * first["build_shuffle_mb"], 1.0)


def test_fixed_batch_extend_flat(record):
    vals = [r["extend_shuffle_mb"] for r in record]
    assert max(vals) <= max(2 * min(vals), 1.0)


def test_probe_zero_shuffle(record):
    assert all(r["probe_shuffle_mb"] <= 0.1 for r in record)


def test_divergence_stable_across_sizes(record):
    # same generator at every size → the JS estimate converges, so the
    # first pair's value moves < 0.01 nats across a 4x corpus
    vals = [r["js_first"] for r in record]
    assert max(vals) - min(vals) < 0.01
