"""Scale invariants for the index retraction lifecycle, asserted on
the committed sweep record (scripts/bench_retract.py →
BENCH_RETRACT.json) — the BENCH_DEDUP_SCALE convention: shuffle BYTES
are asserted, not wall seconds (bytes are exact and immune to host
weather).

The lifecycle's scale contract (operators/index_lifecycle.py):
- deletes are an O(retracted) append (retract shuffles only the id
  distinct, ~0.1 MB for 10% of an 80k corpus);
- the tombstone probe tax is a broadcast anti-join — probing a fixed
  batch shuffles the same O(batch) bytes clean, tombstoned, and
  compacted;
- that O(batch) property stays flat across index doublings in all
  three states. Compaction is the only O(index) pass, by design.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

RECORD = Path(__file__).resolve().parent.parent / "BENCH_RETRACT.json"


@pytest.fixture(scope="module")
def record():
    if not RECORD.exists():
        pytest.skip("BENCH_RETRACT.json not committed; run scripts/bench_retract.py")
    rows = sorted(json.loads(RECORD.read_text()), key=lambda r: r["n"])
    if len(rows) < 3:
        pytest.skip("need >= 3 sizes for scaling assertions")
    return rows


def test_tombstone_probe_tax_is_not_a_corpus_shuffle(record):
    for r in record:
        assert r["probe_tombstoned_mb"] <= r["probe_clean_mb"] * 1.5, (
            f"n={r['n']}: tombstoned probe shuffles "
            f"{r['probe_tombstoned_mb']} MB vs clean {r['probe_clean_mb']} — "
            "the anti-join stopped broadcasting"
        )


def test_probe_shuffle_flat_across_sizes_in_all_states(record):
    for key in ("probe_clean_mb", "probe_tombstoned_mb", "probe_compacted_mb"):
        vols = [r[key] for r in record]
        assert max(vols) <= min(vols) * 1.5, (
            f"{key} tracks corpus size: {vols} over {[r['n'] for r in record]}"
        )


def test_retract_is_an_append_not_an_index_pass(record):
    for r in record:
        assert r["retract_shuffle_mb"] <= 0.5, (
            f"n={r['n']}: retract shuffled {r['retract_shuffle_mb']} MB — "
            "deletes must shuffle only the O(retracted) id distinct"
        )
