"""Scale invariants for the fixed-boundary histogram quantile sketch,
asserted on the committed sweep record (scripts/bench_sketch.py →
BENCH_SKETCH_SCALE.json) — the BENCH_DEDUP_SCALE convention: shuffle
BYTES are asserted, not wall seconds (bytes are exact and immune to
host weather).

The sweep runs both tiers on the same synthetic CONTINUOUS stream
(20 groups, ~all-distinct doubles — the quality-score / loss /
latency regime) at N swept x4 per step:

- histogram_quantiles' exchange carries O(partitions*groups*bins)
  partial cells — Catalyst's partial hash aggregate IS the sketch
  merge — so its shuffle must stay FLAT as N grows;
- the exact `percentile` aggregate's partial buffer is a counts map
  over every distinct value in the partition, so on a continuous
  metric its shuffle grows ~linearly with N. That contrast (not a
  wall-clock race) is why the sketch is the 100 TB / streaming tier.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

RECORD = Path(__file__).resolve().parent.parent / "BENCH_SKETCH_SCALE.json"


@pytest.fixture(scope="module")
def record():
    if not RECORD.exists():
        pytest.skip("BENCH_SKETCH_SCALE.json not committed; run scripts/bench_sketch.py")
    rows = sorted(json.loads(RECORD.read_text()), key=lambda r: r["n"])
    if len(rows) < 3:
        pytest.skip("need >= 3 sizes for scaling assertions")
    return rows


def test_sketch_shuffle_independent_of_n(record):
    """The sketch's exchange is O(partitions*groups*bins): flat across
    a 16x row sweep."""
    vols = [r["sketch_shuffle_mb"] for r in record]
    assert max(vols) <= min(vols) * 1.5, (
        f"sketch shuffle tracks row count: {vols} MB over "
        f"{[r['n'] for r in record]} rows"
    )


def test_exact_percentile_shuffle_grows_with_n(record):
    """The contrast tier: exact percentile's partial counts map grows
    ~linearly on a continuous metric (>= 2x per 4x step leaves room
    for per-buffer serialization overheads while still refuting any
    'it was flat too' reading)."""
    for a, b in zip(record, record[1:]):
        scale = b["n"] / a["n"]
        ratio = b["exact_percentile_shuffle_mb"] / a["exact_percentile_shuffle_mb"]
        assert ratio >= scale * 0.5, (
            f"exact percentile shuffle grew only {ratio:.2f}x for "
            f"{scale:.0f}x rows — the continuous-metric premise broke"
        )


def test_sketch_beats_exact_at_scale(record):
    """At the largest measured N the sketch's exchange is at least
    50x smaller — the headline number for the operator docstring."""
    top = record[-1]
    assert top["exact_percentile_shuffle_mb"] >= top["sketch_shuffle_mb"] * 50
