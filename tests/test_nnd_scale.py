"""Scale invariants from BASELINE.md:31-35, asserted on the committed
NND scale-bench record (scripts/bench_nnd.py -> BENCH_NND_SCALE.json).

The reference's published numbers (39/76/147/290 MB max-stage shuffle
at N=2k/4k/8k/16k on EMNIST) double with N; the engine must preserve
that O(rho*K*N) shape — a quadratic term here is the naive-broadcast
failure mode the reference exists to avoid (~10x larger shuffles,
BASELINE.md:27)."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

RECORD = Path(__file__).resolve().parent.parent / "BENCH_NND_SCALE.json"


@pytest.fixture(scope="module")
def record():
    if not RECORD.exists():
        pytest.skip("BENCH_NND_SCALE.json not committed; run scripts/bench_nnd.py")
    rows = sorted(
        # completed points only: a "disk_bound" entry records that a size
        # exceeded this host's scratch space (machine-readably, with the
        # predicted shuffle bytes) — it has no measured numbers to assert
        (r for r in json.loads(RECORD.read_text()) if r.get("status", "ok") == "ok"),
        key=lambda r: r["n"],
    )
    if len(rows) < 3:
        pytest.skip("need >= 3 sizes for scaling assertions")
    return rows


def test_max_stage_shuffle_linear_in_n(record):
    for a, b in zip(record, record[1:]):
        scale = b["n"] / a["n"]
        ratio = b["max_stage_shuffle_mb"] / a["max_stage_shuffle_mb"]
        # linear => ratio ~= scale; allow 30% headroom, reject quadratic
        assert ratio <= scale * 1.3, (
            f"max-stage shuffle grew {ratio:.2f}x for {scale:.0f}x data "
            f"({a['n']}->{b['n']}): super-linear"
        )


def test_total_shuffle_linear_in_n(record):
    for a, b in zip(record, record[1:]):
        scale = b["n"] / a["n"]
        ratio = b["total_shuffle_mb"] / a["total_shuffle_mb"]
        assert ratio <= scale * 1.3


def test_time_sub_quadratic(record):
    lo, hi = record[0], record[-1]
    scale = hi["n"] / lo["n"]
    ratio = hi["sec"] / lo["sec"]
    # reference: 8x data -> 4.7x time; assert well under scale^2
    assert ratio <= scale ** 2 / 2, f"{scale}x data took {ratio:.1f}x time"


def test_edges_complete(record):
    for r in record:
        assert r["edges"] == r["n"] * 10  # K=10, every node fully populated
