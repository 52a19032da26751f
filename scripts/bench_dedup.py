#!/usr/bin/env python
"""Dedup-index scale benchmark: build + pairs + fixed-batch probe over
a synthetic near-dup corpus at doubling sizes.

The claims under test (the dedup twin of scripts/bench_nnd.py's O(N)
shuffle sweep):
- index BUILD cost and the verified-PAIRS join scale linearly in N
  (banded LSH: candidates ~ near-dup density, never all-pairs);
- the incremental PROBE of a FIXED-size batch is ~independent of the
  indexed corpus size — the whole point of persisting the index: a
  100 TB corpus must not make each ingest batch more expensive.

Corpus: N docs of 150 tokens from a 5k-word Zipf vocabulary; every
10th doc is a near-duplicate of its predecessor with 2 token edits
(shingle Jaccard ~0.9) — verified pairs exist at every size and grow
linearly. Deterministic per-id generation (no global RNG state).

Banding is TUNED TO THE SIMILARITY REGIME, the LSH engineering the
sweep exists to demonstrate: a Zipf vocabulary gives random doc pairs
shingle Jaccard ~0.15, and with the default 16x4 banding (4 rows per
band) their band-collision probability J^4 ~ 5e-4 makes candidate
volume quadratic in N (measured: pairs-join shuffle stepped 3.4x on an
80k->160k doubling). Building the index with 32 hashes x 4 bands
(8 rows per band) suppresses random collisions to J^8 ~ 2.6e-7 —
far below this sweep's quadratic horizon — while J~0.9 near-dups keep
1-(1-0.9^8)^4 ~ 94% candidate recall (verification is exact either
way; banding recall is the documented LSH trade).

Usage: python scripts/bench_dedup.py [N ...]  (default 20000 40000
80000 160000). Writes NND_DEDUP_SCALE_OUT if set.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import urllib.request

import numpy as np
import pandas as pd

sys.path.insert(0, ".")

from spark_nnd_spark import get_spark  # noqa: E402
from spark_nnd_spark.operators.dedup import (  # noqa: E402
    build_neardup_index,
    neardup_pairs_index,
    neardup_query_index,
)

SEED = 42
VOCAB = 5000
DOC_TOKENS = 150
MUTATIONS = 2
PROBE_BATCH = 2000  # fixed-size batch probed against every index size
# hot-bucket cap for pairs/probe: the LSH knob that bounds candidate
# fan-out as bucket occupancy rises with N (env-tunable for cap sweeps)
CAP = int(os.environ.get("DEDUP_SCALE_CAP", "200"))


def _tokens(i: int) -> np.ndarray:
    base = i - 1 if i % 10 == 9 else i
    rng = np.random.default_rng([SEED, base])
    toks = rng.zipf(1.5, DOC_TOKENS).astype(np.int64) % VOCAB
    if i % 10 == 9:  # near-dup: MUTATIONS token edits on the predecessor
        mut = np.random.default_rng([SEED, 7, i])
        pos = mut.choice(DOC_TOKENS, MUTATIONS, replace=False)
        toks = toks.copy()
        toks[pos] = mut.integers(0, VOCAB, MUTATIONS)
    return toks


def synth_docs(spark, n: int, id_offset: int = 0):
    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.int64) + id_offset
            texts = [" ".join(f"w{t}" for t in _tokens(int(i))) for i in ids]
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    return (
        spark.range(n)
        .repartition(32)
        .mapInPandas(gen, "doc_id long, text string")
    )


def stage_writes(port: int = 4040) -> dict[int, int]:
    try:
        apps = json.load(
            urllib.request.urlopen(f"http://localhost:{port}/api/v1/applications")
        )
        stages = json.load(
            urllib.request.urlopen(
                f"http://localhost:{port}/api/v1/applications/{apps[0]['id']}/stages"
            )
        )
        return {s["stageId"]: s.get("shuffleWriteBytes", 0) for s in stages}
    except Exception:  # noqa: BLE001
        return {}


def _delta(before: dict, after: dict) -> float:
    return round(
        sum(w for sid, w in after.items() if sid not in before) / 1e6, 1
    )


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [20000, 40000, 80000, 160000]
    spark = get_spark(
        app_name="dedup_scale_bench", extra_conf={"spark.ui.enabled": "true"}
    )
    # fixed probe batch: ids disjoint from every corpus (offset past max N)
    probe = synth_docs(spark, PROBE_BATCH, id_offset=10_000_000).persist()
    probe.count()
    results = []
    for n in sizes:
        docs = synth_docs(spark, n).persist()
        docs.count()  # materialize outside the timed window
        idx = tempfile.mkdtemp(prefix=f"dedup_scale_{n}_")

        b0 = stage_writes()
        t0 = time.perf_counter()
        build_neardup_index(docs, idx, num_hashes=32, bands=4)
        build_sec = round(time.perf_counter() - t0, 2)
        b1 = stage_writes()

        t0 = time.perf_counter()
        n_pairs = neardup_pairs_index(
            spark, idx, threshold=0.2, max_band_freq=CAP
        ).count()
        pairs_sec = round(time.perf_counter() - t0, 2)
        b2 = stage_writes()

        t0 = time.perf_counter()
        n_verdicts = neardup_query_index(
            spark, idx, probe, threshold=0.2, max_band_freq=CAP
        ).count()
        probe_sec = round(time.perf_counter() - t0, 2)
        b3 = stage_writes()

        rec = {
            "n": n,
            "build_sec": build_sec,
            "pairs_sec": pairs_sec,
            "probe_sec": probe_sec,
            "pairs": int(n_pairs),
            "probe_rows": int(n_verdicts),
            "build_shuffle_mb": _delta(b0, b1),
            "pairs_shuffle_mb": _delta(b1, b2),
            "probe_shuffle_mb": _delta(b2, b3),
        }
        results.append(rec)
        print(json.dumps(rec))
        docs.unpersist()
    out = os.environ.get("NND_DEDUP_SCALE_OUT")
    if out:
        with open(out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
