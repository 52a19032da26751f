#!/usr/bin/env python
"""Retraction-lifecycle scale benchmark (the BENCH_DEDUP_SCALE
convention: this script writes the JSON record, tests/
test_retract_scale.py asserts the properties).

The claims under test (operators/index_lifecycle.py):
- the tombstone PROBE TAX is a broadcast anti-join, so probing a
  fixed batch against an index with 10% of its docs retracted
  shuffles the same O(batch) bytes as probing the clean index —
  retraction must not push the corpus through an exchange;
- probe shuffle stays flat across index doublings in all three
  states (clean / tombstoned / compacted) — the O(batch) ingest
  property survives the delete log;
- RETRACT itself shuffles only the O(retracted) id distinct — the
  whole point: deletes are an append, not an index pass.

Same synthetic corpus and probe batch as scripts/bench_dedup.py
(32x4 banding tuned to the Zipf similarity regime). Probes run
UNCAPPED on every variant (tombstoned probes require
max_band_freq=None, so clean/compacted use the same configuration —
like for like). Shuffle bytes from the Spark UI REST API per stage.

Usage: python scripts/bench_retract.py [N ...] (default 20000 40000
80000). Writes BENCH_RETRACT.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from spark_nnd_spark import get_spark  # noqa: E402
from spark_nnd_spark.operators.dedup import (  # noqa: E402
    build_neardup_index,
    compact_neardup_index,
    neardup_query_index,
    retract_from_neardup_index,
)

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
# stage_writes/_delta run driver-side only (safe to import by
# reference); the synth generator is REDEFINED here because a
# mapInPandas closure from an imported module pickles by reference
# and executors cannot import scripts/ — __main__ closures ship by
# value (the cloudpickle rule this script tripped on first run).
from bench_dedup import (  # noqa: E402
    DOC_TOKENS,
    MUTATIONS,
    PROBE_BATCH,
    SEED,
    VOCAB,
    _delta,
    stage_writes,
)

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402


def _tokens(i: int) -> np.ndarray:
    base = i - 1 if i % 10 == 9 else i
    rng = np.random.default_rng([SEED, base])
    toks = rng.zipf(1.5, DOC_TOKENS).astype(np.int64) % VOCAB
    if i % 10 == 9:
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


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [20000, 40000, 80000]
    spark = get_spark(
        app_name="retract_scale_bench",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.showConsoleProgress": "false"},
    )
    probe = synth_docs(spark, PROBE_BATCH, id_offset=10_000_000).persist()
    probe.count()
    results = []
    for n in sizes:
        docs = synth_docs(spark, n).persist()
        docs.count()
        idx = tempfile.mkdtemp(prefix=f"retract_scale_{n}_")
        build_neardup_index(docs, idx, num_hashes=32, bands=4)

        def timed_probe(label_before: dict) -> tuple[float, float, int, dict]:
            t0 = time.perf_counter()
            rows = neardup_query_index(spark, idx, probe, threshold=0.2).count()
            sec = round(time.perf_counter() - t0, 2)
            after = stage_writes()
            return sec, _delta(label_before, after), int(rows), after

        s0 = stage_writes()
        clean_sec, clean_mb, clean_rows, s1 = timed_probe(s0)

        victims = docs.filter(F.col("doc_id") % 10 == 5).select("doc_id")
        t0 = time.perf_counter()
        retract_from_neardup_index(spark, idx, victims)
        retract_sec = round(time.perf_counter() - t0, 2)
        s2 = stage_writes()
        retract_mb = _delta(s1, s2)

        tomb_sec, tomb_mb, tomb_rows, s3 = timed_probe(s2)

        t0 = time.perf_counter()
        compact_neardup_index(spark, idx)
        compact_sec = round(time.perf_counter() - t0, 2)
        s4 = stage_writes()
        compact_mb = _delta(s3, s4)

        comp_sec, comp_mb, comp_rows, _ = timed_probe(s4)
        assert tomb_rows == comp_rows == clean_rows  # fixed batch size

        rec = {
            "n": n,
            "retracted": int(victims.count()),
            "probe_clean_mb": clean_mb,
            "probe_tombstoned_mb": tomb_mb,
            "probe_compacted_mb": comp_mb,
            "retract_shuffle_mb": retract_mb,
            "compact_shuffle_mb": compact_mb,
            "probe_clean_sec": clean_sec,
            "probe_tombstoned_sec": tomb_sec,
            "probe_compacted_sec": comp_sec,
            "retract_sec": retract_sec,
            "compact_sec": compact_sec,
        }
        results.append(rec)
        print(json.dumps(rec))
        docs.unpersist()
    out = os.environ.get(
        "RETRACT_SCALE_OUT",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "BENCH_RETRACT.json",
        ),
    )
    with open(out, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
