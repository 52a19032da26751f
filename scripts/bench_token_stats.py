#!/usr/bin/env python
"""Token-stats family scale benchmark: build + fixed-batch extend +
divergence probe over synthetic document corpora at doubling sizes.

The claims under test (the second algebraic family's twin of
bench_cov.py):
- BUILD wall is linear in N while its SHUFFLE is vocab-bounded: the
  token explode is map-side combined, so the exchange carries
  O(sources · vocab · partitions) partial counts regardless of N;
- EXTEND of a FIXED-size batch is ~independent of the indexed corpus
  (one batch scan + an O(state) merge);
- the divergence PROBE (q194's kernel) reads only the stored counts —
  constant cost at every corpus size, zero corpus I/O.

Usage: python scripts/bench_token_stats.py [N ...]  (default 100000
200000 400000). Writes BENCH_TOKENSTATS_OUT if set.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

import numpy as np
import pandas as pd

sys.path.insert(0, ".")

from spark_nnd_spark import get_spark  # noqa: E402
from spark_nnd_spark.operators.text_stats import (  # noqa: E402
    build_token_stats,
    extend_token_stats,
    js_divergence_pairs,
    token_counts_from_stats,
)
from spark_nnd_spark.session import session_scratch_dir  # noqa: E402

SEED = 42
BATCH = 10_000  # fixed-size extend batch at every corpus size
VOCAB = [f"w{i}" for i in range(512)]
N_SOURCES = 8
DOC_LEN = 40


def documents(spark, n: int, id_base: int = 0):
    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.int64) + id_base
            texts, srcs = [], []
            for i in ids:
                rng = np.random.default_rng([SEED, int(i)])
                # Zipf-ish draw, source-shifted so distributions differ
                idx = rng.zipf(1.3, DOC_LEN) % len(VOCAB)
                shift = (int(i) % N_SOURCES) * 7
                texts.append(
                    " ".join(VOCAB[(j + shift) % len(VOCAB)] for j in idx)
                )
                srcs.append(f"src{int(i) % N_SOURCES}")
            yield pd.DataFrame(
                {"doc_id": ids, "text": texts, "source": srcs}
            )

    return spark.range(n).repartition(32).mapInPandas(
        gen, "doc_id long, text string, source string"
    )


def stage_writes(spark) -> dict[int, int]:
    try:
        base = spark.sparkContext.uiWebUrl
        app_id = spark.sparkContext.applicationId
        stages = json.load(
            urllib.request.urlopen(f"{base}/api/v1/applications/{app_id}/stages")
        )
        return {s["stageId"]: s.get("shuffleWriteBytes", 0) for s in stages}
    except Exception:
        return {}


def _delta(before: dict, after: dict) -> float:
    return round(
        sum(w for sid, w in after.items() if sid not in before) / 1e6, 1
    )


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [100_000, 200_000, 400_000]
    spark = get_spark(
        app_name="token_stats_scale_bench",
        extra_conf={"spark.ui.enabled": "true"},
    )
    batch = documents(spark, BATCH, id_base=10_000_000).localCheckpoint(
        eager=True
    )
    batch.count()
    results = []
    for n in sizes:
        docs = documents(spark, n).persist()
        docs.count()  # materialize outside the timed window
        path = session_scratch_dir(f"token_stats_scale_{n}_")

        b0 = stage_writes(spark)
        t0 = time.perf_counter()
        build_token_stats(docs, path)
        build_sec = round(time.perf_counter() - t0, 2)
        b1 = stage_writes(spark)

        t0 = time.perf_counter()
        extend_token_stats(spark, path, batch)
        extend_sec = round(time.perf_counter() - t0, 2)
        b2 = stage_writes(spark)

        t0 = time.perf_counter()
        rows = (
            js_divergence_pairs(token_counts_from_stats(spark, path))
            .orderBy("source_a", "source_b")
            .collect()
        )
        probe_sec = round(time.perf_counter() - t0, 2)
        b3 = stage_writes(spark)

        rec = {
            "n": n,
            "build_sec": build_sec,
            "extend_sec": extend_sec,
            "probe_sec": probe_sec,
            "n_pairs": len(rows),
            "js_first": rows[0]["js_nats"],
            "build_shuffle_mb": _delta(b0, b1),
            "extend_shuffle_mb": _delta(b1, b2),
            "probe_shuffle_mb": _delta(b2, b3),
        }
        results.append(rec)
        print(json.dumps(rec))
        docs.unpersist()
    out = os.environ.get("BENCH_TOKENSTATS_OUT")
    if out:
        with open(out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
