#!/usr/bin/env python
"""Covariance-stats family scale benchmark: build + fixed-batch extend
+ spectrum probe over synthetic embedding corpora at doubling sizes.

The claims under test (the algebraic-family twin of bench_dedup.py):
- BUILD wall is linear in N while its SHUFFLE is ~flat: the O(N·d²)
  upper-triangle explode is map-side combined, so the exchange carries
  O(d²·partitions) partial sums regardless of N;
- EXTEND of a FIXED-size batch is ~independent of the indexed corpus
  (one batch scan + an O(d²) merge);
- the spectrum PROBE (3 power-iteration rounds) reads only the O(d²)
  stored rows — constant cost at every corpus size.

Usage: python scripts/bench_cov.py [N ...]  (default 100000 200000
400000). Writes BENCH_COV_OUT if set.
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
from spark_nnd_spark.operators.clustering import (  # noqa: E402
    build_cov_stats,
    cov_from_stats,
    extend_cov_stats,
    top_eigen_power,
)
from spark_nnd_spark.session import session_scratch_dir  # noqa: E402

SEED = 42
DIM = 64
BATCH = 10_000  # fixed-size extend batch at every corpus size


def vectors(spark, n: int, id_base: int = 0):
    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.int64) + id_base
            feats = np.empty((len(ids), DIM))
            for row, i in enumerate(ids):
                feats[row] = np.random.default_rng([SEED, int(i)]).normal(
                    0, 0.2, DIM
                )
            yield pd.DataFrame({"vec_id": ids, "embedding": list(feats)})

    return spark.range(n).repartition(32).mapInPandas(
        gen, "vec_id long, embedding array<double>"
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
        app_name="cov_scale_bench", extra_conf={"spark.ui.enabled": "true"}
    )
    batch = vectors(spark, BATCH, id_base=10_000_000).localCheckpoint(eager=True)
    batch.count()
    results = []
    for n in sizes:
        vecs = vectors(spark, n).persist()
        vecs.count()  # materialize outside the timed window
        path = session_scratch_dir(f"cov_scale_{n}_")

        b0 = stage_writes(spark)
        t0 = time.perf_counter()
        build_cov_stats(vecs, path, dim=DIM)
        build_sec = round(time.perf_counter() - t0, 2)
        b1 = stage_writes(spark)

        t0 = time.perf_counter()
        extend_cov_stats(spark, path, batch)
        extend_sec = round(time.perf_counter() - t0, 2)
        b2 = stage_writes(spark)

        t0 = time.perf_counter()
        rows = top_eigen_power(
            cov_from_stats(spark, path), dim=DIM, iters=3
        ).collect()
        probe_sec = round(time.perf_counter() - t0, 2)
        b3 = stage_writes(spark)

        rec = {
            "n": n,
            "build_sec": build_sec,
            "extend_sec": extend_sec,
            "probe_sec": probe_sec,
            "lambda_top": rows[-1]["lambda_top"],
            "build_shuffle_mb": _delta(b0, b1),
            "extend_shuffle_mb": _delta(b1, b2),
            "probe_shuffle_mb": _delta(b2, b3),
        }
        results.append(rec)
        print(json.dumps(rec))
        vecs.unpersist()
    out = os.environ.get("BENCH_COV_OUT")
    if out:
        with open(out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
