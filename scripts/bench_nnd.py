#!/usr/bin/env python
"""NND scale benchmark on the FIXTURES.md `points_emnist_like` fixture
(N x 784, Uniform(0,1) mixed 50/50 with 10 Gaussian clusters, sigma=0.1).

Times `build_graph` at the README params (K=10, maxIter=5, delta=0.01,
rho=1.0, b=4) and reports wall-clock plus max/total shuffle-write bytes
(from the Spark UI REST API) for comparison against BASELINE.md.

Usage: python scripts/bench_nnd.py [N ...]   (default: 8000 16000)
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

from pyspark.sql import functions as F  # noqa: E402

from spark_nnd_spark import get_spark  # noqa: E402
from spark_nnd_spark.nnd.descent import build_graph  # noqa: E402

DIM = 784
SEED = 42


def emnist_like(spark, n: int):
    def gen(batches):
        centers = np.random.default_rng(SEED).uniform(0, 1, (10, DIM))
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.int64)
            feats = np.empty((len(ids), DIM))
            for row, i in enumerate(ids):
                rng = np.random.default_rng([SEED, int(i)])
                if i % 2 == 0:
                    feats[row] = rng.uniform(0, 1, DIM)
                else:
                    feats[row] = centers[i % 10] + rng.normal(0, 0.1, DIM)
            yield pd.DataFrame(
                {
                    "id": ids,
                    "features": list(feats),
                    "label": (ids % 10).astype(np.int64),
                    "partition": np.zeros(len(ids), np.int64),
                    "finished": np.zeros(len(ids), bool),
                }
            )

    return (
        spark.range(n)
        .repartition(32)
        .mapInPandas(
            gen,
            "id long, features array<double>, label long, partition long, finished boolean",
        )
    )


def stage_writes(spark) -> dict[int, int]:
    """stageId -> shuffleWriteBytes for every completed stage so far
    (REST base derived from THIS session's UI, never a fixed port —
    another app owning :4040 would silently be read instead)."""
    try:
        base = spark.sparkContext.uiWebUrl
        app_id = spark.sparkContext.applicationId
        stages = json.load(
            urllib.request.urlopen(f"{base}/api/v1/applications/{app_id}/stages")
        )
        return {s["stageId"]: s.get("shuffleWriteBytes", 0) for s in stages}
    except Exception:
        return {}


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [8000, 16000]
    codec = os.environ.get("SPARK_SHUFFLE_CODEC", "zstd")
    # The scale sweep's big points get heap headroom beyond the
    # engine's 24g default: at N=256k one iteration's checkpoint
    # blocks + a ~10 GB stage shuffle sit in the storage/execution
    # pool. 40g completes N=256k reliably while leaving the 125 GiB
    # guest room for the OS page cache the 55 GB shuffle relies on
    # (64g worked too but risks the whole-box memory ceiling once
    # Python workers and page cache are counted). NOTE two operational
    # hazards at N>=256k: the point needs ~55 GB free in /tmp (a
    # killed run leaks its blockmgr-* dir — clean before rerunning),
    # and host scheduling jitter swings wall time ~2-3x between hours
    # (compare shuffle bytes, which are exact and stable, before
    # reading anything into a slow wall number).
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "40g")
    extra = {
        "spark.ui.enabled": "true",
        "spark.io.compression.codec": codec,
    }
    # The N=512k point writes ~110 GB of total shuffle against ~80 GB
    # free in /tmp. It fits anyway because shuffle files are not all
    # live at once: each iteration's localCheckpoint cuts lineage, so
    # once the Python wrappers drop their refs a JVM GC lets
    # ContextCleaner delete the PREVIOUS iterations' shuffle dirs
    # mid-job. The default periodic GC (30 min) is longer than the
    # whole run — force it frequent for the sweep. zstd level 3
    # shaves a further ~10-15% off the clustered-feature shuffle.
    if os.environ.get("SPARK_PERIODIC_GC_SEC"):
        extra["spark.cleaner.periodicGC.interval"] = (
            os.environ["SPARK_PERIODIC_GC_SEC"] + "s"
        )
    if os.environ.get("SPARK_ZSTD_LEVEL"):
        extra["spark.io.compression.zstd.level"] = os.environ["SPARK_ZSTD_LEVEL"]
    spark = get_spark(app_name="nnd_scale_bench", extra_conf=extra)
    # ρ (reverse-edge sample rate, NND.scala:146-152): <1.0 cuts the
    # reverse-edge share of every iteration's candidate shuffle roughly
    # proportionally — the knob that buys back disk/network at scale
    # for a measured recall cost (recorded by scripts/bench_nnd_rho.py).
    rho = float(os.environ.get("SPARK_NND_RHO", "1.0"))
    results = []
    for n in sizes:
        pts = emnist_like(spark, n).persist()
        pts.count()  # materialize input outside the timed window
        before = stage_writes(spark)
        t0 = time.perf_counter()
        g = build_graph(
            pts, k=10, max_iterations=5, early_termination=0.01,
            sample_rate=rho, buckets_per_instance=4, seed=SEED,
        )
        n_out = g.count()
        n_edges = g.agg(F.sum(F.size("neighbors"))).first()[0]
        dt = time.perf_counter() - t0
        after = stage_writes(spark)
        # only stages submitted by THIS build (earlier sizes share the app)
        writes = [w for sid, w in after.items() if sid not in before]
        rec = {
            "n": n,
            "rho": rho,
            "sec": round(dt, 2),
            "rows": n_out,
            "edges": int(n_edges),
            "codec": codec,
            "max_stage_shuffle_mb": round(max(writes or [0]) / 1e6, 1),
            "total_shuffle_mb": round(sum(writes) / 1e6, 1),
        }
        results.append(rec)
        print(json.dumps(rec))
        pts.unpersist()
    out = os.environ.get("NND_SCALE_OUT")
    if out:
        with open(out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()

# N=512k note (round 6): the next doubling needs ~110 GB of shuffle in
# /tmp (total shuffle is 2x per doubling, 55 GB at 256k) but the build
# box has only ~80 GB free, so the sweep stops at 256k here; the
# linearity assert (tests/test_nnd_scale.py) covers 2k..256k, ratio
# 2.00 at every doubling.
