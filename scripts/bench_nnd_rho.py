#!/usr/bin/env python
"""Recall cost of the ρ (reverse-edge sample rate) knob, NND.scala:146-152.

Builds the NND graph on the FIXTURES `points_emnist_like` tier at one N
for each requested ρ and scores recall against the exact graph — the
companion measurement to the 512k scale point, which runs ρ=0.5 to fit
the host's disk budget. Prints one JSON line per ρ and writes
$NND_RHO_OUT if set.

Usage: python scripts/bench_nnd_rho.py [N] [rho ...]
(default: 4000 1.0 0.5)

NOTE: the fixture generator is (re)defined in THIS file, not imported
from scripts/bench_nnd.py — mapInPandas generators from an imported
scripts/ module serialize by reference and fail on executors.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from spark_nnd_spark import get_spark  # noqa: E402
from spark_nnd_spark.nnd.descent import build_graph  # noqa: E402
from spark_nnd_spark.nnd.exact import build_graph_exact  # noqa: E402

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


def pairs(g):
    return g.select("id", F.explode("neighbors").alias("nb")).select(
        "id", F.col("nb.id").alias("nb_id")
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    rhos = [float(a) for a in sys.argv[2:]] or [1.0, 0.5]
    spark = get_spark(app_name="nnd_rho_recall")
    pts = emnist_like(spark, n).persist()
    pts.count()
    exact = pairs(build_graph_exact(pts, k=10, validate=False)).localCheckpoint(
        eager=True
    )
    total = exact.count()
    results = []
    for rho in rhos:
        t0 = time.perf_counter()
        g = build_graph(
            pts, k=10, max_iterations=5, early_termination=0.01,
            sample_rate=rho, buckets_per_instance=4, seed=SEED,
        )
        hits = pairs(g).join(exact, ["id", "nb_id"]).count()
        rec = {
            "n": n,
            "rho": rho,
            "recall": round(hits / total, 4),
            "sec": round(time.perf_counter() - t0, 2),
        }
        results.append(rec)
        print(json.dumps(rec))
    out = os.environ.get("NND_RHO_OUT")
    if out:
        with open(out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
