#!/usr/bin/env python
"""Decontamination scale benchmark: cross_decontaminate's cost profile
as the TRAIN corpus doubles with a FIXED eval set.

The claim under test (q148 / decontam_gate_stream's 100 TB argument):
the train corpus is touched by one narrow assign pass plus one
broadcast-hash join against the O(benchmarks) eval side — so shuffle
bytes must stay ~FLAT (only the O(contaminated) per-id aggregate and
verdict join-back scale, never the corpus), while wall time grows
~linearly with the scan.

Usage: python scripts/bench_decontam.py [N ...] (default 100000 200000
400000; eval fixed at 1000). Writes $DECONTAM_SCALE_OUT if set.

NOTE: the fixture generator lives in THIS file (mapInPandas generators
imported from scripts/ fail on executors — cloudpickle by-reference).
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
from spark_nnd_spark.operators.similarity import (  # noqa: E402
    cross_decontaminate,
    fixed_centroids,
)

DIM = 32
CELLS = 16
SEED = 31
TAU = 0.92
N_EVAL = 1000


PLANT_EVERY = 997  # every 997th train vector is a paraphrase of an eval vector


def vectors(spark, n: int, id_base: int = 0, plant: bool = False):
    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.int64) + id_base
            feats = np.empty((len(ids), DIM))
            for row, i in enumerate(ids):
                if plant and i % PLANT_EVERY == 0:
                    # deterministic near-copy of eval vector (i mod N_EVAL)
                    ev_rng = np.random.default_rng(
                        [SEED, int(10_000_000 + (i % N_EVAL))]
                    )
                    feats[row] = ev_rng.normal(0, 1.0, DIM) + 1e-3
                else:
                    rng = np.random.default_rng([SEED, int(i)])
                    feats[row] = rng.normal(0, 1.0, DIM)
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


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [100_000, 200_000, 400_000]
    spark = get_spark(
        app_name="decontam_scale", extra_conf={"spark.ui.enabled": "true"}
    )
    cents = fixed_centroids(DIM, CELLS, SEED)
    ev = vectors(spark, N_EVAL, id_base=10_000_000).localCheckpoint(eager=True)
    ev.count()
    results = []
    for n in sizes:
        tr = vectors(spark, n, plant=True).localCheckpoint(eager=True)
        tr.count()  # materialize outside the timed window
        before = stage_writes(spark)
        t0 = time.perf_counter()
        out = cross_decontaminate(tr, ev, cents, tau=TAU)
        # one full-output aggregate: count() would let Catalyst prune
        # the hits branch (the count()-pruned-plan measurement trap) —
        # summing the verdict column forces the whole DAG
        import pyspark.sql.functions as F  # noqa: PLC0415

        row = out.agg(
            F.count("*").alias("rows"),
            F.sum(F.col("contaminated").cast("long")).alias("cont"),
        ).collect()[0]
        n_cont = int(row["cont"])
        dt = round(time.perf_counter() - t0, 2)
        after = stage_writes(spark)
        writes = [w for sid, w in after.items() if sid not in before]
        rec = {
            "n_train": n,
            "n_eval": N_EVAL,
            "sec": dt,
            "n_contaminated": n_cont,
            "total_shuffle_mb": round(sum(writes) / 1e6, 2),
            "max_stage_shuffle_mb": round(max(writes or [0]) / 1e6, 2),
        }
        results.append(rec)
        print(json.dumps(rec))
        tr.unpersist()
    out_path = os.environ.get("DECONTAM_SCALE_OUT")
    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
