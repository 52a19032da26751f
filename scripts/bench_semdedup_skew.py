#!/usr/bin/env python
"""Skewed-cell stress test for the SemDeDup cell self-join (q138/q148).

The operator's worst case is one hot cell: the same-cell pair join
sends every hot-cell row to ONE reducer, whose pair count grows
quadratically in the cell's occupancy while every other task idles.
This script builds a corpus with ``hot_frac`` of N vectors in a single
cell and measures the join stage's per-task duration spread under three
configurations:

- ``broadcast``  — the plan Spark actually picks at benchable sizes:
  one side broadcasts, hot-cell pairs are enumerated by EVERY scan task
  against the broadcast copy, so the explosion parallelizes for free.
  (At 100 TB the corpus side cannot broadcast, so this exit closes.)
- ``smj_default`` — broadcast disabled (the 100 TB shape), AQE skew
  join at DEFAULT thresholds. Expected finding: no split — AQE detects
  skew by map-output PARTITION SIZE (256 MB default), and a hot cell's
  input is tiny even when its pair OUTPUT explodes, so one task drags
  the stage.
- ``smj_tuned``  — broadcast disabled, skew thresholds lowered
  (skewedPartitionThresholdInBytes/advisoryPartitionSizeInBytes sized
  to the input, factor 2): AQE splits the hot partition and the spread
  collapses. The documented mitigation, made concrete: the thresholds
  must be sized to INPUT bytes per pair-explosion, not left at default.

Writes $SEMDEDUP_SKEW_OUT (default BENCH_SEMDEDUP_SKEW.json-ready
records) — per config: wall seconds, join-stage task count, and
min/median/max task durations from the UI REST taskSummary.

Usage: python scripts/bench_semdedup_skew.py [N] [hot_frac]
(default: 20000 0.9)

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
    fixed_centroids,
    semantic_dedup,
)

DIM = 16
CELLS = 8
SEED = 13
TAU = 0.995


def skewed_vectors(spark, n: int, hot_frac: float):
    cents = fixed_centroids(DIM, CELLS, SEED)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.int64)
            feats = np.empty((len(ids), DIM))
            for row, i in enumerate(ids):
                rng = np.random.default_rng([SEED, int(i)])
                if (i % 1000) < hot_frac * 1000:
                    # hot cell: tight cluster around centroid 0
                    feats[row] = cents[0] + rng.normal(0, 0.05, DIM)
                else:
                    feats[row] = rng.normal(0, 1.0, DIM)
            yield pd.DataFrame({"vec_id": ids, "embedding": list(feats)})

    return spark.range(n).repartition(32).mapInPandas(
        gen, "vec_id long, embedding array<double>"
    )


def stages(spark) -> dict[int, dict]:
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    rows = json.load(
        urllib.request.urlopen(f"{base}/api/v1/applications/{app_id}/stages")
    )
    return {s["stageId"]: s for s in rows}


def task_summary(spark, stage_id: int) -> dict:
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    return json.load(
        urllib.request.urlopen(
            f"{base}/api/v1/applications/{app_id}/stages/{stage_id}/0/"
            "taskSummary?quantiles=0.0,0.5,1.0"
        )
    )


def run_config(spark, pts, cents, label: str, conf: dict) -> dict:
    for k, v in conf.items():
        spark.conf.set(k, v)
    before = set(stages(spark))
    t0 = time.perf_counter()
    out = semantic_dedup(pts, cents, tau=TAU)
    n_drop = out.filter("NOT keep").count()
    wall = round(time.perf_counter() - t0, 2)
    after = stages(spark)
    new = {sid: s for sid, s in after.items() if sid not in before}
    # the pair join's reduce stage = the new stage with the most
    # executor-run time (the explosion dominates every other stage)
    join_sid = max(
        new, key=lambda sid: new[sid].get("executorRunTime", 0)
    )
    ts = task_summary(spark, join_sid)
    dur = ts.get("duration", [0, 0, 0])
    rec = {
        "config": label,
        "wall_sec": wall,
        "n_dropped": n_drop,
        "join_stage_tasks": new[join_sid].get("numCompleteTasks"),
        "task_sec_min": round(dur[0] / 1e3, 2),
        "task_sec_median": round(dur[1] / 1e3, 2),
        "task_sec_max": round(dur[2] / 1e3, 2),
        "max_over_median": (
            round(dur[2] / dur[1], 1) if dur[1] else None
        ),
        "conf": conf,
    }
    print(json.dumps(rec))
    return rec


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    hot = float(sys.argv[2]) if len(sys.argv) > 2 else 0.9
    spark = get_spark(
        app_name="semdedup_skew",
        extra_conf={"spark.ui.enabled": "true"},
    )
    cents = fixed_centroids(DIM, CELLS, SEED)
    pts = skewed_vectors(spark, n, hot).localCheckpoint(eager=True)
    n_rows = pts.count()
    bcast_default = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    results = [{"n": n_rows, "hot_frac": hot, "dim": DIM, "cells": CELLS, "tau": TAU}]
    results.append(
        run_config(spark, pts, cents, "broadcast", {
            "spark.sql.autoBroadcastJoinThreshold": bcast_default,
        })
    )
    results.append(
        run_config(spark, pts, cents, "smj_default", {
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.skewJoin.enabled": "true",
            # defaults: factor 5, threshold 256m — input-size based
        })
    )
    results.append(
        run_config(spark, pts, cents, "smj_tuned", {
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64k",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64k",
        })
    )
    out = os.environ.get("SEMDEDUP_SKEW_OUT")
    if out:
        with open(out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
