#!/usr/bin/env python
"""Per-stage diagnosis of extend_knn_graph_index shuffle at two corpus
sizes: which exchanges grow with N at fixed batch? Labels each phase
with a job description and dumps per-stage shuffle writes + the stage
name/description from the UI REST API, so the growing exchange can be
attributed to a line of code.

Usage: python scripts/diag_extend_stages.py [N ...] (default 20000 80000)
Prints one line per stage with bytes, sorted desc, per N.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from bench_graph_index import SEED, points  # noqa: E402

from spark_nnd_spark import get_spark  # noqa: E402
from spark_nnd_spark.operators import knn_graph_index as KG  # noqa: E402
from spark_nnd_spark.session import session_scratch_dir  # noqa: E402

BATCH = int(os.environ.get("DIAG_BATCH", "250"))


def stages_full(spark):
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    return json.load(
        urllib.request.urlopen(f"{base}/api/v1/applications/{app_id}/stages")
    )


def stage_to_job(spark):
    """stageId -> job-name map (the job name carries the action's
    callsite, which the async broadcast stages' own names do not)."""
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    jobs = json.load(
        urllib.request.urlopen(f"{base}/api/v1/applications/{app_id}/jobs")
    )
    out = {}
    for j in jobs:
        for sid in j.get("stageIds", []):
            out[sid] = j.get("name", "")
    return out


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [20_000, 80_000]
    spark = get_spark(
        app_name="diag_extend_stages",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "20000",
        },
    )
    for n in sizes:
        pts = points(spark, n).localCheckpoint(eager=True)
        pts.count()
        batch = points(spark, BATCH, id_base=10_000_000 + n).localCheckpoint(
            eager=True
        )
        batch.count()
        path = session_scratch_dir(f"diag_ext_{n}_")
        KG.build_knn_graph_index(pts, path, k=10, max_iterations=4, seed=SEED)
        before = {s["stageId"] for s in stages_full(spark)}
        spark.sparkContext.setJobDescription(f"extend N={n}")
        t0 = time.perf_counter()
        KG.extend_knn_graph_index(spark, path, batch)
        dt = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        rows = [
            s
            for s in stages_full(spark)
            if s["stageId"] not in before and s.get("shuffleWriteBytes", 0) > 0
        ]
        rows.sort(key=lambda s: -s["shuffleWriteBytes"])
        total = sum(s["shuffleWriteBytes"] for s in rows)
        s2j = stage_to_job(spark)
        print(f"\n=== N={n} extend_sec={dt:.1f} total_shuffle_mb={total/1e6:.2f}")
        for s in rows[:40]:
            name = (s.get("name") or "")[:60]
            job = (s2j.get(s["stageId"]) or "")[:90]
            print(
                f"{s['shuffleWriteBytes']/1e6:9.2f} MB  stage={s['stageId']:5d} "
                f"tasks={s.get('numTasks', 0):4d}  job={job}  {name}"
            )


if __name__ == "__main__":
    main()
