#!/usr/bin/env python
"""Continuous-aggregate rollup scale benchmark: build + fixed-batch
extend + zero-events probes at doubling event counts — the measured
100 TB contract for the 12th family (operators/event_rollup), the
token-stats convention applied to the hypertable:

- BUILD scales with the events scan (one map-side-combined aggregate
  to O(users·buckets) partials);
- EXTEND of a fixed-size batch pays the batch aggregate + an
  O(rollup) merge commit — flat-ish as the corpus doubles because the
  rollup is bounded by users·buckets, NOT events;
- PROBES (OHLC bars, daily re-bucket, gap-fill grid) touch only the
  stored rollup — wall/shuffle independent of raw event count.

Usage: python scripts/bench_rollup.py [N_EVENTS ...]
(default 250000 500000 1000000; fixed 1500 users / 30 days).
Writes $ROLLUP_SCALE_OUT (default BENCH_ROLLUP_SCALE.json).
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
from spark_nnd_spark.operators import event_rollup as ER  # noqa: E402
from spark_nnd_spark.session import session_scratch_dir  # noqa: E402

SEED = 42
N_USERS = 1500
BATCH = 10_000


def _gen_events(spark, n: int, id_base: int = 0):
    """Deterministic per-id events over a 30-day window (the
    bench_sf1_spot shape, generated distributed)."""

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.int64) + id_base
            rng = np.random.default_rng([SEED, int(ids[0])])
            span = 30 * 86400
            ts = (
                np.datetime64("2024-01-01", "us")
                + (rng.integers(0, span, size=len(ids)) * 1_000_000).astype(
                    "timedelta64[us]"
                )
            )
            yield pd.DataFrame(
                {
                    "event_id": ids,
                    "ts": ts,
                    "user_id": rng.integers(0, N_USERS, size=len(ids)).astype(
                        np.int64
                    ),
                    "value": np.round(rng.uniform(0, 20, size=len(ids)), 2),
                }
            )

    return spark.range(n).repartition(32).mapInPandas(
        gen, "event_id long, ts timestamp, user_id long, value double"
    )


def _stage_writes(spark) -> dict[int, int]:
    try:
        base = spark.sparkContext.uiWebUrl
        app_id = spark.sparkContext.applicationId
        stages = json.load(
            urllib.request.urlopen(
                f"{base}/api/v1/applications/{app_id}/stages"
            )
        )
        return {s["stageId"]: s.get("shuffleWriteBytes", 0) for s in stages}
    except Exception:  # noqa: BLE001
        return {}


def _delta(before: dict, after: dict) -> float:
    return round(
        sum(w for sid, w in after.items() if sid not in before) / 1e6, 2
    )


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [250_000, 500_000, 1_000_000]
    spark = get_spark(
        app_name="rollup_scale_bench",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "20000",
        },
    )
    # untimed warm-up
    warm = _gen_events(spark, 5000).localCheckpoint(eager=True)
    wpath = session_scratch_dir("rollup_warm_")
    ER.build_event_rollup(warm, wpath)
    ER.ohlc_from_rollup(spark, wpath).count()

    results = []
    for n in sizes:
        ev = _gen_events(spark, n).localCheckpoint(eager=True)
        ev.count()
        batch = _gen_events(spark, BATCH, id_base=100_000_000).localCheckpoint(
            eager=True
        )
        batch.count()
        path = session_scratch_dir(f"rollup_scale_{n}_")

        b0 = _stage_writes(spark)
        t0 = time.perf_counter()
        ER.build_event_rollup(ev, path)
        build_sec = round(time.perf_counter() - t0, 2)
        b1 = _stage_writes(spark)

        t0 = time.perf_counter()
        ER.extend_event_rollup(spark, path, batch, batch_id=0)
        extend_sec = round(time.perf_counter() - t0, 2)
        b2 = _stage_writes(spark)

        t0 = time.perf_counter()
        n_bars = ER.ohlc_from_rollup(spark, path).count()
        ER.daily_bars_from_rollup(spark, path).count()
        probe_sec = round(time.perf_counter() - t0, 2)
        b3 = _stage_writes(spark)

        rec = {
            "n_events": n,
            "build_sec": build_sec,
            "build_shuffle_mb": _delta(b0, b1),
            "extend_sec": extend_sec,
            "extend_batch": BATCH,
            "extend_shuffle_mb": _delta(b1, b2),
            "probe_sec": probe_sec,
            "probe_rows": n_bars,
            "probe_shuffle_mb": _delta(b2, b3),
        }
        results.append(rec)
        print(f"# {json.dumps(rec)}", file=sys.stderr)

    dest = os.environ.get("ROLLUP_SCALE_OUT", "BENCH_ROLLUP_SCALE.json")
    with open(dest, "w") as f:
        json.dump(results, f, indent=1)
        f.write("\n")
    print(json.dumps({"metric": "rollup_scale", "sizes": sizes, "out": dest}))


if __name__ == "__main__":
    main()
