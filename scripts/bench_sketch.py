"""Measured shuffle record for the histogram quantile sketch
(the BENCH_DEDUP_SCALE / BENCH_PREJOIN convention: a script writes the
JSON record, tests/test_sketch_scale.py asserts the properties hold).

The claim (operators/sketches.py histogram_quantiles): the sketch's
exchange carries O(partitions·groups·bins) partial cells, INDEPENDENT
of row count, because Catalyst's partial hash aggregate IS the sketch
merge — while the exact-percentile aggregate's partial state is a
counts map over every DISTINCT value seen in the partition, so on a
continuous metric (quality scores, losses, latencies — where distinct
~ rows) its exchange grows linearly with the stream. Both are
measured here on the same synthetic CONTINUOUS stream (20 groups,
~all-distinct doubles in [0, 512)) at N swept ×4 per step; shuffle
bytes come from the Spark UI REST API per stage (exact task metrics,
the signal host jitter can't touch).

Honesty note: on small-integer domains (q126's token counts) the
exact aggregate's distinct-value map is bounded too and the exact
tier is cheap — the sketch's batch-side win is specifically the
continuous-metric regime, plus streaming (a percentile cannot run
incrementally with bounded state; the histogram can, and does —
streams.token_histogram_stream).

Usage: python scripts/bench_sketch.py [N ...]  (default 1e6 4e6 16e6)
Writes BENCH_SKETCH_SCALE.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_nnd_spark import get_spark
from spark_nnd_spark.operators.sketches import histogram_quantiles

GROUPS = 20
LO, WIDTH, BINS = 0.0, 8.0, 64


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


def stream(spark, n: int):
    """Deterministic synthetic value stream: 20 groups, CONTINUOUS
    doubles in [0, 512) (multiplicative hash mod a ~2^31 prime, scaled
    to the bin range) so distinct values ~ rows — the regime where an
    exact percentile's per-partition counts map grows with the data
    while the histogram's state stays O(groups*bins)."""
    return spark.range(n).select(
        F.concat(F.lit("g"), F.pmod("id", F.lit(GROUPS))).alias("grp"),
        (
            F.pmod(F.col("id") * F.lit(2654435761), F.lit(2147483629)).cast(
                "double"
            )
            / F.lit(2147483629.0)
            * F.lit(512.0)
        ).alias("v"),
    )


def main() -> None:
    sizes = [int(float(a)) for a in sys.argv[1:]] or [1_000_000, 4_000_000, 16_000_000]
    spark = get_spark(
        app_name="sketch_scale_bench",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    results = []
    for n in sizes:
        s = stream(spark, n)
        before = stage_writes()
        sk = histogram_quantiles(
            s, "grp", F.col("v"), LO, WIDTH, BINS, {"p50": 0.5, "p99": 0.99}
        )
        n_groups = len(sk.collect())  # collect, not count: count() lets
        # Catalyst prune the quantile columns and the measured exchange
        # would be the pruned plan's
        mid = stage_writes()
        exact = s.groupBy("grp").agg(
            F.expr("percentile(v, 0.5)").alias("p50"),
            F.expr("percentile(v, 0.99)").alias("p99"),
        )
        exact.collect()
        after = stage_writes()
        sketch_bytes = sum(w for sid, w in mid.items() if sid not in before)
        exact_bytes = sum(w for sid, w in after.items() if sid not in mid)
        rec = {
            "n": n,
            "groups": n_groups,
            "sketch_shuffle_mb": round(sketch_bytes / 1e6, 3),
            "exact_percentile_shuffle_mb": round(exact_bytes / 1e6, 3),
        }
        results.append(rec)
        print(json.dumps(rec))
    out = os.environ.get(
        "SKETCH_SCALE_OUT",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "BENCH_SKETCH_SCALE.json",
        ),
    )
    with open(out, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
