#!/usr/bin/env python
"""Winnow-index scale benchmark: build + fixed-batch probe over a
synthetic corpus at doubling sizes — the measured 100 TB contract for
the q205 / winnow_gate_stream family (the winnow twin of
scripts/bench_span.py):

- index BUILD scales linearly in N (one tokenize pass + one fp
  exchange, over a fingerprint stream ~2/(w+1) the span index's gram
  stream);
- the PROBE of a FIXED-size batch is ~independent of indexed corpus
  size in SHUFFLE (the batch fingerprint set broadcasts into the
  fp-sorted postings scan; match volume is pinned by the plant
  density, not N).

Corpus/probe generation is shared with bench_span.py: N docs of 80
tokens from a 5k-word vocabulary; every 25th doc embeds one of a pool
of 16-token passages that GROWS with N (constant per-passage df).
Probe batch: 2000 docs, half embedding a known passage, half clean.

Usage: python scripts/bench_winnow.py [N ...] (default 20000 40000 80000)
Writes $WINNOW_SCALE_OUT (default BENCH_WINNOW_SCALE.json).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from bench_span import PROBE_BATCH, PROBE_PASSAGES, _delta_mb, _gen_docs, _stage_writes  # noqa: E402

from spark_nnd_spark import get_spark  # noqa: E402
from spark_nnd_spark.operators.dedup import (  # noqa: E402
    build_winnow_index,
    winnow_query_index,
)

WINNOW_N = 4
WINNOW_W = 4
MIN_SHARED = 2
MAX_FP_FREQ = 200  # vocabulary-collision guard at bench densities


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [20000, 40000, 80000]
    spark = get_spark(
        app_name="bench_winnow_scale",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "20000",
        },
    )
    root = tempfile.mkdtemp(prefix="winnowscale_")
    probe_pq = f"{root}/probe.parquet"
    _gen_docs(PROBE_BATCH, 10_000_000, True, probe_pq, PROBE_PASSAGES)
    probe = spark.read.parquet(probe_pq)

    # Untimed session warm-up (build + probe on a throwaway 2k-doc
    # index): Python-worker forks + JIT otherwise land entirely on the
    # first timed row — r13's 20k row logged 65.1s build / 62.8s probe
    # against 2.6s warm, drowning the linearity the bench asserts.
    warm_pq = f"{root}/warm.parquet"
    _gen_docs(2000, 20_000_000, False, warm_pq, PROBE_PASSAGES)
    warm_idx = f"{root}/warm_idx"
    build_winnow_index(
        spark.read.parquet(warm_pq), warm_idx, n=WINNOW_N, w=WINNOW_W
    )
    winnow_query_index(
        spark, warm_idx, probe, min_shared=MIN_SHARED, max_fp_freq=MAX_FP_FREQ
    ).count()

    records = []
    for n in sizes:
        corpus_pq = f"{root}/corpus_{n}.parquet"
        _gen_docs(n, 0, False, corpus_pq, max(PROBE_PASSAGES, n // 100))
        corpus = spark.read.parquet(corpus_pq)
        idx = f"{root}/idx_{n}"

        b0 = _stage_writes(spark)
        t0 = time.perf_counter()
        build_winnow_index(corpus, idx, n=WINNOW_N, w=WINNOW_W)
        build_s = round(time.perf_counter() - t0, 2)
        build_mb = _delta_mb(b0, _stage_writes(spark))

        b1 = _stage_writes(spark)
        t1 = time.perf_counter()
        hits = winnow_query_index(
            spark,
            idx,
            probe,
            min_shared=MIN_SHARED,
            max_fp_freq=MAX_FP_FREQ,
        )
        from pyspark.sql import functions as F  # noqa: PLC0415

        agg = hits.agg(
            F.sum(F.col("n_shared").cast("long")).alias("s"),
            F.count("*").alias("n"),
        ).collect()[0]
        probe_s = round(time.perf_counter() - t1, 2)
        probe_mb = _delta_mb(b1, _stage_writes(spark))

        rec = {
            "n": n,
            "build_sec": build_s,
            "build_shuffle_mb": build_mb,
            "probe_sec": probe_s,
            "probe_shuffle_mb": probe_mb,
            "probe_pairs": int(agg["n"]),
            "probe_total_shared": int(agg["s"]) if agg["s"] is not None else 0,
        }
        records.append(rec)
        print(f"# {json.dumps(rec)}", file=sys.stderr)

    dest = os.environ.get("WINNOW_SCALE_OUT", "BENCH_WINNOW_SCALE.json")
    with open(dest, "w") as f:
        json.dump(records, f, indent=1)
        f.write("\n")
    print(json.dumps({"metric": "winnow_scale", "sizes": sizes, "out": dest}))


if __name__ == "__main__":
    main()
