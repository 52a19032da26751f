#!/usr/bin/env python
"""Span-index scale benchmark: build + fixed-batch probe over a
synthetic corpus at doubling sizes — the measured 100 TB contract for
the q162 / span_gate_stream family (the span twin of
scripts/bench_dedup.py):

- index BUILD scales linearly in N (one tokenize pass + one gh
  exchange);
- the PROBE of a FIXED-size batch is ~independent of indexed corpus
  size in SHUFFLE (the join moves O(batch grams + matching corpus
  grams); match volume is pinned by the plant density, not N) — scan
  I/O over the grams table grows linearly but stays shuffle-free.

Corpus: N docs of 80 tokens from a 5k-word vocabulary; every 25th doc
embeds one of 200 fixed 16-token passages (so the probe's planted
matches are constant-count per batch regardless of N). Probe batch:
2000 docs, half embedding a known passage, half clean. Deterministic
per-id generation.

Usage: python scripts/bench_span.py [N ...] (default 20000 40000 80000)
Writes $SPAN_SCALE_OUT (default BENCH_SPAN_SCALE.json).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import urllib.request

import numpy as np
import pandas as pd

sys.path.insert(0, ".")

from spark_nnd_spark import get_spark  # noqa: E402
from spark_nnd_spark.operators.dedup import (  # noqa: E402
    build_span_index,
    span_query_index,
)

SEED = 7
VOCAB = 5000
DOC_TOKENS = 80
PASSAGES_PER_100 = 1  # passage pool GROWS with N: per-passage corpus
# frequency stays constant (4 docs), so probe match volume is pinned
# by the batch, not by N — the contract under test
PROBE_PASSAGES = 200  # probe picks from the first 200 (exist at all N)
PASSAGE_TOKENS = 16
PLANT_EVERY = 25
PROBE_BATCH = 2000
GRAM_LEN = 6
MIN_SPAN = 12


def _passage(k: int) -> list[str]:
    return [f"pp{k}w{j}" for j in range(PASSAGE_TOKENS)]


def _gen_docs(n: int, id0: int, plant_half: bool, out: str,
              n_passages: int) -> None:
    rng = np.random.default_rng(SEED + id0)
    rows = []
    for i in range(n):
        did = id0 + i
        toks = [f"w{x}" for x in rng.integers(0, VOCAB, size=DOC_TOKENS)]
        planted = (not plant_half and i % PLANT_EVERY == 0) or (
            plant_half and i % 2 == 0
        )
        if planted:
            p = _passage(int(rng.integers(0, n_passages)))
            at = int(rng.integers(0, DOC_TOKENS - PASSAGE_TOKENS))
            toks[at : at + PASSAGE_TOKENS] = p
        rows.append((did, " ".join(toks)))
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(out, index=False)


def _stage_writes(spark):
    try:
        base = spark.sparkContext.uiWebUrl
        app_id = spark.sparkContext.applicationId
        if not base:
            return None
        stages = json.load(
            urllib.request.urlopen(f"{base}/api/v1/applications/{app_id}/stages")
        )
        return {s["stageId"]: s.get("shuffleWriteBytes", 0) for s in stages}
    except Exception:  # noqa: BLE001
        return None


def _delta_mb(before, after) -> float | None:
    if before is None or after is None:
        return None
    return round(sum(b - before.get(s, 0) for s, b in after.items()) / 1e6, 2)


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [20000, 40000, 80000]
    spark = get_spark(
        app_name="bench_span_scale",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "20000",
        },
    )
    root = tempfile.mkdtemp(prefix="spanscale_")
    probe_pq = f"{root}/probe.parquet"
    _gen_docs(PROBE_BATCH, 10_000_000, True, probe_pq, PROBE_PASSAGES)
    probe = spark.read.parquet(probe_pq)

    records = []
    for n in sizes:
        corpus_pq = f"{root}/corpus_{n}.parquet"
        # corpus passage pool scales with N => constant per-passage df
        _gen_docs(n, 0, False, corpus_pq, max(PROBE_PASSAGES, n // 100))
        corpus = spark.read.parquet(corpus_pq)
        idx = f"{root}/idx_{n}"

        b0 = _stage_writes(spark)
        t0 = time.perf_counter()
        build_span_index(corpus, idx, gram_len=GRAM_LEN)
        build_s = round(time.perf_counter() - t0, 2)
        build_mb = _delta_mb(b0, _stage_writes(spark))

        b1 = _stage_writes(spark)
        t1 = time.perf_counter()
        hits = span_query_index(
            spark, idx, probe, min_span_tokens=MIN_SPAN
        )
        # agg forces the full hits branch (count() would let Catalyst
        # prune the span aggregates — the measured count-prune trap)
        from pyspark.sql import functions as F  # noqa: PLC0415

        agg = hits.agg(
            F.sum(F.col("n_spans").cast("long")).alias("s"),
            F.count("*").alias("n"),
        ).collect()[0]
        n_pairs = int(agg["n"])
        probe_s = round(time.perf_counter() - t1, 2)
        probe_mb = _delta_mb(b1, _stage_writes(spark))

        rec = {
            "n": n,
            "build_sec": build_s,
            "build_shuffle_mb": build_mb,
            "probe_sec": probe_s,
            "probe_shuffle_mb": probe_mb,
            "probe_pairs": n_pairs,
            "probe_total_spans": int(agg["s"]) if agg["s"] is not None else 0,
        }
        records.append(rec)
        print(f"# {json.dumps(rec)}", file=sys.stderr)

    dest = os.environ.get("SPAN_SCALE_OUT", "BENCH_SPAN_SCALE.json")
    with open(dest, "w") as f:
        json.dump(records, f, indent=1)
        f.write("\n")
    print(json.dumps({"metric": "span_scale", "sizes": sizes, "out": dest}))


if __name__ == "__main__":
    main()
