#!/usr/bin/env python
"""Batched-BPE scale benchmark: train DEEP merge tables over the
sf0.1 documents vocabulary at several merges-per-round settings.

The claim under test (VERDICT r12 missing #3): the training loop is
DRIVER-ROUND-bound, not merge-bound — applying the top-M symbol-
disjoint merges per round cuts driver round-trips ~M× with exact
per-merge counts, so 64+ merges fit in a handful of driver actions
while the corpus is read exactly once (into the (word, count)
vocabulary) regardless of merge depth.

Usage: python scripts/bench_bpe.py [N_MERGES ...] (default 64).
Writes BENCH_BPE_OUT if set (default BENCH_BPE_SCALE.json).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from spark_nnd_spark import get_spark  # noqa: E402
from spark_nnd_spark.functions import text as TX  # noqa: E402
from spark_nnd_spark.queries.pipeline import bpe_train_merges  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    depths = [int(a) for a in sys.argv[1:]] or [64]
    spark = get_spark(app_name="bpe_scale_bench")
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    vocab = (
        d.select(F.explode(TX.tokens_expr("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
        .select("c", F.split("tok", "").alias("syms"))
        .localCheckpoint(eager=True)
    )
    n_vocab = vocab.count()
    results = []
    for n_merges in depths:
        for m in (1, 16, 64):
            t0 = time.perf_counter()
            merges, _cur = bpe_train_merges(
                vocab, n_merges, merges_per_round=m
            )
            wall = round(time.perf_counter() - t0, 2)
            # driver rounds = censuses taken; each round is exactly one
            # collect + one checkpoint, so rounds == actions/2
            results.append(
                {
                    "n_merges_requested": n_merges,
                    "merges_per_round": m,
                    "n_merges_trained": len(merges),
                    "wall_sec": wall,
                    "n_vocab_words": n_vocab,
                    "first_merges": [
                        f"{a}+{b}:{n}" for a, b, n in merges[:5]
                    ],
                }
            )
            print(json.dumps(results[-1]))
    out = os.environ.get("BENCH_BPE_OUT", "BENCH_BPE_SCALE.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
