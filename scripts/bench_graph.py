#!/usr/bin/env python
"""Graph-operator scale benchmark: connected components and PageRank
over synthetic edge lists at doubling sizes.

The claims under test (the graph twin of bench_dedup.py's sweep):
- a CONNECTED-COMPONENTS round shuffles O(E) id-pairs, so total cost
  is O(rounds · E) with rounds ≈ log(diameter), NOT O(diameter) —
  the pointer-jumping contract in operators/graph.py. The edge mix
  plants one 2^12-node chain at every size, so a round count that
  stays flat (~log2(4096) + small constant) while E doubles is the
  direct evidence;
- PAGERANK's fixed-iteration loop shuffles O(E) (id, rank/deg)
  doubles per round, linear in E at a constant round count.

Edges: N nodes in chains of 5 (the shallow near-dup-cluster shape,
0.8·N edges) plus one 4096-node chain (the adversarial diameter).
Deterministic structure — no RNG.

Usage: python scripts/bench_graph.py [E ...]  (node counts; default
250000 500000 1000000 2000000). Writes BENCH_GRAPH_OUT if set.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from spark_nnd_spark import get_spark  # noqa: E402
from spark_nnd_spark.operators.graph import connected_components, pagerank  # noqa: E402

CHAIN = 4096  # adversarial-diameter component planted at every size


def synth_edges(spark, n: int):
    """Chains of 5 over [CHAIN, n) + one CHAIN-long chain at [0, CHAIN)."""
    bulk = (
        spark.range(CHAIN, n)
        .filter(F.col("id") % 5 != 4)
        .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
        .filter(F.col("id_b") < n)
    )
    chain = spark.range(CHAIN - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    return bulk.unionByName(chain).repartition(32)


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


def _delta(before: dict, after: dict) -> float:
    return round(
        sum(w for sid, w in after.items() if sid not in before) / 1e6, 1
    )


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [250_000, 500_000, 1_000_000, 2_000_000]
    spark = get_spark(
        app_name="graph_scale_bench", extra_conf={"spark.ui.enabled": "true"}
    )
    results = []
    for n in sizes:
        edges = synth_edges(spark, n).persist()
        n_edges = edges.count()  # materialize outside the timed window

        rounds = []
        b0 = stage_writes(spark)
        t0 = time.perf_counter()
        comp = connected_components(
            edges, on_round=lambda r, c: rounds.append((r, c))
        )
        n_comp = comp.select("component").distinct().count()
        cc_sec = round(time.perf_counter() - t0, 2)
        b1 = stage_writes(spark)

        t0 = time.perf_counter()
        pr = pagerank(edges, iterations=3)
        # collect the exchange payload, not a count-pruned plan (the
        # count-prune trap): the top-10 keeps the driver result tiny
        pr.orderBy(F.desc("rank"), "id").limit(10).collect()
        pr_sec = round(time.perf_counter() - t0, 2)
        b2 = stage_writes(spark)

        rec = {
            "n_nodes": n,
            "n_edges": int(n_edges),
            "cc_sec": cc_sec,
            "cc_rounds": len(rounds),
            "n_components": int(n_comp),
            "cc_shuffle_mb": _delta(b0, b1),
            "pagerank_sec": pr_sec,
            "pagerank_shuffle_mb": _delta(b1, b2),
        }
        results.append(rec)
        print(json.dumps(rec))
        edges.unpersist()
    out = os.environ.get("BENCH_GRAPH_OUT")
    if out:
        with open(out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
