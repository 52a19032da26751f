"""Measured shuffle-reduction record for the two pre-cut operators
(the BENCH_DEDUP_SCALE convention: a script writes the JSON record,
tests/test_prejoin_scale.py asserts the properties hold).

Two claims are measured, not guessed:

1. ``bloom_semi_join`` (operators/sketches.py): with the key side too
   large to broadcast — the 100 TB regime, forced here via
   ``autoBroadcastJoinThreshold=-1`` — the bloom pre-filter drops
   non-matching probe rows BEFORE the join exchange, so the probe
   side's shuffle bytes shrink toward match-selectivity while the
   plain semi join ships the full probe stream.

2. Native two-phase top-K: Catalyst's WindowGroupLimit inserts a
   Partial cut below the window exchange for rank<=k filters
   (group_top_k's shape), so each map task forwards at most groups·K
   rows. Measured by toggling
   ``spark.sql.optimizer.windowGroupLimitThreshold`` (-1 disables) on
   a synthetic hot-group stream (8 groups × N rows): the disabled run
   ships the whole stream into the window.

Shuffle bytes come from the Spark UI REST API per stage (exact task
metrics, not wall time — the signal host jitter can't touch).

Usage: python scripts/bench_prejoin.py [N_TOPK_ROWS] (default 2e6)
Writes BENCH_PREJOIN.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_nnd_spark import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_TOPK = int(float(sys.argv[1])) if len(sys.argv) > 1 else 2_000_000


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


def delta_mb(before: dict, after: dict) -> float:
    return round(
        sum(w for sid, w in after.items() if sid not in before) / 1e6, 3
    )


def main() -> None:
    spark = get_spark(
        app_name="prejoin_bench",
        extra_conf={
            "spark.ui.enabled": "true",
            # the 100 TB regime: the key side exceeds any broadcast
            # threshold, so the semi join must shuffle both sides
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )
    from spark_nnd_spark.operators.relational import group_top_k
    from spark_nnd_spark.operators.sketches import bloom_semi_join

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    urgent = spark.read.parquet(f"{SF_DIR}/orders.parquet").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )

    out: dict = {"sf_dir": SF_DIR, "n_topk_rows": N_TOPK}

    s0 = stage_writes()
    n_plain = (
        li.join(
            urgent.select(F.col("o_orderkey").alias("l_orderkey")).distinct(),
            "l_orderkey",
            "left_semi",
        ).count()
    )
    s1 = stage_writes()
    n_bloom = bloom_semi_join(
        li, urgent, "l_orderkey", "o_orderkey", m_bits=1 << 16
    ).count()
    s2 = stage_writes()
    # a filter SIZED to the key cardinality (~30k urgent keys at sf0.1:
    # 2n/m = 0.23 -> fpp ~4% vs ~36% at 2^16) — m is the lever
    n_sized = bloom_semi_join(
        li, urgent, "l_orderkey", "o_orderkey", m_bits=1 << 18
    ).count()
    s3b = stage_writes()
    assert n_plain == n_bloom == n_sized, (n_plain, n_bloom, n_sized)
    out["semi_join"] = {
        "rows_out": n_plain,
        "probe_rows_total": li.count(),
        "plain_shuffle_mb": delta_mb(s0, s1),
        # each bloom figure includes its build's own (O(m/64)) aggregate
        "bloom_64kbit_shuffle_mb": delta_mb(s1, s2),
        "bloom_256kbit_shuffle_mb": delta_mb(s2, s3b),
    }

    # hot-group synthetic: 8 groups, value = mixed hash, id = row id
    base = spark.range(N_TOPK).select(
        (F.col("id") % 8).alias("grp"),
        F.xxhash64("id").alias("value"),
        F.col("id").alias("rid"),
    )
    key = "spark.sql.optimizer.windowGroupLimitThreshold"
    spark.conf.set(key, "-1")  # disable the native Partial cut
    s3 = stage_writes()
    w_rows = group_top_k(
        base, ["grp"], [F.desc("value"), F.asc("rid")], 3
    ).count()
    s4 = stage_writes()
    spark.conf.unset(key)  # default: WindowGroupLimit Partial below the exchange
    n_rows = group_top_k(
        base, ["grp"], [F.desc("value"), F.asc("rid")], 3
    ).count()
    s5 = stage_writes()
    assert w_rows == n_rows == 24, (w_rows, n_rows)
    out["topk"] = {
        "rows_out": w_rows,
        "disabled_shuffle_mb": delta_mb(s3, s4),
        "native_group_limit_shuffle_mb": delta_mb(s4, s5),
    }

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_PREJOIN.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
