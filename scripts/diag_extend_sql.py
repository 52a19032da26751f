#!/usr/bin/env python
"""SQL-execution-level attribution of extend_knn_graph_index shuffle:
dump every SQL execution run during one extend, with its physical plan
node list and per-node shuffle metrics, so the O(corpus) exchange found
by diag_extend_stages can be tied to an operator subtree.

Usage: DIAG_BATCH=16 python scripts/diag_extend_sql.py [N] (default 80000)
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from bench_graph_index import SEED, points  # noqa: E402

from spark_nnd_spark import get_spark  # noqa: E402
from spark_nnd_spark.operators import knn_graph_index as KG  # noqa: E402
from spark_nnd_spark.session import session_scratch_dir  # noqa: E402

BATCH = int(os.environ.get("DIAG_BATCH", "16"))


def sql_execs(spark):
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    return json.load(
        urllib.request.urlopen(
            f"{base}/api/v1/applications/{app_id}/sql?length=2000&details=true&planDescription=false"
        )
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 80_000
    spark = get_spark(
        app_name="diag_extend_sql",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "20000",
            "spark.sql.ui.retainedExecutions": "2000",
        },
    )
    pts = points(spark, n).localCheckpoint(eager=True)
    pts.count()
    batch = points(spark, BATCH, id_base=10_000_000 + n).localCheckpoint(
        eager=True
    )
    batch.count()
    path = session_scratch_dir(f"diag_sql_{n}_")
    KG.build_knn_graph_index(pts, path, k=10, max_iterations=4, seed=SEED)
    before = {e["id"] for e in sql_execs(spark)}
    KG.extend_knn_graph_index(spark, path, batch)
    import re

    def mb_of(val: str) -> float:
        """First size in the formatted metric value, in MB."""
        m = re.search(r"([\d.]+)\s*(B|KiB|MiB|GiB)", val or "")
        if not m:
            return 0.0
        scale = {"B": 1e-6, "KiB": 1e-3, "MiB": 1.0, "GiB": 1e3}[m.group(2)]
        return float(m.group(1)) * scale

    execs = [e for e in sql_execs(spark) if e["id"] not in before]
    for e in sorted(execs, key=lambda x: x["id"]):
        heavy = []
        for node in e.get("nodes", []):
            for m in node.get("metrics", []):
                if "written" in m.get("name", "") and mb_of(m.get("value")) >= 0.3:
                    heavy.append((node["nodeId"], node["nodeName"], m["name"], m["value"]))
        if not heavy:
            continue
        print(f"\n### exec {e['id']} dur={e.get('duration')}ms desc={e.get('description','')[:80]}")
        for h in heavy:
            print(f"  HEAVY {h}")
        for node in e.get("nodes", []):
            nm = node["nodeName"]
            rows = next(
                (
                    m["value"]
                    for m in node.get("metrics", [])
                    if m["name"] in ("number of output rows",)
                ),
                "",
            )
            print(f"  [{node['nodeId']:3d}] {nm[:100]} rows={rows}")


if __name__ == "__main__":
    main()
