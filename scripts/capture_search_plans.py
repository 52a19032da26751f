#!/usr/bin/env python
"""Capture the graph-search loop's physical-plan evidence: the final
formatted plan of q199 plus, for every SQL execution the search loop
ran (one per iteration's pool checkpoint), the operator-name counts
(exchanges, joins, windows, aggregates) from the UI REST API — the
per-iteration plan shape `explain` on the final result cannot show
(each iteration ends in a localCheckpoint, so the final plan only
reads the last pool).

Usage: python scripts/capture_search_plans.py OUT_SUFFIX
Writes plans/r15/q199_graph_search_<OUT_SUFFIX>.txt
"""

from __future__ import annotations

import json
import re
import sys
import urllib.request

sys.path.insert(0, ".")

from spark_nnd_spark import get_spark  # noqa: E402

SUFFIX = sys.argv[1] if len(sys.argv) > 1 else "now"
SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark(
        app_name="capture_search_plans",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "20000",
            "spark.sql.ui.retainedExecutions": "2000",
        },
    )
    from spark_nnd_spark.queries.knn import KNN_QUERIES  # noqa: E402,PLC0415

    df = KNN_QUERIES["q199_graph_search"](spark, SF)
    n = df.count()
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"  # noqa: SLF001
    )
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    sqls = json.load(
        urllib.request.urlopen(
            f"{base}/api/v1/applications/{app_id}/sql?length=2000"
        )
    )
    lines = [f"q199_graph_search rows={n}", "", "== final formatted plan ==", plan, ""]
    lines.append("== per-SQL-execution operator counts (search loop jobs) ==")
    ops_of_interest = (
        "Exchange", "BroadcastExchange", "BroadcastHashJoin",
        "ShuffledHashJoin", "SortMergeJoin", "Window", "HashAggregate",
        "LocalTableScan",
    )
    total = {k: 0 for k in ops_of_interest}
    for s in sqls:
        desc = s.get("planDescription", "")
        nodes = [nd.get("nodeName", "") for nd in s.get("nodes", [])]
        counts = {}
        for op in ops_of_interest:
            c = sum(1 for x in nodes if re.fullmatch(rf"{op}( .*)?", x)) or desc.count(op)
            counts[op] = sum(1 for x in nodes if x.startswith(op))
            total[op] += counts[op]
        ln = " ".join(f"{k}={v}" for k, v in counts.items() if v)
        lines.append(f"sql#{s['id']} dur={s.get('duration')}ms {ln}")
    lines.append("")
    lines.append(
        "TOTAL " + " ".join(f"{k}={v}" for k, v in total.items() if v)
    )
    out = f"plans/r15/q199_graph_search_{SUFFIX}.txt"
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", out)
    spark.stop()


if __name__ == "__main__":
    main()
