#!/usr/bin/env python
"""Runtime Bloom-filter injection A/B (VERDICT r15 #5): session.py
disables SPARK-32268 globally, justified in r15 only on the K-NNG
extend path. This measures the engine's real shuffle pair joins —
exactly the joins the optimizer's injection targets — with injection
ON vs OFF, interleaved A/B/A/B min-of-3 per config in one session
(``spark.sql.optimizer.runtime.bloomFilter.enabled`` is a runtime SQL
conf), plus a plan probe: does any plan contain ``bloom_filter_agg`` /
``might_contain`` when enabled? If injection never fires, the global
disable costs these joins nothing and only removes the measured
per-map-task bitmap tax on the extend path.

Writes BENCH_BLOOM_AB.json when BLOOM_AB_OUT is set.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from spark_nnd_spark import get_spark  # noqa: E402
from spark_nnd_spark.operators import dedup as DD  # noqa: E402
from spark_nnd_spark.sources import load_table  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark(
        app_name="bloom_ab",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    docs = load_table(spark, SF, "documents").persist()
    docs.count()

    cases = {
        "jaccard_pairs": lambda: DD.jaccard_pairs(
            docs, n=3, threshold=0.2, max_shingle_freq=100
        ),
        "containment_pairs": lambda: DD.containment_pairs(
            docs, n=3, threshold=0.7, max_shingle_freq=100
        ),
        "winnow_pairs": lambda: DD.winnow_pairs(
            docs, n=4, w=4, min_shared=2, max_fp_freq=100
        ),
        "exact_span_pairs": lambda: DD.exact_span_pairs(
            docs, gram_len=6, min_span_tokens=12
        ),
    }

    def run(name: str, enabled: bool) -> tuple[float, bool, int]:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "true" if enabled else "false",
        )
        gc.collect()
        spark._jvm.System.gc()  # noqa: SLF001
        spark.sparkContext.setJobDescription(
            f"{name} bloom={'on' if enabled else 'off'}"
        )
        t0 = time.perf_counter()
        df = cases[name]()
        n = df.count()
        wall = round(time.perf_counter() - t0, 2)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"  # noqa: SLF001
        )
        fired = "bloom_filter_agg" in plan or "might_contain" in plan
        return wall, fired, n

    results: dict[str, dict] = {}
    for name in cases:
        run(name, True)  # untimed warmup absorbs JIT for this query's plan
        walls: dict[bool, list[float]] = {True: [], False: []}
        fired_any = False
        n_rows: set[int] = set()
        for enabled in [True, False, True, False, True, False]:
            wall, fired, n = run(name, enabled)
            walls[enabled].append(wall)
            fired_any = fired_any or (fired and enabled)
            n_rows.add(n)
        results[name] = {
            "on_min": min(walls[True]),
            "off_min": min(walls[False]),
            "on_all": walls[True],
            "off_all": walls[False],
            "injection_fired_when_on": fired_any,
            "rows_identical": len(n_rows) == 1,
        }
        print(name, json.dumps(results[name]))
    out = os.environ.get("BLOOM_AB_OUT")
    if out:
        with open(out, "w") as f:
            json.dump({"sf": SF, "cases": results}, f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    main()
