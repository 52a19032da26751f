#!/usr/bin/env python
"""Isolate declared queries for optimization work (guide §1): fresh
session, noop-sink materialization (§1.4), labeled jobs (§1.5),
min/median over N samples, optional plan dump to plans/<tag>/.

Usage: python scripts/isolate_queries.py [--sf DIR] [--n N]
           [--plans TAG SUFFIX] q14_jaccard_pairs q88_containment_pairs ...
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_nnd_spark import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument(
        "--plans",
        nargs=2,
        metavar=("TAG", "SUFFIX"),
        help="dump explain('formatted') to plans/TAG/<query>_SUFFIX.txt",
    )
    ap.add_argument("--count", action="store_true", help="count() instead of noop sink")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    spark = get_spark(
        app_name="isolate", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    from spark_nnd_spark.queries.knn import KNN_QUERIES
    from spark_nnd_spark.queries.pipeline import PIPELINE_QUERIES
    from spark_nnd_spark.queries.relational import RELATIONAL_QUERIES

    all_queries = {**RELATIONAL_QUERIES, **PIPELINE_QUERIES, **KNN_QUERIES}
    import gc

    for name in args.queries:
        fn = all_queries[name]
        samples = []
        for i in range(args.n):
            gc.collect()
            spark._jvm.System.gc()  # noqa: SLF001
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            if args.count:
                n_rows = df.count()
            else:
                df.write.format("noop").mode("overwrite").save()
                n_rows = -1
            samples.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        if args.plans:
            tag, suffix = args.plans
            os.makedirs(f"plans/{tag}", exist_ok=True)
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"  # noqa: SLF001
            )
            with open(f"plans/{tag}/{name}_{suffix}.txt", "w") as f:
                f.write(plan)
        med = sorted(samples)[len(samples) // 2]
        print(
            f"RESULT {name}: min={min(samples):.3f} med={med:.3f} "
            f"samples={samples} rows={n_rows}"
        )


if __name__ == "__main__":
    main()
