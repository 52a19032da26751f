"""Full driver-style parity sweep at an arbitrary SF.

The pytest parity suite runs at sf0.001 for speed; the driver's
CORRECTNESS gate compares at sf0.01.  This script replays the exact
compare (pandas dataframes, columns sorted by name, per-cell
normalization) at any SF dir so sf0.01-only divergences (float ties,
sampling thresholds, percentile interpolation) surface before the
driver sees them.

Usage: python scripts/parity_sweep.py [SF_DIR] [NAME_SUBSTR ...]
(default /root/testdata/sf0.01, all queries; extra args keep only
queries whose name contains any substring — e.g. `sf0.1 q2 asof` for a
targeted bench-scale replay of a family)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as entrymod
from tests.test_oracle_parity import _canon

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2:]
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _selected(name: str) -> bool:
    return not ONLY or any(s in name for s in ONLY)


def main() -> int:
    from spark_nnd_spark.session import get_spark

    spark = get_spark(app_name="parity-sweep")
    duck = duckdb.connect()
    for t in TABLES:
        duck.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = {n: s for n, s in entrymod.oracle_sql().items() if _selected(n)}
    failures = []
    for name in sorted(oracles):
        t0 = time.time()
        try:
            sdf = queries[name](spark, SF).toPandas()
            ddf = duck.sql(oracles[name]).fetchdf()
            skinds, srows = _canon(sdf)
            dkinds, drows = _canon(ddf)
            problems = []
            if list(skinds) != list(dkinds):
                problems.append(f"columns {list(skinds)} vs {list(dkinds)}")
            elif skinds != dkinds:
                problems.append(f"dtype kinds {skinds} vs {dkinds}")
            if len(srows) != len(drows):
                problems.append(f"rows {len(srows)} vs {len(drows)}")
            elif not problems and srows != drows:
                bad = next(
                    (i, a, b) for i, (a, b) in enumerate(zip(srows, drows)) if a != b
                )
                problems.append(f"values differ, first at sorted-row {bad[0]}: {bad[1]!r} vs {bad[2]!r}")
            status = "OK " if not problems else "FAIL"
            if problems:
                failures.append((name, problems))
            print(f"{status} {name:28s} {time.time() - t0:6.2f}s {'; '.join(problems)}", flush=True)
        except Exception as exc:  # noqa: BLE001 - report and continue
            failures.append((name, [f"exception: {exc!r}"]))
            print(f"ERR  {name:28s} {time.time() - t0:6.2f}s {exc!r}", flush=True)
    for name in sorted(n for n in set(queries) - set(entrymod.oracle_sql()) if _selected(n)):
        t0 = time.time()
        n = queries[name](spark, SF).count()
        print(f"ROWS {name:28s} {time.time() - t0:6.2f}s ({n} rows, no oracle)", flush=True)

    print(f"\n{len(oracles) - len(failures)}/{len(oracles)} parity-green at {SF}")
    for name, problems in failures:
        print(f"  FAIL {name}: {'; '.join(problems)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
