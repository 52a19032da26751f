"""Bench-scale (sf0.1) parity replay for the events family.

The sf0.001 parity suite and the driver's sf0.01 compare both run on a
500-row events sample; the loader regressions that actually bit (the r3
timestamp-dtype drift) only show up on the bench-scale file the driver
regenerates per round. Replaying the events family at sf0.1 inside the
per-round pytest gate catches that drift before the bench does —
scripts/parity_sweep.py can replay any family at any SF by hand, this
pins the one family with a drift history.
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod
from tests.test_oracle_parity import _canon

SF_BENCH = "/root/testdata/sf0.1"

EVENTS_FAMILY = [
    "q20_sessionize",
    "q21_tumbling_counts",
    "q22_running_value",
    "q23_latest_event",
    "q32_json_props",
    "q34_asof_join",
    "q38_value_quantiles",
    "q41_rollup_counts",
    "q43_nearby_events",
    "q47_sliding_avg",
    "q48_event_gaps",
    "q49_pivot_counts",
    "q58_funnel_stages",
    "q81_retention_cohorts",
    "q84_event_anomaly",
    "q90_event_transitions",
    "q92_decay_engagement",
    "q95_user_lifecycle",
    "q102_behavior_entropy",
]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_BENCH), reason="bench-scale testdata not materialized"
)


@pytest.fixture(scope="module")
def duck_bench():
    import duckdb

    con = duckdb.connect()
    for t in ("events", "customer", "documents"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_BENCH}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", EVENTS_FAMILY)
def test_events_family_matches_oracle_at_bench_scale(spark, duck_bench, name):
    sdf = entrymod.queries()[name](spark, SF_BENCH).toPandas()
    ddf = duck_bench.sql(entrymod.oracle_sql()[name]).fetchdf()
    skinds, srows = _canon(sdf)
    dkinds, drows = _canon(ddf)
    assert list(skinds) == list(dkinds), f"{name}: columns differ"
    assert skinds == dkinds, f"{name}: dtype kinds differ {skinds} vs {dkinds}"
    assert len(srows) == len(drows), f"{name}: rows {len(srows)} vs {len(drows)}"
    assert srows == drows, f"{name}: value mismatch at sf0.1"
