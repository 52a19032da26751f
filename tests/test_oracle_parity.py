"""Every declared query must match its DuckDB oracle bit-for-bit at the
smoke SF (the driver runs the same compare at sf0.01)."""

from __future__ import annotations

import decimal

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE


def _norm(v):
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, decimal.Decimal):
        return str(v)
    return v


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    srows = [tuple(_norm(v) for v in r) for r in QUERIES[name](spark, SF_SMOKE).collect()]
    drows = [tuple(_norm(v) for v in r) for r in duck.sql(ORACLES[name]).fetchall()]
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    assert srows == drows, f"{name}: value mismatch"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    rows = QUERIES[name](spark, SF_SMOKE).collect()
    assert len(rows) >= 0  # must run with a stable schema


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.limit(10).collect()
    assert len(rows) > 0
    assert set(df.columns) == {"id", "nb_id", "rank", "sim"}
