"""Every declared query must match its DuckDB oracle bit-for-bit at the
smoke SF (the driver runs the same compare at sf0.01).

The compare deliberately goes through pandas dataframes (Spark ``toPandas``
vs DuckDB ``fetchdf``), NOT ``collect()``/``fetchall()`` row tuples: the
driver hashes dataframe values, where a DuckDB HUGEINT column materializes
as float64 and hashes differently from Spark's int64 even when every value
is numerically identical.  Row tuples hide that class of bug because
Python's ``1 == 1.0``.
"""

from __future__ import annotations

import decimal

import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE



pytestmark = pytest.mark.slow  # heavy tier: deselected from the default fast run

def _col_kind(s: pd.Series) -> str:
    """Collapse a column dtype to the kind the driver's hash is sensitive to."""
    k = s.dtype.kind
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    return "object"


def _norm_cell(v):
    if isinstance(v, float) or isinstance(v, np.floating):
        if pd.isna(v):
            return None
        return round(float(v), 9)
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, np.bool_):
        return bool(v)
    if v is pd.NaT or (v is not None and not isinstance(v, (list, np.ndarray)) and pd.isna(v)):
        return None
    if isinstance(v, np.ndarray):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    return v


def _canon(df: pd.DataFrame) -> tuple[dict[str, str], list[tuple]]:
    """(column-name -> dtype-kind, row tuples) with columns sorted by name,
    mirroring the driver's sort-columns-by-name-then-hash compare."""
    df = df[sorted(df.columns)]
    kinds = {c: _col_kind(df[c]) for c in df.columns}
    rows = sorted(
        tuple(_norm_cell(v) for v in row) for row in df.itertuples(index=False, name=None)
    )
    return kinds, rows


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_SMOKE).toPandas()
    ddf = duck.sql(ORACLES[name]).fetchdf()
    skinds, srows = _canon(sdf)
    dkinds, drows = _canon(ddf)
    assert list(skinds) == list(dkinds), f"{name}: columns {list(skinds)} vs {list(dkinds)}"
    assert skinds == dkinds, f"{name}: dtype kinds differ {skinds} vs {dkinds}"
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
