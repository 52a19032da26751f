"""Served == inline for graph-search queries: q201 (persisted 10th
family, held-out ids tombstone-retracted) must reproduce q199 (inline
masked flagship graph) row-for-row — same artifact, same search
configuration, so any divergence is a persist/read/retract defect."""

from __future__ import annotations

from spark_nnd_spark.queries.knn import (
    q199_graph_search,
    q200_graph_search_recall,
    q201_indexed_graph_search,
    q202_indexed_graph_recall,
)
from tests.conftest import SF_SMOKE


def test_served_equals_inline(spark):
    inline = sorted(map(tuple, q199_graph_search(spark, SF_SMOKE).collect()))
    served = sorted(
        map(tuple, q201_indexed_graph_search(spark, SF_SMOKE).collect())
    )
    assert served == inline
    assert len(served) > 0


def test_recall_rows_hold_floor(spark):
    for fn in (q200_graph_search_recall, q202_indexed_graph_recall):
        row = fn(spark, SF_SMOKE).collect()[0]
        assert row.floor_ok, f"{row.method} below floor {row.floor}"
        assert row.hits is None and row.recall is None  # oracle contract
