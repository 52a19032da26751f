"""The driver checks only the first ~50 entries of ``queries()``, so the
ordering is a correctness-coverage policy. It is generated from the
recorded CORRECTNESS_r*.json history (never-driver-checked first —
including queries whose oracle landed after their last driver row, so
every recorded row is a valueless ``no_oracle``/error row — then
stalest-last-check first, then fewest-total-checks) so that no query can
be silently starved by a hand-maintained list drifting out of date."""

from __future__ import annotations

import glob
import json
import os
import re

import __spark_entry__ as entrymod

REPO = os.path.dirname(os.path.abspath(entrymod.__file__))


def _history() -> tuple[dict[str, list[int]], set[str]]:
    """Per-query driver-check rounds, plus the set of queries that have
    ever received a value-level (hash) check."""
    hist: dict[str, list[int]] = {}
    hashed: set[str] = set()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)\.json$", path).group(1))
        for q, row in json.load(open(path)).items():
            hist.setdefault(q, []).append(rnd)
            if isinstance(row, dict) and row.get("hash_match") is not None:
                hashed.add(q)
    return hist, hashed


def _effective_last(q: str, hist, hashed, oracled) -> int:
    """The round of the last MEANINGFUL driver check: -1 (never) when
    there is no history at all, or when the query has an oracle now but
    every recorded row predates it (no value comparison ever ran)."""
    if q not in hist:
        return -1
    if q in oracled and q not in hashed:
        return -1
    return max(hist[q])


def test_never_checked_queries_lead_the_window():
    order = list(entrymod.queries())
    hist, hashed = _history()
    oracled = set(entrymod.oracle_sql())
    never = [q for q in order if _effective_last(q, hist, hashed, oracled) == -1]
    # every never-meaningfully-checked query sits strictly before every
    # already-checked query
    if never:
        last_never = max(order.index(q) for q in never)
        first_checked = min(
            order.index(q)
            for q in order
            if _effective_last(q, hist, hashed, oracled) != -1
        )
        assert last_never < first_checked


def test_stalest_checked_queries_precede_fresher_ones():
    order = list(entrymod.queries())
    hist, hashed = _history()
    oracled = set(entrymod.oracle_sql())
    lasts = [
        _effective_last(q, hist, hashed, oracled)
        for q in order
        if _effective_last(q, hist, hashed, oracled) != -1
    ]
    assert lasts == sorted(lasts), (
        "queries last checked in an older round must come before ones "
        "checked more recently"
    )


def test_window_is_exactly_the_never_or_stalest_checked_fifty():
    """The generator's invariant (round-agnostic): the driver-checked
    window (first 50 entries) consists of the queries with the oldest
    effective last-check round — never-checked (last = -1) first, then
    stalest. No query outside the window may be staler than one inside."""
    order = list(entrymod.queries())
    hist, hashed = _history()
    oracled = set(entrymod.oracle_sql())
    window, rest = order[:50], order[50:]

    if rest:
        assert max(
            _effective_last(q, hist, hashed, oracled) for q in window
        ) <= min(
            _effective_last(q, hist, hashed, oracled) for q in rest
        ), "a query outside the window is staler than one inside it"


def test_oracled_but_never_hash_checked_queries_land_at_the_front():
    """A query whose oracle landed after its last driver row (all rows
    are no_oracle/error) must re-enter the window at the front — q135–
    q137's situation after r7. Rows-only-by-design queries (no oracle
    declared) must NOT be promoted this way."""
    order = list(entrymod.queries())
    hist, hashed = _history()
    oracled = set(entrymod.oracle_sql())
    for q in order:
        if q in hist and q in oracled and q not in hashed:
            assert order.index(q) < 50, f"{q} should be in the window"


def test_rows_only_queries_are_not_promoted_forever():
    """q25-style rows-only queries (no oracle) always record no_oracle
    rows; they must rotate by staleness like any checked query, not camp
    at the front."""
    order = list(entrymod.queries())
    hist, hashed = _history()
    oracled = set(entrymod.oracle_sql())
    for q in order:
        if q in hist and q not in oracled:
            assert _effective_last(q, hist, hashed, oracled) == max(hist[q])


def test_new_query_lands_at_the_front():
    """A query with no CORRECTNESS history must be inside the driver's
    checked window — at the very front."""
    order = list(entrymod.queries())
    hist, _ = _history()
    for q in order:
        if q not in hist:
            assert order.index(q) < 50


def test_priority_order_is_total_and_stable():
    names = list(entrymod.queries())
    oracled = set(entrymod.oracle_sql())
    assert entrymod._priority_order(names, oracled) == entrymod._priority_order(
        names, oracled
    )
    assert sorted(entrymod._priority_order(names, oracled)) == sorted(names)


def test_bench_headline_names_are_declared_queries():
    """bench.py's HEADLINE list must reference only declared queries —
    a renamed query would otherwise silently error-isolate out of the
    round's perf record."""
    import bench

    missing = set(bench.HEADLINE) - set(entrymod.queries())
    assert not missing, f"HEADLINE names not in queries(): {sorted(missing)}"
