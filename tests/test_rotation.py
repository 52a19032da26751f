"""The driver checks only the first ~50 entries of ``queries()``, so the
ordering is a correctness-coverage policy. It is generated from the
recorded CORRECTNESS_r*.json history (never-driver-checked first, then
stalest-last-check first, then fewest-total-checks) so that no query can
be silently starved by a hand-maintained list drifting out of date."""

from __future__ import annotations

import glob
import json
import os
import re

import __spark_entry__ as entrymod

REPO = os.path.dirname(os.path.abspath(entrymod.__file__))


def _history() -> dict[str, list[int]]:
    hist: dict[str, list[int]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)\.json$", path).group(1))
        for q in json.load(open(path)):
            hist.setdefault(q, []).append(rnd)
    return hist


def test_never_checked_queries_lead_the_window():
    order = list(entrymod.queries())
    hist = _history()
    never = [q for q in order if q not in hist]
    # every never-driver-checked query sits strictly before every
    # already-checked query
    if never:
        last_never = max(order.index(q) for q in never)
        first_checked = min(order.index(q) for q in order if q in hist)
        assert last_never < first_checked


def test_stalest_checked_queries_precede_fresher_ones():
    order = list(entrymod.queries())
    hist = _history()
    checked = [q for q in order if q in hist]
    last_rounds = [max(hist[q]) for q in checked]
    assert last_rounds == sorted(last_rounds), (
        "queries last checked in an older round must come before ones "
        "checked more recently"
    )


def test_window_is_exactly_the_never_or_stalest_checked_fifty():
    """The generator's invariant (round-agnostic): the driver-checked
    window (first 50 entries) consists of the queries with the oldest
    last-check round — never-checked (last = -1) first, then stalest.
    No query outside the window may be staler than one inside it."""
    order = list(entrymod.queries())
    hist = _history()
    window, rest = order[:50], order[50:]

    def last_check(q: str) -> int:
        return max(hist[q]) if q in hist else -1

    if rest:
        assert max(last_check(q) for q in window) <= min(
            last_check(q) for q in rest
        ), "a query outside the window is staler than one inside it"


def test_new_query_lands_at_the_front():
    """A query with no CORRECTNESS history (like q71 this round) must be
    inside the driver's checked window — at the very front."""
    order = list(entrymod.queries())
    hist = _history()
    for q in order:
        if q not in hist:
            assert order.index(q) < 50


def test_priority_order_is_total_and_stable():
    names = list(entrymod.queries())
    assert entrymod._priority_order(names) == entrymod._priority_order(names)
    assert sorted(entrymod._priority_order(names)) == sorted(names)


def test_bench_headline_names_are_declared_queries():
    """bench.py's HEADLINE list must reference only declared queries —
    a renamed query would otherwise silently error-isolate out of the
    round's perf record."""
    import bench

    missing = set(bench.HEADLINE) - set(entrymod.queries())
    assert not missing, f"HEADLINE names not in queries(): {sorted(missing)}"
