"""Asserts the measured shuffle-reduction record (BENCH_PREJOIN.json,
written by scripts/bench_prejoin.py) still shows the two pre-cut
properties the scale story claims — the BENCH_DEDUP_SCALE convention:
scripts measure, tests pin the shape so a regression can't hide."""

from __future__ import annotations

import json
import os

import pytest

RECORD = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_PREJOIN.json")


@pytest.fixture(scope="module")
def record():
    if not os.path.exists(RECORD):
        pytest.skip("BENCH_PREJOIN.json not generated on this host")
    return json.load(open(RECORD))


def test_bloom_prefilter_cuts_semi_join_shuffle(record):
    sj = record["semi_join"]
    # the 64kbit filter must already beat the plain join; the sized
    # 256kbit filter must beat it further (fpp is the lever)
    assert sj["bloom_64kbit_shuffle_mb"] < sj["plain_shuffle_mb"]
    assert sj["bloom_256kbit_shuffle_mb"] < sj["bloom_64kbit_shuffle_mb"]
    # sized filter: at least 2x below the plain join's shuffle
    assert sj["bloom_256kbit_shuffle_mb"] * 2 < sj["plain_shuffle_mb"]


def test_native_window_group_limit_cuts_topk_shuffle(record):
    tk = record["topk"]
    # the native Partial cut must reduce the window shuffle by >=100x
    # on the hot-group stream (measured ~1100x)
    assert tk["native_group_limit_shuffle_mb"] * 100 < tk["disabled_shuffle_mb"]
