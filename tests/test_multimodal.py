"""Multimodal binary-column plumbing: deterministic fake decode, batch
shapes, frame explosion, codec gating (operators/multimodal.py)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_nnd_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (0, bytes(range(256))),              # exactly one 16x16 image
        (1, b"abc"),                         # shorter than a frame -> padded
        (2, bytes([7] * 300)),               # constant -> std 0, zc 0
        (3, bytes(np.random.default_rng(1).integers(0, 256, 500, dtype=np.uint8))),
    ]
    return spark.createDataFrame(rows, "id long, payload binary")


def test_image_stats_matches_numpy(media):
    got = {r["id"]: r for r in MM.image_stats(media, height=16, width=16).collect()}
    assert set(got) == {0, 1, 2, 3}
    a = np.arange(256, dtype=np.float64)
    assert got[0]["n_bytes"] == 256
    np.testing.assert_allclose(got[0]["mean_px"], a.mean())
    np.testing.assert_allclose(got[0]["std_px"], a.std())
    # payload 1 zero-pads to 256: mean = (97+98+99)/256
    np.testing.assert_allclose(got[1]["mean_px"], (97 + 98 + 99) / 256)
    assert got[2]["std_px"] == 0.0


def test_resize_nearest_neighbor(media):
    got = {r["id"]: r for r in MM.resize_image(media, 4, 4, height=16, width=16).collect()}
    img = np.arange(256, dtype=np.uint8).reshape(16, 16)
    idx = (np.arange(4) * 16) // 4
    expect = hashlib.md5(img[np.ix_(idx, idx)].tobytes()).hexdigest()
    assert got[0]["digest"] == expect
    assert got[0]["out_h"] == 4 and got[0]["out_w"] == 4


def test_sample_frames_explodes(media):
    out = MM.sample_frames(media, frame_bytes=64, every=2).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["id"], []).append(r)
    # id 0: 256 bytes -> 4 frames -> sampled 0, 2
    assert [r["frame_idx"] for r in sorted(by_id[0], key=lambda r: r["frame_idx"])] == [0, 2]
    assert 1 not in by_id  # 3 bytes -> zero full frames -> no rows
    f0 = hashlib.md5(bytes(range(64))).hexdigest()
    assert {r["frame_idx"]: r["frame_digest"] for r in by_id[0]}[0] == f0
    # id 3: 500 bytes -> 7 full frames -> 0, 2, 4, 6
    assert sorted(r["frame_idx"] for r in by_id[3]) == [0, 2, 4, 6]


def test_audio_stats(media):
    got = {r["id"]: r for r in MM.audio_stats(media).collect()}
    s = np.frombuffer(bytes(range(256)), dtype="<i2").astype(np.float64)
    c = s - s.mean()
    np.testing.assert_allclose(got[0]["rms"], np.sqrt((c * c).mean()))
    assert got[0]["n_samples"] == 128
    assert got[2]["zero_crossings"] == 0  # constant signal never crosses
    assert got[1]["n_samples"] == 1  # 3 bytes -> one full int16 sample


def test_real_codec_gated(media):
    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow installed; gate not exercised")
    except ImportError:
        pass
    with pytest.raises(Exception) as ei:
        MM.image_stats(media, codec="real").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_determinism(media):
    a = sorted(map(tuple, MM.image_stats(media).collect()))
    b = sorted(map(tuple, MM.image_stats(media).collect()))
    assert a == b


def test_preserves_partitioning(spark):
    """Narrow op: output partition count == input partition count (no
    shuffle introduced by the mapInPandas plumbing)."""
    df = spark.createDataFrame(
        [(i, bytes([i % 256] * 100)) for i in range(64)], "id long, payload binary"
    ).repartition(8)
    out = MM.image_stats(df)
    assert out.rdd.getNumPartitions() == 8
    assert out.count() == 64


def test_perceptual_hash_matches_python_and_flags_neardups(spark):
    """aHash kernel: equals a plain-python reimplementation, identical
    payloads collide, and a payload differing only in one low-contrast
    byte still collides (the perceptual property), while a structurally
    different payload does not."""
    import numpy as np

    base = bytes(range(200)) + b"\x00" * 56
    tweaked = bytearray(base)
    tweaked[10] = tweaked[10] + 1  # sub-threshold luminance nudge
    other = bytes(reversed(base))
    df = spark.createDataFrame(
        [(1, base), (2, bytes(tweaked)), (3, other), (4, base)],
        "id long, payload binary",
    )
    got = {r["id"]: r["phash"] for r in MM.perceptual_hash(df).collect()}

    def ahash(payload: bytes) -> int:
        arr = np.frombuffer(payload[:256].ljust(256, b"\x00"), np.uint8)
        g = arr.reshape(8, 2, 8, 2).mean(axis=(1, 3)).ravel()
        bits = g > g.mean()
        h = 0
        for b in bits:
            h = (h << 1) | int(b)
        return h - (1 << 64) if h >= (1 << 63) else h

    for i, p in [(1, base), (2, bytes(tweaked)), (3, other), (4, base)]:
        assert got[i] == ahash(p), i
    assert got[1] == got[4] == got[2]  # identical + near-identical collide
    assert got[1] != got[3]
