"""Image-hash index family (q168) — full lifecycle: probe == inline
kernel, extend == fresh build, retraction immediate, compaction ==
fresh build, re-admission upsert, streaming gate replay == batch.
Mirrors the span/near-dup index discipline (7th persisted family)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from spark_nnd_spark.operators.dedup import hash_hamming_pairs
from spark_nnd_spark.operators.multimodal import (
    build_image_index,
    compact_image_index,
    extend_image_index,
    image_query_index,
    perceptual_hash,
    retract_from_image_index,
)

# 16x16 raw uint8 payloads (the codec='raw' deterministic fake decode):
# a gradient, a near-dup of it (one corner byte perturbed), and two
# patterns far from both in aHash space.

pytestmark = pytest.mark.slow  # heavy tier: deselected from the default fast run

GRAD = bytes(i % 256 for i in range(256))
GRAD_NEAR = bytes([255]) + GRAD[1:]
CHECKER = bytes(
    (0 if ((i // 32) + (i % 16) // 2) % 2 == 0 else 255) for i in range(256)
)
STRIPES = bytes((0 if (i % 16) // 2 % 2 == 0 else 255) for i in range(256))


def _imgs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def _corpus(spark):
    return _imgs(spark, [(1, GRAD), (2, CHECKER), (3, GRAD_NEAR)])


def _batch(spark):
    return _imgs(spark, [(100, GRAD), (101, STRIPES)])


def _probe(spark, idx, batch):
    return sorted(
        tuple(r)
        for r in image_query_index(
            spark, idx, batch, max_hamming=3, id_col="doc_id"
        ).collect()
    )


def _inline_cross(spark, corpus, batch):
    """The inline twin: hash_hamming_pairs over corpus+batch, cut to
    (batch, corpus) pairs — what the probe must equal row-for-row."""
    both = corpus.unionByName(batch)
    ph = perceptual_hash(both, id_col="doc_id")
    return sorted(
        (r.id_b, r.id_a, r.hamming)
        for r in hash_hamming_pairs(
            ph, hash_col="phash", id_col="id", n_bands=4, bits=64, max_hamming=3
        ).collect()
        if r.id_b >= 100 and r.id_a < 100
    )


def test_fixture_geometry(spark):
    # the fixtures must actually probe both sides of the threshold:
    # GRAD vs GRAD_NEAR within hamming 3, the patterns far from both.
    ph = {
        r.id: r.phash
        for r in perceptual_hash(
            _imgs(
                spark,
                [(1, GRAD), (2, CHECKER), (3, GRAD_NEAR), (4, STRIPES)],
            ),
            id_col="doc_id",
        ).collect()
    }
    ham = lambda a, b: bin((ph[a] ^ ph[b]) & ((1 << 64) - 1)).count("1")  # noqa: E731
    assert ham(1, 3) <= 3
    assert ham(1, 2) > 3 and ham(1, 4) > 3 and ham(2, 4) > 3


def test_probe_matches_inline_kernel(spark, tmp_path):
    idx = str(tmp_path / "iidx")
    build_image_index(_corpus(spark), idx, id_col="doc_id")
    got = _probe(spark, idx, _batch(spark))
    inline = _inline_cross(spark, _corpus(spark), _batch(spark))
    assert got == inline
    # the exact copy and the near-dup both surface for batch 100
    assert {(b, c) for b, c, _ in got} == {(100, 1), (100, 3)}
    assert got[0][2] == 0  # (100, 1) is byte-identical => hamming 0


def test_extend_equals_fresh_build(spark, tmp_path):
    base, grown, fresh = (str(tmp_path / n) for n in ("b", "g", "f"))
    c = _corpus(spark)
    extra = _imgs(spark, [(4, STRIPES)])
    build_image_index(c, base, id_col="doc_id")
    build_image_index(c, grown, id_col="doc_id")
    extend_image_index(spark, grown, extra, id_col="doc_id")
    build_image_index(c.unionByName(extra), fresh, id_col="doc_id")
    b = _batch(spark)
    assert _probe(spark, grown, b) == _probe(spark, fresh, b)
    # batch 101 (STRIPES) now matches the admitted image 4 exactly
    assert (101, 4, 0) in _probe(spark, grown, b)
    stats = lambda p: sorted(  # noqa: E731
        tuple(r) for r in spark.read.parquet(f"{p}/band_stats").collect()
    )
    assert stats(grown) == stats(fresh)
    # layout contract survives the extend (r11 ADVICE): every bands
    # part file — including the appended batch — is sorted by band_val
    # within the file, so parquet row-group skipping keeps working
    # without waiting for a compaction
    import pathlib

    import pyarrow.parquet as pq

    for f in pathlib.Path(grown, "bands").glob("*.parquet"):
        vals = pq.read_table(f, columns=["band_val"])["band_val"].to_pylist()
        assert vals == sorted(vals), f.name


def test_retract_immediate_and_compact_equals_fresh(spark, tmp_path):
    idx, fresh = str(tmp_path / "i"), str(tmp_path / "f")
    build_image_index(_corpus(spark), idx, id_col="doc_id")
    b = _batch(spark)
    assert {r[1] for r in _probe(spark, idx, b)} == {1, 3}
    retract_from_image_index(
        spark, idx, spark.createDataFrame([(1,)], "doc_id long")
    )
    after = _probe(spark, idx, b)
    assert {r[1] for r in after} == {3}
    compact_image_index(spark, idx)
    assert _probe(spark, idx, b) == after
    build_image_index(
        _corpus(spark).filter(F.col("doc_id") != 1), fresh, id_col="doc_id"
    )
    assert _probe(spark, idx, b) == _probe(spark, fresh, b)
    rows = lambda p: sorted(  # noqa: E731
        tuple(r) for r in spark.read.parquet(f"{p}/bands").collect()
    )
    assert rows(idx) == rows(fresh)


def test_readmission_upsert(spark, tmp_path):
    idx = str(tmp_path / "i")
    build_image_index(_corpus(spark), idx, id_col="doc_id")
    retract_from_image_index(
        spark, idx, spark.createDataFrame([(3,)], "doc_id long")
    )
    b = _batch(spark)
    assert {r[1] for r in _probe(spark, idx, b)} == {1}
    # re-admit image 3 with NEW content (CHECKER): old band rows must
    # be purged and the tombstone cleared — 3 no longer matches GRAD
    # but is physically present with only the new rows
    extend_image_index(
        spark, idx, _imgs(spark, [(3, CHECKER)]), id_col="doc_id"
    )
    assert {r[1] for r in _probe(spark, idx, b)} == {1}
    rows3 = (
        spark.read.parquet(f"{idx}/bands").filter(F.col("id") == 3).collect()
    )
    assert len(rows3) == 4  # exactly one banded row set (4 bands)
    ph_checker = perceptual_hash(
        _imgs(spark, [(3, CHECKER)]), id_col="doc_id"
    ).first()["phash"]
    assert all(r.h == ph_checker for r in rows3)


def test_image_gate_stream_replay_equals_batch(spark, tmp_path):
    """Streaming image gate: exact/near copies rejected in every
    replay; verdicts == one-shot batch probe; retraction flips the
    verdict to admit."""
    import os

    import pandas as pd

    from spark_nnd_spark.streaming.streams import image_gate_stream

    idx = str(tmp_path / "iidx")
    build_image_index(_corpus(spark), idx, id_col="doc_id")
    cands = [
        (200, GRAD),       # exact copy of indexed 1, near 3
        (201, STRIPES),    # clean
        (202, GRAD_NEAR),  # exact copy of indexed 3, near 1
        (203, CHECKER),    # exact copy of indexed 2
    ]
    src = tmp_path / "cands"
    src.mkdir()
    for b in range(2):
        p = src / f"chunk{b}.parquet"
        pd.DataFrame(
            cands[2 * b : 2 * b + 2], columns=["doc_id", "payload"]
        ).to_parquet(p, index=False)
        os.utime(p, (1_700_000_000 + b, 1_700_000_000 + b))
    out = str(tmp_path / "gates")

    def run(ckpt: str):
        stream = (
            spark.readStream.schema("doc_id long, payload binary")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        image_gate_stream(
            stream, idx, out, checkpoint=str(tmp_path / ckpt), max_hamming=3
        )
        return sorted(
            tuple(r)
            for r in spark.read.parquet(out).drop("image_batch").collect()
        )

    streamed = run("ck1")
    v = {r[0]: r[4] for r in streamed}
    assert v == {200: True, 201: False, 202: True, 203: True}
    # nearest-id tie-break: batch 200 at hamming 0 from image 1
    by_id = {r[0]: r for r in streamed}
    assert by_id[200][1] == 1 and by_id[200][2] == 0
    assert by_id[201][1] == -1 and by_id[201][2] == -1
    assert run("ck2") == streamed  # replay == first run

    # retract 1 and 3: GRAD-family candidates admit immediately;
    # CHECKER still rejected via image 2
    retract_from_image_index(
        spark, idx, spark.createDataFrame([(1,), (3,)], "doc_id long")
    )
    after = run("ck3")
    assert {r[0]: r[4] for r in after} == {
        200: False, 201: False, 202: False, 203: True
    }
