"""Multimodal (image/audio/video) columns as opaque BINARY payloads.

Extension layer (no counterpart in the reference — it is a single-purpose
K-NNG library, SURVEY.md §2.3); this is the training-data-pipeline
surface: media riding in DataFrames as ``BINARY`` payload columns with
typed metadata, processed by Arrow-batched ``mapInPandas`` kernels.

Container reality: no image/audio codec libraries are installed, so the
*format* decode step is stubbed exactly as the build brief requires —
``codec="raw"`` is a deterministic fake decoder (bytes → fixed-shape
uint8 tensor, zero-padded/truncated), while ``codec="real"`` raises
``NotImplementedError`` unless Pillow is importable. Everything around
the decode — schemas, mapInPandas batch iteration, frame explosion,
output columns — is real, tested, and scale-shaped:

- kernels stream Arrow batches (no per-row Python), stay O(batch) in
  memory, and preserve the input partitioning (no shuffle is introduced
  by any operator here — narrow transformations only);
- frame sampling explodes one row per sampled frame, the standard
  pre-shuffle layout for per-frame feature extraction downstream;
- payload bytes never enter a groupBy key — ids and digests do.

Determinism: raw-codec outputs are pure functions of the payload bytes,
so the DuckDB oracle can reproduce them with byte/codepoint arithmetic
(the test corpus is ASCII, so UTF-8 bytes == codepoints).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

IMAGE_STATS_SCHEMA = "id long, n_bytes int, mean_px double, std_px double"
RESIZE_SCHEMA = "id long, out_h int, out_w int, digest string"
FRAME_SCHEMA = "id long, frame_idx int, frame_digest string"
AUDIO_STATS_SCHEMA = "id long, n_samples int, rms double, zero_crossings int"


def _pil_or_none():
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def _decode_raw(payload: bytes, n: int) -> np.ndarray:
    """Deterministic fake decode: first ``n`` payload bytes as a uint8
    tensor, zero-padded. Stands in for a codec while keeping every
    downstream shape/dtype contract identical to a real decode."""
    arr = np.frombuffer(payload[:n], dtype=np.uint8)
    if len(arr) < n:
        arr = np.concatenate([arr, np.zeros(n - len(arr), np.uint8)])
    return arr


def _decode(payload: bytes, n: int, codec: str) -> np.ndarray:
    if codec == "raw":
        return _decode_raw(payload, n)
    if codec == "real":
        if _pil_or_none() is None:
            raise NotImplementedError(
                "codec='real' needs Pillow, which is not installed in this "
                "container; use codec='raw' (deterministic fake decode)"
            )
        import io  # noqa: PLC0415

        img = _pil_or_none().open(io.BytesIO(payload)).convert("L")
        return np.asarray(img, dtype=np.uint8).ravel()[:n]
    raise ValueError(f"unknown codec {codec!r}")


def image_stats(
    df: DataFrame,
    id_col: str = "id",
    payload_col: str = "payload",
    height: int = 16,
    width: int = 16,
    channels: int = 1,
    codec: str = "raw",
) -> DataFrame:
    """Per-image pixel statistics: decode payload to (height, width,
    channels) and emit mean/population-std over all pixels.

    Returns (id, n_bytes, mean_px, std_px)."""
    n = height * width * channels

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            a = np.stack([_decode(p, n, codec) for p in pdf[payload_col]]).astype(
                np.float64
            )
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(np.int64),
                    "n_bytes": pdf[payload_col].map(len).astype(np.int32),
                    "mean_px": a.mean(axis=1),
                    "std_px": a.std(axis=1),
                }
            )

    return df.mapInPandas(run, IMAGE_STATS_SCHEMA)


def resize_image(
    df: DataFrame,
    out_h: int,
    out_w: int,
    id_col: str = "id",
    payload_col: str = "payload",
    height: int = 16,
    width: int = 16,
    codec: str = "raw",
) -> DataFrame:
    """Nearest-neighbor resize of the decoded (height, width) image to
    (out_h, out_w); emits an md5 digest of the resized pixels (payload
    bytes stay out of driver-facing results by design).

    Returns (id, out_h, out_w, digest)."""
    n = height * width
    ri = (np.arange(out_h) * height) // out_h
    ci = (np.arange(out_w) * width) // out_w

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            digests = []
            for p in pdf[payload_col]:
                img = _decode(p, n, codec).reshape(height, width)
                small = img[np.ix_(ri, ci)]
                digests.append(hashlib.md5(small.tobytes()).hexdigest())
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(np.int64),
                    "out_h": np.full(len(pdf), out_h, np.int32),
                    "out_w": np.full(len(pdf), out_w, np.int32),
                    "digest": digests,
                }
            )

    return df.mapInPandas(run, RESIZE_SCHEMA)


def sample_frames(
    df: DataFrame,
    frame_bytes: int = 64,
    every: int = 4,
    id_col: str = "id",
    payload_col: str = "payload",
) -> DataFrame:
    """Treat the payload as a fixed-frame-size video track and emit one
    row per sampled frame (every ``every``-th full frame): the standard
    1→many explode that feeds per-frame feature extraction.

    Returns (id, frame_idx, frame_digest) — md5 of the frame's bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, digs = [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                n_frames = len(p) // frame_bytes
                for f in range(0, n_frames, every):
                    ids.append(int(i))
                    idxs.append(f)
                    digs.append(
                        hashlib.md5(
                            p[f * frame_bytes : (f + 1) * frame_bytes]
                        ).hexdigest()
                    )
            if ids:
                yield pd.DataFrame(
                    {
                        "id": np.array(ids, np.int64),
                        "frame_idx": np.array(idxs, np.int32),
                        "frame_digest": digs,
                    }
                )

    return df.mapInPandas(run, FRAME_SCHEMA)


def audio_stats(
    df: DataFrame,
    id_col: str = "id",
    payload_col: str = "payload",
) -> DataFrame:
    """Treat the payload as little-endian int16 PCM: RMS and
    zero-crossing count after DC-offset removal (mean-centering).

    Returns (id, n_samples, rms, zero_crossings)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ns, rms, zc = [], [], []
            for p in pdf[payload_col]:
                s = np.frombuffer(p[: (len(p) // 2) * 2], dtype="<i2").astype(
                    np.float64
                )
                ns.append(len(s))
                if len(s) == 0:
                    rms.append(0.0)
                    zc.append(0)
                    continue
                c = s - s.mean()
                rms.append(float(np.sqrt((c * c).mean())))
                zc.append(int(np.count_nonzero(c[:-1] * c[1:] < 0)))
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(np.int64),
                    "n_samples": np.array(ns, np.int32),
                    "rms": rms,
                    "zero_crossings": np.array(zc, np.int32),
                }
            )

    return df.mapInPandas(run, AUDIO_STATS_SCHEMA)


PHASH_SCHEMA = "id long, phash long"


def perceptual_hash(
    df: DataFrame,
    id_col: str = "id",
    payload_col: str = "payload",
    height: int = 16,
    width: int = 16,
    block: int = 2,
    codec: str = "raw",
) -> DataFrame:
    """Average-hash (aHash) perceptual fingerprint per image: decode to
    (height, width), mean-pool block×block cells to a coarse grid,
    threshold every cell against the grid's mean (strict >), and pack
    the bits row-major MSB-first into one signed int64 — the standard
    cheap perceptual-dedup key (identical hash ⇒ visually near-identical
    image under the pooled-luminance model).

    All arithmetic is exact in float64 (uint8 sums → quarter-integers,
    means divide by powers of two), so the bit pattern — and therefore
    the hash — replays bit-for-bit in any engine (DuckDB oracle: q100).
    Same scale shape as the other kernels here: Arrow-batched
    mapInPandas, narrow, no shuffle; the grouping downstream keys on
    the int64, never the payload.
    """
    n = height * width
    gh, gw = height // block, width // block
    n_bits = gh * gw
    if n_bits != 64:
        raise ValueError(f"aHash packs 64 bits; got {gh}x{gw} grid")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = (1 << np.arange(n_bits - 1, -1, -1, dtype=np.uint64)).astype(
            np.uint64
        )
        for pdf in batches:
            if len(pdf) == 0:
                continue
            a = np.stack([_decode(p, n, codec) for p in pdf[payload_col]]).astype(
                np.float64
            )
            g = a.reshape(-1, gh, block, gw, block).mean(axis=(2, 4)).reshape(
                len(pdf), n_bits
            )
            m = g.mean(axis=1, keepdims=True)
            bits = (g > m).astype(np.uint64)
            h = (bits * weights).sum(axis=1, dtype=np.uint64).view(np.int64)
            yield pd.DataFrame(
                {"id": pdf[id_col].to_numpy(np.int64), "phash": h}
            )

    return df.mapInPandas(run, PHASH_SCHEMA)


# ------------------------------------------- persisted image-hash index

def _image_tables(spark, path: str):
    # physical layout the probe depends on: band_val-partitioned +
    # band_val-sorted for parquet row-group min/max skipping
    return [("bands", "id", None, ("band_val", ["band_val"]))]


def build_image_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "id",
    payload_col: str = "payload",
    height: int = 16,
    width: int = 16,
    block: int = 2,
    codec: str = "raw",
    n_bands: int = 4,
    bits: int = 64,
) -> None:
    """Persist a perceptual-hash (aHash) index over an image corpus —
    the SEVENTH persisted index family (after near-dup LSH, BM25 text,
    MRL prefix, IVF-PQ, binary bits, span grams), closing the modality
    gap: an ingest pipeline with image columns gets the same
    index-served dedup path text and vectors already have, same
    lifecycle discipline (build → probe → extend → retract → compact,
    shared kernel in operators/index_lifecycle.py).

    Layout under ``path``:
    - ``meta``       — 1 row (height, width, block, codec, n_bands,
      bits): probe hashes MUST be computed with the stored params, so
      they are recorded, never trusted to the caller.
    - ``bands``      — (id, h, band, band_val): the banded pigeonhole
      rows (operators/dedup.hash_band_rows — byte-identical banding to
      the inline hash_hamming_pairs plan), carrying the full hash so
      the probe verifies hamming without a second join.
      Repartitioned+sorted by band_val for row-group skipping.
    - ``band_stats`` — (band, band_val, bf): per-bucket DISTINCT-id
      frequency, so the probe-time hot-bucket cap reads O(buckets)
      stats instead of recomputing a corpus aggregate per batch
      (count_distinct ⇒ a retried extend cannot inflate it).

    Build cost: one narrow Arrow hash kernel pass + one exchange on
    band_val — payload bytes never shuffle (the hash is 8 bytes)."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    from spark_nnd_spark.operators.dedup import hash_band_rows  # noqa: PLC0415

    spark = corpus.sparkSession
    spark.createDataFrame(
        [(height, width, block, codec, n_bands, bits)],
        "height int, width int, block int, codec string, "
        "n_bands int, bits int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")
    hashes = perceptual_hash(
        corpus,
        id_col=id_col,
        payload_col=payload_col,
        height=height,
        width=width,
        block=block,
        codec=codec,
    )
    bands = hash_band_rows(
        hashes, hash_col="phash", id_col="id", n_bands=n_bands, bits=bits
    )
    bands.repartition("band_val").sortWithinPartitions("band_val").write.mode(
        "overwrite"
    ).parquet(f"{path}/bands")
    spark.read.parquet(f"{path}/bands").groupBy("band", "band_val").agg(
        F.count_distinct("id").alias("bf")
    ).write.mode("overwrite").parquet(f"{path}/band_stats")


def image_query_index(
    spark,
    path: str,
    batch: DataFrame,
    max_hamming: int = 3,
    max_band_freq: int | None = None,
    id_col: str = "id",
    payload_col: str = "payload",
) -> DataFrame:
    """Perceptual near-dup probe of an image batch against the
    PERSISTED index: (batch_id, index_id, hamming) for every stored
    image within ``max_hamming`` of a batch image — the inline
    hash_hamming_pairs verdicts with the corpus side read from
    storage. Pigeonhole-exact for max_hamming <= n_bands - 1, exactly
    like the inline plan, so probe==inline is assertable row-for-row.

    Parity: probe hashes use the params recorded in meta; a batch
    image also present in the index does not match itself (id
    inequality); retracted images stop matching immediately
    (tombstone anti-join). ``max_band_freq`` caps hot buckets by the
    STORED distinct-id frequency (band_stats) — O(buckets) stats, no
    corpus rescan. Candidate pairs are distinct'd before verification,
    so duplicated band rows from a retried extend cannot duplicate or
    corrupt verdicts (the span-index retry-safety argument).

    Scale: the batch side broadcasts (ingest micro-batches are small
    by contract — the span/decontam probe discipline): the stored
    bands stream through the join with ZERO shuffle, so probe shuffle
    is O(matches), independent of corpus size."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    from spark_nnd_spark.operators import index_lifecycle as IL  # noqa: PLC0415
    from spark_nnd_spark.operators.dedup import hash_band_rows  # noqa: PLC0415

    meta = spark.read.parquet(f"{path}/meta").first()
    qh = perceptual_hash(
        batch,
        id_col=id_col,
        payload_col=payload_col,
        height=meta["height"],
        width=meta["width"],
        block=meta["block"],
        codec=meta["codec"],
    )
    qb = hash_band_rows(
        qh, hash_col="phash", id_col="id",
        n_bands=meta["n_bands"], bits=meta["bits"],
    ).select(
        F.col("id").alias("batch_id"),
        F.col("h").alias("h_q"),
        "band",
        "band_val",
    ).localCheckpoint(eager=True)
    cb = IL.anti_tombstones(
        spark.read.parquet(f"{path}/bands"), IL.read_tombstones(spark, path), "id"
    ).select(
        F.col("id").alias("index_id"), F.col("h").alias("h_c"), "band", "band_val"
    )
    if max_band_freq is not None:
        hot = (
            spark.read.parquet(f"{path}/band_stats")
            .filter(F.col("bf") > max_band_freq)
            .select("band", "band_val")
        )
        qb = qb.join(F.broadcast(hot), ["band", "band_val"], "left_anti")
    cand = (
        cb.join(F.broadcast(qb), ["band", "band_val"])
        .filter(F.col("index_id") != F.col("batch_id"))
        .select("batch_id", "index_id", "h_q", "h_c")
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("h_q").bitwiseXOR(F.col("h_c")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("batch_id", "index_id", "hamming")
    )


def extend_image_index(
    spark,
    path: str,
    new_images: DataFrame,
    id_col: str = "id",
    payload_col: str = "payload",
) -> None:
    """Admit a batch into the image index: re-admission upsert (shared
    kernel), append the batch's banded hash rows, refresh band_stats
    (count_distinct over bands — an O(index) integer scan a retried
    extension cannot double-count)."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    from spark_nnd_spark.operators import index_lifecycle as IL  # noqa: PLC0415
    from spark_nnd_spark.operators.dedup import hash_band_rows  # noqa: PLC0415

    meta = spark.read.parquet(f"{path}/meta").first()
    IL.settle_upsert(
        spark, path, new_images.select(id_col), _image_tables(spark, path)
    )
    hashes = perceptual_hash(
        new_images,
        id_col=id_col,
        payload_col=payload_col,
        height=meta["height"],
        width=meta["width"],
        block=meta["block"],
        codec=meta["codec"],
    )
    # The appended batch keeps the build-time layout contract
    # (repartition+sort by band_val → parquet row-group skipping on
    # probes); without it, probes over extended indexes scan every
    # appended row-group until a compaction rewrites the layout.
    hash_band_rows(
        hashes, hash_col="phash", id_col="id",
        n_bands=meta["n_bands"], bits=meta["bits"],
    ).repartition("band_val").sortWithinPartitions("band_val").write.mode(
        "append"
    ).parquet(f"{path}/bands")
    spark.read.parquet(f"{path}/bands").groupBy("band", "band_val").agg(
        F.count_distinct("id").alias("bf")
    ).write.mode("overwrite").parquet(f"{path}/band_stats")


def retract_from_image_index(spark, path: str, ids: DataFrame) -> None:
    """O(retracted) tombstone append; the probe anti-joins it, so a
    retracted image stops matching immediately (the shared lifecycle
    contract). band_stats keeps pre-retraction counts until compaction
    — the hot-bucket cap may over-cut, never under-cut, while
    tombstoned."""
    from spark_nnd_spark.operators import index_lifecycle as IL  # noqa: PLC0415

    IL.append_tombstones(spark, path, ids)


def compact_image_index(spark, path: str) -> None:
    """Fold the tombstone log into bands (layout-preserving rewrite),
    rebuild band_stats, drop the log last — byte-equivalent to a fresh
    build over the surviving corpus (asserted in tests)."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    from spark_nnd_spark.operators import index_lifecycle as IL  # noqa: PLC0415

    if not IL.compact(spark, path, _image_tables(spark, path)):
        return
    spark.read.parquet(f"{path}/bands").groupBy("band", "band_val").agg(
        F.count_distinct("id").alias("bf")
    ).write.mode("overwrite").parquet(f"{path}/band_stats")
