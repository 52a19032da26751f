"""Cardinality sketches: KMV (k-minimum-values) distinct counting.

Extension layer (the reference has none of this — SURVEY.md §2.3).
The standard approximate-distinct tool at 100 TB is a mergeable sketch:
per-partition partials of bounded size, an associative merge, and an
estimate read off the merged state — never a full distinct shuffle.

KMV (Bar-Yossef et al. 2002): hash every value into [0, P); keep the k
smallest DISTINCT hashes; estimate |set| ≈ (k−1)·P / h_(k) where h_(k)
is the k-th smallest kept hash (exact count when fewer than k hashes
exist). The merge is trivially associative — the global k-min set is
contained in the union of per-partition k-min sets — which is what
makes it a sketch rather than a sample.

KMV over the repo's PORTABLE polynomial hash (functions/text.py) is
chosen over HyperLogLog deliberately: Spark's HLL++ registers are not
bit-compatible with any other engine's, so an HLL query can never be
DuckDB-oracle-checked, while KMV's kept hashes — and therefore the
estimate — replay bit-for-bit in SQL (q109).

Scale shape: the partial pass is a narrow Arrow-batched mapInPandas
keeping O(groups·k) state per partition; the only shuffle carries the
partial k-min rows, O(partitions·groups·k) — independent of corpus
size. Compare the exact distinct count, whose shuffle is O(distinct
values): the sketch is the 100 TB path, the exact count exists here as
the calibration column (the q33/q64 convention).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spark_nnd_spark.functions.text import P

_PARTIAL_SCHEMA = "grp string, h long"

# Knuth's multiplicative constant. P is prime and KMV_MIX < P is not a
# multiple, so h -> (h * KMV_MIX) % P is a BIJECTION mod P: distinctness
# is preserved exactly while the low-clustered polynomial token hashes
# (short tokens hash to small ints) are spread across [0, P) — the
# uniformity the KMV estimator requires. Max product ~2.65e18 < int64.
KMV_MIX = 2654435761


def kmv_mix_expr(h: Column) -> Column:
    return (h * F.lit(KMV_MIX)) % F.lit(P)


def kmv_mix_sql(h: str) -> str:
    return f"(({h}) * {KMV_MIX}) % {P}"


def _kmv_partials_kernel(k: int):
    """Per-partition KMV partials: for every group seen in this
    partition, the k smallest distinct hashes — O(groups·k) memory,
    one pass, no sort of the full stream (np.unique sorts only the
    bounded carry + one Arrow batch's group slice at a time)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        best: dict[object, np.ndarray] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # dropna=False: a null group key is a group like any other
            # (Spark-side exact counts keep it; silently dropping it
            # here would make the sketch asymmetric for generic callers)
            for grp, slice_ in pdf.groupby("grp", sort=False, dropna=False):
                hs = np.unique(slice_["h"].to_numpy(np.int64))
                cur = best.get(grp)
                merged = hs if cur is None else np.unique(np.concatenate([cur, hs]))
                best[grp] = merged[:k]
        if best:
            yield pd.DataFrame(
                {
                    "grp": np.repeat(
                        np.array(list(best.keys()), dtype=object),
                        [len(v) for v in best.values()],
                    ),
                    "h": np.concatenate(list(best.values())),
                }
            )

    return run


def kmv_group_minhashes(
    df: DataFrame,
    group_col: str,
    hash_expr: Column,
    k: int = 64,
) -> DataFrame:
    """(grp, h, rn): the merged k-minimum-value set per group — the
    reusable KMV sketch STATE. ``kmv_distinct`` reads its cardinality
    aggregate off it; the set-algebra estimators (``kmv_pair_jaccard``)
    consume it directly. Per-partition partials are O(groups·k), the
    merge is the k smallest distinct across partials (the global k-min
    set is inside the union of partial k-min sets)."""
    hashed = df.select(
        F.col(group_col).cast("string").alias("grp"), hash_expr.alias("h")
    )
    partials = hashed.mapInPandas(_kmv_partials_kernel(k), _PARTIAL_SCHEMA)
    w = Window.partitionBy("grp").orderBy("h")
    return (
        partials.distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )


def kmv_pair_jaccard(mins: DataFrame, k: int = 64) -> DataFrame:
    """KMV set algebra: for every pair of groups in a ``(grp, h)``
    k-min sketch table (``kmv_group_minhashes``), the Jaccard estimate

        J_est = |{h in U_k : h in S_a AND h in S_b}| / |U_k|

    where U_k is the k smallest hashes of S_a ∪ S_b — the standard
    KMV resemblance estimator (Beyer et al. 2007). Returns
    (grp_a, grp_b, n_union_kept, n_both, jaccard_est).

    Scale (100 TB): this is the profile-store pattern — the corpus is
    reduced ONCE to O(groups·k) sketch rows; every pairwise question
    after that is algebra over sketches, never a second corpus scan.
    The group cross join is O(groups²) over a table of distinct group
    ids (broadcast side), and the union-rank window shuffles
    O(groups²·k) rows total.
    """
    g = mins.select("grp").distinct()
    pr = (
        g.select(F.col("grp").alias("grp_a"))
        .crossJoin(F.broadcast(g.select(F.col("grp").alias("grp_b"))))
        .filter(F.col("grp_a") < F.col("grp_b"))
    )
    sa = mins.select(F.col("grp").alias("grp_a"), "h")
    sb = mins.select(F.col("grp").alias("grp_b"), "h")
    ua = pr.join(sa, "grp_a").select(
        "grp_a", "grp_b", "h", F.lit(True).alias("a"), F.lit(False).alias("b")
    )
    ub = pr.join(sb, "grp_b").select(
        "grp_a", "grp_b", "h", F.lit(False).alias("a"), F.lit(True).alias("b")
    )
    u = (
        ua.unionByName(ub)
        .groupBy("grp_a", "grp_b", "h")
        .agg(F.max("a").alias("in_a"), F.max("b").alias("in_b"))
    )
    w = Window.partitionBy("grp_a", "grp_b").orderBy("h")
    kept = u.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    return kept.groupBy("grp_a", "grp_b").agg(
        F.count("*").alias("n_union_kept"),
        F.count_if(F.col("in_a") & F.col("in_b")).alias("n_both"),
        F.round(
            F.count_if(F.col("in_a") & F.col("in_b")).cast("double")
            / F.count("*"),
            6,
        ).alias("jaccard_est"),
    )


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    hash_expr: Column,
    k: int = 64,
) -> DataFrame:
    """Per-group KMV distinct-count estimate over ``hash_expr`` values
    (hashes must be uniform in [0, P) — use the portable text hashes).

    Returns (group, n_kept, kth_hash, kmv_estimate): n_kept < k means
    the group had fewer than k distinct hashes and the estimate is the
    exact count; kth_hash is null in that case. Deterministic — the
    same rows replay in any engine that computes the same hashes.
    """
    merged = kmv_group_minhashes(df, group_col, hash_expr, k)
    agg = merged.groupBy("grp").agg(
        F.count("*").alias("n_kept"),
        F.max(F.when(F.col("rn") == k, F.col("h"))).alias("kth_hash"),
    )
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(F.lit(float(k - 1)) * F.lit(float(P)) / F.col("kth_hash"))
    return agg.select(
        F.col("grp").alias(group_col),
        "n_kept",
        "kth_hash",
        est.alias("kmv_estimate"),
    )


# ----------------------------------------------------- bloom pre-join

BLOOM_SEED2 = 0x9E3779B9  # second-hash salt (golden-ratio constant)


def bloom_build(keys_df: DataFrame, key_col: str, m_bits: int = 1 << 14) -> list[int]:
    """Build an m-bit / 2-hash Bloom filter over the DISTINCT values of
    ``key_col``, returned as ``m_bits/64`` packed int64 words.

    Distributed build: each key explodes to its two bit positions, a
    word-indexed ``bit_or`` aggregate folds them map-side, and only the
    O(m_bits/64) word rows ever reach the driver — the key set itself
    is never collected (the O(centroids)-style bounded collect). Runs a
    job at call time, like the eager-checkpoint sites.

    Hashing uses Spark's xxhash64 with two salts. Unlike the md5
    samplers this does NOT need an engine-portable hash: the filter
    only PRE-FILTERS — false positives are removed by the exact join
    that follows — so results (and the DuckDB oracle) are independent
    of the hash choice.
    """
    assert m_bits % 64 == 0
    k = F.col(key_col)
    pos = F.explode(
        F.array(
            F.pmod(F.xxhash64(k), F.lit(m_bits)),
            F.pmod(F.xxhash64(k, F.lit(BLOOM_SEED2)), F.lit(m_bits)),
        )
    ).alias("pos")
    words = (
        keys_df.select(k).distinct()
        .select(pos)
        .select(
            (F.col("pos") / 64).cast("long").alias("w"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), F.pmod(F.col("pos"), F.lit(64)).cast("int")
            ).alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("word"))
        .collect()
    )
    out = [0] * (m_bits // 64)
    for r in words:
        out[r["w"]] = r["word"]
    return out


def bloom_might_contain_expr(col: Column | str, words: list[int], m_bits: int) -> Column:
    """``might_contain`` probe as a pure JVM expression over the word
    array literal: both hash bits must be set. No false negatives."""
    c = F.col(col) if isinstance(col, str) else col
    arr = F.array(*[F.lit(w) for w in words])

    def bit_set(pos: Column) -> Column:
        word = F.element_at(arr, (pos / 64).cast("int") + 1)
        bits = F.pmod(pos, F.lit(64)).cast("int")
        return F.call_function("shiftright", word, bits).bitwiseAND(1) == 1

    p1 = F.pmod(F.xxhash64(c), F.lit(m_bits))
    p2 = F.pmod(F.xxhash64(c, F.lit(BLOOM_SEED2)), F.lit(m_bits))
    return bit_set(p1) & bit_set(p2)


def bloom_might_contain_pandas(spark, col: Column | str, words: list[int], m_bits: int) -> Column:
    """``might_contain`` probe for LARGE filters: the word array ships
    once per executor as a real Spark broadcast and the bit test runs
    as a vectorized Arrow-batched Pandas UDF over numpy — the path the
    literal-array expression form (bloom_might_contain_expr) cannot
    take past m_bits ≈ 2^20, where its m/64 literal expression tree
    becomes impractical to ship per task and compile.

    Bit-identical to the expression form (asserted in tests): the two
    positions are still computed JVM-side with the SAME salted
    xxhash64 expressions as ``bloom_build``, so the filters agree
    bit-for-bit regardless of which probe executes them; only the
    array indexing crosses into Python, amortized over Arrow batches.
    """
    c = F.col(col) if isinstance(col, str) else col
    bc = spark.sparkContext.broadcast(np.array(words, dtype=np.int64))

    @F.pandas_udf(T.BooleanType())
    def probe(p1: pd.Series, p2: pd.Series) -> pd.Series:
        w = bc.value
        a1 = p1.to_numpy(np.int64)
        a2 = p2.to_numpy(np.int64)
        hit1 = (w[a1 // 64] >> (a1 % 64)) & 1
        hit2 = (w[a2 // 64] >> (a2 % 64)) & 1
        return pd.Series((hit1 & hit2).astype(bool))

    p1 = F.pmod(F.xxhash64(c), F.lit(m_bits))
    p2 = F.pmod(F.xxhash64(c, F.lit(BLOOM_SEED2)), F.lit(m_bits))
    return probe(p1, p2)


def bloom_semi_join(
    big: DataFrame,
    keys_df: DataFrame,
    big_key: str,
    keys_key: str | None = None,
    m_bits: int = 1 << 14,
    broadcast_probe: bool = False,
) -> DataFrame:
    """Semi-join ``big`` to ``keys_df`` with an explicit Bloom
    pre-filter on the big side: rows failing ``might_contain`` are
    dropped BEFORE the join's exchange, so the shuffle carries only
    (true matches + the filter's false-positive mass) instead of the
    whole stream — the manual form of runtime row-level filtering for
    plans the optimizer's own bloom injection misses (non-equi-visible
    keys, pre-aggregated inputs, reused filters across queries).

    The exact left-semi join afterwards removes false positives, so
    the RESULT equals a plain semi join (that is the oracle) — only
    the shuffle volume changes. m_bits sizes the false-positive rate:
    with 2 hashes, fpp ≈ (1 − e^{−2n/m})², e.g. n=8k keys, m=16k bits
    → ~40%; m=128k bits → ~1.5%. Size m to the key cardinality
    (KMV-estimated, kmv_distinct).

    Probe-side representation: the default ``bloom_might_contain_expr``
    embeds the words as an m_bits/64-element LITERAL array expression —
    pure codegen, practical up to m on the order of 2^20 bits (~16k
    literals). ``broadcast_probe=True`` switches to
    ``bloom_might_contain_pandas`` — the words ship once per executor
    as a real Spark broadcast and the bit test runs vectorized over
    Arrow batches — for the hundreds-of-millions-of-keys regime where
    the literal tree is impractical. Both probes hash JVM-side with
    the build's exact salted xxhash64, so they are bit-identical
    (asserted in tests); the build side already scales, since only
    O(m_bits/64) word rows ever reach the driver.
    """
    keys_key = keys_key or big_key
    words = bloom_build(keys_df, keys_key, m_bits)
    might = (
        bloom_might_contain_pandas(big.sparkSession, big_key, words, m_bits)
        if broadcast_probe
        else bloom_might_contain_expr(big_key, words, m_bits)
    )
    pre = big.filter(might)
    return pre.join(
        keys_df.select(F.col(keys_key).alias(big_key)).distinct(),
        big_key,
        "left_semi",
    )


# ------------------------------------------------ count-min sketch

CMS_DEPTH = 4
CMS_WIDTH = 1024
# per-row salts: distinct odd constants; (h + salt) * KMV_MIX stays a
# bijection mod P per row, so rows are differently-mixed uniform hashes
CMS_SALTS = tuple(1 + 2 * i * 40503 for i in range(CMS_DEPTH))


def cms_col_expr(h: Column, row: int) -> Column:
    """Column index of a pre-hashed value in sketch row ``row``."""
    return ((h + F.lit(CMS_SALTS[row])) * F.lit(KMV_MIX)) % F.lit(P) % F.lit(CMS_WIDTH)


def cms_col_sql(h: str, row: int) -> str:
    return f"((({h}) + {CMS_SALTS[row]}) * {KMV_MIX}) % {P} % {CMS_WIDTH}"


def cms_sketch(df: DataFrame, hash_col: Column | str) -> DataFrame:
    """Count-min sketch over a pre-hashed value stream: a bounded
    (row, col) -> count table of at most CMS_DEPTH·CMS_WIDTH cells.

    Scale shape: each value expands to CMS_DEPTH (row, col) cells
    map-side, the partial aggregate folds them before the shuffle, so
    the exchange carries O(DEPTH·WIDTH) partials per task — independent
    of stream length, the same mergeability story as the KMV sketch
    (two sketches merge by cell-wise addition). Point estimates read
    ``min`` over the value's DEPTH cells and can only OVER-estimate
    (collisions add, never subtract) — the property tests pin it.
    Portable polynomial hashing keeps every cell, and therefore every
    estimate, DuckDB-replayable — the sketch itself is the oracle
    surface, not just its answers."""
    h = F.col(hash_col) if isinstance(hash_col, str) else hash_col
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row"), cms_col_expr(h, i).alias("col")
                )
                for i in range(CMS_DEPTH)
            ]
        )
    ).alias("cell")
    return (
        df.select(cells)
        .select("cell.row", "cell.col")
        .groupBy("row", "col")
        .agg(F.count("*").alias("n"))
    )


def cms_estimate(sketch: DataFrame, keys: DataFrame, hash_col: str) -> DataFrame:
    """Point-estimate each key's count from a cms_sketch table: min of
    its CMS_DEPTH cells. ``keys`` is small (the probe set) and fans out
    ×DEPTH before a broadcast-friendly join on (row, col)."""
    probes = keys.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        cms_col_expr(F.col(hash_col), i).alias("col"),
                    )
                    for i in range(CMS_DEPTH)
                ]
            )
        ).alias("cell"),
    ).select("*", "cell.row", "cell.col").drop("cell")
    key_cols = [c for c in keys.columns]
    return (
        probes.join(sketch, ["row", "col"])
        .groupBy(*key_cols)
        .agg(F.min("n").alias("cms_n"))
    )


# -------------------------------------- fixed-boundary histogram sketch

def hist_bin_expr(v: Column | str, lo: float, width: float, n_bins: int) -> Column:
    """Bin index of a value in a fixed-boundary histogram: values below
    ``lo`` clamp to bin 0, values past the last edge clamp to the top
    bin. Pure double arithmetic (floor of a double division), so the
    binning replays bit-for-bit in any engine — the portability
    property the KMV/CMS hashes establish for this module."""
    c = F.col(v) if isinstance(v, str) else v
    b = F.floor((c.cast("double") - F.lit(float(lo))) / F.lit(float(width))).cast(
        "long"
    )
    return F.least(F.greatest(b, F.lit(0)), F.lit(n_bins - 1))


def hist_bin_sql(v: str, lo: float, width: float, n_bins: int) -> str:
    """DuckDB mirror of ``hist_bin_expr`` — every numeric literal cast
    to DOUBLE because DuckDB parses ``8.0`` as DECIMAL, and exact
    decimal arithmetic would diverge from Spark's IEEE doubles."""
    return (
        f"LEAST(GREATEST(CAST(FLOOR((CAST({v} AS DOUBLE) - CAST({lo} AS DOUBLE))"
        f" / CAST({width} AS DOUBLE)) AS BIGINT), 0), {n_bins - 1})"
    )


def fixed_histogram(
    df: DataFrame,
    group_col: str,
    value_col: Column | str,
    lo: float,
    width: float,
    n_bins: int,
) -> DataFrame:
    """Per-group fixed-boundary histogram: (grp, bin, cnt), only
    occupied bins. THE mergeable quantile sketch for 100 TB streams:
    per-partition state is O(groups·n_bins) counts folded map-side
    (plain partial aggregation — Catalyst's hash aggregate IS the
    sketch merge), the exchange carries O(partitions·groups·n_bins)
    partials independent of row count, and two histograms merge by
    cell-wise addition — the same mergeability story as KMV and CMS.
    Compare the exact percentile, which must SORT each group (q38):
    that is the calibration tier, this is the scale tier.

    Why fixed boundaries and not a rank-based sketch (KLL, t-digest)?
    A rank sketch's selling point is prior-free operation on UNKNOWN,
    unbounded, or heavy-tailed domains — it pays for that with
    probabilistic rank error (ε·n w.h.p., not a hard bound), state
    whose merge is custom code (a UDAF or approx_percentile, which
    Spark exposes only as an opaque aggregate), and — decisively for
    this repo — no cross-engine replay: KLL's compactions are
    randomized and t-digest's centroid placement is
    implementation-defined, so no DuckDB oracle can hash-check them
    (the KMV-over-HLL argument, module header). The distributions
    this engine sketches (token counts, doc lengths, scores in
    [0, 1], event values with schema-known caps) have KNOWN bounded
    domains, so the lo/width prior is free — and when it isn't, one
    narrow min/max pre-pass (no shuffle, no sort) buys it, which is
    cheaper than carrying a rank sketch through every merge. In
    exchange, fixed bins give a DETERMINISTIC |est − exact| ≤ width
    bound (asserted by test_histogram_sketch_bound_and_mergeability
    and the q126 property tests), bin-width as the single accuracy
    knob, trivially exact cell-wise merges, and a sketch the DuckDB
    oracle replays bit-for-bit. Measured: state stays flat (0.66 MB
    shuffled) while the exact tier grows 20→325 MB over 1M→16M
    values (BENCH_SKETCH_SCALE.json)."""
    return (
        df.select(
            F.col(group_col).cast("string").alias("grp"),
            hist_bin_expr(value_col, lo, width, n_bins).alias("bin"),
        )
        .groupBy("grp", "bin")
        .agg(F.count("*").alias("cnt"))
    )


def histogram_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: Column | str,
    lo: float,
    width: float,
    n_bins: int,
    probs: dict[str, float],
) -> DataFrame:
    """Per-group quantile ESTIMATES read off the fixed-boundary
    histogram: for each probability p, find the bin holding the
    rank-(p·n) value (the unique occupied bin with
    cum−cnt < p·n ≤ cum) and interpolate linearly inside it:

        est = lo + width · (bin + (p·n − cum_before) / cnt)

    The true rank-⌈p·n⌉ order statistic provably lies in that bin, so
    |estimate − exact| ≤ width — a deterministic error bound the
    property tests assert, and the knob a 100 TB deployment turns
    (more bins → tighter quantiles, state still O(groups·n_bins)).
    Every step is integer counts + double arithmetic: unlike
    approx_percentile/KLL/t-digest the whole sketch is
    DuckDB-replayable (the KMV-over-HLL argument, sketches.py:16).

    ``probs`` maps output labels to probabilities, e.g.
    ``{"p50": 0.5, "p90": 0.9}`` → columns ``p50``, ``p90``.
    Returns (grp, n, <label>...), one row per group with n ≥ 1.
    """
    hist = fixed_histogram(df, group_col, value_col, lo, width, n_bins)
    w_cum = Window.partitionBy("grp").orderBy("bin")
    cum = hist.withColumn("cum", F.sum("cnt").over(w_cum)).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy("grp"))
    )
    probe = F.explode(
        F.array(
            *[
                F.struct(F.lit(label).alias("label"), F.lit(float(p)).alias("p"))
                for label, p in probs.items()
            ]
        )
    ).alias("pr")
    t = F.col("pr.p") * F.col("n").cast("double")
    est = F.lit(float(lo)) + F.lit(float(width)) * (
        F.col("bin").cast("double")
        + (t - (F.col("cum") - F.col("cnt")).cast("double"))
        / F.col("cnt").cast("double")
    )
    sel = (
        cum.select("grp", "bin", "cnt", "cum", "n", probe)
        .filter(((F.col("cum") - F.col("cnt")).cast("double") < t) & (t <= F.col("cum").cast("double")))
        .select("grp", "n", F.col("pr.label").alias("label"), est.alias("est"))
    )
    return sel.groupBy("grp", "n").agg(
        *[
            F.max(F.when(F.col("label") == label, F.col("est"))).alias(label)
            for label in probs
        ]
    )
