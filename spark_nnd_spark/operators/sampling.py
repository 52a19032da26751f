"""Deterministic hash-based sampling operators.

Extension layer (the reference has no sampling surface; SURVEY.md §2.3):
a training-data pipeline rebalances its source mixture by *sampling*,
and at 100 TB the sample must be (a) a narrow scan — no shuffle, no
RNG state — and (b) reproducible across engines, reruns and backfills.

Both properties fall out of keying the keep/drop decision on a
cryptographic hash of the row's stable id: ``md5(id)`` is uniform over
the hex space, so comparing its prefix against a threshold derived
from the rate is an exact Bernoulli(rate) draw that any engine with
md5 replays bit-for-bit (the DuckDB oracles run the same predicate).
Changing the rate only moves the threshold, so samples are *nested*:
the 10% sample is a subset of the 20% sample — the property that lets
a pipeline grow a training set without re-drawing it.

Scale shape: a filter on a per-row expression — fully pushed into the
scan stage, no exchange, trivially parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HEX_WIDTH = 8  # 32 bits of hash → rate resolution ~2.3e-10
_SPACE = 16**HEX_WIDTH


def threshold_hex(rate: float) -> str:
    """Map a keep-rate in [0,1] to the lexicographic hex threshold the
    sample key is compared against (lowercase, zero-padded). Rate 1.0
    would need HEX_WIDTH+1 digits, which breaks bytewise comparison
    against the fixed-width key, so it saturates to "g" — one past 'f'
    in ASCII, ordered after every hex string in any engine."""
    r = min(max(rate, 0.0), 1.0)
    t = int(round(r * _SPACE))
    return "g" if t >= _SPACE else format(t, f"0{HEX_WIDTH}x")


def sample_key_expr(id_col: Column | str) -> Column:
    """First HEX_WIDTH hex chars of md5(id-as-string) — the uniform
    draw. Lowercase hex compares bytewise identically everywhere."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.substring(F.md5(c.cast("string").cast("binary")), 1, HEX_WIDTH)


def sample_key_sql(id_col: str) -> str:
    """DuckDB rendering of sample_key_expr (same hex prefix)."""
    return f"substr(md5(CAST({id_col} AS VARCHAR)), 1, {HEX_WIDTH})"


def deterministic_sample(df: DataFrame, rate: float, id_col: str = "doc_id") -> DataFrame:
    """Keep each row iff md5(id) prefix < threshold(rate) — an exact,
    replayable Bernoulli(rate) sample with no RNG state."""
    return df.filter(sample_key_expr(id_col) < F.lit(threshold_hex(rate)))


def stratified_threshold_expr(
    rates: dict[str, float], strata_col: Column | str, default_rate: float = 0.0
) -> Column:
    """Per-stratum threshold as one CASE expression (a literal decision
    table — no join; the rate map is plan metadata, not data)."""
    c = F.col(strata_col) if isinstance(strata_col, str) else strata_col
    expr = None
    for k, v in rates.items():
        branch = (c == k, F.lit(threshold_hex(v)))
        expr = F.when(*branch) if expr is None else expr.when(*branch)
    default = F.lit(threshold_hex(default_rate))
    return default if expr is None else expr.otherwise(default)


def stratified_threshold_sql(
    rates: dict[str, float], strata_col: str, default_rate: float = 0.0
) -> str:
    """DuckDB rendering of stratified_threshold_expr."""
    whens = " ".join(
        f"WHEN '{k}' THEN '{threshold_hex(v)}'" for k, v in rates.items()
    )
    return f"CASE {strata_col} {whens} ELSE '{threshold_hex(default_rate)}' END"


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum Bernoulli sampling — the source-mixture rebalance of
    a training corpus (downsample the dominant stratum, keep the rest)
    as a single narrow filter."""
    return df.filter(
        sample_key_expr(id_col) < stratified_threshold_expr(rates, strata_col, default_rate)
    )


def weighted_key_expr(id_col: Column | str, weight: Column) -> Column:
    """Efraimidis–Spirakis exponential-race key: ``-ln(u)/w`` with the
    uniform ``u ∈ (0,1)`` derived from the row's md5 (the same stable
    32-bit prefix the Bernoulli sampler uses), so the draw is
    deterministic and engine-portable. Taking the k SMALLEST keys of a
    stratum is an exact weighted sample without replacement — the
    quality-weighted corpus downsample (weight = quality score means
    high-quality docs win their races more often), computed as a
    narrow per-row expression + one per-stratum top-k window."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    u = (
        F.conv(sample_key_expr(c), 16, 10).cast("long") + F.lit(1)
    ) / F.lit(float(_SPACE + 1))
    return -F.log(u) / weight


def weighted_key_sql(id_col: str, weight: str) -> str:
    """DuckDB rendering of weighted_key_expr (identical arithmetic)."""
    u = f"(('0x' || {sample_key_sql(id_col)})::UBIGINT + 1) / {float(_SPACE + 1)}"
    return f"-ln({u}) / ({weight})"


def weighted_sample(
    df: DataFrame,
    k: int,
    weight: Column,
    strata_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k-by-race weighted sample per stratum. One hash exchange on
    the stratum column (the top-k window); everything else narrow."""
    from pyspark.sql import Window  # noqa: PLC0415

    key = weighted_key_expr(id_col, weight)
    w = Window.partitionBy(strata_col).orderBy(F.col("skey").asc(), F.col(id_col).asc())
    return (
        df.withColumn("skey", key)
        .withColumn("srank", F.row_number().over(w))
        .filter(F.col("srank") <= k)
        .drop("skey", "srank")
    )


def per_group_exact_sample(
    df: DataFrame, group_col: str, k: int, id_col: str = "doc_id"
) -> DataFrame:
    """Exactly-k deterministic sample per group: rank each group's rows
    by their md5 draw (the same stable key the Bernoulli sampler uses)
    and keep the k smallest. Unlike the rate-based samplers this pins
    the OUTPUT size per group — the shape needed when building balanced
    eval slices ('exactly 1000 docs per source') where a Bernoulli draw
    would leave slice sizes noisy. Deterministic, nested in k (the
    top-5 sample is a prefix of the top-10), and engine-replayable.

    Scale: one hash exchange on the group column for the top-k window;
    the rank key is a narrow per-row expression. Skew note: a window
    sort is per-group; a pathologically hot group can instead take the
    group-local top-k via repartition+mapInPandas, but for bounded
    group counts (sources, langs) this is the right shape.

    Distinct from operators/relational.sample_per_group (reference
    parity: RATE-based tagging via xxhash64, NND.scala:146-152): this
    one pins the absolute count and uses the md5 key so a DuckDB
    oracle can replay it.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    w = Window.partitionBy(group_col).orderBy(
        sample_key_expr(id_col).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= k)
    )
