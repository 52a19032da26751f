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

from spark_nnd_spark.functions import text as TX

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


# ------------------------------------------------- temperature mixing

def uniform_draw_expr(id_col: Column | str) -> Column:
    """The md5 prefix as a numeric uniform draw in (0, 1] — the form
    needed when the keep-rate is DATA-DEPENDENT (computed per source at
    runtime) and can't be pre-rendered as a hex threshold literal."""
    return (
        F.conv(sample_key_expr(id_col), 16, 10).cast("long") + F.lit(1)
    ) / F.lit(float(_SPACE))


def uniform_draw_sql(id_col: str) -> str:
    """DuckDB rendering of uniform_draw_expr (identical arithmetic)."""
    return f"((('0x' || {sample_key_sql(id_col)})::UBIGINT + 1) / {float(_SPACE)})"


def temperature_mix(
    df: DataFrame,
    alpha: float = 0.5,
    budget_frac: float = 0.5,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based source rebalance: sample each source s with
    rate ``min(1, B · w_s / n_s)`` where ``w_s ∝ n_s^α`` and B is the
    total row budget (``budget_frac`` of the corpus) — the standard
    multilingual/multi-source mixing rule (α→1 keeps natural
    proportions, α→0 equalizes sources) that upweights small sources
    without duplicating rows.

    α is fixed at 0.5 so the power is ``sqrt`` — correctly rounded
    IEEE in every engine, which keeps the per-source rates (and hence
    the row-level sample) bit-replayable by the DuckDB oracle.

    Scale shape: one map-side-combined aggregate over the source
    column (O(sources) rows), a broadcast of the rate table back onto
    the stream, and a narrow per-row filter — the corpus itself never
    shuffles, so this runs as a single scan at 100 TB.
    """
    if alpha != 0.5:
        raise ValueError("alpha is fixed at 0.5 (sqrt) for engine-exact replay")
    from pyspark.sql import Window  # noqa: PLC0415

    counts = df.groupBy(source_col).agg(F.count("*").alias("n_s"))
    # totals via an all-rows window over the O(sources) count table —
    # single tiny partition, and the corpus aggregate runs exactly once
    # (a self-join/crossJoin formulation would recompute the scan).
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    rate = F.least(
        F.lit(1.0),
        F.lit(budget_frac)
        * F.sum("n_s").over(wall)
        * F.sqrt(F.col("n_s"))
        / F.sum(F.sqrt("n_s")).over(wall)
        / F.col("n_s"),
    )
    rates = counts.select(source_col, rate.alias("mix_rate"))
    return (
        df.join(F.broadcast(rates), source_col)
        .filter(uniform_draw_expr(id_col) <= F.col("mix_rate"))
        .drop("mix_rate")
    )


def temperature_mix_sql(
    table: str = "documents",
    alpha: float = 0.5,
    budget_frac: float = 0.5,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> str:
    """DuckDB CTE prefix replaying temperature_mix row-for-row: yields
    a relation ``mixed`` with the sampled rows of ``table``. The rate
    expression is written in the same operation order as the Spark
    side so the doubles agree bit-for-bit."""
    assert alpha == 0.5
    return f"""
        counts AS (
            SELECT {source_col}, COUNT(*)::BIGINT AS n_s
            FROM {table} GROUP BY 1
        ),
        tot AS (
            SELECT SUM(n_s)::BIGINT AS n_total, SUM(sqrt(n_s)) AS z
            FROM counts
        ),
        rates AS (
            SELECT {source_col},
                   least(1.0, {budget_frac} * n_total * sqrt(n_s) / z / n_s)
                       AS mix_rate
            FROM counts CROSS JOIN tot
        ),
        mixed AS (
            SELECT t.*
            FROM {table} t JOIN rates USING ({source_col})
            WHERE {uniform_draw_sql("t." + id_col)} <= mix_rate
        )
    """


# ------------------------------------------- deterministic sharding

def assign_shards(
    df: DataFrame,
    n_shards: int = 32,
    id_col: str = "doc_id",
    seed: str = "r6",
) -> DataFrame:
    """Deterministic global shuffle + shard assignment for training
    output: shard = md5(seed:id) mod n_shards, position = rank of the
    same draw within the shard. Replaces the usual ``orderBy(rand())``
    (non-replayable, full global sort) with a seeded hash: re-running
    the job, or re-materializing one lost shard, reproduces byte-equal
    ordering, and changing the seed is a fresh epoch-level shuffle.

    Scale shape: one hash exchange on the shard id (uniform by
    construction — md5 can't skew), then a per-shard sort of N/shards
    rows; no global sort ever happens. The (shard, pos) pair is the
    read order a training loader consumes shard-by-shard.
    """
    salted = F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string"))
    key = sample_key_expr(salted)
    d = df.withColumn("shard_key", key).withColumn(
        "shard",
        F.pmod(F.conv(F.col("shard_key"), 16, 10).cast("long"), F.lit(n_shards)),
    )
    from pyspark.sql import Window  # noqa: PLC0415

    w = Window.partitionBy("shard").orderBy(F.col("shard_key").asc(), F.col(id_col).asc())
    return (
        d.withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("shard_key")
    )


def assign_shards_sql(
    table: str = "documents",
    n_shards: int = 32,
    id_col: str = "doc_id",
    seed: str = "r6",
) -> str:
    """DuckDB CTE prefix: relation ``sharded`` = table + (shard, pos)."""
    skey = sample_key_sql(f"concat('{seed}', ':', CAST({id_col} AS VARCHAR))")
    return f"""
        keyed AS (
            SELECT *, {skey} AS shard_key,
                   (('0x' || {skey})::UBIGINT % {n_shards})::BIGINT AS shard
            FROM {table}
        ),
        sharded AS (
            SELECT * EXCLUDE (shard_key),
                   ROW_NUMBER() OVER (PARTITION BY shard
                                      ORDER BY shard_key, {id_col})::BIGINT AS pos
            FROM keyed
        )
    """


# ------------------------------- DSIR-style importance reweighting

def dsir_log_weights(
    df: DataFrame,
    tokens_col: Column,
    target_col: str,
    id_col: str = "doc_id",
    alpha: float = 1.0,
) -> DataFrame:
    """Data Selection with Importance Resampling (Xie et al. 2023),
    hashed-unigram variant: per-document log importance weight

        log w(x) = sum_tokens [ log p_target(tok) - log p_raw(tok) ]

    where p_target is the add-``alpha``-smoothed unigram distribution
    of the rows flagged by boolean ``target_col`` (the small
    high-quality slice the mixture should look like) and p_raw is the
    whole corpus's. Documents whose token mix resembles the target get
    positive weights; selection is top-k by weight downstream. Returns
    (id, n_tokens, log_weight) with log_weight rounded to 6dp (the
    q60 float discipline — per-doc sum order differs across engines).
    Extension operator (no reference analog — NND.scala:66 has no text
    surface).

    Scale (100 TB): both distributions are ONE groupBy over the same
    exploded token stream (count + count_if — the target tally rides
    the same shuffle for free), materialized once at O(vocab); the
    scoring join is token-keyed (AQE/size-threshold decides broadcast
    vs shuffle, q60's rationale: web-scale vocabs don't force-
    broadcast), and the only other wide op is the per-doc fold. The
    smoothing totals travel as a broadcast 1-row cross join.
    """
    toks = df.select(
        F.col(id_col),
        F.col(target_col).cast("boolean").alias("__is_tgt"),
        F.explode(tokens_col).alias("token"),
    ).filter(F.col("token") != "")
    vocab = (
        toks.groupBy("token")
        .agg(
            F.count("*").alias("raw_cnt"),
            F.count_if(F.col("__is_tgt")).alias("tgt_cnt"),
        )
        .localCheckpoint(eager=True)  # feeds totals AND the scoring join
    )
    return dsir_score(toks.drop("__is_tgt"), vocab, id_col=id_col, alpha=alpha)


def dsir_score(
    toks: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    alpha: float = 1.0,
) -> DataFrame:
    """The DSIR scoring kernel over an (id, token) stream and a
    (token, raw_cnt, tgt_cnt) distribution table — shared by the
    inline tally (dsir_log_weights) and the index-served path (the
    q196 probe derives the table from the persisted token stats), so
    the two cannot drift."""
    totals = vocab.agg(
        F.sum("raw_cnt").alias("raw_total"),
        F.sum("tgt_cnt").alias("tgt_total"),
        F.count("*").alias("v_size"),
    )
    a = F.lit(float(alpha))
    # LEFT join + coalesce(cnt, 0): a token absent from the served
    # distribution (sidecar lagging a continuously-ingesting corpus)
    # gets the documented add-one smoothing floor instead of silently
    # vanishing from both the score and n_tokens. With a full-coverage
    # vocab (the inline tier) this is byte-identical to an inner join.
    tgt = F.coalesce(F.col("tgt_cnt"), F.lit(0))
    raw = F.coalesce(F.col("raw_cnt"), F.lit(0))
    tok_logw = F.log(
        (tgt + a) / (F.col("tgt_total") + a * F.col("v_size"))
    ) - F.log(
        (raw + a) / (F.col("raw_total") + a * F.col("v_size"))
    )
    return (
        toks.join(vocab, "token", "left")
        .crossJoin(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.sum(tok_logw), 6).alias("log_weight"),
        )
    )


# ------------------------------------ leakage-safe train/val/test split

def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
    seed: str = "split",
) -> DataFrame:
    """Train/val/test assignment that near-duplicates cannot straddle:
    the split bucket is hashed from the doc's near-dup COMPONENT label
    (connected components over ``pairs``; docs in no pair are their own
    singleton component), so every member of a duplicate cluster lands
    in the same split — the eval-contamination guard a naive per-doc
    hash split lacks. Returns (id, component, bucket, split) with
    bucket = md5(seed:component) mod 100 and split carved at
    ``train_pct`` / ``train_pct + val_pct``. Extension operator (no
    reference analog).

    Scale (100 TB): components come from the already-blocked LSH pair
    stream (never all-pairs); the label propagation is the q31
    pointer-jumping kernel; the final assignment is one narrow
    expression over (id, component) plus a left join of docs to the
    O(paired-docs) component table — singleton docs never shuffle.
    """
    from spark_nnd_spark.operators.graph import connected_components  # noqa: PLC0415

    cc = connected_components(pairs).select(
        F.col("id").alias(id_col), "component"
    )
    d = docs.select(id_col).join(cc, id_col, "left")
    comp = F.coalesce(F.col("component"), F.col(id_col)).alias("component")
    salted = F.concat_ws(":", F.lit(seed), comp.cast("string"))
    bucket = F.pmod(
        F.conv(sample_key_expr(salted), 16, 10).cast("long"), F.lit(100)
    ).cast("int")
    return d.select(
        F.col(id_col),
        comp,
        bucket.alias("bucket"),
        F.when(bucket < train_pct, "train")
        .when(bucket < train_pct + val_pct, "val")
        .otherwise("test")
        .alias("split"),
    )


# --------------------------- CCNet-style reference-LM quality buckets

def ref_lm_buckets(
    df: DataFrame,
    tokens_col: Column,
    ref_col: str,
    lang_col: str = "lang",
    id_col: str = "doc_id",
    n_buckets: int = 3,
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score
    every document by its mean token log-probability under a unigram
    LM trained ONLY on the rows flagged by boolean ``ref_col`` (the
    trusted reference slice — CCNet uses Wikipedia), then split each
    language into ``n_buckets`` equal tiles by that score. Tile 1
    ("head") is the most reference-like / lowest-perplexity third —
    the slice CCNet keeps outright; "tail" is what it drops or
    quarantines. Differs from :func:`dsir_log_weights` in both the
    model (reference-only numerator, no raw-distribution denominator)
    and the decision (per-language tiles, not a global top-k).

    Smoothing: add-one over the FULL corpus vocabulary ``V`` (not just
    the reference vocab), so out-of-reference tokens get the floor
    probability ``1 / (ref_total + V)`` instead of blowing up the
    score — the standard back-off for scoring text the LM never saw.
    Returns (id, lang, n_tokens, logprob, bucket) with logprob rounded
    to 6dp BEFORE the tile order (rounded-value + id tiebreak ⇒ the
    tile boundary is deterministic cross-engine — the q140 ordering
    discipline).

    Scale (100 TB): one groupBy over the exploded token stream builds
    reference counts AND the vocab size (count_if rides the corpus
    tally's shuffle), materialized once at O(vocab); the scoring join
    is token-keyed (AQE decides broadcast, q60's web-scale-vocab
    rationale); the per-doc fold is the only other wide op. The ntile
    costs one exchange + sort per language partition; at true 100 TB
    the same tiles come from broadcasting two cutoff scores per
    language off a quantile sketch (q126's histogram) instead of
    ranking every row — that swap changes the boundary rows only.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    toks = df.select(
        F.col(id_col),
        F.col(lang_col),
        F.col(ref_col).cast("boolean").alias("__is_ref"),
        F.explode(tokens_col).alias("token"),
    ).filter(F.col("token") != "")
    vocab = (
        toks.groupBy("token")
        .agg(F.count_if(F.col("__is_ref")).alias("ref_cnt"))
        .localCheckpoint(eager=True)  # feeds totals AND the scoring join
    )
    return ref_lm_score(
        toks.drop("__is_ref"), vocab,
        lang_col=lang_col, id_col=id_col, n_buckets=n_buckets,
    )


def ref_lm_score(
    toks: DataFrame,
    vocab: DataFrame,
    lang_col: str = "lang",
    id_col: str = "doc_id",
    n_buckets: int = 3,
) -> DataFrame:
    """The reference-LM scoring + per-language tiling kernel over an
    (id, lang, token) stream and a (token, ref_cnt) table covering the
    FULL corpus vocabulary — shared by the inline tally
    (ref_lm_buckets) and the index-served path (the q197 probe derives
    the table from the persisted token stats), so they cannot drift."""
    from pyspark.sql import Window  # noqa: PLC0415

    totals = vocab.agg(
        F.sum("ref_cnt").alias("ref_total"),
        F.count("*").alias("v_size"),
    )
    # LEFT join + coalesce: out-of-vocab tokens receive the add-one
    # floor probability instead of dropping out of logprob/n_tokens —
    # identical to the old inner join whenever the vocab covers the
    # scored stream (the inline tier), correct when a lagging sidecar
    # serves a continuously-ingesting corpus (the index-served tier).
    tok_logp = F.log(
        (F.coalesce(F.col("ref_cnt"), F.lit(0)) + F.lit(1.0))
        / (F.col("ref_total") + F.lit(1.0) * F.col("v_size"))
    )
    scored = (
        toks.join(vocab, "token", "left")
        .crossJoin(F.broadcast(totals))
        .groupBy(id_col, lang_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.sum(tok_logp) / F.count("*"), 6).alias("logprob"),
        )
    )
    w = Window.partitionBy(lang_col).orderBy(
        F.desc("logprob"), F.asc(id_col)
    )
    return scored.withColumn("bucket", F.ntile(n_buckets).over(w))


# --------------------------- token-budget-constrained mixture solve

def budget_waterfill(
    per_source: DataFrame,
    budget_frac: tuple[int, int] = (9, 10),
    cap_frac: tuple[int, int] = (6, 100),
    source_col: str = "source",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Solve per-source token allocations under a total budget and a
    per-source cap — the curation step that turns "we want B training
    tokens" into sampling rates (q112's temperature mix assumes rates;
    this SOLVES for them). Classic waterfilling: effective availability
    = min(tokens, cap); sort sources by availability ascending; small
    sources are taken whole (saturated), the rest share the remaining
    budget at a common fill level, and the sub-level remainder goes one
    token each to the first sources in sort order. Entirely integer
    arithmetic (floor division), so the solve replays bit-for-bit in
    any engine.

    budget = floor(total_tokens * budget_frac), cap = floor(budget *
    cap_frac) — fractions of the observed corpus so the same query is
    meaningful at every SF.

    Returns per source: (source, tokens, avail_tokens, capped,
    saturated, alloc_tokens, rate). sum(alloc_tokens) == min(budget,
    sum(avail_tokens)) by construction.

    Scale (100 TB): the only corpus-sized work is upstream (the
    per-source token aggregate, map-side combined); this solve runs
    windows over O(sources) rows — hundreds, not billions — so the
    single-partition ordering is a constant-cost driver-adjacent step,
    the same class as a centroid collect.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    bn, bd = budget_frac
    cn, cd = cap_frac
    w_all = Window.partitionBy()
    w_ord = Window.orderBy(F.asc("avail_tokens"), F.asc(source_col))
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, -1)

    base = per_source.select(
        F.col(source_col).alias("source"),
        F.col(tokens_col).cast("long").alias("tokens"),
    )
    staged = base.select(
        "source",
        "tokens",
        F.expr(f"(sum(tokens) over () * {bn}) div {bd}").alias("budget"),
    ).select(
        "source",
        "tokens",
        "budget",
        F.expr(f"(budget * {cn}) div {cd}").alias("cap"),
    ).select(
        "source",
        "tokens",
        "budget",
        (F.col("tokens") > F.col("cap")).alias("capped"),
        F.least("tokens", "cap").alias("avail_tokens"),
    )
    ranked = staged.select(
        "*",
        F.row_number().over(w_ord).alias("__rk"),
        F.count("*").over(w_all).alias("__n"),
        F.coalesce(F.sum("avail_tokens").over(w_cum), F.lit(0)).alias("__cum"),
    ).withColumn(
        "saturated",
        F.col("avail_tokens") * (F.col("__n") - F.col("__rk") + 1) + F.col("__cum")
        <= F.col("budget"),
    )
    solved = ranked.select(
        "*",
        F.sum(F.when(F.col("saturated"), F.col("avail_tokens")).otherwise(0))
        .over(w_all)
        .alias("__sat_sum"),
        F.sum(F.when(F.col("saturated"), 1).otherwise(0)).over(w_all).alias("__n_sat"),
    ).withColumn("__n_u", F.col("__n") - F.col("__n_sat"))
    alloc = (
        solved.withColumn(
            "__level",
            F.when(
                F.col("__n_u") > 0,
                F.expr("(budget - __sat_sum) div __n_u"),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "__rem",
            F.col("budget") - F.col("__sat_sum") - F.col("__level") * F.col("__n_u"),
        )
        .withColumn(
            "alloc_tokens",
            F.when(F.col("saturated"), F.col("avail_tokens")).otherwise(
                F.col("__level")
                + F.when(
                    F.col("__rk") - F.col("__n_sat") <= F.col("__rem"), 1
                ).otherwise(0)
            ),
        )
    )
    return alloc.select(
        "source",
        "tokens",
        "avail_tokens",
        "capped",
        "saturated",
        "alloc_tokens",
        # zero-token source guard: x/0 is NULL in Spark but NaN/Inf in a
        # double-division oracle — pin the degenerate case to 0.0 on both
        # sides so the replay stays bit-exact (ADVICE r9)
        F.when(
            F.col("tokens") > 0,
            F.round(F.col("alloc_tokens") / F.col("tokens"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("rate"),
    )


# ------------------------------ whole-document sequence packing

def pack_whole_docs(
    df: DataFrame,
    n_col: Column,
    context_len: int,
    block_docs: int = 32,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Whole-document greedy (next-fit) packing manifest — the export
    convention for runs that must NOT split documents across context
    windows (SFT, cross-document attention masking): walk each
    source's documents in stable id order and append each whole doc to
    the current pack, opening a new pack when it would overflow
    ``context_len``. A single oversize document (n > context_len) gets
    a pack of its own (flagged, so the exporter can truncate it
    explicitly). Complements the straddle convention (q66), where docs
    split at pack boundaries and no token is ever padding.

    Determinism across engines: packing is sequential by nature, so
    the manifest shards it — per source, docs are numbered and cut
    into fixed ``block_docs`` blocks; each (source, block) packs
    independently with an in-array fold (next-fit is a left fold over
    (fill, bin) state). Block boundaries are id-derived, so any engine
    replays the exact assignment (the DuckDB oracle runs the same fold
    as a recursive CTE).

    Returns one manifest row per document: (source, block, bin,
    doc_id, n_tokens, fill_after, oversize) — ``bin`` is local to the
    (source, block) shard; (source, block, bin) is the global pack key.

    Scale (100 TB): the text column is touched once (the token count);
    the manifest rows that shuffle are 4 integers + the source key.
    One window exchange on source for the numbering, one hash exchange
    to (source, block) groups of at most ``block_docs`` rows, then the
    fold is narrow per-row work. No collect, no global sort, no
    Python. Block-local packing costs at most one under-filled pack
    per block vs an unsharded walk — bounded, and the price of making
    a sequential algorithm embarrassingly parallel.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    w = Window.partitionBy(source_col).orderBy(id_col)
    base = df.select(
        F.col(source_col).alias("source"),
        F.col(id_col).alias("doc_id"),
        n_col.cast("long").alias("n_tokens"),
    ).withColumn("rn", F.row_number().over(w))
    blk = base.withColumn(
        "block", F.expr(f"(rn - 1) div {block_docs}").cast("long")
    )
    grouped = blk.groupBy("source", "block").agg(
        F.array_sort(
            F.collect_list(F.struct("rn", "doc_id", "n_tokens"))
        ).alias("docs")
    )
    row_t = "array<struct<doc_id:bigint,n_tokens:bigint,bin:bigint,fill_after:bigint>>"
    # zero fill > context_len forces the first doc to open bin 0
    zero = F.expr(
        f"named_struct('rows', CAST(array() AS {row_t}), "
        f"'bin', CAST(-1 AS BIGINT), 'fill', CAST({context_len + 1} AS BIGINT))"
    )

    def _step(acc: Column, x: Column) -> Column:
        fits = (acc["fill"] + x["n_tokens"]) <= F.lit(context_len)
        nbin = F.when(fits, acc["bin"]).otherwise(acc["bin"] + 1)
        nfill = F.when(fits, acc["fill"] + x["n_tokens"]).otherwise(x["n_tokens"])
        row = F.struct(
            x["doc_id"].alias("doc_id"),
            x["n_tokens"].alias("n_tokens"),
            nbin.alias("bin"),
            nfill.alias("fill_after"),
        )
        return F.struct(
            F.concat(acc["rows"], F.array(row)).alias("rows"),
            nbin.alias("bin"),
            nfill.alias("fill"),
        )

    folded = grouped.select(
        "source",
        "block",
        F.aggregate("docs", zero, _step)["rows"].alias("rows"),
    )
    return folded.select("source", "block", F.explode("rows").alias("r")).select(
        "source",
        "block",
        F.col("r.bin").alias("bin"),
        F.col("r.doc_id").alias("doc_id"),
        F.col("r.n_tokens").alias("n_tokens"),
        F.col("r.fill_after").alias("fill_after"),
        (F.col("r.n_tokens") > F.lit(context_len)).cast("int").alias("oversize"),
    )


def chunk_tokens(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Overlapping token-window CHUNKS of each document — the RAG /
    retrieval-corpus export convention (packing joins documents into
    fixed windows; chunking SPLITS them into retrievable units whose
    ``size - stride`` token overlap keeps boundary context inside at
    least one chunk). Start offsets are 0, stride, 2·stride, … < n,
    so every token lands in >= 1 chunk and the final chunk may be
    short (its true length is emitted — the embedder pads, not the
    engine).

    Returns (doc_id, chunk_idx, start, n_tokens, chunk_text); empty
    documents produce no chunks.

    Scale (100 TB): a pure narrow projection — tokenize, one generator
    (posexplode over the O(n/stride) start array), one slice per
    chunk; ZERO exchanges, so chunking parallelizes with the scan and
    never limits cluster width. The ~size/stride output amplification
    is inherent to overlap, not to the plan."""
    if stride <= 0 or size <= 0:
        msg = f"size and stride must be positive (got {size}, {stride})"
        raise ValueError(msg)
    toks = TX.tokens_expr(text_col)
    # split('') yields [''] (size 1) — the explicit empty-text filter
    # is what makes "empty documents produce no chunks" true
    base = df.filter(F.col(text_col) != "").select(
        F.col(id_col), toks.alias("tk"), F.size(toks).alias("n")
    ).filter(F.col("n") > 0)
    starts = F.sequence(F.lit(0), F.col("n") - 1, F.lit(stride))
    return base.select(
        id_col,
        "tk",
        "n",
        F.posexplode(starts).alias("chunk_idx", "start"),
    ).select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("start").cast("long").alias("start"),
        F.least(F.lit(size), F.col("n") - F.col("start"))
        .cast("long")
        .alias("n_tokens"),
        F.array_join(
            F.slice("tk", F.col("start") + 1, F.lit(size)), " "
        ).alias("chunk_text"),
    )
