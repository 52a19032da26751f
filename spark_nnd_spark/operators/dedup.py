"""Deduplication operators for training-data pipelines.

Extension layer (the reference has none of this — SURVEY.md §2.3); the
near-dup family reuses the engine's core primitives: per-group agg,
candidate-pair joins, per-group top-K/dedup-with-preference.

Scale design (100 TB):
- Exact / fingerprint dedup: one hash-groupBy; the group key is a short
  digest, never the full text — shuffle carries O(rows · 16 bytes).
- Shingle-join (n-gram Jaccard): the classic inverted-index self-join.
  Pairs are generated only for docs sharing a shingle; hot shingles are
  the skew risk → ``max_shingle_freq`` drops shingles appearing in more
  than that many docs (standard df-cut), bounding join fan-out; AQE
  skew-join splits the rest.
- MinHash LSH: signature is O(num_hashes) ints per doc; banding turns
  near-dup search into an equi-join on (band_idx, band_hash) — the
  100 TB path, since candidate volume is tunable via bands/rows.
- SimHash: one 30-bit integer per doc; candidates via identical-band
  prefixes (here: exact simhash match or banded rotation joins).

All of exact/fingerprint/jaccard/minhash are DuckDB-oracle-checkable
because every hash is portable arithmetic (functions/text.py).
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spark_nnd_spark.functions import text as TX


# _fan_out decisions memoized per (session, input files): the split
# estimate for a given source never changes within a session, and the
# RDD-conversion fallback costs an extra planning pass per call.
_FAN_OUT_CACHE: dict[tuple, bool] = {}
_FAN_OUT_MAX_FOOTERS = 64


def _n_input_splits(df: DataFrame) -> int | None:
    """Scan-parallelism estimate from parquet metadata: row groups are
    the unit Spark splits parquet files at, so their count bounds the
    achievable scan parallelism. Metadata-only (capped footer reads,
    extrapolated for many-file inputs) — no job, no plan conversion.
    None for non-file inputs."""
    try:
        files = [f for f in df.inputFiles() if ".parquet" in f]
    except Exception:  # noqa: BLE001 - non-file plans
        return None
    if not files:
        return None
    import pyarrow.parquet as pq  # noqa: PLC0415

    def _path(uri: str) -> str:
        return uri[7:] if uri.startswith("file://") else uri.removeprefix("file:")

    try:
        head = files[:_FAN_OUT_MAX_FOOTERS]
        total = sum(pq.ParquetFile(_path(f)).metadata.num_row_groups for f in head)
        if len(files) > len(head):
            total = int(total * len(files) / len(head))
        return total
    except Exception:  # noqa: BLE001 - unreadable footer
        return None


def _fan_out(df: DataFrame) -> DataFrame:
    """Repartition ONLY when the input arrives in fewer than half the
    default parallelism's splits (a single-file corpus at test scale
    lands in 1-2 splits, so per-row hashing would run on 2 cores). At
    scale the parquet splits already provide parallelism and a blanket
    repartition is a full shuffle of raw document text.

    The split count comes from parquet row-group metadata when the
    input is file-backed (no RDD conversion, no extra planning pass);
    the RDD fallback for in-memory inputs is memoized per source."""
    sc = df.sparkSession.sparkContext
    par = sc.defaultParallelism
    splits = _n_input_splits(df)
    if splits is None:
        try:
            files = tuple(sorted(df.inputFiles()))
        except Exception:  # noqa: BLE001
            files = ()
        # only file-backed plans get a memo key: all in-memory plans
        # would otherwise share one entry despite differing layouts
        key = (sc.applicationId, files) if files else None
        if key is not None and key in _FAN_OUT_CACHE:
            few = _FAN_OUT_CACHE[key]
        else:
            few = df.rdd.getNumPartitions() < par // 2
            if key is not None:
                _FAN_OUT_CACHE[key] = few
    else:
        few = splits < par // 2
    return df.repartition(par) if few else df


def exact_dedup(
    df: DataFrame, key: Column | str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup by content digest: keep the smallest id per md5(key).

    Returns the surviving ids (one row per distinct content).
    """
    key = F.col(key) if isinstance(key, str) else key
    return (
        df.groupBy(F.md5(key).alias("digest"))
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("dup_count"))
    )


def fingerprint_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Dedup by rolling-hash fingerprint of the token stream (robust to
    raw-byte differences that tokenize identically)."""
    return (
        df.groupBy(TX.fingerprint_expr(text_col).alias("fp"))
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("dup_count"))
    )


# Auto df-cut defaults: the cap derives from the corpus's own posting
# document-frequency distribution instead of a hand-tuned absolute
# (BENCH_SF1_SPOT's finding: a fixed cap sits above the whole df
# distribution until the corpus saturates, then the inverted-index
# join is quadratic in Σ df²). A df QUANTILE was tried first and
# fails exactly there — on a saturated corpus the whole distribution
# shifts up with N, so the quantile rises with it and never bites
# (measured: derived p99.9 cap 122 > the fixed 100 at the sf1.0
# step). The shipped rule is a CANDIDATE BUDGET instead: the largest
# cap c with Σ_{df<=c} df² <= AUTO_DF_BUDGET · Σ df — i.e. admit keys
# until the self-join's candidate volume exceeds AUTO_DF_BUDGET
# candidates per posting on average. Candidates stay O(postings) BY
# CONSTRUCTION at any corpus size or saturation level. The floor
# keeps tiny corpora / test fixtures exact — below it no cut fires.
AUTO_DF_BUDGET = 8.0
AUTO_DF_FLOOR = 16

# Observability for the 'auto' default (r11 ADVICE): every derived cut
# that actually ENGAGES (cap < max df seen) is logged at WARNING and
# recorded here, so a caller can audit what recall the budget traded
# away without re-deriving the histogram. Keyed by nothing — it holds
# the LAST derivation (driver-side, single-threaded query authoring);
# read it right after the operator call.
LAST_DERIVED_CAP: dict[str, float | int | None] = {}

_LOG = logging.getLogger(__name__)


def derived_df_cap(
    dfreq: DataFrame,
    df_col: str = "df",
    budget: float = AUTO_DF_BUDGET,
    floor: int = AUTO_DF_FLOOR,
) -> int:
    """Corpus-derived posting-frequency cap under a candidate budget:
    admit df values ascending while the admitted keys' Σ df² stays
    within ``budget`` × total postings; the cap is the last admitted
    df (all keys admitted → the max df — open-vocabulary corpora are
    never cut), floored at ``floor``. Keys above the cap are exactly
    the Zipf head that owns the quadratic candidate blow-up; what
    survives generates <= budget candidates per posting on average —
    the linear-join contract as an invariant, not a tuning. Cost: one
    O(distinct keys) aggregate folded to an O(distinct df values)
    histogram collected to the driver (the convergence-scalar class).

    Trade (documented, visible in BENCH_AUTO_DFCUT.json): on a
    vocabulary-saturated corpus the budget cuts into the body of the
    distribution and verified pairs whose overlap is all-hot content
    are lost — recall there belongs to the MinHash-LSH tier (q16),
    which stays linear without any df cut."""
    hist = (
        dfreq.groupBy(df_col)
        .agg(F.count("*").alias("k"))
        .orderBy(df_col)
        .collect()
    )
    return _derived_cap_from_hist(hist, df_col=df_col, budget=budget, floor=floor)


def _derived_cap_from_hist(
    hist: list,
    df_col: str = "df",
    budget: float = AUTO_DF_BUDGET,
    floor: int = AUTO_DF_FLOOR,
) -> int:
    """derived_df_cap's driver-side core over already-collected
    (df, k) histogram rows — shared with the adaptive prefilter gate
    (_pruned_postings), which needs the same histogram anyway, so the
    'auto' paths pay exactly one census job for both decisions."""
    total = sum(r[df_col] * r["k"] for r in hist)
    if total == 0:
        # Empty input still refreshes the observability dict — a
        # caller auditing the cut right after the call must never
        # read the PREVIOUS derivation.
        LAST_DERIVED_CAP.clear()
        LAST_DERIVED_CAP.update(
            cap=floor, max_df=0, budget=budget, keys_cut=0,
            postings_cut=0, total_postings=0,
        )
        return floor
    limit = budget * total
    cap, cum = 0, 0.0
    for r in hist:
        cum += r["k"] * float(r[df_col]) ** 2
        if cum > limit:
            break
        cap = r[df_col]
    cap = max(floor, int(cap))
    max_df = int(hist[-1][df_col])
    keys_cut = sum(r["k"] for r in hist if r[df_col] > cap)
    postings_cut = sum(r[df_col] * r["k"] for r in hist if r[df_col] > cap)
    LAST_DERIVED_CAP.clear()
    LAST_DERIVED_CAP.update(
        cap=cap, max_df=max_df, budget=budget, keys_cut=keys_cut,
        postings_cut=postings_cut, total_postings=total,
    )
    if keys_cut:
        _LOG.warning(
            "auto df-cut engaged: cap=%d (max df %d); %d hot keys / %d of %d "
            "postings dropped before pair verification — pairs whose overlap "
            "is all-hot content are not verified at this tier; pass "
            "max_*_freq=None for exact pairs or use the LSH tier for recall",
            cap, max_df, keys_cut, postings_cut, total,
        )
    return cap


def _resolve_shingle_cap(raw: DataFrame, max_shingle_freq) -> int | None:
    """'auto' → derived_df_cap over the posting df distribution; pass
    ints / None through unchanged (declared queries pin explicit caps
    so their oracles replay; 'auto' is the production default).

    BEHAVIOR CHANGE (r11): the default flipped from None (never cut)
    to 'auto'. On a vocabulary-saturated corpus the derived budget cap
    can drop verified pairs whose overlap is entirely hot content —
    the engaged cut is logged at WARNING with the dropped-posting
    counts and recorded in :data:`LAST_DERIVED_CAP`; callers that need
    exact pairs must pass ``None`` explicitly."""
    if max_shingle_freq != "auto":
        return max_shingle_freq
    return derived_df_cap(
        raw.groupBy("shingle").agg(F.count("*").alias("df"))
    )


def shingle_postings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_shingle_freq: int | str | None = "auto",
) -> DataFrame:
    """Inverted index: (shingle, doc_id) postings over distinct n-token
    shingles, dropping shingles hotter than max_shingle_freq (df-cut —
    the skew guard for the self-join). The default 'auto' derives the
    cap from the corpus df distribution (derived_df_cap); pass an int
    to pin it or None to disable."""
    posts = _fan_out(df).select(
        F.col(id_col), F.explode(TX.shingles_expr(text_col, n)).alias("shingle")
    )
    max_shingle_freq = _resolve_shingle_cap(posts, max_shingle_freq)
    if max_shingle_freq is None:
        return posts
    hot = (
        posts.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > max_shingle_freq)
        .select("shingle")
    )
    return posts.join(hot, "shingle", "left_anti")


# Adaptive gate for the singleton/pair census prefilter (r15's df>=2
# semi-join; made data-adaptive in r16 per VERDICT r15 #3). The
# prefilter pays one semi-join plus a full checkpoint of the surviving
# postings, and saves the pruned fraction from BOTH sides of the pair
# self-join exchange — worth it only when it actually prunes. Rough
# break-even: checkpoint write+read of kept ~ one exchange of kept,
# saving ~ two exchanges of (1 - kept), i.e. kept ~ 2/3; the gate
# engages below 0.6 (measured at sf0.1: the saturated 31-word corpus
# keeps ~100% and the gate correctly skips, restoring the r14 plan;
# open-vocabulary corpora are singleton-dominated and engage it —
# BENCH_PREFILTER_GATE.json).
PREFILTER_MAX_KEEP_FRAC = 0.6
# Broadcast ceiling for the prune/hot key sets (keys, not bytes): under
# it the prefilter is an EXPLICIT broadcast semi/anti join — a map-side
# filter on both pair-join sides, no extra exchange, no second
# checkpoint (measured: the shuffle semi-join variant pays a full
# exchange of the postings and LOSES in both regimes —
# BENCH_PREFILTER_GATE.json). Above it (giant corpora whose repeated-
# key set alone is broadcast-hostile) fall back to the shuffle
# semi-join + checkpoint, which still bounds the pair join.
PREFILTER_BROADCAST_MAX_KEYS = 2_000_000


def _df_hist_rows(cens: DataFrame) -> list:
    """(df, k) histogram of a (key, df) census: O(distinct df values)
    rows collected (the derived_df_cap / convergence-scalar class)."""
    return (
        cens.groupBy("df")
        .agg(F.count("*").alias("k"))
        .orderBy("df")
        .collect()
    )


def _pruned_postings(
    raw: DataFrame,
    key_col: str,
    max_freq: int | str | None,
) -> tuple[DataFrame, int | None]:
    """(posts, cap): postings ready for the pair self-join.

    One histogram job decides everything driver-side: the 'auto' df
    cap (same rule as derived_df_cap, same LAST_DERIVED_CAP audit) and
    whether the singleton prune pays. Postings are per-key-per-doc
    distinct here (shingles_expr dedups within a doc), so df >= 2 is
    exactly "this key can ever produce an id_a < id_b pair".

    - prune pays (kept fraction <= PREFILTER_MAX_KEEP_FRAC): semi-join
      postings down to pairable keys within the cap, checkpoint once so
      both join sides read the pruned stream (r15's plan).
    - prune doesn't pay but hot keys exist: anti-join just the over-cap
      keys (few by construction) — the r14 plan.
    - neither: the raw checkpoint feeds the join directly.
    """
    # ONE census pass, checkpointed: the df aggregate over an
    # open-vocabulary posting stream is itself a near-full-postings
    # exchange (unique keys defeat map-side combining), so the
    # histogram job and the keep/hot build sides below must read the
    # SAME materialization, never recompute it (measured: the
    # recompute was a second 122 MB exchange at 4.7M postings).
    cens = (
        raw.groupBy(key_col)
        .agg(F.count("*").alias("df"))
        .localCheckpoint(eager=True)
    )
    hist = _df_hist_rows(cens)
    cap = (
        _derived_cap_from_hist(hist) if max_freq == "auto" else max_freq
    )
    in_keep = (
        lambda df_: df_ >= 2 and (cap is None or df_ <= cap)  # noqa: E731
    )
    tot = sum(r["df"] * r["k"] for r in hist)
    kept = sum(r["df"] * r["k"] for r in hist if in_keep(r["df"]))
    n_keep = sum(r["k"] for r in hist if in_keep(r["df"]))
    n_hot = sum(r["k"] for r in hist if cap is not None and r["df"] > cap)
    if tot and kept <= PREFILTER_MAX_KEEP_FRAC * tot:
        keep = cens.filter(
            F.col("df") >= 2
            if cap is None
            else F.col("df").between(2, cap)
        ).select(key_col)
        if n_keep <= PREFILTER_BROADCAST_MAX_KEYS:
            # map-side prune: the broadcast build (census -> filter) is
            # computed once and reused by both pair-join sides
            # (ReusedExchange), and the surviving postings flow straight
            # into the pair join's exchange — nothing else moves.
            return raw.join(F.broadcast(keep), key_col, "left_semi"), cap
        pruned = raw.join(keep, key_col, "left_semi")
        return pruned.localCheckpoint(eager=True), cap
    if n_hot:
        hot = cens.filter(F.col("df") > cap).select(key_col)
        if n_hot <= PREFILTER_BROADCAST_MAX_KEYS:
            return raw.join(F.broadcast(hot), key_col, "left_anti"), cap
        cut = raw.join(hot, key_col, "left_anti")
        return cut.localCheckpoint(eager=True), cap
    return raw, cap


def _pruned_fp_postings(
    posts: DataFrame, id_col: str, max_fp_freq: int | None
) -> DataFrame:
    """_pruned_postings' winnow twin: fingerprints repeat WITHIN a doc
    (repeated passages), so the pairable test is min(id) < max(id) per
    fp — two map-side-combined partial-agg scalars — and the gate
    stats come from one scalar aggregate instead of a df histogram."""
    # one census pass, checkpointed (see _pruned_postings): the gate
    # stats job and the keep/hot build sides read the materialization
    cens = posts.groupBy("fp").agg(
        F.count("*").alias("df"),
        F.min(id_col).alias("__lo"),
        F.max(id_col).alias("__hi"),
    ).localCheckpoint(eager=True)
    keep_cond = F.col("__lo") < F.col("__hi")
    if max_fp_freq is not None:
        keep_cond = keep_cond & (F.col("df") <= max_fp_freq)
    hot_cond = (
        F.lit(False)
        if max_fp_freq is None
        else F.col("df") > max_fp_freq
    )
    stats = cens.agg(
        F.sum("df").alias("tot"),
        F.sum(F.when(keep_cond, F.col("df")).otherwise(F.lit(0))).alias(
            "kept"
        ),
        F.sum(F.when(keep_cond, 1).otherwise(0)).alias("n_keep"),
        F.sum(F.when(hot_cond, 1).otherwise(0)).alias("n_hot"),
    ).first()
    tot = stats["tot"] or 0
    kept = stats["kept"] or 0
    n_keep = stats["n_keep"] or 0
    n_hot = stats["n_hot"] or 0
    if tot and kept <= PREFILTER_MAX_KEEP_FRAC * tot:
        keep = cens.filter(keep_cond).select("fp")
        if n_keep <= PREFILTER_BROADCAST_MAX_KEYS:
            return posts.join(F.broadcast(keep), "fp", "left_semi")
        return posts.join(keep, "fp", "left_semi").localCheckpoint(
            eager=True
        )
    if n_hot:
        hot = cens.filter(F.col("df") > max_fp_freq).select("fp")
        if n_hot <= PREFILTER_BROADCAST_MAX_KEYS:
            return posts.join(F.broadcast(hot), "fp", "left_anti")
        return posts.join(hot, "fp", "left_anti").localCheckpoint(
            eager=True
        )
    return posts


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.2,
    max_shingle_freq: int | str | None = "auto",
) -> DataFrame:
    """n-gram Jaccard near-duplicate pairs via inverted-index self-join.

    Returns (id_a, id_b, jaccard) for id_a < id_b with
    ``|A∩B| / |A∪B| >= threshold`` over distinct n-token shingle sets.
    Docs with no shingles (< n tokens) pair with nothing.

    Scale (measured caveat, BENCH_SF1_SPOT.json): candidate volume is
    O(sum over shingles of df²). On an open-vocabulary corpus df stays
    ~constant as the corpus grows (new docs bring new shingles) — the
    linear regime; on a vocabulary-SATURATED corpus (the synthetic
    testdata: 31 words, sum df² grew 51.6× over a 10× doc step) the
    join is quadratic until ``max_shingle_freq`` bites. The df-cut is
    the lever for that tail, and the MinHash-LSH tier (same step: 9.7×
    shuffle) is the scale path when the raw shingle join's density is
    unknown.
    """
    # Tokenize ONCE: the raw postings are checkpointed and every
    # derived stream — the per-doc set sizes, the hot-shingle census,
    # and the df-cut postings feeding BOTH sides of the self-join —
    # reads the materialized stream instead of re-running the
    # tokenize+explode scan (previously sizes, census and anti-join
    # each re-tokenized the corpus: three full text passes). Each
    # checkpoint is the size of one shuffle of the same stream,
    # cost-neutral at any scale.
    raw = (
        _fan_out(df)
        .select(F.col(id_col), F.explode(TX.shingles_expr(text_col, n)).alias("shingle"))
        .localCheckpoint(eager=True)
    )
    return _jaccard_from_postings(raw, id_col, threshold, max_shingle_freq)


def _jaccard_from_postings(
    raw: DataFrame,
    id_col: str,
    threshold: float,
    max_shingle_freq: int | str | None,
) -> DataFrame:
    """The Jaccard-pairs core over materialized (id, shingle) postings —
    shared by the tokenize-inline path (jaccard_pairs) and the
    index-served path (jaccard_pairs_index), so the join/verify
    semantics can never drift between them."""
    # full set sizes (pre-cut, mirroring the oracle): shingles_expr is
    # per-doc distinct, so the count equals F.size of the array; docs
    # with zero shingles are absent here AND from the postings join, so
    # they pair with nothing either way
    sizes = raw.groupBy(id_col).agg(F.count("*").alias("n_sh")).select(
        F.col(id_col).alias("id"), "n_sh"
    )
    # Adaptive census prefilter (_pruned_postings): the df >= 2
    # singleton prune engages only where it pays (open-vocabulary,
    # singleton-dominated corpora); the df cap always applies.
    posts, _cap = _pruned_postings(raw, "shingle", max_shingle_freq)
    a = posts.select(F.col("shingle"), F.col(id_col).alias("id_a"))
    b = posts.select(F.col("shingle"), F.col(id_col).alias("id_b"))
    # the exploded postings look tiny to the size estimator (stats come
    # from the compact parquet), so Catalyst wants to broadcast-build a
    # hash relation over every shingle string — slow and single-threaded.
    # A shuffle join partitions by shingle and parallelizes the fan-out.
    inter = (
        a.hint("shuffle_hash").join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"id": "id_a", "n_sh": "n_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "n_sh": "n_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def jaccard_pairs_index(
    spark,
    path: str,
    threshold: float = 0.2,
    max_shingle_freq: int | str | None = "auto",
) -> DataFrame:
    """n-gram Jaccard near-dup pairs served from the persisted index's
    shingle sidecar (build_neardup_index): the postings stream is the
    stored per-doc shingle arrays exploded — no tokenization, no
    document text read. Same rows as ``jaccard_pairs(corpus, n=meta.n)``
    (the sidecar stores exactly ``shingles_expr(text, n)``); asserted
    index==inline in tests. The shingle regex/tokenize pass is the
    dominant CPU cost of the inline path at scale — here it was paid
    once at index build."""
    sh = spark.read.parquet(f"{path}/shingles")
    id_col = [c for c in sh.columns if c != "sh"][0]
    # _fan_out: a compact sidecar can land in one split; the explode
    # must use the whole cluster (same guard as the inline tokenize)
    raw = (
        _fan_out(sh)
        .select(F.col(id_col), F.explode("sh").alias("shingle"))
        .localCheckpoint(eager=True)
    )
    return _jaccard_from_postings(raw, id_col, threshold, max_shingle_freq)


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.7,
    max_shingle_freq: int | str | None = "auto",
) -> DataFrame:
    """Directed shingle-containment near-dup pairs:
    ``|A∩B| / |A| >= threshold`` emits (contained, container,
    containment). The asymmetric complement to ``jaccard_pairs`` —
    a short doc wholly embedded in a long one (quote farms, boilerplate
    wrappers, excerpt pages) scores near-1 containment but low Jaccard,
    so symmetric dedup never sees it.

    Same inverted-index plan as jaccard_pairs (postings checkpointed
    once, df-cut skew guard, shuffle-hash self-join); both directions
    of each undirected intersection are tested, so one join pass yields
    all directed edges.
    """
    raw = (
        _fan_out(df)
        .select(F.col(id_col), F.explode(TX.shingles_expr(text_col, n)).alias("shingle"))
        .localCheckpoint(eager=True)
    )
    return _containment_from_postings(raw, id_col, threshold, max_shingle_freq)


def _containment_from_postings(
    raw: DataFrame,
    id_col: str,
    threshold: float,
    max_shingle_freq: int | str | None,
) -> DataFrame:
    """Containment-pairs core over materialized (id, shingle) postings —
    shared by the tokenize-inline path (containment_pairs) and the
    index-served path (containment_pairs_index)."""
    sizes = raw.groupBy(id_col).agg(F.count("*").alias("n_sh")).select(
        F.col(id_col).alias("id"), "n_sh"
    )
    # same adaptive census prefilter as _jaccard_from_postings
    posts, _cap = _pruned_postings(raw, "shingle", max_shingle_freq)
    a = posts.select(F.col("shingle"), F.col(id_col).alias("id_a"))
    b = posts.select(F.col("shingle"), F.col(id_col).alias("id_b"))
    inter = (
        a.hint("shuffle_hash").join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    j = inter.join(
        sizes.withColumnsRenamed({"id": "id_a", "n_sh": "n_a"}), "id_a"
    ).join(sizes.withColumnsRenamed({"id": "id_b", "n_sh": "n_b"}), "id_b")
    fwd = (
        j.withColumn("containment", F.col("inter") / F.col("n_a"))
        .filter(F.col("containment") >= threshold)
        .select(
            F.col("id_a").alias("contained"),
            F.col("id_b").alias("container"),
            "containment",
        )
    )
    rev = (
        j.withColumn("containment", F.col("inter") / F.col("n_b"))
        .filter(F.col("containment") >= threshold)
        .select(
            F.col("id_b").alias("contained"),
            F.col("id_a").alias("container"),
            "containment",
        )
    )
    return fwd.unionByName(rev)


def containment_pairs_index(
    spark,
    path: str,
    threshold: float = 0.7,
    max_shingle_freq: int | str | None = "auto",
) -> DataFrame:
    """Directed containment pairs served from the persisted index's
    shingle sidecar — the jaccard_pairs_index pattern on the asymmetric
    measure. Same rows as ``containment_pairs(corpus, n=meta.n)``;
    asserted index==inline in tests; no document text read."""
    sh = spark.read.parquet(f"{path}/shingles")
    id_col = [c for c in sh.columns if c != "sh"][0]
    raw = (
        _fan_out(sh)
        .select(F.col(id_col), F.explode("sh").alias("shingle"))
        .localCheckpoint(eager=True)
    )
    return _containment_from_postings(raw, id_col, threshold, max_shingle_freq)


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    n: int = 3,
) -> DataFrame:
    """(id, signature ARRAY<BIGINT>) — portable-arithmetic MinHash.

    Two-stage plan for scale: (1) fan out the raw docs if they arrive
    in few splits (``_fan_out`` — per-row hashing must use the whole
    cluster), compute the per-shingle hash array once; (2) exchange,
    then derive the ``num_hashes`` affine minima from the precomputed
    array. The exchange is a projection-collapse barrier — without it
    Catalyst inlines the shingle-hash expression into all
    ``num_hashes`` lambda bodies and recomputes it num_hashes times
    (measured 16× slowdown at sf0.1).
    """
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    base = _fan_out(
        df.select(F.col(id_col).alias("id"), TX.shingles_expr(text_col, n).alias("sh"))
    )
    hs = base.select(
        "id", F.transform("sh", TX.token_hash_lambda).alias("hs")
    ).repartition(parallelism, "id")
    return hs.select(
        "id",
        F.transform(
            F.sequence(F.lit(0), F.lit(num_hashes - 1)),
            lambda j: F.coalesce(
                F.array_min(
                    F.transform("hs", lambda h: (h * (2 * j + 3) + j * 7919) % TX.P)
                ),
                F.lit(TX.P).cast("long"),
            ),
        ).alias("signature"),
    )


def _band_explode(sigs: DataFrame, bands: int, rows_per_band: int) -> DataFrame:
    """(id, signature) → (id, band, band_sig): split each MinHash
    signature into ``bands`` contiguous slices. Shared by the inline
    LSH join (minhash_lsh_pairs) and the persisted index
    (build_neardup_index / neardup_query_index) so the banding can
    never drift between the build and probe sides."""
    return sigs.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.slice("signature", b * rows_per_band + 1, rows_per_band).alias(
                        "sig"
                    ),
                ),
            )
        ).alias("bs"),
    ).select("id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("band_sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.2,
    max_band_freq: int | None = None,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """MinHash + LSH banding near-dup candidates, verified by true
    Jaccard over shingle sets.

    Pipeline: signature → split into ``bands`` bands of
    ``num_hashes/bands`` rows → equi-join docs agreeing on any whole
    band → distinct candidate pairs → verify with exact Jaccard and
    filter. The band join is the scale path: candidate volume is
    controlled by (bands, rows-per-band), never all-pairs.

    ``max_band_freq`` is the skew guard: a band-signature shared by m
    docs fans out to m²/2 candidate pairs, so one giant cluster of
    near-identical docs (boilerplate pages, empty docs) makes the band
    self-join quadratic in the cluster size. Buckets hotter than the
    cap are dropped — their members are near-identical to each other
    and overwhelmingly still pair up through their other (colder)
    bands, while the join's worst case becomes O(cap²·n_buckets).

    ``sigs`` optionally supplies precomputed ``minhash_signatures``
    output (id, signature) so a caller that also consumes the
    signatures directly (e.g. estimator calibration) computes them
    once instead of per consumer; it must have been built with the
    same (num_hashes, n).
    """
    rows_per_band = num_hashes // bands
    if sigs is None:
        sigs = minhash_signatures(df, text_col, id_col, num_hashes, n)
    banded = _band_explode(sigs, bands, rows_per_band)
    if max_band_freq is not None:
        hot = (
            banded.groupBy("band", "band_sig")
            .agg(F.count("*").alias("bf"))
            .filter(F.col("bf") > max_band_freq)
            .select("band", "band_sig")
        )
        banded = banded.join(hot, ["band", "band_sig"], "left_anti")
    # materialize once: banded feeds both sides of the self-join (and
    # the census above); without this each consumer re-runs the
    # signature pipeline (see jaccard_pairs / simhash_neardup_pairs)
    banded = banded.localCheckpoint(eager=True)
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "band_sig"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
        # pinned once: read by the ids derivation below AND the final
        # verify-join chain (without this the band self-join runs twice)
        .localCheckpoint(eager=True)
    )
    # Verify candidates with true shingle Jaccard. Shingle sets are
    # computed ONLY for docs that appear in some candidate pair: the
    # candidate id list semi-joins the corpus before tokenization, so
    # the materialized verify side is O(candidate docs), not O(corpus)
    # — previously the full corpus's shingle arrays were checkpointed
    # even when candidates touched a fraction of it, a tokenized-corpus
    # materialization that would dominate at 100 TB. AQE picks a
    # broadcast semi-join while the id list is small and falls back to
    # a keyed join when it isn't.
    ids = (
        cand.select(F.col("id_a").alias("cid"))
        .union(cand.select(F.col("id_b")))
        .distinct()
    )
    sh = (
        _fan_out(df)
        .join(ids, F.col(id_col) == F.col("cid"), "left_semi")
        .select(F.col(id_col).alias("id"), TX.shingles_expr(text_col, n).alias("sh"))
        .localCheckpoint(eager=True)
    )
    return (
        cand.join(sh.withColumnsRenamed({"id": "id_a", "sh": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({"id": "id_b", "sh": "sh_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


SIMHASH_BITS = 24  # token hashes are < P ≈ 2^30; use the low 24 bits


def simhash_expr(text: Column | str) -> Column:
    """SimHash over token hashes: bit_i = 1 iff more tokens have bit i
    set than not. Portable arithmetic (shifts emulated by div/mod)."""
    hashes = F.transform(TX.tokens_expr(text), TX.token_hash_lambda)
    bits = F.transform(
        F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1)),
        lambda i: F.when(
            F.aggregate(
                hashes,
                F.lit(0).cast("long"),
                lambda acc, h: acc
                + (F.floor(h / F.pow(F.lit(2.0), i.cast("double"))).cast("long") % 2) * 2
                - 1,
            )
            > 0,
            F.lit(1).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(
        F.zip_with(
            bits,
            F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1)),
            lambda b, i: b * F.pow(F.lit(2.0), i.cast("double")).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def simhash_sql(text: str = "text") -> str:
    """DuckDB rendering of simhash_expr (same arithmetic)."""
    hashes = f"list_transform({TX.tokens_sql(text)}, t -> {TX.token_hash_sql('t')})"
    bit = (
        f"CASE WHEN list_sum(list_transform({hashes}, "
        f"h -> ((h // (2::BIGINT ^ i)::BIGINT) % 2) * 2 - 1)) > 0 THEN 1::BIGINT ELSE 0::BIGINT END"
    )
    return (
        f"list_sum(list_transform(range(0, {SIMHASH_BITS}), "
        f"i -> ({bit}) * (2::BIGINT ^ i)::BIGINT))::BIGINT"
    )


def simhash_df(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, simhash) per doc — the shared front of simhash_dedup and
    simhash_neardup_pairs.

    Same two-stage shape as minhash_signatures: token hashes are
    computed once before an exchange so the per-bit aggregation doesn't
    recompute them SIMHASH_BITS times on one core.
    """
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    # _fan_out spreads the hashing on few-split inputs; the keyed
    # repartition after it is the projection-collapse barrier and must
    # stay unconditionally (see minhash_signatures).
    hs = (
        _fan_out(df)
        .select(
            F.col(id_col),
            F.transform(TX.tokens_expr(text_col), TX.token_hash_lambda).alias("hs"),
        )
        .repartition(parallelism, id_col)
    )
    bits = F.transform(
        F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1)),
        lambda i: F.when(
            F.aggregate(
                "hs",
                F.lit(0).cast("long"),
                lambda acc, h: acc
                + (F.floor(h / F.pow(F.lit(2.0), i.cast("double"))).cast("long") % 2) * 2
                - 1,
            )
            > 0,
            F.lit(1).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    sim = F.aggregate(
        F.zip_with(
            bits,
            F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1)),
            lambda b, i: b * F.pow(F.lit(2.0), i.cast("double")).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return hs.select(F.col(id_col), sim.alias("simhash"))


def simhash_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Group docs by identical simhash (near-dup buckets at this bit
    width); keep min id per bucket."""
    return simhash_df(df, text_col, id_col).groupBy("simhash").agg(
        F.min(id_col).alias(id_col), F.count("*").alias("bucket_size")
    )


SIMHASH_BANDS = 3  # 3 bands × 8 bits: hamming ≤ 2 ⇒ some band matches exactly


def simhash_neardup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_band_freq: int | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, banded for scale.

    Candidate generation splits the 24-bit simhash into SIMHASH_BANDS
    8-bit bands and equi-joins docs agreeing on any band — the same
    never-all-pairs posture as minhash_lsh_pairs, with the pigeonhole
    guarantee that any pair at hamming ≤ SIMHASH_BANDS−1 shares a band
    (recall is exact up to that distance; beyond it the banding may
    miss pairs whose differing bits straddle all bands, which is the
    documented LSH trade). Candidates are then verified with the exact
    popcount of the XOR — integer ops, whole-stage codegen.

    ``max_band_freq`` is the same skew guard as the MinHash path: an
    8-bit band value shared by m docs fans out m²/2 candidates (the
    empty-document bucket is the classic offender), so hotter buckets
    than the cap are dropped before the self-join.
    """
    # Materialize the signatures ONCE (eager localCheckpoint): the
    # sims subtree feeds multiple consumers inside the banded join
    # (hot-band census and both self-join sides), and Catalyst/AQE
    # re-executes the tokenize+24-bit-aggregate scan for each —
    # measured 4.3s vs ~10s for the whole operator at sf0.1. The
    # checkpoint is O(N) (id, long) rows — negligible at any scale.
    # Banding/candidates/verify delegate to the generic packed-bit-hash
    # machinery (hash_hamming_pairs) — one implementation for simhash
    # and the perceptual aHash. The "first agreeing band" optimization
    # is deliberately absent there too: a pair agreeing on a DROPPED
    # band plus a kept one must still surface through the kept band,
    # which a first-band filter can't see from the signatures alone.
    sims = simhash_df(df, text_col, id_col).localCheckpoint(eager=True)
    return hash_hamming_pairs(
        sims,
        hash_col="simhash",
        id_col=id_col,
        n_bands=SIMHASH_BANDS,
        bits=SIMHASH_BITS,
        max_hamming=max_hamming,
        max_band_freq=max_band_freq,
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """Benchmark decontamination: per corpus doc, how many of its
    distinct n-token shingles appear in the benchmark set — the overlap
    check a training pipeline runs against its eval suites before
    training.

    Scale shape: the benchmark side is tiny relative to the corpus
    (eval suites are MBs, the corpus is 100 TB), so its distinct
    shingle set is broadcast and the corpus-side postings stream
    through a broadcast hash join — the corpus never shuffles. Returns
    (id, n_hits, contaminated); docs with no overlap keep n_hits = 0.
    """
    bench_sh = (
        benchmark.select(F.explode(TX.shingles_expr(text_col, n)).alias("shingle"))
        .distinct()
    )
    posts = corpus.select(
        F.col(id_col), F.explode(TX.shingles_expr(text_col, n)).alias("shingle")
    )
    hits = (
        posts.join(F.broadcast(bench_sh), "shingle")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def contamination_pairs(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """Span-level decontamination forensic: WHICH eval doc contaminates
    which training doc — (corpus id, bench_id, n_shared) for every pair
    sharing ≥ 1 distinct n-token shingle. ``decontaminate`` gives the
    per-doc verdict a pipeline filters on; this gives the audit trail a
    leak investigation needs (trace a contaminated doc to the specific
    eval items it leaks).

    Same scale shape as ``decontaminate``: the eval-side postings
    (shingle → bench_id, eval suites are MBs) broadcast, the corpus
    postings stream through a broadcast hash join, and the pair
    aggregate is map-side partial — the corpus never shuffles raw text,
    only (corpus_id, bench_id) hit partials."""
    bench_posts = benchmark.select(
        F.col(id_col).alias("bench_id"),
        F.explode(TX.shingles_expr(text_col, n)).alias("shingle"),
    )
    posts = corpus.select(
        F.col(id_col), F.explode(TX.shingles_expr(text_col, n)).alias("shingle")
    )
    return (
        posts.join(F.broadcast(bench_posts), "shingle")
        .groupBy(id_col, "bench_id")
        .agg(F.count("*").alias("n_shared"))
    )


def incremental_dedup(
    df: DataFrame,
    is_batch: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.2,
    max_band_freq: int | None = None,
) -> DataFrame:
    """Incremental (batch-vs-corpus) dedup verdicts: for each document
    where ``is_batch`` holds, decide ``exact`` (byte-identical text
    already in the corpus side), ``near`` (verified MinHash-LSH
    near-duplicate of a corpus doc), or ``novel``.

    This is the steady-state ingestion shape of a training-data
    pipeline: a new crawl snapshot lands and must be admitted or
    dropped against everything already indexed. At scale the corpus
    side's digests and band signatures are precomputed and stored —
    that path exists as ``build_neardup_index`` /
    ``neardup_query_index`` (verdicts asserted identical to this
    inline form) with ``extend_neardup_index`` closing the ingest
    loop; this inline form derives both sides from one DataFrame split
    by a predicate so the whole verdict is replayable against a SQL
    oracle.
    """
    flagged = df.withColumn("_is_batch", is_batch)
    batch_ids = flagged.filter(F.col("_is_batch")).select(id_col)

    # exact tier: digest semi-join against the corpus side
    digests = flagged.select(id_col, F.md5(text_col).alias("digest"), "_is_batch")
    exact = (
        digests.filter(F.col("_is_batch"))
        .join(
            digests.filter(~F.col("_is_batch")).select("digest").distinct(),
            "digest",
            "left_semi",
        )
        .select(id_col)
        .withColumn("_exact", F.lit(True))
    )

    # near tier: verified LSH pairs that cross the batch/corpus boundary
    pairs = minhash_lsh_pairs(
        df,
        text_col,
        id_col,
        num_hashes=num_hashes,
        bands=bands,
        n=n,
        threshold=threshold,
        max_band_freq=max_band_freq,
    )
    flags = flagged.select(id_col, "_is_batch")
    sided = pairs.join(
        flags.select(F.col(id_col).alias("id_a"), F.col("_is_batch").alias("_ba")),
        "id_a",
    ).join(
        flags.select(F.col(id_col).alias("id_b"), F.col("_is_batch").alias("_bb")),
        "id_b",
    )
    near = (
        sided.filter(F.col("_ba") & ~F.col("_bb"))
        .select(F.col("id_a").alias(id_col))
        .unionByName(
            sided.filter(F.col("_bb") & ~F.col("_ba")).select(
                F.col("id_b").alias(id_col)
            )
        )
        .distinct()
        .withColumn("_near", F.lit(True))
    )

    verdict = (
        F.when(F.col("_exact"), F.lit("exact"))
        .when(F.col("_near"), F.lit("near"))
        .otherwise(F.lit("novel"))
    )
    return (
        batch_ids.join(exact, id_col, "left")
        .join(near, id_col, "left")
        .select(id_col, verdict.alias("verdict"))
    )


def winnow_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 4,
    w: int = 4,
    min_shared: int = 2,
    max_fp_freq: int | None = None,
) -> DataFrame:
    """Winnowed-fingerprint near-dup pairs (Schleimer/Wilkerson/Aiken
    winnowing, SIGMOD 2003): each doc keeps the local-minimum hashes of
    its positional n-token shingle stream (~2/(w+1) of them,
    functions/text.py winnow_select_expr — pure array arithmetic, no
    shuffle), and pairs sharing >= min_shared selected fingerprints are
    emitted with the shared count. Winnowing's window guarantee makes
    any shared run of ~w+n consecutive tokens surface at least one
    common fingerprint, so this catches LOCAL copied passages that
    whole-document MinHash dilutes away.

    Scale shape = the jaccard_pairs inverted index over a stream ~2/(w+1)
    the size: postings checkpointed once, optional df-cut skew guard,
    shuffle-hash equi-self-join on the fingerprint — never all-pairs.
    """
    posts = (
        _fan_out(df)
        .withColumn("_hs", TX.ordered_shingle_hashes_expr(text_col, n))
        .select(
            F.col(id_col),
            F.explode(TX.winnow_select_expr(F.col("_hs"), w)).alias("fp"),
        )
        .localCheckpoint(eager=True)
    )
    # adaptive census prefilter (_pruned_fp_postings): the min<max
    # pairable prune engages only where it pays; the boilerplate cut
    # (max_fp_freq) always applies.
    posts = _pruned_fp_postings(posts, id_col, max_fp_freq)
    a = posts.select("fp", F.col(id_col).alias("id_a"))
    b = posts.select("fp", F.col(id_col).alias("id_b"))
    return (
        a.hint("shuffle_hash").join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def build_neardup_index(
    corpus: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
) -> None:
    """Persist a near-duplicate index over the corpus so incremental
    batches probe STORED signatures instead of re-shingling 100 TB of
    already-ingested text per batch (the steady-state ingest shape
    incremental_dedup's docstring promises; the dedup twin of
    similarity.build_ivf_index).

    Layout under ``path``:
    - ``meta``        — 1 row (num_hashes, bands, n): probe-side
      signatures MUST be built with the same parameters, so they are
      recorded with the index, never trusted to the caller.
    - ``digests``     — (doc_id, digest): the exact-dup tier.
    - ``bands``       — (doc_id, band_sig), hive-partitioned by band:
      the LSH probe is a plain equi-join into this table.
    - ``band_stats``  — (band, band_sig, cnt): per-bucket occupancy,
      so the query-time hot-bucket skew guard can reproduce the inline
      census (corpus + batch counts) from O(buckets) stats instead of
      rescanning corpus bands.
    - ``shingles``    — (doc_id, sh): the verify sidecar — candidates
      are confirmed with exact shingle Jaccard without touching the
      corpus text. Stored as the same distinct string shingles the
      inline path computes so the verdicts are bit-identical; a
      production deployment at 100 TB would store 64-bit shingle
      hashes instead (≈8 bytes/shingle) at the cost of hash-collision
      noise in the verify tier.

    Build cost: one signature pass + one tokenize pass + writes — all
    narrow except the signature exchange that the inline path pays per
    batch anyway.
    """
    spark = corpus.sparkSession
    rows_per_band = num_hashes // bands
    spark.createDataFrame(
        [(num_hashes, bands, n)], "num_hashes int, bands int, n int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")
    corpus.select(
        F.col(id_col), F.md5(text_col).alias("digest")
    ).write.mode("overwrite").parquet(f"{path}/digests")
    sigs = minhash_signatures(corpus, text_col, id_col, num_hashes, n)
    _band_explode(sigs, bands, rows_per_band).withColumnRenamed(
        "id", id_col
    ).write.mode("overwrite").partitionBy("band").parquet(f"{path}/bands")
    # stats from the WRITTEN bands (re-read, not recomputed): one cheap
    # scan of (id, 4 longs) rows instead of a second signature pass
    spark.read.parquet(f"{path}/bands").groupBy("band", "band_sig").agg(
        F.count("*").alias("cnt")
    ).write.mode("overwrite").parquet(f"{path}/band_stats")
    corpus.select(
        F.col(id_col), TX.shingles_expr(text_col, n).alias("sh")
    ).write.mode("overwrite").parquet(f"{path}/shingles")


def neardup_query_index(
    spark,
    path: str,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.2,
    max_band_freq: int | None = None,
    exclude_ids: DataFrame | None = None,
) -> DataFrame:
    """Incremental dedup verdicts against a PERSISTED near-dup index
    (build_neardup_index): each batch doc is 'exact' (digest already
    indexed), 'near' (Jaccard-verified LSH match against an indexed
    doc), or 'novel'. Produces exactly the verdicts of
    ``incremental_dedup(corpus ∪ batch, ...)`` — asserted index==inline
    in tests — while touching only the batch text and the stored
    index: the corpus is never re-shingled.

    Parity details that make the equivalence exact:
    - probe signatures use the (num_hashes, bands, n) recorded in the
      index meta, not caller-supplied values;
    - the hot-bucket census counts corpus + batch members combined
      (corpus side from the O(buckets) band_stats, batch side counted
      live), matching the inline census over the unioned DataFrame;
    - candidate verification is exact shingle Jaccard between the
      batch doc (tokenized here, only for candidate ids) and the
      indexed shingle set.

    Scale: every corpus-side input is index-backed and only ever
    STREAMS through broadcast joins or narrow filters — probe SHUFFLE
    is O(batch + candidates), independent of corpus size (measured
    flat across an 8x corpus sweep, BENCH_DEDUP_SCALE.json; before the
    broadcast discipline it grew ~O(N)). The corpus-side scans remain
    O(N) read I/O — shuffle-free and embarrassingly parallel; sorting
    digests/bands at build time would add row-group min/max pruning on
    top if scan I/O ever dominated.
    """
    meta = spark.read.parquet(f"{path}/meta").first()
    num_hashes, bands, n = meta["num_hashes"], meta["bands"], meta["n"]
    rows_per_band = num_hashes // bands

    batch_ids = batch.select(id_col)

    # exclude_ids: treat the index AS IF these doc ids were never
    # admitted — the replay-purity hook for the streaming ingest loop
    # (a crashed micro-batch may have PARTIALLY admitted itself before
    # the retry re-probes; excluding the batch's own ids restores the
    # exact pre-batch index state, so retried verdicts equal the
    # originals). Broadcast anti-joins: O(excluded) side is small, the
    # corpus tables still stream. Incompatible with the hot-bucket
    # census (band_stats counts can't subtract excluded members), so
    # the capped path rejects it — the streaming probe is uncapped by
    # design anyway.
    if exclude_ids is not None and max_band_freq is not None:
        raise ValueError(
            "exclude_ids requires max_band_freq=None: the stored "
            "band_stats census cannot subtract excluded members"
        )
    excl_parts = []
    if exclude_ids is not None:
        excl_parts.append(
            exclude_ids.select(F.col(exclude_ids.columns[0]).alias(id_col)).distinct()
        )
    # tombstones are persistent exclude_ids (retract_from_neardup_index):
    # same broadcast anti-join, same census restriction — the capped
    # path comes back after compact_neardup_index clears them.
    tomb = _tombstones(spark, path, id_col)
    if tomb is not None:
        if max_band_freq is not None:
            raise ValueError(
                "index has tombstones: probe requires max_band_freq=None "
                "(band_stats cannot subtract retracted members); run "
                "compact_neardup_index to restore the capped path"
            )
        excl_parts.append(tomb)
    excl = None
    if excl_parts:
        merged = excl_parts[0]
        for p in excl_parts[1:]:
            merged = merged.unionByName(p)
        excl = F.broadcast(merged.distinct())

    def _minus_excluded(index_tbl: DataFrame) -> DataFrame:
        return (
            index_tbl.join(excl, id_col, "left_anti") if excl is not None else index_tbl
        )

    # O(batch) DISCIPLINE: every join against an index table below puts
    # the BATCH-derived (small) side behind an explicit broadcast, so
    # the corpus-sized tables (digests, bands, shingles, band_stats)
    # only ever STREAM through broadcast hash joins or narrow filters —
    # the probe's shuffle volume is O(batch + candidates), independent
    # of corpus size. (Measured before this discipline: probe shuffle
    # grew ~O(N) with the indexed corpus — scripts/bench_dedup.py.)

    # exact tier: matched digests via broadcast of the batch digests;
    # the corpus digest table streams (no distinct over the corpus —
    # semi-join semantics are duplicate-tolerant)
    b_dig = batch.select(F.col(id_col), F.md5(text_col).alias("digest"))
    matched_dig = (
        _minus_excluded(spark.read.parquet(f"{path}/digests"))
        .join(
            F.broadcast(b_dig.select("digest").distinct()), "digest", "left_semi"
        )
        .select("digest")
        .distinct()  # O(matched) <= O(batch)
    )
    exact = (
        b_dig.join(F.broadcast(matched_dig), "digest", "left_semi")
        .select(id_col)
        .withColumn("_exact", F.lit(True))
    )

    # near tier: band the batch, probe the stored bands
    sigs = minhash_signatures(batch, text_col, id_col, num_hashes, n)
    # checkpointed: feeds the census and the candidate join
    b_banded = _band_explode(sigs, bands, rows_per_band).localCheckpoint(eager=True)
    c_banded = _minus_excluded(spark.read.parquet(f"{path}/bands")).select(
        F.col(id_col).alias("id"), "band", "band_sig"
    )
    if max_band_freq is not None:
        # combined census without shuffling the O(buckets) stats table:
        # corpus-only-hot buckets are a narrow filter over the stats
        # scan; mixed buckets stream the stats through a broadcast join
        # against the O(batch) batch-side counts; batch-only-hot
        # buckets need no stats at all. Anti-join semantics tolerate
        # the unions' duplicates.
        stats = spark.read.parquet(f"{path}/band_stats")
        b_cnt = (
            b_banded.groupBy("band", "band_sig")
            .agg(F.count("*").alias("bcnt"))
            .localCheckpoint(eager=True)  # feeds two census consumers
        )
        corp_hot = stats.filter(F.col("cnt") > max_band_freq).select(
            "band", "band_sig"
        )
        mixed_hot = (
            stats.filter(F.col("cnt") <= max_band_freq)
            .join(F.broadcast(b_cnt), ["band", "band_sig"])
            .filter(F.col("cnt") + F.col("bcnt") > max_band_freq)
            .select("band", "band_sig")
        )
        batch_hot = b_cnt.filter(F.col("bcnt") > max_band_freq).select(
            "band", "band_sig"
        )
        hot = (
            corp_hot.unionByName(mixed_hot)
            .unionByName(batch_hot)
            .localCheckpoint(eager=True)  # feeds both anti-joins
        )
        b_banded = b_banded.join(hot, ["band", "band_sig"], "left_anti")
        c_banded = c_banded.join(F.broadcast(hot), ["band", "band_sig"], "left_anti")
    cand = (
        c_banded.select("band", "band_sig", F.col("id").alias("cid"))
        .join(
            F.broadcast(b_banded.select("band", "band_sig", F.col("id").alias("bid"))),
            ["band", "band_sig"],
        )
        .filter(F.col("bid") != F.col("cid"))
        .select("bid", "cid")
        .distinct()
        # pinned once: feeds the two id derivations and the verify join
        .localCheckpoint(eager=True)
    )

    # verify: exact Jaccard, batch shingles computed only for candidate
    # ids, corpus shingles read from the index sidecar (streamed
    # through a broadcast semi-join on the O(candidates) id list)
    b_sh = (
        batch.join(
            cand.select(F.col("bid").alias(id_col)).distinct(), id_col, "left_semi"
        )
        .select(F.col(id_col).alias("bid"), TX.shingles_expr(text_col, n).alias("sh_b"))
    )
    c_sh = (
        spark.read.parquet(f"{path}/shingles")
        .join(
            F.broadcast(cand.select(F.col("cid").alias(id_col)).distinct()),
            id_col,
            "left_semi",
        )
        .select(F.col(id_col).alias("cid"), F.col("sh").alias("sh_c"))
    )
    near = (
        cand.join(b_sh, "bid")
        .join(c_sh, "cid")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_b", "sh_c"))
            / F.size(F.array_union("sh_b", "sh_c")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(F.col("bid").alias(id_col))
        .distinct()
        .withColumn("_near", F.lit(True))
    )

    verdict = (
        F.when(F.col("_exact"), F.lit("exact"))
        .when(F.col("_near"), F.lit("near"))
        .otherwise(F.lit("novel"))
    )
    return (
        batch_ids.join(exact, id_col, "left")
        .join(near, id_col, "left")
        .select(id_col, verdict.alias("verdict"))
    )


def extend_neardup_index(
    spark,
    path: str,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Admit a batch into an existing near-dup index: append the new
    docs' digests, band signatures, and shingle sidecars, then refresh
    the bucket-occupancy stats — the write half of the continuous-
    ingest loop (probe with neardup_query_index, admit the keepers,
    extend; the next batch probes an index that already contains this
    one). Signature parameters come from the stored meta, so an
    extension can never be banded differently from the base build.

    Appends are plain parquet appends (new files, existing files
    untouched). band_stats is recomputed from the bands table — an
    O(index-bands) integer scan, deliberately derived from bands
    rather than merged with the old stats so a retried extension
    cannot double-count; at 100 TB this scan is (id, band, 4 longs)
    rows, orders of magnitude under one corpus text pass.
    """
    meta = spark.read.parquet(f"{path}/meta").first()
    num_hashes, bands, n = meta["num_hashes"], meta["bands"], meta["n"]
    rows_per_band = num_hashes // bands
    # Extension is an UPSERT: a doc retracted earlier and re-ingested
    # (settle half: old rows purged, tombstones cleared) or submitted
    # while still LIVE (duplicate submission / crashed re-extension)
    # must become visible with ONLY the batch's rows. Rare path: the
    # purge rewrite triggers only on actual overlap; plain extensions
    # stay pure appends after one O(docs) digests-roster check.
    # Idempotent under retry: the purge anti-join no-ops on ids
    # already gone, the appends are the same batch.
    from spark_nnd_spark.operators import index_lifecycle as IL

    IL.settle_upsert(
        spark, path, new_docs.select(id_col), _neardup_tables(spark, path)
    )
    new_docs.select(
        F.col(id_col), F.md5(text_col).alias("digest")
    ).write.mode("append").parquet(f"{path}/digests")
    sigs = minhash_signatures(new_docs, text_col, id_col, num_hashes, n)
    _band_explode(sigs, bands, rows_per_band).withColumnRenamed(
        "id", id_col
    ).write.mode("append").partitionBy("band").parquet(f"{path}/bands")
    new_docs.select(
        F.col(id_col), TX.shingles_expr(text_col, n).alias("sh")
    ).write.mode("append").parquet(f"{path}/shingles")
    # refresh stats AFTER the band append: reads bands, overwrites
    # band_stats — safe without a barrier because stats derive from
    # bands, never from the directory being overwritten
    spark.read.parquet(f"{path}/bands").groupBy("band", "band_sig").agg(
        F.count("*").alias("cnt")
    ).write.mode("overwrite").parquet(f"{path}/band_stats")


def _tombstones(spark, path: str, id_col: str) -> DataFrame | None:
    """Retracted doc ids as (id_col), or None when the index has no
    tombstone log (operators/index_lifecycle.py — the kernel shared
    by every persisted index family)."""
    from spark_nnd_spark.operators import index_lifecycle as IL

    tomb = IL.read_tombstones(spark, path)
    if tomb is None:
        return None
    return tomb.select(F.col("id").alias(id_col))


def retract_from_neardup_index(spark, path: str, ids: DataFrame) -> None:
    """Retract docs from a persisted near-dup index WITHOUT rewriting
    it: append the ids to a tombstones table that every read path
    (neardup_query_index, neardup_pairs_index) anti-joins — the
    right-to-be-forgotten / bad-batch-rollback half of the index
    lifecycle (build → probe → extend → RETRACT → compact). O(retracted)
    write, zero index I/O; idempotent under retry because duplicate
    tombstones are harmless (reads are distinct + anti-join).

    Cost model: tombstones are the delete log; verdicts are correct
    immediately, and the capped (max_band_freq) probe path is
    unavailable until ``compact_neardup_index`` folds the log into the
    physical tables (band_stats cannot subtract retracted members).
    """
    from spark_nnd_spark.operators import index_lifecycle as IL

    IL.append_tombstones(spark, path, ids)


def compact_neardup_index(spark, path: str) -> None:
    """Fold the tombstone log into the physical index: rewrite
    digests/bands/shingles minus retracted ids, rebuild band_stats
    from the rewritten bands, drop the tombstones table. After
    compaction the index is byte-equivalent to a fresh build over the
    surviving corpus (asserted in tests), and the capped probe path is
    valid again.

    Crash-safe by convergence, not atomicity: each table overwrite is
    an idempotent anti-join (a retried compaction no-ops on tables
    already rewritten), verdicts stay correct throughout because the
    tombstones table is removed only LAST, after every rewrite. The
    eager localCheckpoint detaches each rewrite from the files it
    overwrites; a 100 TB deployment would write a new versioned dir
    and swap, trading the checkpoint for a rename."""
    from spark_nnd_spark.operators import index_lifecycle as IL

    if not IL.compact(spark, path, _neardup_tables(spark, path)):
        return
    spark.read.parquet(f"{path}/bands").groupBy("band", "band_sig").agg(
        F.count("*").alias("cnt")
    ).write.mode("overwrite").parquet(f"{path}/band_stats")


def _neardup_tables(spark, path: str):
    """The family's physical tables for the shared lifecycle kernel —
    id column detected from each table (the build stamps the caller's
    id_col into the data)."""
    specs = []
    for tbl, part in (("digests", None), ("bands", "band"), ("shingles", None)):
        cols = spark.read.parquet(f"{path}/{tbl}").columns
        tbl_id = [c for c in cols if c not in ("band", "band_sig", "digest", "sh")][0]
        specs.append((tbl, tbl_id, part))
    return specs


def neardup_pairs_index(
    spark,
    path: str,
    threshold: float = 0.2,
    max_band_freq: int | None = None,
) -> DataFrame:
    """Verified MinHash-LSH near-dup pairs served ENTIRELY from a
    persisted index (build_neardup_index over the same doc set):
    banded self-join over the stored band signatures, hot-bucket cut
    from the stored O(buckets) stats, Jaccard verify from the stored
    shingle sidecar. Produces exactly ``minhash_lsh_pairs(corpus,...)``
    with the index's (num_hashes, bands, n) — asserted index==inline
    in tests — without touching document text at all.

    This is the operator the corpus-health queries (cluster sizes,
    keep/drop verdicts, cross-source overlap) should run at 100 TB:
    signatures are computed once at ingest; every downstream consumer
    joins stored integers. Per-query cost is the band self-join +
    candidate-sized verify, independent of corpus text size.
    """
    c_banded = spark.read.parquet(f"{path}/bands")
    id_col = [c for c in c_banded.columns if c not in ("band", "band_sig")][0]
    banded = c_banded.select(F.col(id_col).alias("id"), "band", "band_sig")
    tomb = _tombstones(spark, path, "id")
    if tomb is not None:
        if max_band_freq is not None:
            raise ValueError(
                "index has tombstones: pairs require max_band_freq=None "
                "(band_stats cannot subtract retracted members); run "
                "compact_neardup_index to restore the capped path"
            )
        banded = banded.join(F.broadcast(tomb), "id", "left_anti")
    if max_band_freq is not None:
        hot = (
            spark.read.parquet(f"{path}/band_stats")
            .filter(F.col("cnt") > max_band_freq)
            .select("band", "band_sig")
        )
        banded = banded.join(hot, ["band", "band_sig"], "left_anti")
    # the same materialize-per-reuse barrier as the inline path: both
    # self-join sides read one scan of the (already tiny) band table
    banded = banded.localCheckpoint(eager=True)
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "band_sig"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
        .localCheckpoint(eager=True)  # feeds ids derivation + verify join
    )
    ids = (
        cand.select(F.col("id_a").alias("cid"))
        .union(cand.select(F.col("id_b")))
        .distinct()
    )
    sh = (
        spark.read.parquet(f"{path}/shingles")
        .join(ids, F.col(id_col) == F.col("cid"), "left_semi")
        .select(F.col(id_col).alias("id"), "sh")
    )
    return (
        cand.join(
            sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a"
        )
        .join(
            sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b"
        )
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def hash_band_rows(
    df: DataFrame,
    hash_col: str = "phash",
    id_col: str = "doc_id",
    n_bands: int = 4,
    bits: int = 64,
) -> DataFrame:
    """Banded rows (id, h, band, band_val) over a packed integer
    fingerprint — the pigeonhole candidate key shared by the inline
    pair join (hash_hamming_pairs) and the persisted image-hash index
    (operators/multimodal.py build_image_index): band j is bits
    [j·(bits/n_bands), (j+1)·(bits/n_bands)) extracted with an
    unsigned shift, so both consumers band identically by
    construction."""
    if bits % n_bands != 0:
        raise ValueError(f"bits={bits} not divisible by n_bands={n_bands}")
    band_bits = bits // n_bands
    band_mask = (1 << band_bits) - 1
    return df.select(
        F.col(id_col).alias("id"),
        F.col(hash_col).alias("h"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.shiftrightunsigned(F.col(hash_col), band_bits * j)
                        .bitwiseAND(F.lit(band_mask))
                        .alias("band_val"),
                    )
                    for j in range(n_bands)
                ]
            )
        ).alias("bv"),
    ).select(
        "id",
        "h",
        F.col("bv.band").alias("band"),
        F.col("bv.band_val").alias("band_val"),
    )


def hash_hamming_pairs(
    df: DataFrame,
    hash_col: str = "phash",
    id_col: str = "doc_id",
    n_bands: int = 4,
    bits: int = 64,
    max_hamming: int = 3,
    max_band_freq: int | None = None,
) -> DataFrame:
    """Near-dup pairs over a fixed-width integer fingerprint (e.g. the
    64-bit perceptual aHash) by hamming distance, banded for scale —
    the q42 simhash machinery generalized to any packed bit hash.

    Candidates: split the hash into ``n_bands`` equal bit bands and
    equi-join docs agreeing on any band. Pigeonhole: any pair at
    hamming ≤ n_bands − 1 has an untouched band, so for
    ``max_hamming ≤ n_bands − 1`` recall is EXACT — banded output
    equals the all-pairs filter (which is what the DuckDB oracle runs).
    Verification is one XOR + popcount, whole-stage codegen.

    ``max_band_freq`` (off by default — it trades the exactness
    guarantee for bounded fan-out) drops band buckets hotter than the
    cap, the same skew guard as the MinHash/SimHash paths: a bucket of
    m identical-band docs fans out m²/2 candidates.
    """
    banded = hash_band_rows(df, hash_col, id_col, n_bands, bits)
    if max_band_freq is not None:
        hot = (
            banded.groupBy("band", "band_val")
            .agg(F.count("*").alias("bf"))
            .filter(F.col("bf") > max_band_freq)
            .select("band", "band_val")
        )
        banded = banded.join(hot, ["band", "band_val"], "left_anti")
    # materialized once: both sides of the self-join read it (the q42
    # pattern — without this the hash kernel upstream runs twice)
    banded = banded.localCheckpoint(eager=True)
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "band_val"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.col("x.h").alias("h_a"),
            F.col("y.h").alias("h_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ------------------------------------------------------- span scrub

def word_spans_expr(text_col: Column | str, span_words: int) -> Column:
    """Non-overlapping ``span_words``-token spans of a document as an
    array<string> (trailing partial span dropped) — the deterministic
    segmentation behind corpus-level span scrubbing (C4's "repeated
    three-sentence" rule re-expressed for unpunctuated token streams;
    Raffel et al. 2020 §2.2). Pure array lambdas: zero shuffle, and
    replayable in DuckDB via string_split + integer-division grouping.
    """
    toks = F.split(F.col(text_col) if isinstance(text_col, str) else text_col, " ")
    n_spans = F.floor(F.size(toks) / span_words).cast("int")
    return F.when(
        n_spans > 0,
        F.transform(
            F.sequence(F.lit(0), n_spans - F.lit(1)),
            lambda i: F.array_join(
                F.slice(toks, i * span_words + 1, span_words), " "
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def span_scrub(
    df: DataFrame,
    span_words: int = 5,
    min_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-level span scrub verdicts: one row per (doc, span
    occurrence) with the span's corpus document-frequency and whether
    the C4-style rule removes it (appears in >= ``min_df`` distinct
    docs). Extension operator (no reference analog — the reference's
    NND.scala has no text layer).

    Scale (100 TB): segmentation is a narrow map; the only wide ops are
    a groupBy on the span string (partial-agg combines identical spans
    map-side) and the df join back on the SAME key, which AQE can plan
    as one co-partitioned exchange. Shuffle carries spans once —
    O(corpus tokens), the floor for any corpus-frequency rule. The
    scrub set itself (df >= min_df) is the duplicated tail only, so a
    broadcast-join variant is available when the duplicate rate is low;
    the same-key join is the rate-independent default.
    """
    spans = df.select(
        F.col(id_col),
        F.posexplode(word_spans_expr(text_col, span_words)).alias(
            "span_idx", "span"
        ),
    )
    span_df = spans.groupBy("span").agg(
        F.countDistinct(id_col).alias("span_docfreq")
    )
    return spans.join(span_df, "span").select(
        F.col(id_col),
        "span_idx",
        "span",
        "span_docfreq",
        (F.col("span_docfreq") >= min_df).alias("scrubbed"),
    )


# --------------------------------------------- blocked fuzzy matching

def fuzzy_name_pairs(
    df: DataFrame,
    name_col: str,
    max_dist: int = 3,
    max_token_freq: int = 1000,
) -> DataFrame:
    """Entity-resolution fuzzy self-match: distinct-value pairs whose
    Levenshtein distance is in [1, ``max_dist``], candidate-blocked on
    a shared whitespace token. Returns (name_a, name_b, dist, n_a,
    n_b) where n_* are the row counts behind each distinct name.
    Extension operator (no reference analog).

    The blocking contract is part of the semantics (the LSH-banding
    convention): a pair is reported only if the two names share at
    least one token whose distinct-name frequency is <= 
    ``max_token_freq`` — the df-cut that bounds block fan-out exactly
    like ``max_shingle_freq`` does for the Jaccard join.

    Scale (100 TB): names are canonicalized FIRST (groupBy name → row
    counts), so the quadratic stage runs over distinct values, not
    rows — the dedupe-before-join move that makes ER tractable when a
    hot name covers millions of rows. The verify predicate
    (levenshtein) is a JVM built-in inside codegen, and the final
    row-count attach is a join against the small distinct-name table.
    """
    names = df.groupBy(F.col(name_col).alias("name")).agg(
        F.count("*").alias("n_rows")
    )
    # both the self-join sides and the count-attach read it
    names = names.localCheckpoint(eager=True)
    toks = names.select(
        "name", F.explode(F.array_distinct(F.split("name", " "))).alias("token")
    )
    tok_df = toks.groupBy("token").agg(F.countDistinct("name").alias("tf"))
    toks = (
        toks.join(tok_df, "token")
        .filter(F.col("tf") <= max_token_freq)
        .select("token", "name")
    )
    cand = (
        toks.alias("x")
        .join(toks.alias("y"), "token")
        .filter(F.col("x.name") < F.col("y.name"))
        .select(
            F.col("x.name").alias("name_a"), F.col("y.name").alias("name_b")
        )
        .distinct()
    )
    verified = cand.withColumn(
        "dist", F.levenshtein("name_a", "name_b")
    ).filter(F.col("dist") <= max_dist)
    na = names.select(F.col("name").alias("name_a"), F.col("n_rows").alias("n_a"))
    nb = names.select(F.col("name").alias("name_b"), F.col("n_rows").alias("n_b"))
    return (
        verified.join(F.broadcast(na), "name_a")
        .join(F.broadcast(nb), "name_b")
        .select("name_a", "name_b", "dist", "n_a", "n_b")
    )


def exact_span_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram_len: int = 6,
    min_span_tokens: int = 12,
    max_gram_freq: int | str | None = None,
    islands: DataFrame | None = None,
) -> DataFrame:
    """Exact-substring (verbatim span) dedup — the Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better"
    operation: find maximal runs of >= ``min_span_tokens`` consecutive
    tokens repeated VERBATIM across documents. Set-based tiers
    (MinHash/SimHash/winnowing) score whole-document overlap and dilute
    a short copied passage inside two otherwise-different documents;
    this operator finds exactly those spans.

    Spark-first re-expression of the paper's suffix-array scan:

    1. positional ``gram_len``-token gram hashes per doc
       (functions/text.ordered_shingle_hashes_expr — narrow, codegen);
    2. inverted-index equi-self-join on the gram hash (pairs exist
       only where content repeats — never all-pairs);
    3. island detection: two grams at (pos_a, pos_b) and
       (pos_a+1, pos_b+1) belong to the same verbatim run, so matches
       group by the alignment diagonal ``pos_a - pos_b`` and split on
       gaps via the pos_a - row_number() constant (the q110 SCD2 /
       q128 sorted-run-length convention). An island of k consecutive
       grams is a maximal verbatim span of k + gram_len - 1 tokens.

    Returns one row per (id_a, id_b) document pair with n_spans,
    max_span_tokens and matched_tokens (sum of span lengths over
    spans >= min_span_tokens).

    Scale (100 TB): the join shuffles O(repeated grams), not O(corpus)
    — unique content produces no posting collisions, so cost tracks
    the duplication rate exactly like the paper's suffix-array dedup.
    ``max_gram_freq`` is the df-cut skew guard for boilerplate grams
    (licence headers, templates) that would otherwise fan out
    quadratically; the island windows partition by (pair, diagonal) —
    millions of tiny partitions, no skew. Gram hashes are the shared
    portable polynomial hashes (functions/text.py), so a collision is
    identical in both engines; production would widen to 128-bit.
    """
    if islands is None:
        islands = _span_islands(df, text_col, id_col, gram_len, max_gram_freq)
    elif (gram_len, max_gram_freq) != (6, None):
        # a precomputed islands table was built with ITS OWN gram
        # parameters; accepting different ones here would silently
        # apply the wrong dedup (ADVICE r15) — min_span_tokens is the
        # only knob that composes with a prebuilt table
        msg = (
            "islands= was passed: gram_len/max_gram_freq belong to the "
            "islands build and must be left at their defaults here"
        )
        raise ValueError(msg)
    spans = islands.filter(F.col("span_tokens") >= min_span_tokens)
    return spans.groupBy("id_a", "id_b").agg(
        F.count("*").alias("n_spans"),
        F.max("span_tokens").alias("max_span_tokens"),
        F.sum("span_tokens").alias("matched_tokens"),
    )


def _span_islands(
    df: DataFrame,
    text_col: str,
    id_col: str,
    gram_len: int,
    max_gram_freq: int | str | None,
) -> DataFrame:
    """Shared island kernel behind exact_span_pairs (pair scores) and
    span_remove_rewrite (cut coordinates): one row per maximal verbatim
    run between an (id_a < id_b) document pair, with the run's token
    coordinates on BOTH sides — (id_a, id_b, diag, island, span_tokens,
    start_b, end_b), positions 1-based to match DuckDB list indexing.
    On a diagonal pos_a - pos_b is constant, so the a-side and b-side
    run lengths are identical."""
    from pyspark.sql.window import Window  # noqa: PLC0415

    posts = (
        _fan_out(df)
        .withColumn("_hs", TX.ordered_shingle_hashes_expr(text_col, gram_len))
        .select(
            F.col(id_col),
            F.posexplode("_hs").alias("pos0", "gh"),
        )
        # 1-based positions match DuckDB list indexing in the oracle
        .select(F.col(id_col), (F.col("pos0") + 1).alias("pos"), "gh")
        .localCheckpoint(eager=True)
    )
    if max_gram_freq == "auto":
        max_gram_freq = derived_df_cap(
            posts.groupBy("gh").agg(F.countDistinct(id_col).alias("df"))
        )
    if max_gram_freq is not None:
        hot = (
            posts.groupBy("gh")
            .agg(F.countDistinct(id_col).alias("df"))
            .filter(F.col("df") > max_gram_freq)
            .select("gh")
        )
        posts = posts.join(hot, "gh", "left_anti").localCheckpoint(eager=True)
    # Only grams seen in >= 2 DISTINCT docs can produce an (id_a <
    # id_b) pair; min(id) < max(id) is that test as two partial-agg
    # scalars (countDistinct would be a two-phase agg over ids). The
    # prefilter makes the PAIR JOIN O(repeated-gram postings) — on a
    # mostly-unique corpus a tiny fraction of the posting stream the
    # r14 plan exchanged in FULL, twice (once per join side). The
    # full stream is now touched only by (a) the map-side-combined
    # min/max aggregate, whose exchange carries one (gh, lo, hi) row
    # per gram-and-map-task, and (b) the semi-join scan; the surviving
    # postings are checkpointed so both pair-join sides read the
    # pruned table instead of re-running the filter.
    dup = (
        posts.groupBy("gh")
        .agg(F.min(id_col).alias("__lo"), F.max(id_col).alias("__hi"))
        .filter(F.col("__lo") < F.col("__hi"))
        .select("gh")
    )
    rep = posts.join(dup, "gh", "left_semi").localCheckpoint(eager=True)
    a = rep.select("gh", F.col(id_col).alias("id_a"), F.col("pos").alias("pos_a"))
    b = rep.select("gh", F.col(id_col).alias("id_b"), F.col("pos").alias("pos_b"))
    matches = (
        a.hint("shuffle_hash")
        .join(b, "gh")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "pos_a", "pos_b")
    )
    w = Window.partitionBy(
        "id_a", "id_b", F.col("pos_a") - F.col("pos_b")
    ).orderBy("pos_a")
    return (
        matches.withColumn("island", F.col("pos_a") - F.row_number().over(w))
        .groupBy(
            "id_a",
            "id_b",
            (F.col("pos_a") - F.col("pos_b")).alias("diag"),
            "island",
        )
        .agg(
            (F.max("pos_a") - F.min("pos_a") + F.lit(gram_len)).alias(
                "span_tokens"
            ),
            F.min("pos_b").alias("start_b"),
            (F.max("pos_b") + F.lit(gram_len) - 1).alias("end_b"),
        )
    )


def span_remove_rewrite(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram_len: int = 6,
    min_span_tokens: int = 12,
    max_gram_freq: int | None = None,
    islands: DataFrame | None = None,
) -> DataFrame:
    """Exact-substring span REMOVAL — the output Lee et al. 2022
    actually trains on: for every verbatim token run of >=
    ``min_span_tokens`` duplicated across documents, keep the copy in
    the smallest doc_id and cut it from every other document,
    returning the rewritten corpus as one row per doc:
    (doc_id, cleaned_text, n_spans_cut, tokens_cut).

    Keep-one-copy: every pair-island cuts its id_b side (id_a < id_b),
    so for a span shared by docs {2, 5, 9} docs 5 and 9 are cut (via
    pairs 2-5 / 2-9) and doc 2 — never an id_b — keeps the only copy.
    Overlapping cut intervals within a doc (the same region matched by
    several partners) are unioned before slicing, so tokens_cut counts
    each cut token once. Within-doc self-repetition is out of scope
    (the pair kernel is cross-doc by construction).

    Scale (100 TB): the heavy stage is the shared island kernel
    (O(repeated grams) shuffle — exact_span_pairs' measured contract);
    everything after it is O(cut intervals): a distinct, one per-doc
    interval-union window, a collect_list into O(docs-with-cuts) rows,
    and a LEFT join back to the corpus whose small side is the cut
    set (broadcast-able when the duplication rate is low). The text
    rewrite itself is a narrow codegen array expression — tokens are
    filtered by position against the doc's merged intervals, never
    exploded through a shuffle (document token order survives for
    free)."""
    if islands is None:
        islands = _span_islands(df, text_col, id_col, gram_len, max_gram_freq)
    elif (gram_len, max_gram_freq) != (6, None):
        # a precomputed islands table was built with ITS OWN gram
        # parameters; accepting different ones here would silently
        # apply the wrong dedup (ADVICE r15) — min_span_tokens is the
        # only knob that composes with a prebuilt table
        msg = (
            "islands= was passed: gram_len/max_gram_freq belong to the "
            "islands build and must be left at their defaults here"
        )
        raise ValueError(msg)
    cuts = (
        islands.filter(F.col("span_tokens") >= min_span_tokens)
        # same interval can arrive from several id_a partners
        .select(F.col("id_b").alias(id_col), "start_b", "end_b")
        .distinct()
    )
    return _apply_cut_intervals(df, cuts, text_col, id_col)


def _apply_cut_intervals(
    df: DataFrame,
    cuts: DataFrame,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Interval-union + token-slice rewrite shared by the
    corpus-internal keep-one-copy rewrite (span_remove_rewrite) and
    the index-served ingest scrub (span_scrub_index): ``cuts`` is
    (id_col, start_b, end_b) 1-based inclusive token intervals;
    overlapping intervals union per doc (running-max window — the
    islands pattern), the per-doc merged set collects to an array,
    and the text rewrite is a narrow codegen array filter. Emits one
    row per input doc: (id, cleaned_text, n_spans_cut, tokens_cut);
    untouched docs pass through with 0/0."""
    from pyspark.sql.window import Window  # noqa: PLC0415

    prev_end = F.max("end_b").over(
        Window.partitionBy(id_col)
        .orderBy("start_b", "end_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    grp = F.sum(
        F.when(
            F.col("start_b") > F.coalesce(prev_end, F.lit(-1)), 1
        ).otherwise(0)
    ).over(Window.partitionBy(id_col).orderBy("start_b", "end_b"))
    merged = (
        cuts.withColumn("grp", grp)
        .groupBy(id_col, "grp")
        .agg(F.min("start_b").alias("s"), F.max("end_b").alias("e"))
        .groupBy(id_col)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("s"), F.col("e")))
            ).alias("ivs")
        )
    )
    ivs = F.coalesce(
        F.col("ivs"), F.array().cast("array<struct<s:int,e:int>>")
    )
    toks = F.split(F.col(text_col), " ")
    kept = F.filter(
        toks,
        lambda t, i: ~F.exists(
            ivs, lambda iv: (i + 1 >= iv["s"]) & (i + 1 <= iv["e"])
        ),
    )
    return df.join(merged, id_col, "left").select(
        F.col(id_col),
        F.array_join(kept, " ").alias("cleaned_text"),
        F.coalesce(F.size("ivs"), F.lit(0)).cast("long").alias("n_spans_cut"),
        F.coalesce(
            F.aggregate(
                ivs, F.lit(0), lambda acc, iv: acc + iv["e"] - iv["s"] + 1
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("tokens_cut"),
    )


# --------------------------------------------------------------- span index

def build_span_index(
    corpus: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram_len: int = 6,
) -> None:
    """Persist a positional-gram index over the corpus so exact-span
    contamination probes (exact_span_pairs' one-sided ingest twin)
    never re-tokenize already-ingested text — the sixth persisted
    index family, same lifecycle discipline as the near-dup index
    (build → probe → extend → retract → compact, shared kernel in
    operators/index_lifecycle.py).

    Layout under ``path``:
    - ``meta``       — 1 row (gram_len): probe grams MUST be built
      with the same width, so it is recorded, never trusted to the
      caller.
    - ``grams``      — (doc_id, pos, gh): positional gram postings,
      repartitioned by gh and sorted within partitions so the probe's
      equi-join can skip row groups via min/max stats.
    - ``gram_stats`` — (gh, df): per-gram document frequency, so the
      probe-time boilerplate df-cut reads O(grams) stats instead of
      recomputing a corpus aggregate per batch.

    Build cost: one tokenize pass + one exchange on gh — the same
    exchange the inline pair join pays once per QUERY."""
    spark = corpus.sparkSession
    spark.createDataFrame([(gram_len,)], "gram_len int").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/meta")
    grams = (
        _fan_out(corpus)
        .withColumn("_hs", TX.ordered_shingle_hashes_expr(text_col, gram_len))
        .select(F.col(id_col), F.posexplode("_hs").alias("pos0", "gh"))
        .select(F.col(id_col), (F.col("pos0") + 1).alias("pos"), "gh")
    )
    grams.repartition("gh").sortWithinPartitions("gh").write.mode(
        "overwrite"
    ).parquet(f"{path}/grams")
    spark.read.parquet(f"{path}/grams").groupBy("gh").agg(
        F.count_distinct(F.col(id_col)).alias("df")
    ).write.mode("overwrite").parquet(f"{path}/gram_stats")
    corpus.select(id_col).distinct().write.mode("overwrite").parquet(
        f"{path}/ids"
    )


def span_query_index(
    spark,
    path: str,
    batch: DataFrame,
    min_span_tokens: int = 12,
    max_gram_freq: int | str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    _return_islands: bool = False,
) -> DataFrame:
    """Verbatim-span probe of a batch against the PERSISTED span index:
    for each (batch doc, indexed doc) pair sharing a maximal verbatim
    run of >= ``min_span_tokens`` tokens, returns (batch_id, index_id,
    n_spans, max_span_tokens, matched_tokens) — exact_span_pairs'
    island-merge kernel with the corpus side read from storage. The
    ingest-time shape of Lee et al. 2022 span decontamination: is this
    incoming doc a verbatim copy (in part) of anything already in the
    corpus / eval suite?

    Parity: probe grams use the gram_len recorded in meta; a batch doc
    also present in the index does not match itself (id inequality);
    retracted docs stop matching immediately (tombstone anti-join
    before the join). ``max_gram_freq`` cuts boilerplate grams by the
    STORED document frequency (gram_stats) — O(grams) stats, no corpus
    rescan.

    Scale: the join shuffles O(batch grams + matching corpus grams) —
    matching is bounded by how much of the batch's content is repeated
    corpus content; the corpus grams table streams through the
    equi-join without ever being re-tokenized."""
    from pyspark.sql.window import Window  # noqa: PLC0415

    from spark_nnd_spark.operators import index_lifecycle as IL  # noqa: PLC0415

    gram_len = spark.read.parquet(f"{path}/meta").first()["gram_len"]
    stored_id = [
        c for c in spark.read.parquet(f"{path}/grams").columns
        if c not in ("pos", "gh")
    ][0]
    qgrams = (
        batch.withColumn("_hs", TX.ordered_shingle_hashes_expr(text_col, gram_len))
        .select(F.col(id_col), F.posexplode("_hs").alias("pos0", "gh"))
        .select(
            F.col(id_col).alias("batch_id"),
            (F.col("pos0") + 1).alias("pos_q"),
            "gh",
        )
        .localCheckpoint(eager=True)
    )
    cgrams = IL.anti_tombstones(
        spark.read.parquet(f"{path}/grams"),
        IL.read_tombstones(spark, path),
        stored_id,
    ).select(
        F.col(stored_id).alias("index_id"), F.col("pos").alias("pos_c"), "gh"
    )
    if max_gram_freq == "auto":
        # derived from the STORED per-gram doc frequencies — O(grams)
        # metadata, no corpus rescan (the gram_stats contract)
        max_gram_freq = derived_df_cap(
            spark.read.parquet(f"{path}/gram_stats")
        )
    if max_gram_freq is not None:
        hot = (
            spark.read.parquet(f"{path}/gram_stats")
            .filter(F.col("df") > max_gram_freq)
            .select("gh")
        )
        qgrams = qgrams.join(F.broadcast(hot), "gh", "left_anti")
    # the BATCH side broadcasts (ingest micro-batches are small by
    # contract — the decontaminate_query_index discipline): the stored
    # grams table streams through the join with ZERO shuffle, so probe
    # shuffle is O(matches), independent of corpus size (measured:
    # BENCH_SPAN_SCALE.json; the pre-fix shuffle_hash plan exchanged
    # the O(N) corpus postings on every probe)
    matches = (
        cgrams.join(F.broadcast(qgrams), "gh")
        .filter(F.col("index_id") != F.col("batch_id"))
        .select("batch_id", "index_id", "pos_q", "pos_c")
        # retry-safety: a partially-failed-then-retried extend can leave
        # duplicate (doc_id, pos, gh) postings in the stored grams; the
        # set-based families absorb duplicates downstream, but a
        # duplicated positional match would double row_number on its
        # diagonal and split the island into ~half-length runs (spans
        # near min_span_tokens shrink or vanish). O(matches) distinct
        # makes the probe immune to duplicated postings.
        .distinct()
    )
    w = Window.partitionBy(
        "batch_id", "index_id", F.col("pos_q") - F.col("pos_c")
    ).orderBy("pos_q")
    spans = (
        matches.withColumn("island", F.col("pos_q") - F.row_number().over(w))
        .groupBy(
            "batch_id",
            "index_id",
            (F.col("pos_q") - F.col("pos_c")).alias("diag"),
            "island",
        )
        .agg(
            (F.max("pos_q") - F.min("pos_q") + F.lit(gram_len)).alias(
                "span_tokens"
            ),
            F.min("pos_q").alias("start_q"),
            (F.max("pos_q") + F.lit(gram_len) - 1).alias("end_q"),
        )
        .filter(F.col("span_tokens") >= min_span_tokens)
    )
    if _return_islands:
        return spans
    return spans.groupBy("batch_id", "index_id").agg(
        F.count("*").alias("n_spans"),
        F.max("span_tokens").alias("max_span_tokens"),
        F.sum("span_tokens").alias("matched_tokens"),
    )


def span_scrub_index(
    spark,
    path: str,
    batch: DataFrame,
    min_span_tokens: int = 12,
    max_gram_freq: int | str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Ingest-time span-decontamination REWRITE against the PERSISTED
    span index: where span_query_index FLAGS a candidate that shares a
    verbatim run of >= ``min_span_tokens`` tokens with an indexed doc,
    this emits the candidate's CLEANED text with every such run cut —
    the operation a pipeline actually applies when the index holds
    protected content (eval benchmarks, opted-out documents): admit
    the doc, remove the leaked span. Unlike span_remove_rewrite's
    corpus-internal keep-one-copy policy, EVERY matching batch-side
    occurrence is cut (the indexed side is the canonical copy by
    definition). One row per batch doc: (id, cleaned_text,
    n_spans_cut, tokens_cut); clean docs pass through 0/0.

    Scale: the probe is span_query_index's kernel verbatim (batch
    side broadcasts, stored postings never shuffle — measured flat,
    BENCH_SPAN_SCALE); the rewrite adds only O(cut intervals) wide
    work + the narrow token-slice (the shared _apply_cut_intervals
    kernel)."""
    islands = span_query_index(
        spark,
        path,
        batch,
        min_span_tokens=min_span_tokens,
        max_gram_freq=max_gram_freq,
        text_col=text_col,
        id_col=id_col,
        _return_islands=True,
    )
    cuts = (
        islands.select(
            F.col("batch_id").alias(id_col),
            F.col("start_q").alias("start_b"),
            F.col("end_q").alias("end_b"),
        )
        # several indexed partners can contribute the same interval
        .distinct()
    )
    return _apply_cut_intervals(batch, cuts, text_col, id_col)


def _span_tables(spark, path: str):
    import os  # noqa: PLC0415

    cols = spark.read.parquet(f"{path}/grams").columns
    tbl_id = [c for c in cols if c not in ("pos", "gh")][0]
    # physical layout reads depend on: gh-partitioned + gh-sorted
    tables = [("grams", tbl_id, None, ("gh", ["gh"]))]
    if os.path.isdir(f"{path}/ids"):  # absent on pre-roster indexes
        tables.append(("ids", tbl_id, None))
    return tables


def extend_span_index(
    spark,
    path: str,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Admit a batch into the span index: full upsert (shared kernel —
    tombstoned AND still-live overlap purged, so a duplicate
    submission or crashed re-extension never leaves second copies of
    a doc's positional grams, which would corrupt probe span extents),
    append the batch's positional grams, refresh gram_stats
    (count_distinct — a recompute that cannot double-count). The
    live-overlap check reads the O(docs) ``ids`` roster, never the
    grams; pre-roster indexes migrate once."""
    import os  # noqa: PLC0415

    from spark_nnd_spark.operators import index_lifecycle as IL  # noqa: PLC0415

    gram_len = spark.read.parquet(f"{path}/meta").first()["gram_len"]
    # Detach the batch from any lineage that reads this index's own
    # parquet files BEFORE the upsert's overwrite can invalidate those
    # input files mid-extend (matches the winnow twin).
    new_docs = new_docs.localCheckpoint(eager=True)
    stored_id = _span_tables(spark, path)[0][1]
    if not os.path.isdir(f"{path}/ids"):
        spark.read.parquet(f"{path}/grams").select(
            stored_id
        ).distinct().write.mode("overwrite").parquet(f"{path}/ids")
    IL.settle_upsert(
        spark, path, new_docs.select(id_col), _span_tables(spark, path),
        roster=("ids", stored_id, None),
    )
    new_docs.select(F.col(id_col).alias(stored_id)).distinct().write.mode(
        "append"
    ).parquet(f"{path}/ids")
    (
        new_docs.withColumn(
            "_hs", TX.ordered_shingle_hashes_expr(text_col, gram_len)
        )
        .select(F.col(id_col), F.posexplode("_hs").alias("pos0", "gh"))
        .select(
            F.col(id_col).alias(stored_id),
            (F.col("pos0") + 1).alias("pos"),
            "gh",
        )
        .write.mode("append")
        .parquet(f"{path}/grams")
    )
    spark.read.parquet(f"{path}/grams").groupBy("gh").agg(
        F.count_distinct(F.col(stored_id)).alias("df")
    ).write.mode("overwrite").parquet(f"{path}/gram_stats")


def retract_from_span_index(spark, path: str, ids: DataFrame) -> None:
    """O(retracted) tombstone append; the probe anti-joins it, so a
    retracted doc stops matching immediately (the shared lifecycle
    contract). gram_stats keeps pre-retraction counts until compaction
    — the df-cut may over-cut, never under-cut, while tombstoned."""
    from spark_nnd_spark.operators import index_lifecycle as IL  # noqa: PLC0415

    IL.append_tombstones(spark, path, ids)


def compact_span_index(spark, path: str) -> None:
    """Fold the tombstone log into grams (layout-preserving rewrite),
    rebuild gram_stats, drop the log last — byte-equivalent to a fresh
    build over the surviving corpus (asserted in tests)."""
    from spark_nnd_spark.operators import index_lifecycle as IL  # noqa: PLC0415

    if not IL.compact(spark, path, _span_tables(spark, path)):
        return
    stored_id = _span_tables(spark, path)[0][1]
    spark.read.parquet(f"{path}/grams").groupBy("gh").agg(
        F.count_distinct(F.col(stored_id)).alias("df")
    ).write.mode("overwrite").parquet(f"{path}/gram_stats")


def build_winnow_index(
    corpus: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 4,
    w: int = 4,
) -> None:
    """Persist a winnowed-fingerprint index over the corpus so local-
    passage copy probes (winnow_pairs' one-sided ingest twin) never
    re-shingle already-ingested text — the eleventh persisted index
    family, same lifecycle discipline as the near-dup and span indexes
    (build → probe → extend → retract → compact, shared kernel in
    operators/index_lifecycle.py). Winnowing (Schleimer/Wilkerson/
    Aiken, SIGMOD 2003) keeps ~2/(w+1) of the positional shingle
    hashes while guaranteeing any shared run of ~w+n consecutive
    tokens surfaces at least one common fingerprint, so the stored
    postings are a constant factor smaller than the span index's full
    gram stream at the cost of span-extent information: probes report
    SHARED-FINGERPRINT counts (evidence of copied passages), not exact
    span boundaries.

    Layout under ``path``:
    - ``meta``     — 1 row (n, w): probe fingerprints MUST be built
      with the same shingle width and window, so they are recorded
      with the index, never trusted to the caller.
    - ``fps``      — (doc_id, fp): per-doc DISTINCT selected
      fingerprints, repartitioned by fp and sorted within partitions
      so the probe's equi-join can skip row groups via min/max stats.
    - ``fp_stats`` — (fp, df): per-fingerprint document frequency for
      the probe-time boilerplate cut — O(fps) stats, no corpus rescan
      per batch.
    - ``ids``      — (doc_id): the admitted-doc roster, O(docs) rows —
      extend's duplicate-submission upsert checks the incoming batch
      against THIS table instead of scanning the ~2L/(w+1)-x-larger
      postings, so the no-overlap common path pays a roster-sized
      read, not a postings-sized one.

    Build cost: one tokenize pass + one exchange on fp — the same
    exchange the inline pair join pays once per QUERY."""
    spark = corpus.sparkSession
    spark.createDataFrame([(n, w)], "n int, w int").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/meta")
    fps = (
        _fan_out(corpus)
        .withColumn("_hs", TX.ordered_shingle_hashes_expr(text_col, n))
        .select(
            F.col(id_col),
            F.explode(TX.winnow_select_expr(F.col("_hs"), w)).alias("fp"),
        )
    )
    fps.repartition("fp").sortWithinPartitions("fp").write.mode(
        "overwrite"
    ).parquet(f"{path}/fps")
    _write_fp_stats(spark, path)
    corpus.select(F.col(id_col).alias(id_col)).distinct().write.mode(
        "overwrite"
    ).parquet(f"{path}/ids")


def _write_fp_stats(spark, path: str) -> None:
    """fp_stats = DISTINCT-doc frequency per fingerprint (the probe's
    own distinct-fp convention): on clean postings identical to a row
    count (per-doc fps are distinct by construction), but immune to
    the duplicate rows a crashed admit-novel re-extension can leave
    behind — the recompute genuinely cannot double-count."""
    stored_id = _winnow_tables(spark, path)[0][1]
    spark.read.parquet(f"{path}/fps").groupBy("fp").agg(
        F.count_distinct(F.col(stored_id)).alias("df")
    ).write.mode("overwrite").parquet(f"{path}/fp_stats")


def winnow_query_index(
    spark,
    path: str,
    batch: DataFrame,
    min_shared: int = 2,
    max_fp_freq: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    exclude_ids: DataFrame | None = None,
) -> DataFrame:
    """Copied-passage probe of a batch against the PERSISTED winnow
    index: for each (batch doc, indexed doc) pair sharing >=
    ``min_shared`` selected fingerprints, returns (batch_id, index_id,
    n_shared) — winnow_pairs' inverted-index join with the corpus side
    read from storage. The ingest-time plagiarism/near-dup shape: does
    this incoming doc locally copy anything already admitted?

    Parity: probe fingerprints use the (n, w) recorded in meta; a
    batch doc also present in the index does not match itself (id
    inequality); retracted docs stop matching immediately (tombstone
    anti-join before the join). ``max_fp_freq`` cuts boilerplate
    fingerprints by document frequency — and the df SOURCE is
    branch-dependent by design: the default path reads the STORED
    fp_stats (under a pending tombstone log the stored df over-counts
    retracted docs until compaction, so the cut may over-cut, never
    under-cut — the span-index contract), while the ``exclude_ids``
    path RECOMPUTES df from the masked postings (excluding both
    tombstoned and probe-excluded docs) so a replayed probe cuts the
    exact same fingerprints its first attempt did. The same probe can
    therefore cut differently with vs without ``exclude_ids`` while a
    tombstone log is pending: the default branch trades exactness for
    an O(stats) read; the replay branch pays the recompute because the
    gate's purity demands it. ``exclude_ids`` masks those index ids
    for THIS probe only (no tombstone write) — the replay-purity hook
    the admit-novel ingest gate uses so a crashed batch that partially
    admitted itself re-probes against the exact pre-batch index state.

    Scale: the batch's fingerprint set (small — ~2/(w+1) of its
    shingles) broadcasts into the fp-sorted postings scan, so the join
    shuffles O(matching corpus postings) and the stored postings are
    never re-shingled; the stats join is fp-keyed and pruned the same
    way."""
    from spark_nnd_spark.operators import index_lifecycle as IL  # noqa: PLC0415

    meta = spark.read.parquet(f"{path}/meta").first()
    bfp = (
        batch.withColumn("_hs", TX.ordered_shingle_hashes_expr(text_col, meta["n"]))
        .select(
            F.col(id_col).alias("batch_id"),
            F.explode(TX.winnow_select_expr(F.col("_hs"), meta["w"])).alias("fp"),
        )
        .localCheckpoint(eager=True)
    )
    tomb = IL.read_tombstones(spark, path)
    stored_id = _winnow_tables(spark, path)[0][1]
    posts = IL.anti_tombstones(
        spark.read.parquet(f"{path}/fps"), tomb, stored_id
    ).select(F.col(stored_id).alias("index_id"), "fp")
    if exclude_ids is not None:
        posts = posts.join(
            F.broadcast(
                exclude_ids.select(
                    F.col(exclude_ids.columns[0]).alias("index_id")
                ).distinct()
            ),
            "index_id",
            "left_anti",
        )
    if max_fp_freq is not None:
        if exclude_ids is None:
            hot = (
                spark.read.parquet(f"{path}/fp_stats")
                .join(
                    F.broadcast(bfp.select("fp").distinct()), "fp", "left_semi"
                )
                .filter(F.col("df") > max_fp_freq)
                .select("fp")
            )
        else:
            # Replay purity for the admit-novel gate: the stored
            # fp_stats may already include a crashed attempt's
            # partially-admitted batch, so a replayed probe cutting on
            # them could over-cut relative to the first attempt.
            # Recompute df for JUST the batch's fingerprints from the
            # masked postings themselves — both the first attempt and
            # any replay see the identical pre-batch df, and the
            # O(matching postings) aggregate is the same order as the
            # probe join it gates.
            hot = (
                posts.join(
                    F.broadcast(bfp.select("fp").distinct()), "fp", "left_semi"
                )
                .groupBy("fp")
                .agg(F.count_distinct("index_id").alias("df"))
                .filter(F.col("df") > max_fp_freq)
                .select("fp")
            )
        bfp = bfp.join(F.broadcast(hot), "fp", "left_anti")
    # count DISTINCT fp, not rows: identical on clean postings (per-doc
    # distinct by construction) but immune to the duplicate postings a
    # crashed admit-novel extension can leave behind
    return (
        posts.join(F.broadcast(bfp), "fp")
        .filter(F.col("batch_id") != F.col("index_id"))
        .groupBy("batch_id", "index_id")
        .agg(F.count_distinct("fp").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def _winnow_tables(spark, path: str):
    import os  # noqa: PLC0415

    cols = spark.read.parquet(f"{path}/fps").columns
    tbl_id = [c for c in cols if c != "fp"][0]
    # physical layout reads depend on: fp-partitioned + fp-sorted
    tables = [("fps", tbl_id, None, ("fp", ["fp"]))]
    if os.path.isdir(f"{path}/ids"):  # absent on pre-roster indexes
        tables.append(("ids", tbl_id, None))
    return tables


def extend_winnow_index(
    spark,
    path: str,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Admit a batch into the winnow index: upsert, append the batch's
    selected fingerprints, refresh fp_stats. The upsert purges the
    incoming ids' old physical rows UNCONDITIONALLY — tombstoned
    (settle_readmission, which also clears their tombstones) AND still
    live (a duplicate submission or a crashed admit-novel re-extension)
    — so the batch's version of each doc is the only one stored and no
    duplicate postings survive to drift the capped pairs sweep or the
    compact==fresh-build invariant. fp_stats is recomputed as
    DISTINCT-doc counts (:func:`_write_fp_stats`), so the refresh
    cannot double-count even against postings written by an interrupted
    attempt."""
    from spark_nnd_spark.operators import index_lifecycle as IL  # noqa: PLC0415

    import os  # noqa: PLC0415

    meta = spark.read.parquet(f"{path}/meta").first()
    new_docs = new_docs.localCheckpoint(eager=True)
    stored_id = _winnow_tables(spark, path)[0][1]
    if not os.path.isdir(f"{path}/ids"):
        # one-time migration of a pre-roster index: derive the roster
        # from the postings so every later extend pays O(docs) reads
        spark.read.parquet(f"{path}/fps").select(
            stored_id
        ).distinct().write.mode("overwrite").parquet(f"{path}/ids")
    IL.settle_upsert(
        spark, path, new_docs.select(id_col), _winnow_tables(spark, path),
        roster=("ids", stored_id, None),
    )
    new_docs.select(F.col(id_col).alias(stored_id)).distinct().write.mode(
        "append"
    ).parquet(f"{path}/ids")
    (
        new_docs.withColumn(
            "_hs", TX.ordered_shingle_hashes_expr(text_col, meta["n"])
        )
        .select(
            F.col(id_col).alias(stored_id),
            F.explode(TX.winnow_select_expr(F.col("_hs"), meta["w"])).alias("fp"),
        )
        .write.mode("append")
        .parquet(f"{path}/fps")
    )
    _write_fp_stats(spark, path)


def retract_from_winnow_index(spark, path: str, ids: DataFrame) -> None:
    """O(retracted) tombstone append; the probe anti-joins it, so a
    retracted doc stops matching immediately (the shared lifecycle
    contract). fp_stats keeps pre-retraction counts until compaction —
    the boilerplate cut may over-cut, never under-cut, while
    tombstoned."""
    from spark_nnd_spark.operators import index_lifecycle as IL  # noqa: PLC0415

    IL.append_tombstones(spark, path, ids)


def compact_winnow_index(spark, path: str) -> None:
    """Fold the tombstone log into fps (layout-preserving rewrite),
    rebuild fp_stats, drop the log last — byte-equivalent to a fresh
    build over the surviving corpus (asserted in tests)."""
    from spark_nnd_spark.operators import index_lifecycle as IL  # noqa: PLC0415

    if not IL.compact(spark, path, _winnow_tables(spark, path)):
        return
    _write_fp_stats(spark, path)


def winnow_pairs_index(
    spark,
    path: str,
    min_shared: int = 2,
    max_fp_freq: int | None = None,
) -> DataFrame:
    """Winnowed-fingerprint copy pairs served ENTIRELY from a persisted
    winnow index (build_winnow_index over the same doc set): inverted
    self-join over the stored per-doc fingerprints, boilerplate cut
    from the stored O(fps) df stats. Produces exactly
    ``winnow_pairs(corpus, n, w, min_shared, max_fp_freq)`` with the
    index's (n, w) — asserted index==inline in tests — without
    touching document text at all (the neardup_pairs_index convention
    for the eleventh family).

    This is the corpus-health shape at 100 TB: fingerprints are
    computed once at ingest; the pair sweep joins stored integers.
    Per-query cost is the fp self-join on the capped postings,
    independent of corpus text size.

    Under a pending tombstone log the stored df over-counts, so the
    cut could silently differ from a fresh build's; like the near-dup
    family, the capped path therefore refuses while tombstones exist —
    compact first. The uncapped path stays exact under tombstones
    (anti-join before the self-join)."""
    from spark_nnd_spark.operators import index_lifecycle as IL  # noqa: PLC0415

    stored_id = _winnow_tables(spark, path)[0][1]
    posts = spark.read.parquet(f"{path}/fps")
    tomb = IL.read_tombstones(spark, path)
    if tomb is not None:
        if max_fp_freq is not None:
            raise ValueError(
                "index has tombstones: pairs require max_fp_freq=None "
                "(fp_stats cannot subtract retracted members); run "
                "compact_winnow_index to restore the capped path"
            )
        posts = IL.anti_tombstones(posts, tomb, stored_id)
    if max_fp_freq is not None:
        hot = (
            spark.read.parquet(f"{path}/fp_stats")
            .filter(F.col("df") > max_fp_freq)
            .select("fp")
        )
        posts = posts.join(hot, "fp", "left_anti")
    # adaptive census prefilter (r16, the winnow_pairs twin): the
    # min<max pairable prune over the POST-CUT postings (NOT stored
    # fp_stats, so it is exact under every branch above), engaged only
    # where it pays; the hot cut already happened from stored stats,
    # so no cap is passed.
    posts = _pruned_fp_postings(posts, stored_id, None)
    a = posts.select("fp", F.col(stored_id).alias("id_a"))
    b = posts.select("fp", F.col(stored_id).alias("id_b"))
    # count_distinct for the same crashed-admit immunity as the probe
    return (
        a.hint("shuffle_hash").join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count_distinct("fp").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
