"""Training-data-pipeline queries over documents/embeddings/events,
each paired with a DuckDB oracle (portable-arithmetic hashes make even
MinHash/SimHash oracle-checkable — functions/text.py).

Float-output discipline (the driver hash-compares values):
- ratios/similarities rounded to 6 decimals on BOTH sides;
- money sums via DECIMAL(18,2) (exact, order-independent) then cast;
- timestamps exported as epoch seconds (BIGINT) to dodge cross-engine
  datetime formatting.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_nnd_spark.functions import text as TX
from spark_nnd_spark.operators import dedup as DD
from spark_nnd_spark.operators import events as EV
from spark_nnd_spark.operators import multimodal as MM
from spark_nnd_spark.operators import similarity as SIM
from spark_nnd_spark.sources import load_table


# --------------------------------------------------------------- text

def q11_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: token counts, fingerprint, quality ratios,
    language prediction — all portable arithmetic."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        TX.token_count_expr("text").alias("n_tokens"),
        TX.fingerprint_expr("text").alias("fingerprint"),
        F.round(TX.stopword_ratio_expr("text"), 6).alias("stopword_ratio"),
        F.round(TX.avg_token_len_expr("text"), 6).alias("avg_token_len"),
        F.round(TX.type_token_ratio_expr("text"), 6).alias("type_token_ratio"),
        TX.predicted_lang_expr("text").alias("pred_lang"),
    ).orderBy("doc_id")


def q12_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return DD.exact_dedup(d).orderBy("digest")


def q13_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return DD.fingerprint_dedup(d).orderBy("fp")


# Skew guards, mirrored in the DuckDB oracles so results match by
# construction at every SF. At sf0.01 the hottest shingle df is 7 and
# the hottest LSH band bucket holds 3 docs, so 100 leaves small-SF
# results untouched while bounding the self-join fan-out at scale
# (worst case O(cap^2) pairs per key instead of quadratic in a hot
# key's document frequency).
MAX_SHINGLE_FREQ = 100
MAX_BAND_FREQ = 100


def q14_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    out = DD.jaccard_pairs(d, n=3, threshold=0.2, max_shingle_freq=MAX_SHINGLE_FREQ)
    return out.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    ).orderBy("id_a", "id_b")


def q15_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signatures exploded to (doc_id, hash_idx, h) — integer rows."""
    d = load_table(spark, sf_dir, "documents")
    sigs = DD.minhash_signatures(d, num_hashes=16, n=3)
    return sigs.select(
        F.col("id").alias("doc_id"), F.posexplode("signature").alias("hash_idx", "h")
    ).orderBy("doc_id", "hash_idx")


def q16_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    out = DD.minhash_lsh_pairs(
        d, num_hashes=16, bands=4, n=3, threshold=0.2, max_band_freq=MAX_BAND_FREQ
    )
    return out.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    ).orderBy("id_a", "id_b")


def q17_simhash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return DD.simhash_dedup(d).orderBy("simhash")


def q31_neardup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup clusters: MinHash-LSH pairs → connected
    components (min-label propagation), the corpus-dedup final step."""
    return _components_for(spark, sf_dir).select(
        F.col("id").alias("doc_id"), "component"
    ).orderBy("doc_id")


# --------------------------------------------------------- embeddings

def q18_ann_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k — one run per session; q33 grades
    every approximate tier against THIS list (knn._ann_tier_for)."""
    from spark_nnd_spark.queries.knn import _tier_brute  # noqa: PLC0415

    return _tier_brute(spark, sf_dir).select(
        "query_id", "nb_id", "rank", F.round("cosine", 6).alias("cosine")
    ).orderBy("query_id", "rank")


def q19_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs near-dup (the oracle-checkable tier; the LSH
    blocked variant is validated against it in tests)."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = SIM.embedding_neardup_exact(emb, threshold=0.45)
    return out.select(
        "id_a", "id_b", F.round("cosine", 6).alias("cosine")
    ).orderBy("id_a", "id_b")


# --------------------------------------------------- multimodal (binary)
# The corpus has no real media files; payloads are the documents' UTF-8
# bytes (ASCII ⇒ bytes == codepoints, so DuckDB can oracle-check the
# byte arithmetic). The mapInPandas plumbing is the real deliverable —
# a true codec would swap in behind operators/multimodal.py `codec=`.

def q27_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    out = MM.image_stats(d, id_col="doc_id", height=16, width=16, channels=1)
    return out.select(
        F.col("id").alias("doc_id"),
        "n_bytes",
        F.round("mean_px", 4).alias("mean_px"),
        F.round("std_px", 4).alias("std_px"),
    ).orderBy("doc_id")


def q28_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    out = MM.sample_frames(d, frame_bytes=64, every=4, id_col="doc_id")
    return out.select(
        F.col("id").alias("doc_id"), "frame_idx", "frame_digest"
    ).orderBy("doc_id", "frame_idx")


def q29_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    out = MM.audio_stats(d, id_col="doc_id")
    return out.select(
        F.col("id").alias("doc_id"),
        "n_samples",
        F.round("rms", 4).alias("rms"),
        "zero_crossings",
    ).orderBy("doc_id")


# ------------------------------------------------------------- events

def q20_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = EV.sessionize(ev, gap_minutes=30)
    return out.select(
        "user_id",
        "session_id",
        "n_events",
        F.col("t_start").cast("long").alias("t_start_epoch"),
        F.col("t_end").cast("long").alias("t_end_epoch"),
    ).orderBy("user_id", "session_id")


def q21_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).cast("long").alias("w_start_epoch"),
            "event_type",
        )
        .agg(
            F.count("*").alias("c"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("string").alias("v"),
        )
        .orderBy("w_start_epoch", "event_type")
    )


def q22_running_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-user cumulative value; DECIMAL keeps the running sum
    exact and order-independent for the oracle compare."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        ev.select(
            "user_id",
            "event_id",
            F.sum(F.col("value").cast("decimal(18,2)"))
            .over(w)
            .cast("string")
            .alias("running_value"),
        )
        .orderBy("user_id", "event_id")
    )


def q32_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column path: extract a field from the JSON
    ``props`` string and aggregate it — `get_json_object` stays JVM-side
    (Jackson), no UDF."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("c"),
            F.sum("k").alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
        .orderBy("event_type")
    )


def q23_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = EV.latest_event_per_user(ev)
    return out.select(
        "user_id",
        "event_id",
        F.col("ts").cast("long").alias("ts_epoch"),
        "event_type",
        F.round("value", 6).alias("value"),
    ).orderBy("user_id")


def q35_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level token frequency top-50 — the vocabulary-building
    primitive. Explode → count (map-side partial agg collapses each
    task to its distinct tokens, so the shuffle is O(vocab), not
    O(corpus tokens)) → one tiny global top-k."""
    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(TX.tokens_expr("text")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    return counts.orderBy(F.desc("n"), "token").limit(50).select("token", "n")


def q36_lang_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language top-10 token bigrams (adjacent token pairs) by
    count — grouped top-k over an exploded n-gram stream, all integer
    arithmetic. Two shuffles: (lang, bigram) count with map-side
    partials, then the per-lang window top-k."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    toks = TX.tokens_expr("text")
    bigrams = F.filter(
        F.zip_with(
            toks,
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
        lambda s: s.contains(" "),
    )
    # Project lang + the bigram array FIRST, behind a materialization
    # barrier: fused with the generator, Catalyst re-inlines both
    # expressions into the exploded stream and recomputes them per
    # bigram row (measured 11.3s vs 1.5s at sf0.1 — same pathology as
    # the MinHash projection collapse, dedup.py minhash_signatures).
    # localCheckpoint (the q70 idiom), NOT repartition: a shuffle-as-
    # barrier would move the whole projected (lang, bigram-array)
    # stream — roughly the tokenized corpus — across the wire at scale,
    # while the checkpoint pins the computed partitions in place.
    base = d.select(
        TX.predicted_lang_expr("text").alias("lang"), bigrams.alias("__bg")
    ).localCheckpoint(eager=True)
    counts = (
        base.select("lang", F.explode("__bg").alias("bigram"))
        .groupBy("lang", "bigram")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("n"), "bigram")
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("lang", "rank", "bigram", "n")
        .orderBy("lang", "rank")
    )


def q37_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-gate composition — the keep/drop decision of a training
    corpus pipeline as one narrow scan: every gate is a JVM expression,
    no shuffle at all until the final ORDER BY."""
    d = load_table(spark, sf_dir, "documents")
    n_tok = TX.token_count_expr("text")
    stop = TX.stopword_ratio_expr("text")
    ttr = TX.type_token_ratio_expr("text")
    return (
        d.select(
            "doc_id",
            n_tok.alias("n_tokens"),
            F.round(stop, 6).alias("stopword_ratio"),
            F.round(ttr, 6).alias("type_token_ratio"),
            (
                (n_tok >= 5)
                & (stop <= 0.6)
                & (ttr >= 0.3)
            ).alias("keep"),
        )
        .orderBy("doc_id")
    )


def q38_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-type value percentiles (p50/p90/p99) — sort-based
    aggregation; Spark's exact percentile and DuckDB's quantile_cont
    share the linear-interpolation definition."""
    ev = load_table(spark, sf_dir, "events")
    pct = lambda p: F.expr(f"percentile(value, {p})")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(pct(0.5), 6).alias("p50"),
            F.round(pct(0.9), 6).alias("p90"),
            F.round(pct(0.99), 6).alias("p99"),
        )
        .orderBy("event_type")
    )


def q34_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click event picks up the user's most recent
    prior (or simultaneous) purchase — union+window plan, one shuffle
    on user_id; oracle is DuckDB's native ASOF JOIN."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    return (
        EV.asof_join(clicks, purchases)
        .select(
            "event_id",
            "user_id",
            F.col("ts").cast("long").alias("ts_epoch"),
            F.round("value_asof", 6).alias("purchase_value"),
            F.col("ts_asof").cast("long").alias("purchase_ts_epoch"),
        )
        .orderBy("event_id")
    )


def q39_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-3 terms by TF-IDF — the classic signature-term
    extraction. Three aggregations, each with map-side partials: term
    counts on (doc_id, token), document frequency on token, then a
    per-doc window top-k. The corpus size joins in as a broadcast
    1-row aggregate (no driver collect); the df table joins on token
    (AQE broadcasts it at this scale; at 100 TB vocab it stays a hash
    join, which is the right plan). tf is materialized once — it feeds
    both the scoring join and the df aggregate, and without the cut
    Catalyst re-executes the whole scan+explode+agg subtree for the
    second consumer (a second full corpus scan)."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(TX.tokens_expr("text")).alias("token")).filter(
        F.col("token") != ""
    )
    tf = (
        toks.groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=True)
    )
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    n = d.select(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n))
        .withColumn("score", F.col("tf") * F.log(F.col("n_docs") / F.col("df")))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "token")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "doc_id",
            F.col("rank").cast("long").alias("rank"),
            "token",
            "tf",
            "df",
            F.round("score", 6).alias("tfidf"),
        )
        .orderBy("doc_id", "rank")
    )


# Downsample the dominant language, keep the rest — the source-mixture
# rebalance of a multilingual training corpus. Thresholds are literals
# derived from these rates, replayed bit-for-bit by the oracle.
Q40_RATES = {"en": 0.3, "de": 0.8, "es": 0.8, "fr": 0.8, "zh": 0.75}


def q40_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified Bernoulli sample keyed on md5(doc_id) —
    no RNG state, no shuffle: one narrow filter pushed into the scan
    (operators/sampling.py)."""
    from spark_nnd_spark.operators import sampling as SA

    d = load_table(spark, sf_dir, "documents")
    return (
        SA.stratified_sample(d, Q40_RATES, strata_col="lang", id_col="doc_id")
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


def q41_rollup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level aggregate via ROLLUP(event_type, hour-of-day) —
    detail rows, per-type subtotals and the grand total in ONE pass
    (Catalyst expands the grouping sets; partial aggregation still
    applies map-side). DECIMAL keeps the value sums exact."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select("event_type", F.hour("ts").alias("hod"), "value")
    return (
        base.rollup("event_type", "hod")
        .agg(
            F.count("*").alias("c"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("string").alias("v"),
            F.grouping("event_type").cast("int").alias("g_type"),
            F.grouping("hod").cast("int").alias("g_hod"),
        )
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce(F.col("hod"), F.lit(-1)).cast("long").alias("hod"),
            "g_type",
            "g_hod",
            "c",
            "v",
        )
        .orderBy("event_type", "hod")
    )


def q42_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded SimHash near-dup pairs at hamming ≤ 3 with the band-freq
    skew guard ON (operators/dedup.simhash_neardup_pairs); the oracle
    replays bands, guard and popcount verbatim."""
    d = load_table(spark, sf_dir, "documents")
    return (
        DD.simhash_neardup_pairs(d, max_hamming=3, max_band_freq=50)
        .withColumn("hamming", F.col("hamming").cast("int"))
        .orderBy("id_a", "id_b")
    )


def q43_nearby_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event count of same-user events within ±5 minutes — a
    bucketized interval self-join (operators/events.range_join), then
    a count and a left join back so isolated events keep n_nearby=0.
    The oracle is the naive inequality join; the engine never runs
    that plan."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select("event_id", "user_id", "ts")
    pairs = EV.range_join(base, base, keys=["user_id"], lower_sec=-300, upper_sec=300)
    near = (
        pairs.filter(F.col("event_id_r") != F.col("event_id"))
        .groupBy("event_id")
        .agg(F.count("*").alias("n"))
    )
    return (
        base.join(near, "event_id", "left")
        .select(
            "event_id",
            "user_id",
            F.col("ts").cast("long").alias("ts_epoch"),
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_nearby"),
        )
        .orderBy("event_id")
    )


def q44_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids (operators/similarity
    .label_centroids): posexplode → partial-aggregated groupBy, all
    JVM-side."""
    e = load_table(spark, sf_dir, "embeddings")
    return (
        SIM.label_centroids(e)
        .select(
            "label",
            F.col("i").cast("long").alias("i"),
            F.round("centroid", 6).alias("centroid"),
            "n",
        )
        .orderBy("label", "i")
    )


def q48_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap analysis: lag() per user stream, then exact gap
    percentiles per event type — the latency/dwell-time profile query.
    One shuffle on user_id for the window, one on event_type for the
    percentile sort-agg."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type",
        (F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    pct = lambda p: F.expr(f"percentile(gap, {p})")  # noqa: E731
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(pct(0.5), 6).alias("gap_p50"),
            F.round(pct(0.9), 6).alias("gap_p90"),
            F.max("gap").alias("gap_max"),
        )
        .orderBy("event_type")
    )


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q49_pivot_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user event counts spread across one column per event
    type. The pivot values are DECLARED (EVENT_TYPES), not discovered —
    discovery would cost an extra distinct scan and make the schema
    data-dependent, which a production pipeline can't have. Plans as a
    single hash aggregate with map-side partials; missing combinations
    coalesce to 0."""
    ev = load_table(spark, sf_dir, "events")
    pivoted = ev.groupBy("user_id").pivot("event_type", EVENT_TYPES).count()
    return pivoted.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in EVENT_TYPES],
    ).orderBy("user_id")


def q50_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition score (Gopher-style quality signal):
    fraction of n-gram slots occupied by repeats = 1 − distinct/total
    3-shingles. Pure narrow expressions — no shuffle before the final
    sort; the filter a pipeline applies before any cross-doc dedup."""
    d = load_table(spark, sf_dir, "documents")
    total = F.greatest(TX.token_count_expr("text") - 2, F.lit(0))
    distinct = F.size(TX.shingles_expr("text", 3))
    dup_frac = F.when(total > 0, 1 - distinct / total).otherwise(F.lit(0.0))
    return (
        d.select(
            "doc_id",
            total.cast("long").alias("n_shingle_slots"),
            distinct.cast("long").alias("n_distinct_shingles"),
            F.round(dup_frac, 6).alias("dup_fraction"),
            (dup_frac > 0.2).alias("repetitive"),
        )
        .orderBy("doc_id")
    )


# Benchmark/eval split for the decontamination demo: the first docs
# play the eval suite, the rest the training corpus.
Q51_BENCH_MAX_ID = 20


def q51_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/dedup.decontaminate): count
    per training doc the distinct 5-shingles it shares with the eval
    set; the eval shingle set broadcasts, the corpus never shuffles."""
    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") < Q51_BENCH_MAX_ID)
    corpus = d.filter(F.col("doc_id") >= Q51_BENCH_MAX_ID)
    return DD.decontaminate(corpus, bench, n=5).orderBy("doc_id")


FUNNEL_STEPS = ["view", "click", "purchase"]


def q58_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view → click → purchase per user
    (operators/events.funnel_stages): cumulative-min windows feed each
    step's strictly-after test, so the whole funnel is ONE shuffle on
    user_id however deep the funnel gets."""
    ev = load_table(spark, sf_dir, "events")
    return (
        EV.funnel_stages(ev, FUNNEL_STEPS)
        .select(
            "user_id",
            "stage",
            F.col("t_view").alias("t_view_epoch"),
            F.col("t_click").alias("t_click_epoch"),
            F.col("t_purchase").alias("t_purchase_epoch"),
        )
        .orderBy("user_id")
    )


def q60_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model score per document — mean log-probability
    of its tokens under the corpus unigram distribution, the classic
    cheap quality/perplexity proxy. Vocabulary and corpus total are
    aggregates of the same token stream. Only the 1-row corpus total
    carries a broadcast hint; the vocabulary join is left to the
    size-threshold/AQE planner, because a web-scale corpus can hold
    billions of distinct tokens and a forced broadcast of that side
    would OOM building the broadcast relation (q39's shape, which is
    the template here). The log sums are rounded to 6dp on both
    sides."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(TX.tokens_expr("text")).alias("token")
    ).filter(F.col("token") != "")
    # Materialized once: vocab feeds the scoring join AND the corpus
    # total; without the cut the second consumer re-runs the whole
    # scan+explode+agg (a third corpus scan). O(vocab) rows — the token
    # stream itself is deliberately NOT checkpointed (that would
    # materialize O(corpus)); two corpus scans (vocab build + scoring)
    # is the floor without it.
    vocab = (
        toks.groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    total = vocab.agg(F.sum("cnt").alias("total"))
    scored = toks.join(vocab, "token").crossJoin(F.broadcast(total))
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.sum(F.log(F.col("cnt") / F.col("total"))) / F.count("*"), 6
            ).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


def q61_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup END STEP: one keep/drop verdict per document. Keeper =
    the component label (min doc_id) of its near-dup cluster; docs
    outside any cluster keep themselves. Composes index-served LSH
    pairs (_indexed_lsh_pairs — signatures computed once at index
    build, not per query) → connected_components → left join back to
    the corpus — the exact chain a training-data build runs before
    writing its final shard set."""
    d = load_table(spark, sf_dir, "documents")
    comp = _components_for(spark, sf_dir).select(
        F.col("id").alias("doc_id"), "component"
    )
    return (
        d.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            (F.col("component").isNull() | (F.col("component") == F.col("doc_id"))).alias("keep"),
        )
        .orderBy("doc_id")
    )


def q64_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimator calibration: for every LSH candidate pair, the MinHash
    ESTIMATE of Jaccard (fraction of agreeing signature positions) next
    to the exact shingle Jaccard — the in-engine measurement that tells
    a pipeline operator whether 16 hashes are enough for their dedup
    threshold. Same banded candidate generation as q16 with the verify
    threshold at 0 so the estimator's error is visible across the whole
    candidate range."""
    d = load_table(spark, sf_dir, "documents")
    # Signatures computed ONCE and shared: both the banded candidate
    # join (via the sigs= hook) and the estimator join below consume
    # the same materialized (id, signature) rows instead of re-running
    # the shingle+hash pipeline per consumer.
    sigs = DD.minhash_signatures(d, num_hashes=16, n=3).localCheckpoint(eager=True)
    pairs = DD.minhash_lsh_pairs(
        d, num_hashes=16, bands=4, n=3, threshold=0.0, max_band_freq=MAX_BAND_FREQ,
        sigs=sigs,
    )
    est = F.aggregate(
        F.zip_with("sa", "sb", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    ) / F.lit(16.0)
    return (
        pairs.join(
            sigs.select(F.col("id").alias("id_a"), F.col("signature").alias("sa")),
            "id_a",
        )
        .join(
            sigs.select(F.col("id").alias("id_b"), F.col("signature").alias("sb")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.round(est, 6).alias("est_jaccard"),
            F.round("jaccard", 6).alias("jaccard"),
        )
        .orderBy("id_a", "id_b")
    )


CHUNK_TOKENS = 32
CHUNK_STRIDE = 24  # 8-token overlap between consecutive chunks


def q65_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size token chunking with overlap — the pretraining prep
    step that turns long documents into training sequences. One narrow
    pass: tokenize, explode chunk starts (stride CHUNK_STRIDE), slice
    and rejoin. No shuffle before the final sort; chunk counts are
    data-derived so short docs emit one chunk and empty docs none."""
    d = load_table(spark, sf_dir, "documents")
    toks = TX.tokens_expr("text")
    n_chunks = F.greatest(
        F.ceil((F.size(toks) - F.lit(CHUNK_TOKENS)) / F.lit(CHUNK_STRIDE)) + 1,
        F.lit(1),
    )
    chunked = d.select(
        "doc_id",
        toks.alias("toks"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    ).filter(F.size("toks") > 0)
    chunk = F.slice(
        "toks", F.col("chunk_idx") * CHUNK_STRIDE + 1, CHUNK_TOKENS
    )
    return chunked.select(
        "doc_id",
        "chunk_idx",
        F.size(chunk).cast("long").alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    ).orderBy("doc_id", "chunk_idx")


PACK_CONTEXT = 256  # tokens per packed training sequence


def q66_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: concatenate documents (in stable doc_id order)
    into fixed-budget context windows, assigning each doc the pack
    whose running token total it starts in. Packing is per SOURCE —
    a global ordered cumsum would serialize into one task, so each
    source stream packs independently (the sharded layout a real
    export uses) and the window costs one exchange on source."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    n = TX.token_count_expr("text")
    cum = F.sum(n).over(w)
    return (
        d.select(
            "source",
            "doc_id",
            n.cast("long").alias("n_tokens"),
            # floor-division, NOT a double cast: DuckDB's double->int
            # cast rounds-to-nearest while Spark's truncates
            F.floor((cum - n) / F.lit(PACK_CONTEXT)).cast("long").alias("pack_id"),
            (cum - n).alias("pack_offset"),
        )
        .orderBy("source", "doc_id")
    )


BM25_QUERY = ["spark", "table", "value"]
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPN = 20

# The single-query BM25 SCORED TABLE (doc_id, score, n_terms — every
# doc containing a query term, un-cut) is the shared spine of three
# consumers: q68's top-N row, q80's text-retriever arm, and through
# them q158's eval. One posting scan per (session, sf_dir) — the
# _indexed_lsh_pairs convention; the table is O(matching docs), tiny.
_BM25_SCORED_CACHE: dict[tuple[str, str], DataFrame] = {}


def _bm25_scored_for(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _BM25_SCORED_CACHE:
        d = load_table(spark, sf_dir, "documents")
        toks = d.select(
            "doc_id",
            TX.token_count_expr("text").cast("double").alias("dl"),
            F.explode(TX.tokens_expr("text")).alias("token"),
        ).filter(F.col("token").isin(BM25_QUERY))
        # Materialized once (rows: docs containing a query term ×
        # terms — tiny): tf feeds both the df aggregate and the
        # scoring reagg, and without the cut the filtered corpus scan
        # runs twice.
        tf = (
            toks.groupBy("doc_id", "token", "dl")
            .agg(F.count("*").alias("tf"))
            .localCheckpoint(eager=True)
        )
        df_ = tf.groupBy("token").agg(F.count("*").alias("df"))
        stats = d.agg(
            F.count("*").cast("double").alias("n_docs"),
            F.avg(TX.token_count_expr("text")).alias("avgdl"),
        )
        idf = F.log(
            (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
        )
        term_score = idf * (
            F.col("tf") * (BM25_K1 + 1)
            / (F.col("tf") + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl")))
        )
        _BM25_SCORED_CACHE[key] = (
            tf.join(F.broadcast(df_), "token")
            .crossJoin(F.broadcast(stats))
            .groupBy("doc_id")
            .agg(F.sum(term_score).alias("score"), F.count("*").alias("n_terms"))
            .localCheckpoint(eager=True)
        )
    return _BM25_SCORED_CACHE[key]


def q68_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword retrieval over the corpus — the scoring behind
    'select training docs matching this topic query'. Query terms are
    literals; document frequencies and avg doc length are corpus
    aggregates (broadcast as one-row joins); the per-doc score is a
    single re-aggregation of the filtered posting list. The posting
    scan filters to the query terms BEFORE any shuffle, so the
    exchange carries O(docs containing a query term), not O(tokens) —
    and runs once per session (_bm25_scored_for; q80/q158 share it)."""
    scored = _bm25_scored_for(spark, sf_dir)
    return (
        scored.orderBy(F.desc("score"), "doc_id")
        .limit(BM25_TOPN)
        .select("doc_id", "n_terms", F.round("score", 6).alias("score"))
    )


def q69_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget accounting per (source, lang) — the first question
    every pretraining data build answers: how many documents and
    training tokens does each slice contribute, and what share of the
    corpus is that. One narrow pass computes per-doc token counts,
    one map-side-combined aggregate collapses to (source, lang) — the
    shuffle carries O(slices), never O(docs) — and the corpus total is
    a global window OVER the slice aggregate (single-partition frame
    over O(slices) rows), so the corpus is scanned exactly once.
    Share uses the tie-proof cross-engine rounding
    (functions/numeric.py)."""
    from pyspark.sql import Window

    from spark_nnd_spark.functions.numeric import round_half_up_expr

    d = load_table(spark, sf_dir, "documents")
    per = d.select(
        "source",
        "lang",
        F.size(F.filter(TX.tokens_expr("text"), lambda t: t != F.lit(""))).alias("ntok"),
    )
    agg = per.groupBy("source", "lang").agg(
        F.count("*").alias("docs"),
        F.sum("ntok").alias("tokens"),
    )
    corpus_tokens = F.sum("tokens").over(Window.partitionBy()).cast("double")
    return (
        agg.select(
            "source",
            "lang",
            "docs",
            "tokens",
            round_half_up_expr(F.col("tokens") / corpus_tokens).alias("token_share"),
        )
        .orderBy("source", "lang")
    )


ZIPF_TOPN = 50


def q70_zipf_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary head profile — token frequencies ranked with each
    rank's CUMULATIVE share of all corpus tokens, the Zipf diagnostic
    that tells a pipeline how top-heavy its token distribution is
    (and how much a stopword cut would remove). The count aggregate
    shuffles O(vocab) after map-side partials and is materialized once
    (localCheckpoint) so the corpus-total aggregate and the top-N both
    reuse it instead of re-scanning the corpus; rank + cumulative sum
    run AFTER the top-N limit, so the single-partition window only
    ever sees ZIPF_TOPN rows regardless of corpus size."""
    from pyspark.sql import Window

    from spark_nnd_spark.functions.numeric import round_half_up_expr

    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(TX.tokens_expr("text")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=True)
    )
    total = counts.agg(F.sum("n").cast("double").alias("corpus_tokens"))
    top = counts.orderBy(F.desc("n"), "token").limit(ZIPF_TOPN)
    w = Window.orderBy(F.desc("n"), "token").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            "token",
            "n",
            F.row_number()
            .over(Window.orderBy(F.desc("n"), "token"))
            .cast("long")
            .alias("rank"),
            round_half_up_expr(
                F.sum("n").over(w) / F.col("corpus_tokens")
            ).alias("cum_share"),
        )
        .orderBy("rank")
    )


def q71_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix — near-duplicate pair counts
    per unordered source pair, the forensic that tells a corpus build
    which feeds mirror each other (and how much dedup credit to expect
    from dropping one). Reuses the q16 MinHash-LSH verified pairs
    (same params), then two id→source hash joins and a tiny
    (source_a, source_b) aggregate — the matrix is O(sources²) rows
    regardless of corpus size."""
    d = load_table(spark, sf_dir, "documents")
    pairs = _indexed_lsh_pairs(spark, sf_dir)
    src = d.select("doc_id", "source")
    return (
        pairs.join(src.withColumnsRenamed({"doc_id": "id_a", "source": "src_a"}), "id_a")
        .join(src.withColumnsRenamed({"doc_id": "id_b", "source": "src_b"}), "id_b")
        .select(
            F.least("src_a", "src_b").alias("source_a"),
            F.greatest("src_a", "src_b").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("source_a", "source_b")
    )


def q72_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-entropy quality signal per document — the classic
    gibberish/boilerplate detector (low entropy = repeated chars or
    templated text, high = random noise). Entirely narrow: char split,
    sorted-distinct alphabet, and a fold over the alphabet are all
    JVM array expressions on one row — zero shuffle until the final
    ORDER BY, so at 100 TB this is a pure map stage. The alphabet is
    sorted before the fold so Spark's left-fold and DuckDB's list_sum
    add the p·ln p terms in the same order (float addition is not
    associative)."""
    from spark_nnd_spark.functions.numeric import round_half_up_expr

    d = load_table(spark, sf_dir, "documents")
    chars = F.split(F.col("text"), "")
    alphabet = F.array_sort(F.array_distinct(chars))
    total = F.size(chars).cast("double")

    def _p(c):
        return F.size(F.filter(chars, lambda x: x == c)) / total

    ent = -F.aggregate(
        F.transform(alphabet, lambda c: _p(c) * F.log(_p(c))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return d.select(
        "doc_id",
        F.size(alphabet).cast("long").alias("n_distinct_chars"),
        round_half_up_expr(ent).alias("entropy"),
    ).orderBy("doc_id")


# Corpus-scrub blocklist: term hits are counted and redacted in one
# narrow regex pass (word-boundary alternation — same RE2-compatible
# pattern on both engines). The terms are chosen to actually occur in
# the synthetic corpus so the query exercises nonzero redactions.
BLOCKLIST_PATTERN = r"\b(customer|stream|merge)\b"


def q73_blocklist_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist scrub — the filter/redact primitive of corpus curation
    (PII and unwanted-term removal share this exact shape: match count
    for audit, redacted text for the output corpus). One narrow map
    per document (regexp_count + regexp_replace + md5), no shuffle
    until the final ORDER BY; at 100 TB this is a pure map stage and
    the redacted corpus would stream straight to the sink. The md5 of
    the redacted text is emitted instead of the text itself so the
    driver compare stays small while still pinning every byte."""
    d = load_table(spark, sf_dir, "documents")
    pat = F.lit(BLOCKLIST_PATTERN)
    redacted = F.regexp_replace(F.col("text"), BLOCKLIST_PATTERN, "[X]")
    return d.select(
        "doc_id",
        F.regexp_count(F.col("text"), pat).cast("long").alias("n_blocked"),
        F.md5(redacted.cast("binary")).alias("redacted_md5"),
    ).orderBy("doc_id")


def q74_shingle_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source shingle novelty — how much of each source's 3-gram
    vocabulary appears in no other source. The inter-source complement
    of q71's overlap matrix: overlap says which feeds mirror each
    other; novelty says what a feed uniquely contributes (the number a
    curation run uses to decide if a source is worth its dedup cost).
    Shuffles are all O(distinct (source, shingle)) with map-side
    partial aggregation, never O(corpus): distinct pairs, then ONE
    per-shingle aggregate that carries each shingle's source list
    (bounded by the number of sources, a catalog-sized constant —
    never by corpus size), exploded back out and rolled up per source.
    No self-join, no materialization barrier: each shingle's
    source-count rides along with its sources in the same aggregate
    row, so the novelty flag needs no second pass over the pairs."""
    from spark_nnd_spark.functions.numeric import round_half_up_expr

    d = load_table(spark, sf_dir, "documents")
    # ONE exchange (r15): the standalone (source, shingle) distinct and
    # the per-shingle rollup were two differently-keyed exchanges over
    # the same stream; collect_set dedups sources inside the per-shingle
    # aggregate itself (partial sets merge map-side), so the distinct
    # pass — and its exchange — disappears without changing the set
    # semantics the novelty flag reads.
    srcsh = d.select(
        "source", F.explode(TX.shingles_expr("text", 3)).alias("shingle")
    )
    per_shingle = srcsh.groupBy("shingle").agg(
        F.collect_set("source").alias("srcs")
    ).select(F.size("srcs").cast("long").alias("nsrc"), "srcs")
    uniq = F.sum(F.when(F.col("nsrc") == 1, 1).otherwise(0)).cast("long")
    return (
        per_shingle.select(F.explode("srcs").alias("source"), "nsrc")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            uniq.alias("n_unique"),
        )
        .select(
            "source",
            "n_shingles",
            "n_unique",
            round_half_up_expr(
                F.col("n_unique") / F.col("n_shingles").cast("double")
            ).alias("novelty"),
        )
        .orderBy("source")
    )


# Filter-cascade gate thresholds (stage 2/3 reuse q37's quality-gate
# conventions; stage 1's token floor is set where the synthetic corpus
# actually splits so the funnel shows real attrition at every SF).
CASCADE_MIN_TOKENS = 40


def q75_filter_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-cascade audit — the per-stage attrition funnel every
    corpus build reports (N in → N out per gate, gates applied in
    sequence). All four gate booleans are computed in ONE narrow scan
    and collapsed by ONE map-side-combined aggregate to a single row
    of counters; the corpus is scanned exactly once regardless of how
    many gates the cascade has. The single counter row is materialized
    (localCheckpoint) before being fanned out into per-stage rows, so
    the four stage projections don't re-trigger the scan."""
    d = load_table(spark, sf_dir, "documents")
    n_tok = TX.token_count_expr("text")
    b1 = n_tok >= CASCADE_MIN_TOKENS
    b2 = b1 & (TX.stopword_ratio_expr("text") <= 0.6)
    b3 = b2 & (TX.type_token_ratio_expr("text") >= 0.3)
    b4 = b3 & (TX.predicted_lang_expr("text") == "en")

    def cnt(b, name):
        return F.sum(b.cast("long")).alias(name)

    counters = d.agg(
        F.count("*").alias("n0"),
        cnt(b1, "p1"), cnt(b2, "p2"), cnt(b3, "p3"), cnt(b4, "p4"),
    ).localCheckpoint(eager=True)

    gates = [
        (1, "min_tokens", "n0", "p1"),
        (2, "stopword_ratio", "p1", "p2"),
        (3, "type_token_ratio", "p2", "p3"),
        (4, "lang_en", "p3", "p4"),
    ]
    stages = [
        counters.select(
            F.lit(i).cast("long").alias("stage"),
            F.lit(gate).alias("gate"),
            F.col(n_in).alias("n_in"),
            F.col(n_pass).alias("n_pass"),
            (F.col(n_in) - F.col(n_pass)).alias("n_fail"),
        )
        for i, gate, n_in, n_pass in gates
    ]
    out = stages[0]
    for s in stages[1:]:
        out = out.unionAll(s)
    return out.orderBy("stage")


def q76_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8-quantized cosine top-k (operators/similarity.py
    quantize_embeddings / quantized_brute_topk) — q18's brute tier at
    1/8th the wire bytes, with integer dots making the approximate
    tier itself hash-checkable (unlike the float LSH/IVF tiers, which
    need the q33 recall surrogate)."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = SIM.quantized_brute_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)
    return out.select(
        "query_id", "nb_id", "rank", F.round("qcosine", 6).alias("qcosine")
    ).orderBy("query_id", "rank")


WEIGHTED_SAMPLE_K = 20


def q77_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling (Efraimidis–Spirakis exponential
    race, operators/sampling.py weighted_key_expr): per source, the 20
    documents that win a -ln(u)/weight race with u derived from
    md5(doc_id) and weight = n_chars — the quality-weighted corpus
    downsample, reproducible across engines/reruns. Narrow key
    computation; one hash exchange for the per-source top-k window."""
    from spark_nnd_spark.operators.sampling import weighted_sample

    d = load_table(spark, sf_dir, "documents")
    out = weighted_sample(
        d,
        k=WEIGHTED_SAMPLE_K,
        weight=F.col("n_chars").cast("double"),
        strata_col="source",
        id_col="doc_id",
    )
    return out.select("source", "doc_id", "n_chars").orderBy("source", "doc_id")


def q78_contamination_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level decontamination audit (operators/dedup.
    contamination_pairs): q51 says WHETHER a training doc leaks the
    eval set; this says WHICH eval doc it leaks and how many distinct
    5-shingles they share — the trace a leak investigation follows.
    Bench postings broadcast; the corpus never shuffles raw text.
    Materialized once per (session, sf_dir) (_contam_pairs_for):
    q166's report runs this query as its shingle-tier evidence."""
    return _contam_pairs_for(spark, sf_dir).orderBy("doc_id", "bench_id")


_CONTAM_PAIRS_CACHE: dict[tuple[str, str], DataFrame] = {}


def _contam_pairs_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") < Q51_BENCH_MAX_ID)
    corpus = d.filter(F.col("doc_id") >= Q51_BENCH_MAX_ID)
    return DD.contamination_pairs(corpus, bench, n=5)


def _contam_pairs_for(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _CONTAM_PAIRS_CACHE:
        _CONTAM_PAIRS_CACHE[key] = _contam_pairs_plan(
            spark, sf_dir
        ).localCheckpoint(eager=True)
    return _CONTAM_PAIRS_CACHE[key]


PQ_M, PQ_CODES, PQ_SEED, PQ_DIM = 8, 16, 42, 64


def q79_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC top-k (operators/similarity.py
    pq_encode / pq_adc_topk) — the billion-scale ANN shape: corpus
    reduced to 8 code bytes per vector, per-query lookup tables
    precomputed once, per-pair cost = 8 table lookups. Codebooks are
    seeded data-independent (pq_codebooks), so the DuckDB oracle
    replays encode + ADC from literals and the whole approximate tier
    hash-matches (the q33/q67 convention)."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = SIM.pq_adc_topk(
        emb, emb.filter(F.col("vec_id") < 10), k=5,
        m=PQ_M, n_codes=PQ_CODES, seed=PQ_SEED, dim=PQ_DIM,
    )
    return out.select(
        "query_id", "nb_id", "rank", F.round("pq_dist", 6).alias("pq_dist")
    ).orderBy("query_id", "rank")


RRF_K = 60
RRF_CAND = 100
RRF_TOPN = 20


def q80_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with Reciprocal Rank Fusion — the modern
    two-tower selection stack: a BM25 keyword list (q68 scoring) and a
    vector-similarity list (cosine to the vec_id=0 embedding) are each
    cut to RRF_CAND candidates, ranked, and fused with
    1/(K+rank_text) + 1/(K+rank_vec). The production shape: each
    retriever's global ordering ends at a top-N limit (TakeOrdered —
    no single-partition pass over the corpus), and every window after
    that sees ≤ RRF_CAND rows regardless of corpus size. Ranks are 0
    when a doc is absent from that retriever's list (no NULLs — the
    cross-engine hash treats them differently). Both arms run once
    per session: the BM25 scored table is _bm25_scored_for (shared
    with q68/q158), the fused list _rrf_fused_for (shared with q158)."""
    return _rrf_fused_for(spark, sf_dir).orderBy("rank")


_RRF_FUSED_CACHE: dict[tuple[str, str], DataFrame] = {}


def _rrf_fused_for(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _RRF_FUSED_CACHE:
        _RRF_FUSED_CACHE[key] = _rrf_fused_plan(
            spark, sf_dir
        ).localCheckpoint(eager=True)
    return _RRF_FUSED_CACHE[key]


def _rrf_fused_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from spark_nnd_spark.functions.numeric import round_half_up_expr
    from spark_nnd_spark.functions.vector import cosine_similarity_expr

    e = load_table(spark, sf_dir, "embeddings")

    # text retriever: q68's BM25 scored table, cut to RRF_CAND
    t_top = (
        _bm25_scored_for(spark, sf_dir)
        .select("doc_id", "score")
        .orderBy(F.desc("score"), "doc_id")
        .limit(RRF_CAND)
    )
    t_rank = t_top.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("score"), "doc_id"))
        .cast("long")
        .alias("rank_t"),
    )

    # vector retriever: cosine to the vec_id=0 query, cut to RRF_CAND
    qv = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").cast("array<double>").alias("qv")
    )
    v_top = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            cosine_similarity_expr(
                F.col("embedding").cast("array<double>"), F.col("qv")
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), "doc_id")
        .limit(RRF_CAND)
    )
    v_rank = v_top.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("cosine"), "doc_id"))
        .cast("long")
        .alias("rank_v"),
    )

    rrf_term = lambda c: F.when(  # noqa: E731
        F.col(c).isNotNull(), F.lit(1.0) / (F.lit(RRF_K) + F.col(c))
    ).otherwise(F.lit(0.0))
    fused = t_rank.join(v_rank, "doc_id", "full_outer").select(
        "doc_id",
        F.coalesce("rank_t", F.lit(0)).cast("long").alias("rank_t"),
        F.coalesce("rank_v", F.lit(0)).cast("long").alias("rank_v"),
        round_half_up_expr(rrf_term("rank_t") + rrf_term("rank_v")).alias("rrf"),
    )
    w = Window.orderBy(F.desc("rrf"), "doc_id")
    return fused.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).filter(F.col("rank") <= RRF_TOPN)


def q81_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle over events: users bucketed into
    day-grain cohorts by first activity, distinct-active counts per
    (cohort, day offset) cell. Pure integer output — hash-exact."""
    e = load_table(spark, sf_dir, "events")
    return (
        EV.retention_cohorts(e, bucket_seconds=86400)
        .select(
            F.col("cohort").alias("cohort_day"),
            F.col("offset").alias("day_offset"),
            "n_users",
        )
        .orderBy("cohort_day", "day_offset")
    )


def q82_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster-size histogram: MinHash-LSH pairs → connected
    components → component sizes → (size, n_clusters). The corpus-
    health dashboard number a dedup pass is judged by."""
    d = load_table(spark, sf_dir, "documents")
    comp = _components_for(spark, sf_dir)
    sizes = comp.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count("*").alias("n_clusters"))
        .orderBy("cluster_size")
    )


def q83_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion verdicts: treat source='src0' as the
    incoming batch, everything else as the indexed corpus; each batch
    doc is 'exact' / 'near' / 'novel' (operators/dedup.py
    incremental_dedup)."""
    d = load_table(spark, sf_dir, "documents")
    return DD.incremental_dedup(
        d,
        F.col("source") == "src0",
        num_hashes=16,
        bands=4,
        n=3,
        threshold=0.2,
        max_band_freq=MAX_BAND_FREQ,
    ).orderBy("doc_id")


def q84_event_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outliers: events whose value is more than 3
    sample standard deviations from their event_type mean. Stats are
    O(types) and broadcast — the event stream never shuffles."""
    from spark_nnd_spark.functions.numeric import round_half_up_expr

    e = load_table(spark, sf_dir, "events")
    return (
        EV.value_zscores(e, z_threshold=3.0)
        .select(
            "event_id",
            "event_type",
            F.round("value", 6).alias("value"),
            round_half_up_expr(F.col("z")).alias("z"),
        )
        .orderBy("event_id")
    )


def q85_type_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type co-occurrence lift across users:
    lift(a,b) = P(user does a AND b) / (P(a) · P(b)). All inputs are
    distinct-user counts, so the ratio is exact integer arithmetic in
    doubles — deterministic across engines. The user-level self-join
    fans out ≤ T²/2 rows per user (T = #types, tiny), then aggregates
    to the O(T²) pair grid map-side."""
    from spark_nnd_spark.functions.numeric import round_half_up_expr

    e = load_table(spark, sf_dir, "events")
    ut = e.select("user_id", "event_type").distinct()
    totals = ut.groupBy("event_type").agg(F.count("*").alias("n_t"))
    nu = ut.select("user_id").distinct().agg(F.count("*").alias("n_users"))
    pairs = (
        ut.alias("a")
        .join(ut.alias("b"), "user_id")
        .filter(F.col("a.event_type") < F.col("b.event_type"))
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("n_both"))
    )
    lift = (F.col("n_both").cast("double") * F.col("n_users").cast("double")) / (
        F.col("na").cast("double") * F.col("nb").cast("double")
    )
    return (
        pairs.join(
            F.broadcast(totals.select(F.col("event_type").alias("type_a"), F.col("n_t").alias("na"))),
            "type_a",
        )
        .join(
            F.broadcast(totals.select(F.col("event_type").alias("type_b"), F.col("n_t").alias("nb"))),
            "type_b",
        )
        .crossJoin(F.broadcast(nu))
        .select(
            "type_a",
            "type_b",
            "n_both",
            round_half_up_expr(lift).alias("lift"),
        )
        .orderBy("type_a", "type_b")
    )


def q86_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix: declared lang × n-gram-heuristic
    predicted lang (functions/text.py) with document counts — the
    standard language-filter QA artifact."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy("lang", TX.predicted_lang_expr("text").alias("pred_lang"))
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang", "pred_lang")
    )


def q87_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model score per document: mean
    log P(w2|w1) with add-k smoothing (k=0.5) under the corpus bigram
    distribution — the next quality-proxy step up from q60's unigram
    score. V is the distinct-left-context vocabulary (the convention is
    mirrored in the oracle). Context totals and V derive from the
    O(distinct-bigrams) count table, never a second corpus pass; only
    single-token docs (no bigrams) are absent from the output."""
    d = load_table(spark, sf_dir, "documents")
    toks = TX.tokens_expr("text")
    bigrams = F.filter(
        F.zip_with(
            toks,
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
        lambda s: s.contains(" "),
    )
    # q36's anti-fusion barrier: without it the bigram generator is
    # re-inlined per exploded row
    base = d.select("doc_id", bigrams.alias("__bg")).localCheckpoint(eager=True)
    db = base.select("doc_id", F.explode("__bg").alias("bg"))
    counts = (
        db.groupBy("bg").agg(F.count("*").alias("c2")).localCheckpoint(eager=True)
    )
    lefts = (
        counts.select(F.substring_index("bg", " ", 1).alias("w1"), "c2")
        .groupBy("w1")
        .agg(F.sum("c2").alias("c1"))
    )
    v = lefts.agg(F.count("*").alias("v"))
    scored = (
        db.join(counts, "bg")
        .withColumn("w1", F.substring_index("bg", " ", 1))
        .join(lefts, "w1")
        .crossJoin(F.broadcast(v))
    )
    logp = F.log((F.col("c2") + 0.5) / (F.col("c1") + 0.5 * F.col("v")))
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(logp), 6).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


def q88_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed containment near-dups: docs whose shingle set is ≥ 70%
    inside another doc's (operators/dedup.py containment_pairs) — the
    subset-duplication case symmetric Jaccard misses."""
    d = load_table(spark, sf_dir, "documents")
    out = DD.containment_pairs(
        d, n=3, threshold=0.7, max_shingle_freq=MAX_SHINGLE_FREQ
    )
    return out.select(
        "contained", "container", F.round("containment", 6).alias("containment")
    ).orderBy("contained", "container")


def q89_length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-length deciles: NTILE(10) within each source
    over (n_tokens, doc_id), then per-decile count / min / max — the
    length-distribution diagnostic behind chunking and packing
    decisions. The window partitions by source, so the sort is
    per-source, never global."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    base = d.select("source", "doc_id", TX.token_count_expr("text").alias("n_tokens"))
    w = Window.partitionBy("source").orderBy("n_tokens", "doc_id")
    return (
        base.withColumn("decile", F.ntile(10).over(w).cast("long"))
        .groupBy("source", "decile")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
        .orderBy("source", "decile")
    )


# q90–q95 parameters (mirrored into the oracles below).
WINNOW_N = 4  # shingle width (tokens) for winnowing fingerprints
WINNOW_W = 4  # winnowing window: ≥1 fingerprint per W consecutive shingles
WINNOW_MIN_SHARED = 2
PMI_VOCAB = 20  # co-occurrence vocabulary: top-N tokens by doc frequency
PMI_MIN_PAIRS = 5
DECAY_HALFLIFE_DAYS = 7
GROUP_SAMPLE_K = 10
LIFECYCLE_CORE_DAYS = 28
LIFECYCLE_REGULAR_DAYS = 25


def q90_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of event types
    (operators/events.py type_transitions): one user_id exchange for
    the LEAD window, map-side partial aggregate to O(types²) rows, the
    normalizing window only on that aggregate."""
    from spark_nnd_spark.functions.numeric import round_half_up_expr

    e = load_table(spark, sf_dir, "events")
    return (
        EV.type_transitions(e)
        .select(
            "prev_type",
            "next_type",
            "n",
            round_half_up_expr(F.col("prob")).alias("prob"),
        )
        .orderBy("prev_type", "next_type")
    )


def q91_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowed-fingerprint near-dup pairs (operators/dedup.py
    winnow_pairs): local-passage copy detection — any shared run of
    ~W+N consecutive tokens is guaranteed to surface a common selected
    fingerprint, a case whole-document MinHash dilutes away. Inverted
    index over the ~2/(W+1)-selected hashes, df-cut skew guard, never
    all-pairs."""
    d = load_table(spark, sf_dir, "documents")
    return (
        DD.winnow_pairs(
            d,
            n=WINNOW_N,
            w=WINNOW_W,
            min_shared=WINNOW_MIN_SHARED,
            max_fp_freq=MAX_SHINGLE_FREQ,
        )
        .orderBy("id_a", "id_b")
    )


def q92_decay_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user recency-weighted engagement score (operators/events.py
    decayed_engagement): weekly half-life, weight = 0.5^integer-periods
    (exact in binary FP → engine-replayable), reference timestamp
    broadcast — the event stream never shuffles before the per-user
    aggregate."""
    from spark_nnd_spark.functions.numeric import round_half_up_expr

    e = load_table(spark, sf_dir, "events")
    return (
        EV.decayed_engagement(e, halflife_days=DECAY_HALFLIFE_DAYS)
        .select(
            "user_id",
            "n_events",
            round_half_up_expr(F.col("score")).alias("decay_score"),
        )
        .orderBy("user_id")
    )


def q93_token_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information between top-vocabulary tokens
    co-occurring in the same document — the collocation signal behind
    phrase mining and topic drift checks. The vocabulary is the top
    PMI_VOCAB tokens by doc frequency (broadcast), so the pair space is
    bounded O(docs · V²/2) regardless of corpus size; tokenization runs
    once (checkpointed postings feed both the df aggregate and the
    pair join)."""
    from spark_nnd_spark.functions.numeric import round_half_up_expr

    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.select(
            "doc_id",
            F.explode(F.array_distinct(TX.tokens_expr("text"))).alias("token"),
        )
        .localCheckpoint(eager=True)
    )
    dfreq = toks.groupBy("token").agg(F.count("*").alias("dfreq"))
    vocab = dfreq.orderBy(F.desc("dfreq"), "token").limit(PMI_VOCAB)
    vp = toks.join(F.broadcast(vocab.select("token")), "token")
    pairs = (
        vp.alias("a")
        .join(vp.alias("b"), "doc_id")
        .filter(F.col("a.token") < F.col("b.token"))
        .groupBy(F.col("a.token").alias("tok_a"), F.col("b.token").alias("tok_b"))
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= PMI_MIN_PAIRS)
    )
    nd = d.agg(F.count("*").cast("double").alias("n_docs"))
    va = vocab.select(F.col("token").alias("tok_a"), F.col("dfreq").alias("df_a"))
    vb = vocab.select(F.col("token").alias("tok_b"), F.col("dfreq").alias("df_b"))
    pmi = F.log(F.col("n_ab") * F.col("n_docs") / (F.col("df_a") * F.col("df_b")))
    return (
        pairs.join(F.broadcast(va), "tok_a")
        .join(F.broadcast(vb), "tok_b")
        .crossJoin(F.broadcast(nd))
        .select("tok_a", "tok_b", "n_ab", round_half_up_expr(pmi).alias("pmi"))
        .orderBy("tok_a", "tok_b")
    )


def q94_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k deterministic sample per source (operators/sampling.py
    per_group_exact_sample): md5-ranked top-k window — pinned slice
    sizes for balanced eval sets, nested in k, engine-replayable."""
    from spark_nnd_spark.operators.sampling import per_group_exact_sample

    d = load_table(spark, sf_dir, "documents")
    return (
        per_group_exact_sample(d, "source", GROUP_SAMPLE_K, "doc_id")
        .select("source", "sample_rank", "doc_id")
        .orderBy("source", "sample_rank")
    )


def q95_user_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User lifecycle-stage census (operators/events.py
    lifecycle_stages): one map-side-combined aggregate per user, then a
    O(users) rollup to stage counts with average activity shape."""
    from spark_nnd_spark.functions.numeric import round_half_up_expr

    e = load_table(spark, sf_dir, "events")
    staged = EV.lifecycle_stages(
        e, core_days=LIFECYCLE_CORE_DAYS, regular_days=LIFECYCLE_REGULAR_DAYS
    )
    return (
        staged.groupBy("stage")
        .agg(
            F.count("*").alias("n_users"),
            round_half_up_expr(F.avg("n_events")).alias("avg_events"),
            round_half_up_expr(F.avg("active_days")).alias("avg_active_days"),
        )
        .orderBy("stage")
    )


PR_ITERATIONS = 3
PR_DAMPING = 0.85


def q96_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the MinHash-LSH near-dup graph
    (operators/graph.py pagerank, fixed 3 damped iterations — exact
    closed-form arithmetic, so the DuckDB oracle unrolls the same
    iterations): ranks the canonical 'hub' copies inside duplication
    clusters. Edges shuffle once; per round only (id, rank/deg)
    doubles move."""
    from spark_nnd_spark.functions.numeric import round_half_up_expr
    from spark_nnd_spark.operators.graph import pagerank

    d = load_table(spark, sf_dir, "documents")
    pairs = _indexed_lsh_pairs(spark, sf_dir)
    return (
        pagerank(pairs, iterations=PR_ITERATIONS, damping=PR_DAMPING)
        .select(
            F.col("id").alias("doc_id"),
            "deg",
            round_half_up_expr(F.col("rank")).alias("rank"),
        )
        .orderBy("doc_id")
    )


def q97_cross_modal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal slice audit: join the text corpus to its embedding
    table on the shared id space and profile each (lang, label) cell —
    doc count, mean embedding L2 norm, mean token length. The
    modality-alignment sanity check of a multimodal training build
    (does each language cover every label, do norms drift by slice).

    Scale: a 1:1 equi-join on the id (bucketable/co-partitionable at
    scale), norms computed as array arithmetic in codegen, then one
    map-side-combined aggregate to O(langs × labels) rows."""
    from spark_nnd_spark.functions.numeric import round_half_up_expr

    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    norm = F.sqrt(
        F.aggregate(
            F.col("embedding").cast("array<double>"),
            F.lit(0.0),
            lambda acc, v: acc + v * v,
        )
    )
    j = d.join(e, d["doc_id"] == e["vec_id"]).select(
        "lang",
        "label",
        norm.alias("norm"),
        TX.token_count_expr("text").alias("ntok"),
    )
    return (
        j.groupBy("lang", "label")
        .agg(
            F.count("*").alias("n_docs"),
            round_half_up_expr(F.avg("norm")).alias("avg_norm"),
            round_half_up_expr(F.avg("ntok")).alias("avg_tokens"),
        )
        .orderBy("lang", "label")
    )


OOV_VOCAB = 100  # global vocabulary size for the coverage audit


def q98_cluster_reps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Representative selection per near-dup cluster: LSH pairs →
    connected components → keep the longest doc (tiebreak smallest id)
    as each cluster's canonical copy — the 'which copy survives' policy
    layer above q61's boolean verdict. One window over O(cluster
    members) rows; the corpus never re-shuffles."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    comp = _components_for(spark, sf_dir).withColumnRenamed("id", "doc_id")
    members = comp.join(d.select("doc_id", "n_chars"), "doc_id")
    w = Window.partitionBy("component").orderBy(F.desc("n_chars"), "doc_id")
    return (
        members.withColumn("rn", F.row_number().over(w))
        .withColumn("n_members", F.count("*").over(Window.partitionBy("component")))
        .filter(F.col("rn") == 1)
        .select(
            "component",
            F.col("doc_id").alias("rep_doc_id"),
            "n_members",
            F.col("n_chars").alias("rep_chars"),
        )
        .orderBy("component")
    )


def q99_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-coverage audit: fraction of each language's token
    occurrences that fall outside the global top-OOV_VOCAB vocabulary —
    the out-of-vocabulary rate that decides whether a fixed vocab (or
    BPE merge table) trained on the corpus head serves every language
    slice. Token stream materialized once (checkpoint) and consumed by
    both the vocabulary head and the per-lang rollup; the vocabulary is
    broadcast, so the stream shuffles only for the O(langs) final
    aggregate."""
    from spark_nnd_spark.functions.numeric import round_half_up_expr

    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.select("lang", F.explode(TX.tokens_expr("text")).alias("token"))
        .localCheckpoint(eager=True)
    )
    vocab = (
        toks.groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "token")
        .limit(OOV_VOCAB)
        .select("token", F.lit(True).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "token", "left")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(
                F.when(F.col("in_vocab").isNull(), F.lit(1)).otherwise(F.lit(0))
            ).alias("n_oov"),
        )
        .select(
            "lang",
            "n_tokens",
            "n_oov",
            round_half_up_expr(F.col("n_oov") / F.col("n_tokens")).alias("oov_rate"),
        )
        .orderBy("lang")
    )


def q100_phash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-dedup buckets for image payloads: aHash each image
    (operators/multimodal.py perceptual_hash — 2×2 mean-pool to an 8×8
    grid, threshold on the grid mean, 64 bits packed MSB-first) and
    group identical hashes, the q17-simhash shape transplanted to the
    image modality. Exact power-of-two float arithmetic makes the bits
    engine-replayable, so the DuckDB oracle recomputes the hash from
    the payload bytes. Narrow kernel → one int64-keyed aggregate."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    out = MM.perceptual_hash(d, id_col="doc_id")
    return (
        out.groupBy("phash")
        .agg(F.min("id").alias("doc_id"), F.count("*").alias("bucket_size"))
        .orderBy("phash")
    )


DRIFT_VOCAB = 50  # restricted support for the total-variation distance


def q101_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-distribution drift: total-variation distance
    between each source's token distribution and the whole corpus,
    restricted to the global top-DRIFT_VOCAB vocabulary plus one pooled
    out-of-vocabulary bucket — the 'did this source's language shift'
    monitor a continuously-ingesting corpus runs per batch.

    Scale: the token stream is materialized once (checkpoint) and feeds
    the global counts, the per-source totals, and the vocab-restricted
    per-(source, token) counts; the vocabulary and global distribution
    are broadcast (O(V) rows), the dense source×vocab grid is
    O(sources · V) — the event stream never shuffles twice. All
    probabilities are single divisions of exact counts, so both engines
    compute identical doubles; only the 51-term sum carries float
    noise, absorbed by the 6-decimal rounding."""
    from spark_nnd_spark.functions.numeric import round_half_up_expr

    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.select("source", F.explode(TX.tokens_expr("text")).alias("token"))
        .localCheckpoint(eager=True)
    )
    g = toks.groupBy("token").agg(F.count("*").alias("g_cnt"))
    vocab = g.orderBy(F.desc("g_cnt"), "token").limit(DRIFT_VOCAB)
    g_tot = toks.agg(F.count("*").alias("g_tot"))
    s_tot = toks.groupBy("source").agg(F.count("*").alias("s_tot"))
    sc = (
        toks.join(F.broadcast(vocab.select("token")), "token")
        .groupBy("source", "token")
        .agg(F.count("*").alias("s_cnt"))
    )
    grid = (
        s_tot.crossJoin(F.broadcast(vocab))
        .join(sc, ["source", "token"], "left")
        .na.fill({"s_cnt": 0})
        .crossJoin(F.broadcast(g_tot))
    )
    term = F.abs(
        F.col("s_cnt") / F.col("s_tot") - F.col("g_cnt") / F.col("g_tot")
    )
    per_source = grid.groupBy("source", "s_tot", "g_tot").agg(
        F.sum(term).alias("vocab_l1"),
        F.sum("s_cnt").alias("s_in_vocab"),
        F.sum("g_cnt").alias("g_in_vocab"),
    )
    oov = F.abs(
        (F.col("s_tot") - F.col("s_in_vocab")) / F.col("s_tot")
        - (F.col("g_tot") - F.col("g_in_vocab")) / F.col("g_tot")
    )
    return (
        per_source.select(
            "source",
            F.col("s_tot").alias("n_tokens"),
            round_half_up_expr(
                F.lit(0.5) * (F.col("vocab_l1") + oov)
            ).alias("tv_distance"),
        )
        .orderBy("source")
    )


def q102_behavior_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral diversity: Shannon entropy (nats) of each
    user's event-type distribution — the bot/monoculture signal (a
    single-action scripted user scores 0, a uniform explorer ln(types)).
    One map-side-combined (user, type) aggregate, then the normalizing
    window and entropy sum run on that O(users·types) table — the event
    stream is exchanged exactly once."""
    from pyspark.sql import Window

    from spark_nnd_spark.functions.numeric import round_half_up_expr

    e = load_table(spark, sf_dir, "events")
    c = e.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    c = c.withColumn("tot", F.sum("n").over(Window.partitionBy("user_id")))
    p = F.col("n") / F.col("tot")
    return (
        c.groupBy("user_id")
        .agg(
            F.max("tot").alias("n_events"),
            F.count("*").alias("n_types"),
            round_half_up_expr(-F.sum(p * F.log(p))).alias("entropy"),
        )
        .orderBy("user_id")
    )


# On-disk near-dup index over the corpus side (source != 'src0'),
# built once per (session, sf_dir) — the q25/_NND_CACHE convention:
# q103 measures the PROBE path; the build is the amortized ingest-time
# cost a 100 TB pipeline pays once, not per batch.
_NEARDUP_IDX_CACHE: dict[tuple[str, str], str] = {}


def _neardup_index_for(spark: SparkSession, sf_dir: str) -> str:
    from spark_nnd_spark.session import session_scratch_dir  # noqa: PLC0415

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _NEARDUP_IDX_CACHE:
        path = session_scratch_dir("neardup_idx_")
        d = load_table(spark, sf_dir, "documents")
        DD.build_neardup_index(
            d.filter(F.col("source") != "src0"), path, num_hashes=16, bands=4, n=3
        )
        _NEARDUP_IDX_CACHE[key] = path
    return _NEARDUP_IDX_CACHE[key]


def q103_indexed_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q83's verdicts served from a PERSISTED near-dup index
    (operators/dedup.py build_neardup_index / neardup_query_index):
    the corpus side (source != 'src0') is indexed once — digests, LSH
    band signatures, per-bucket stats, shingle sidecar — and each
    incoming batch probes the stored index instead of re-shingling the
    corpus. Same verdicts as the inline path (asserted index==inline
    in tests/test_operators.py), same oracle SQL as q83; at 100 TB
    this is the difference between O(batch) and O(corpus) per ingest."""
    d = load_table(spark, sf_dir, "documents")
    idx = _neardup_index_for(spark, sf_dir)
    return DD.neardup_query_index(
        spark,
        idx,
        d.filter(F.col("source") == "src0"),
        threshold=0.2,
        max_band_freq=MAX_BAND_FREQ,
    ).orderBy("doc_id")


# Full-corpus near-dup index (every document, not just the q103 corpus
# side) — the artifact the corpus-health queries probe. Built once per
# (session, sf_dir); the amortized ingest-time cost.
_NEARDUP_FULL_IDX_CACHE: dict[tuple[str, str], str] = {}


def _neardup_full_index_for(spark: SparkSession, sf_dir: str) -> str:
    from spark_nnd_spark.session import session_scratch_dir  # noqa: PLC0415

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _NEARDUP_FULL_IDX_CACHE:
        path = session_scratch_dir("neardup_full_idx_")
        d = load_table(spark, sf_dir, "documents")
        DD.build_neardup_index(d, path, num_hashes=16, bands=4, n=3)
        _NEARDUP_FULL_IDX_CACHE[key] = path
    return _NEARDUP_FULL_IDX_CACHE[key]


_LSH_PAIRS_CACHE: dict[tuple[str, str], DataFrame] = {}


def _indexed_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verified LSH near-dup pairs for the corpus-health queries
    (q31/q61/q71/q82/q96/q98), served from the session-cached persisted
    index (operators/dedup.py neardup_pairs_index) — identical rows to
    the inline ``minhash_lsh_pairs(documents, 16, 4, 3, 0.2, cap)``
    (asserted index==inline in tests/test_operators.py; every
    consumer's oracle SQL still replays the inline pipeline), but the
    corpus text is shingled once at index build instead of once per
    query. At 100 TB this is the only viable shape: six health queries
    re-tokenizing the corpus each would be six full text scans.

    The VERIFIED PAIRS TABLE itself is materialized once per
    (session, sf_dir) for the same reason (the r15 finding: sixteen
    consumer queries each re-ran the banded self-join + Jaccard verify
    over the stored sidecars — at 100 TB that is sixteen runs of the
    corpus-wide candidate join for one unchanged artifact). A real
    pipeline lands this table next to the index; the bench pre-builds
    it as ``build_neardup_pairs`` so consumer rows stay warm-path, and
    every consumer's oracle still replays the full inline pipeline."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _LSH_PAIRS_CACHE:
        idx = _neardup_full_index_for(spark, sf_dir)
        _LSH_PAIRS_CACHE[key] = DD.neardup_pairs_index(
            spark, idx, threshold=0.2, max_band_freq=MAX_BAND_FREQ
        ).localCheckpoint(eager=True)
    return _LSH_PAIRS_CACHE[key]


# Connected components over the verified pairs table feed FIVE
# consumers (q31 components, q61 keep-one, q82 cluster sizes, q98
# representatives, q174 dedup weights) — the large/small-star
# iteration is itself a multi-round fixpoint, so one run per
# (session, sf_dir).
_COMPONENTS_CACHE: dict[tuple[str, str], DataFrame] = {}


def _components_for(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_nnd_spark.operators.graph import (  # noqa: PLC0415
        connected_components,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _COMPONENTS_CACHE:
        _COMPONENTS_CACHE[key] = connected_components(
            _indexed_lsh_pairs(spark, sf_dir)
        ).localCheckpoint(eager=True)
    return _COMPONENTS_CACHE[key]


def q105_indexed_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q16's verified near-dup pairs served ENTIRELY from the persisted
    index (operators/dedup.py neardup_pairs_index): banded self-join
    over stored signatures, census cut from stored bucket stats,
    Jaccard verify from the stored shingle sidecar — document text is
    never read. Same rows as q16 (asserted index==inline in tests),
    same oracle SQL; this is how the q61/q71/q82-class corpus-health
    queries run at 100 TB, where re-shingling per query is a full
    corpus text scan each time."""
    idx = _neardup_full_index_for(spark, sf_dir)
    out = DD.neardup_pairs_index(spark, idx, threshold=0.2, max_band_freq=MAX_BAND_FREQ)
    return out.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    ).orderBy("id_a", "id_b")


def q106_indexed_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q14's n-gram Jaccard pairs served from the persisted index's
    shingle sidecar (operators/dedup.py jaccard_pairs_index): the
    inverted-index self-join runs over stored per-doc shingle arrays —
    the tokenize/regex pass, the dominant CPU cost of the inline path,
    was paid once at index build. Same rows as q14 (index==inline
    asserted in tests), same oracle SQL."""
    idx = _neardup_full_index_for(spark, sf_dir)
    out = DD.jaccard_pairs_index(
        spark, idx, threshold=0.2, max_shingle_freq=MAX_SHINGLE_FREQ
    )
    return out.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    ).orderBy("id_a", "id_b")


def q107_indexed_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q88's directed containment pairs served from the persisted
    index's shingle sidecar (operators/dedup.py
    containment_pairs_index) — no tokenization at query time. Same
    rows as q88 (index==inline asserted in tests), same oracle SQL."""
    idx = _neardup_full_index_for(spark, sf_dir)
    out = DD.containment_pairs_index(
        spark, idx, threshold=0.7, max_shingle_freq=MAX_SHINGLE_FREQ
    )
    return out.select(
        "contained", "container", F.round("containment", 6).alias("containment")
    ).orderBy("contained", "container")


_TEXT_IDX_CACHE: dict[tuple[str, str], str] = {}


def _text_index_for(spark: SparkSession, sf_dir: str) -> str:
    """Session-cached persisted BM25 postings index over the documents
    table (operators/retrieval.py build_text_index) — built once per
    (session, sf_dir), the same amortized-ingest convention as the
    near-dup index."""
    from spark_nnd_spark.session import session_scratch_dir  # noqa: PLC0415

    from spark_nnd_spark.operators import retrieval as RT

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _TEXT_IDX_CACHE:
        path = session_scratch_dir("text_idx_")
        RT.build_text_index(load_table(spark, sf_dir, "documents"), path)
        _TEXT_IDX_CACHE[key] = path
    return _TEXT_IDX_CACHE[key]


def q108_indexed_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q68's BM25 retrieval served from the persisted postings index
    (operators/retrieval.py bm25_query_index): the query's terms prune
    the token-sorted postings parquet; no tokenization at query time.
    Same rows as q68 (index==inline asserted in tests), same oracle."""
    from spark_nnd_spark.operators import retrieval as RT

    idx = _text_index_for(spark, sf_dir)
    scored = RT.bm25_query_index(spark, idx, BM25_QUERY, k1=BM25_K1, b=BM25_B)
    return (
        scored.orderBy(F.desc("score"), "doc_id")
        .limit(BM25_TOPN)
        .select("doc_id", "n_terms", F.round("score", 6).alias("score"))
    )


KMV_K = 16  # below the per-source vocab so the estimator branch (not the exact-count fallback) is what the oracle certifies


def q109_kmv_distinct_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinct-token cardinality via the KMV sketch
    (operators/sketches.py kmv_distinct) next to the exact count — the
    vocabulary-size monitor a continuously-ingesting corpus runs per
    source without paying a full distinct shuffle. KMV over the
    portable polynomial hash is used instead of HLL precisely so the
    sketch state (kept hashes, k-th minimum, estimate) replays
    bit-for-bit in the DuckDB oracle; the exact count is the
    calibration column (the q33/q64 convention). Sketch shuffle is
    O(partitions·sources·k); only the calibration column costs
    O(distinct)."""
    from spark_nnd_spark.functions.numeric import round_half_up_expr
    from spark_nnd_spark.operators import sketches as SK

    d = load_table(spark, sf_dir, "documents")
    # hashed once (polynomial hash + KMV mixer — a bijection mod P, so
    # distinct counts are unchanged while values spread uniformly),
    # checkpointed: feeds the sketch AND the exact count
    toks = (
        d.select("source", F.explode(TX.tokens_expr("text")).alias("token"))
        .filter(F.col("token") != "")
        .select(
            "source",
            SK.kmv_mix_expr(TX.token_hash_lambda(F.col("token"))).alias("h"),
        )
        .localCheckpoint(eager=True)
    )
    sk = SK.kmv_distinct(toks, "source", F.col("h"), k=KMV_K)
    exact = toks.groupBy("source").agg(F.countDistinct("h").alias("n_distinct"))
    return (
        sk.join(exact, "source")
        .select(
            "source",
            "n_distinct",
            "n_kept",
            "kth_hash",
            round_half_up_expr(F.col("kmv_estimate")).alias("kmv_estimate"),
        )
        .orderBy("source")
    )


def q104_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup PAIRS at hamming ≤ 3 over the 64-bit aHash
    (q100 buckets only exact-equal hashes; real image dedup needs a
    distance). Banded pigeonhole candidates (operators/dedup.py
    hash_hamming_pairs, the q42 machinery on the phash int64): 4
    bands of 16 bits, so any pair at hamming ≤ 3 shares an untouched
    band — recall is EXACT and the all-pairs DuckDB oracle must agree
    row-for-row. Verification is one XOR+popcount, codegen'd."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    ph = MM.perceptual_hash(d, id_col="doc_id")
    return DD.hash_hamming_pairs(
        ph, hash_col="phash", id_col="id", n_bands=4, bits=64, max_hamming=3
    ).orderBy("id_a", "id_b")


def q110_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 dimension history (operators/events.scd2_intervals): each
    user's event stream collapsed to versioned status intervals with
    valid_from/valid_to bounds — the warehouse shape for 'the version
    valid at time t' joins. One user_id exchange end-to-end."""
    e = load_table(spark, sf_dir, "events")
    return (
        EV.scd2_intervals(e)
        .select(
            "user_id",
            "version",
            "status",
            F.col("valid_from").cast("long").alias("valid_from_epoch"),
            F.col("valid_to").cast("long").alias("valid_to_epoch"),
            "n_events",
            "is_current",
        )
        .orderBy("user_id", "version")
    )


def q111_model_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed linear quality-model inference (functions/text.py
    linear_score_expr): fastText-style hashing-trick features scored
    as a narrow array-lambda fold — zero shuffle, zero UDF, the
    integer-exact sum makes the sigmoid bit-replayable in DuckDB. The
    plan shape a learned quality filter runs with at 100 TB (swap the
    arithmetic weight for a broadcast weight table)."""
    d = load_table(spark, sf_dir, "documents")
    score = TX.linear_score_expr("text")
    return d.select(
        "doc_id",
        F.round(score, 6).alias("model_score"),
        (score >= F.lit(0.5)).alias("keep"),
    ).orderBy("doc_id")


MIX_BUDGET_FRAC = 0.4


def q112_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-sampled source mixture (operators/sampling.py
    temperature_mix, α=0.5): the multilingual-corpus rebalance rule —
    per-source rates from one O(sources) aggregate, broadcast back,
    row-level md5 draw. The corpus never shuffles."""
    from spark_nnd_spark.operators import sampling as SA  # noqa: PLC0415

    d = load_table(spark, sf_dir, "documents")
    return (
        SA.temperature_mix(d, alpha=0.5, budget_frac=MIX_BUDGET_FRAC)
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


N_SHARDS = 8
SHARD_SEED = "epoch0"


def q113_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard assignment (operators/sampling.py
    assign_shards): seeded-hash global shuffle into N_SHARDS ordered
    shards — replayable (re-running or re-materializing one lost shard
    reproduces byte-equal order), no global sort, one shard exchange."""
    from spark_nnd_spark.operators import sampling as SA  # noqa: PLC0415

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    return (
        SA.assign_shards(d, n_shards=N_SHARDS, seed=SHARD_SEED)
        .select("doc_id", "shard", "pos")
        .orderBy("shard", "pos")
    )


# Persisted MRL prefix sidecar — built once per (session, sf_dir),
# the q103/_neardup_full_index_for convention.
_MRL_IDX_CACHE: dict[tuple[str, str], str] = {}


def _mrl_index_for(spark: SparkSession, sf_dir: str) -> str:
    from spark_nnd_spark.session import session_scratch_dir  # noqa: PLC0415

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _MRL_IDX_CACHE:
        path = session_scratch_dir("mrl_idx_")
        emb = load_table(spark, sf_dir, "embeddings")
        SIM.build_mrl_index(emb, path, prefix_dims=MRL_PREFIX_DIMS)
        _MRL_IDX_CACHE[key] = path
    return _MRL_IDX_CACHE[key]


def q123_indexed_mrl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q114's Matryoshka cascade served from a PERSISTED prefix sidecar
    (operators/similarity.py build_mrl_index / mrl_query_index): the
    coarse stage scans only the 16-dim prefix column — prefix/dims of
    the corpus vector bytes — and the rerank re-fetches full vectors
    for the bounded candidate set. Same rows as q114 (asserted
    index==inline in tests), same oracle SQL; columnar storage can
    prune columns but not array elements, so the materialized slice is
    what turns prefix scoring into an I/O win at 100 TB."""
    emb = load_table(spark, sf_dir, "embeddings")
    idx = _mrl_index_for(spark, sf_dir)
    out = SIM.mrl_query_index(
        spark,
        idx,
        emb.filter(F.col("vec_id") < 10),
        coarse_k=MRL_COARSE_K,
        k=5,
    )
    return out.select(
        "query_id", "nb_id", "rank", F.round("cosine", 6).alias("cosine")
    ).orderBy("query_id", "rank")


# Partitioned events dataset — written once per (session, sf_dir); the
# roundtrip query reads it back so the driver's correctness gate also
# covers the WRITE path (no other query touches sinks).
_EVENTS_DS_CACHE: dict[tuple[str, str], str] = {}


def _partitioned_events_for(spark: SparkSession, sf_dir: str) -> str:
    from spark_nnd_spark.session import session_scratch_dir  # noqa: PLC0415

    from spark_nnd_spark.sources.sinks import write_sorted

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _EVENTS_DS_CACHE:
        path = session_scratch_dir("events_ds_")
        e = load_table(spark, sf_dir, "events")
        write_sorted(
            e, f"{path}/events", ["ts"], mode="overwrite", partition_by=["event_type"]
        )
        _EVENTS_DS_CACHE[key] = path
    return _EVENTS_DS_CACHE[key]


def q124_partitioned_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write→read roundtrip through the engine's own sink layout
    (sources/sinks.write_sorted: hive-partitioned by event_type,
    ts-clustered row groups): read back ONE partition — the scan must
    prune to it (PartitionFilters, plan-asserted) — and aggregate
    purchase values per day. The oracle runs the same aggregate on the
    ORIGINAL table, so a hash match proves the partitioned, sorted
    copy is faithful: the correctness gate covering the write path."""
    path = _partitioned_events_for(spark, sf_dir)
    e = spark.read.parquet(f"{path}/events")
    return (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", F.col("ts")).cast("long").alias("day_epoch"))
        .agg(
            F.count("*").alias("c"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("string").alias("v"),
        )
        .orderBy("day_epoch")
    )


def q125_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (native ``unpivot``/melt — the inverse of q49's
    pivot): stack lineitem's four measure columns into (measure, value)
    rows and aggregate per (returnflag, measure). Unpivot is a
    zero-shuffle map-side expansion (×4 here) feeding one partial+final
    aggregate; the long form is what generic per-metric pipelines
    (drift checks, quality dashboards) consume without per-column
    code."""
    li = load_table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=["l_returnflag"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="value",
    )
    return (
        long.groupBy("l_returnflag", "measure")
        .agg(
            F.count("*").alias("c"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("string").alias("total"),
        )
        .orderBy("l_returnflag", "measure")
    )


# Fixed-boundary histogram sketch parameters (q126): token counts bin
# into 64 bins of width 8 (covers 0..512, clamped top bin) — estimate
# error is bounded by one width (operators/sketches.histogram_quantiles)
HIST_LO, HIST_WIDTH, HIST_BINS = 0.0, 8.0, 64
HIST_PROBS = {"p50": 0.5, "p90": 0.9, "p99": 0.99}


def q126_hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-count quantiles read off the mergeable
    fixed-boundary histogram sketch (operators/sketches.py
    fixed_histogram / histogram_quantiles), beside the exact
    percentiles — the q64/q109 calibration convention. This fills the
    bounded-state-quantiles gap between the exact sort-based
    percentiles (q38/q117) and the cardinality/frequency sketches
    (KMV/CMS): per-source length distributions at 100 TB (or in a
    streaming quality monitor) need O(groups·bins) mergeable state,
    not a per-group sort. Integer bin counts + double interpolation
    keep the whole sketch DuckDB-replayable — the same
    portability-over-approx_percentile argument as KMV-over-HLL —
    and |estimate − exact| ≤ width by construction (property-tested).
    The exact columns are the only sort-based tier; the sketch's
    shuffle is O(partitions·sources·bins), independent of corpus
    size."""
    from spark_nnd_spark.operators import sketches as SK

    d = (
        load_table(spark, sf_dir, "documents")
        .select("source", TX.token_count_expr("text").cast("double").alias("v"))
        .localCheckpoint(eager=True)  # feeds the sketch AND calibration
    )
    sk = SK.histogram_quantiles(
        d, "source", F.col("v"), HIST_LO, HIST_WIDTH, HIST_BINS, HIST_PROBS
    )
    pct = lambda p: F.expr(f"percentile(v, {p})")  # noqa: E731
    exact = d.groupBy("source").agg(
        F.round(pct(0.5), 6).alias("p50_exact"),
        F.round(pct(0.9), 6).alias("p90_exact"),
    )
    return (
        sk.select(
            F.col("grp").alias("source"),
            "n",
            *[F.round(F.col(lab), 6).alias(lab) for lab in HIST_PROBS],
        )
        .join(exact, "source")
        .orderBy("source")
    )


def q133_source_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source attrition through the FULL quality-gate stack —
    q75's cascade audit at source granularity with the r7 gates
    stacked on: min-tokens → stopword ratio → language → repetition
    (q128's Gopher keep) → learned tree-ensemble margin (q130). The
    FineWeb-style ablation table a corpus build publishes per source.
    All five cumulative gate booleans are computed in ONE narrow scan
    (every gate is a pure expression — even the GBDT margin) and
    collapsed by ONE map-side-combined groupBy(source) into
    O(sources) counter rows; integer counts hash exactly. The oracle
    recounts the repetition gate relationally (the q128 cross-check)
    while Spark folds it — strategies stay deliberately different."""
    d = load_table(spark, sf_dir, "documents")
    g1 = TX.token_count_expr("text") >= CASCADE_MIN_TOKENS
    g2 = g1 & (TX.stopword_ratio_expr("text") <= 0.6)
    g3 = g2 & (TX.predicted_lang_expr("text") == "en")
    s2 = TX.repetition_stats_expr(TX.ngrams_expr("text", 2))
    s3 = TX.repetition_stats_expr(TX.ngrams_expr("text", 3))
    n2 = F.size(TX.ngrams_expr("text", 2))
    n3 = F.size(TX.ngrams_expr("text", 3))
    top2 = F.when(n2 > 0, s2["best"].cast("double") / n2.cast("double")).otherwise(0.0)
    dup3 = F.when(n3 > 0, s3["dup"].cast("double") / n3.cast("double")).otherwise(0.0)
    g4 = g3 & (top2 <= REP_TOP2_MAX) & (dup3 <= REP_DUP3_MAX)
    g5 = g4 & (TX.tree_score_expr("text") > 0.0)

    def cnt(b, name):
        return F.sum(b.cast("long")).alias(name)

    return (
        d.groupBy("source")
        .agg(
            F.count("*").alias("n0"),
            cnt(g1, "p_min_tokens"),
            cnt(g2, "p_stopword"),
            cnt(g3, "p_lang"),
            cnt(g4, "p_repetition"),
            cnt(g5, "p_model"),
        )
        .orderBy("source")
    )


OUTLIER_Z = 2.0


def q132_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space label audit (operators/similarity
    .embedding_outliers): cosine of each vector to its OWN label
    centroid, z-scored within the label — the mislabel/noise curation
    signal for a labeled embedding store. Composes q44's centroid
    aggregate: the posexplode stream feeds the O(labels·dim) centroid
    broadcast AND collapses map-side to one (id, 3 sums) exchange;
    stats are O(labels), broadcast back; nothing wide ever moves. A
    zero-variance label z-scores 0 by definition (guarded on both
    engines)."""
    from spark_nnd_spark.functions.numeric import round_half_up_expr

    e = load_table(spark, sf_dir, "embeddings")
    out = SIM.embedding_outliers(e, z_threshold=OUTLIER_Z)
    return out.select(
        F.col("id").alias("vec_id"),
        "label",
        F.round("cosine", 6).alias("cosine"),
        round_half_up_expr(F.col("z")).alias("z"),
        "outlier",
    ).orderBy("vec_id")


# Retraction demo (q131): corpus docs with doc_id % RETRACT_MOD ==
# RETRACT_REM are tombstoned out of a dedicated session-cached index
# (never the shared q103 one — retraction mutates).
RETRACT_MOD, RETRACT_REM = 7, 3
_RETRACT_IDX_CACHE: dict[tuple[str, str], str] = {}


def _retracted_index_for(spark: SparkSession, sf_dir: str) -> str:
    from spark_nnd_spark.session import session_scratch_dir  # noqa: PLC0415

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _RETRACT_IDX_CACHE:
        path = session_scratch_dir("neardup_retract_idx_")
        d = load_table(spark, sf_dir, "documents")
        corpus = d.filter(F.col("source") != "src0")
        DD.build_neardup_index(corpus, path, num_hashes=16, bands=4, n=3)
        DD.retract_from_neardup_index(
            spark,
            path,
            corpus.filter(F.col("doc_id") % RETRACT_MOD == RETRACT_REM).select(
                "doc_id"
            ),
        )
        _RETRACT_IDX_CACHE[key] = path
    return _RETRACT_IDX_CACHE[key]


def q131_retracted_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup verdicts against an index with RETRACTED documents
    (operators/dedup.retract_from_neardup_index): the corpus index is
    built, then every corpus doc with doc_id ≡ 3 (mod 7) is
    tombstoned — the right-to-be-forgotten / bad-batch-rollback half
    of the index lifecycle. The probe anti-joins the O(retracted)
    tombstone log (broadcast), so verdicts are correct IMMEDIATELY
    after an O(retracted) append, no index rewrite; the oracle builds
    the ground truth the hard way (full incremental-dedup SQL over
    the corpus minus the retracted set), so the hash match proves
    tombstoning == physical deletion. compact_neardup_index folds the
    log in later (compact == fresh-build asserted in tests)."""
    d = load_table(spark, sf_dir, "documents")
    idx = _retracted_index_for(spark, sf_dir)
    return DD.neardup_query_index(
        spark,
        idx,
        d.filter(F.col("source") == "src0"),
        threshold=0.2,
        max_band_freq=None,
    ).orderBy("doc_id")


# Persisted binary-bits index (q134) — session-cached like the other
# index families; the build is the amortized ingest-time cost.
_BINARY_IDX_CACHE: dict[tuple[str, str], str] = {}


def _binary_index_for(spark: SparkSession, sf_dir: str) -> str:
    from spark_nnd_spark.session import session_scratch_dir  # noqa: PLC0415

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _BINARY_IDX_CACHE:
        path = session_scratch_dir("binary_idx_")
        SIM.build_binary_index(load_table(spark, sf_dir, "embeddings"), path)
        _BINARY_IDX_CACHE[key] = path
    return _BINARY_IDX_CACHE[key]


def q134_indexed_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q129's binary cascade served from the PERSISTED bits sidecar
    (operators/similarity.build_binary_index / binary_query_index):
    the coarse scan reads dim/8 bytes per vector from the stored sign
    words instead of packing a full float64 scan per query — the MRL
    argument applied to the 1-bit tier, and the point where the 64×
    cut becomes real scan I/O. Same rows as q129 (index==inline
    asserted in tests), same oracle SQL — execution strategy, not a
    semantic change (the q103/q123 convention)."""
    emb = load_table(spark, sf_dir, "embeddings")
    idx = _binary_index_for(spark, sf_dir)
    out = SIM.binary_query_index(
        spark,
        idx,
        emb.filter(F.col("vec_id") < 10),
        k=5,
        shortlist=BQ_SHORTLIST,
    )
    return out.select(
        "query_id",
        "nb_id",
        "rank",
        "hamming",
        F.round("cosine", 6).alias("cosine"),
    ).orderBy("query_id", "rank")


def q130_tree_ensemble_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GBDT-style quality classifier inference (functions/text.py
    tree_score_expr): six depth-2 trees over INTEGER-exact document
    features (token/distinct/stopword counts, max token length),
    evaluated as nested CASE WHEN — the piecewise-constant complement
    to q111's linear scorer, i.e. the XGBoost/fastText-filter
    inference shape of modern corpus curation. Integer splits are
    exact on both engines and the leaf-value sum is a fixed-order sum
    of literals, so the margin (and the keep verdict at margin > 0,
    ~79% of the corpus) hash-checks bit-for-bit. Entirely narrow:
    zero shuffle until the presentation sort, zero UDF — a real
    trained dump swaps in by replacing the TREES constants; the plan
    shape is unchanged."""
    d = load_table(spark, sf_dir, "documents")
    feats = TX._tree_feature_exprs("text")
    score = TX.tree_score_expr("text")
    return d.select(
        "doc_id",
        feats["n_tokens"].alias("n_tokens"),
        feats["n_distinct"].alias("n_distinct"),
        feats["stop_hits"].alias("stop_hits"),
        feats["max_tok_len"].alias("max_tok_len"),
        score.alias("margin"),
        (score > F.lit(0.0)).alias("keep"),
    ).orderBy("doc_id")


BQ_SHORTLIST = 20


def q129_binary_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantized retrieval with exact rerank
    (operators/similarity.binarize_embeddings / binary_hamming_topk):
    sign bits packed 32-per-BIGINT word, XOR+popcount hamming
    shortlist (64× smaller scan than float64), exact cosine over only
    the 20 survivors per query. Completes the compression ladder —
    float64 (q18) → int8 (q76) → PQ codes (q79) → 1 bit (here). The
    integer hamming cut is deterministic ((hamming, nb_id) ties), so
    unlike the float LSH/IVF tiers the whole cascade hash-checks
    against a full SQL replay. One run per session — q33 grades THIS
    tier (knn._ann_tier_for; BQ_SHORTLIST mirrors its
    BIN_SHORTLIST)."""
    from spark_nnd_spark.queries.knn import _tier_binary  # noqa: PLC0415

    return _tier_binary(spark, sf_dir).select(
        "query_id",
        "nb_id",
        "rank",
        "hamming",
        F.round("cosine", 6).alias("cosine"),
    ).orderBy("query_id", "rank")


# Repetition-filter thresholds (q128): chosen to split the synthetic
# corpus meaningfully (sf0.01: top-bigram p90 ≈ 0.071, trigram-dup has
# a ~5% tail above 0.02) — the Gopher-style "too repetitious to train
# on" verdict.
REP_TOP2_MAX, REP_DUP3_MAX = 0.0625, 0.02


def q128_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-family repetition quality filter (Rae et al. 2021 §A1.1:
    duplicate-n-gram and top-n-gram fractions): per document, the
    occurrence share of the most frequent bigram and the share of
    trigram occurrences belonging to repeated trigrams, plus the
    keep/drop verdict. Both metrics come from ONE narrow fold per
    n-gram order (functions/text.repetition_stats_expr: sort the
    gram array, run-length-scan it in an F.aggregate lambda) — no
    explode, no groupBy, zero shuffle until the final ORDER BY, so at
    100 TB this is a pure map stage over the corpus scan, the same
    plan shape as q72/q111. The DuckDB oracle takes the OPPOSITE
    strategy (unnest → GROUP BY gram → MAX/SUM-FILTER), so the parity
    check cross-validates the fold against a relational recount.
    Ratios are a single integer/integer double division, so both
    engines produce bit-identical values; short docs (< n tokens)
    score 0.0 by definition."""
    d = load_table(spark, sf_dir, "documents")
    rows = d.select(
        "doc_id",
        TX.repetition_stats_expr(TX.ngrams_expr("text", 2)).alias("s2"),
        TX.repetition_stats_expr(TX.ngrams_expr("text", 3)).alias("s3"),
        F.size(TX.ngrams_expr("text", 2)).cast("long").alias("n2"),
        F.size(TX.ngrams_expr("text", 3)).cast("long").alias("n3"),
    )
    top2 = F.when(
        F.col("n2") > 0, F.col("s2.best").cast("double") / F.col("n2").cast("double")
    ).otherwise(F.lit(0.0))
    dup3 = F.when(
        F.col("n3") > 0, F.col("s3.dup").cast("double") / F.col("n3").cast("double")
    ).otherwise(F.lit(0.0))
    return rows.select(
        "doc_id",
        top2.alias("top_bigram_frac"),
        dup3.alias("dup_trigram_frac"),
        ((top2 <= REP_TOP2_MAX) & (dup3 <= REP_DUP3_MAX)).alias("keep"),
    ).orderBy("doc_id")


CMS_TOPK = 10


def q122_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters (operators/sketches.cms_sketch):
    the exact global top-10 tokens next to their CMS point estimates —
    the q64/q109 calibration convention (sketch beside ground truth).
    The token stream materializes once (checkpoint) and feeds both the
    O(DEPTH·WIDTH)-bounded sketch aggregate and the exact count; the
    estimate join fans the 10 probes out ×DEPTH against the tiny
    sketch. Portable hashing makes every cell DuckDB-replayable."""
    from spark_nnd_spark.operators.sketches import cms_estimate, cms_sketch

    d = load_table(spark, sf_dir, "documents")
    hashed = (
        d.select(F.explode(TX.tokens_expr("text")).alias("token"))
        .select("token", TX.token_hash_lambda(F.col("token")).alias("h"))
        .localCheckpoint(eager=True)
    )
    sketch = cms_sketch(hashed, "h")
    top = (
        hashed.groupBy("token")
        .agg(F.count("*").alias("exact_n"), F.min("h").alias("h"))
        .orderBy(F.desc("exact_n"), F.asc("token"))
        .limit(CMS_TOPK)
    )
    return (
        cms_estimate(sketch, top, "h")
        .select("token", "exact_n", "cms_n")
        .orderBy("token")
    )


LPA_ITERATIONS = 2


def q120_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic label-propagation communities over the near-dup
    graph (operators/graph.label_propagation, fixed 2 iterations,
    mode-with-min-tiebreak — oracle-unrolled like q96 PageRank):
    bridge nodes join their denser side instead of fusing components."""
    from spark_nnd_spark.operators.graph import label_propagation

    pairs = _indexed_lsh_pairs(spark, sf_dir)
    return (
        label_propagation(pairs, iterations=LPA_ITERATIONS)
        .select(F.col("id").alias("doc_id"), "label")
        .orderBy("doc_id")
    )


def q121_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle participation in the near-dup graph
    (operators/graph.triangle_counts, oriented wedge join): triangle
    density separates tight duplicate cliques from chains of borderline
    pairs — the structural signal behind 'is this cluster one document
    or a drifting family'."""
    from spark_nnd_spark.operators.graph import triangle_counts

    pairs = _indexed_lsh_pairs(spark, sf_dir)
    return (
        triangle_counts(pairs)
        .select(F.col("id").alias("doc_id"), "n_triangles")
        .orderBy("doc_id")
    )


def q117_percentile_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source winsorization by rank: keep docs whose token count
    sits in the middle 90% of their source's distribution
    (percent_rank ∈ [0.05, 0.95]) — the outlier-trimming step before
    training-mix statistics. percent_rank is the exact rational
    (rank−1)/(n−1), identical in every engine; one source exchange."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", TX.token_count_expr("text").alias("n_tokens")
    )
    from pyspark.sql import Window  # noqa: PLC0415

    pr = F.percent_rank().over(
        Window.partitionBy("source").orderBy("n_tokens")
    )
    return (
        d.withColumn("pr", pr)
        .filter((F.col("pr") >= 0.05) & (F.col("pr") <= 0.95))
        .select("doc_id", "source", "n_tokens", F.round("pr", 6).alias("pr"))
        .orderBy("doc_id")
    )


def q119_hopping_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping event-time windows (operators/events.hopping_counts,
    size 2 h / slide 1 h): every event lands in exactly 2 overlapping
    windows, expanded map-side before the partial aggregate — shuffle
    carries O(windows·types), not 2× the stream."""
    ev = load_table(spark, sf_dir, "events")
    return (
        EV.hopping_counts(ev, size_hours=2, slide_hours=1)
        .select(
            F.col("w_start").cast("long").alias("w_start_epoch"),
            "event_type",
            "c",
            "v",
        )
        .orderBy("w_start_epoch", "event_type")
    )


def q116_two_phase_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant two-phase per-group top-K: top-3 longest docs per
    source. On Spark 3.5+ the plain ``row_number() <= k`` window IS
    two-phase — Catalyst inserts ``WindowGroupLimit Partial`` BELOW the
    exchange (plan-asserted in tests/test_plans.py), so each map task
    forwards at most groups·K rows and a hot group costs its reducer
    O(partitions·K), not its full mass. An earlier revision hand-built
    this cut with an Arrow mapInPandas pass; the native JVM form is
    strictly better (no Python round-trip) — measured in
    BENCH_PREJOIN.json: disabling the optimization multiplies the
    window's shuffle bytes by the stream/survivor ratio."""
    from spark_nnd_spark.operators.relational import group_top_k

    d = load_table(spark, sf_dir, "documents").select(
        "source", TX.token_count_expr("text").alias("n_tokens"), "doc_id"
    )
    return (
        group_top_k(
            d,
            ["source"],
            [F.desc("n_tokens"), F.asc("doc_id")],
            3,
            rank_col="rank",
        )
        .withColumn("rank", F.col("rank").cast("long"))
        .orderBy("source", "rank")
    )


BLOOM_M_BITS = 1 << 16


def q115_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit Bloom pre-filtered semi join (operators/sketches.py
    bloom_semi_join): lineitems of urgent orders, with the big side
    bloom-screened BEFORE the join exchange so the shuffle carries only
    matches + false-positive mass. The exact semi join removes false
    positives, so the result — and the DuckDB oracle — is the plain
    semi join; the bloom changes shuffle volume, not answers."""
    from spark_nnd_spark.operators.sketches import bloom_semi_join

    li = load_table(spark, sf_dir, "lineitem")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    hit = bloom_semi_join(li, urgent, "l_orderkey", "o_orderkey", m_bits=BLOOM_M_BITS)
    return (
        hit.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


MRL_PREFIX_DIMS = 16
MRL_COARSE_K = 20


def q114_mrl_two_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka two-stage retrieval (operators/similarity.py
    mrl_two_stage_topk): coarse top-20 on the first 16 dims (wide
    shuffle carries only ids+score, never vectors), exact full-dim
    rerank of the bounded candidate set to top-5. Both stages exact ⇒
    the whole cascade hash-checks against the SQL replay. One run per
    session — q33 grades THIS tier (knn._ann_tier_for)."""
    from spark_nnd_spark.queries.knn import _tier_mrl  # noqa: PLC0415

    return _tier_mrl(spark, sf_dir).select(
        "query_id", "nb_id", "rank", F.round("cosine", 6).alias("cosine")
    ).orderBy("query_id", "rank")


SPAN_WORDS = 5
SPAN_MIN_DF = 2
# fuzzy-match knobs: parts share a small adjective/noun vocabulary, so
# distance <= 3 pairs exist at every SF; the token df-cut mirrors
# MAX_SHINGLE_FREQ's role (no-op at small SF, fan-out bound at scale)
FUZZY_MAX_DIST = 3
FUZZY_MAX_TOKEN_FREQ = 1000


def q135_span_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style corpus-level span scrub (operators/dedup.span_scrub,
    Raffel et al. 2020 §2.2 re-expressed for unpunctuated token
    streams): 5-token spans occurring in >= 2 distinct docs are
    scrubbed corpus-wide; reported per source as a retention summary.
    Two wide ops total — a groupBy on the span string and the
    doc-frequency join back on the SAME key — then an O(sources)
    aggregate; the corpus text itself shuffles once as spans, the
    floor for any corpus-frequency rule."""
    d = load_table(spark, sf_dir, "documents")
    per_doc = (
        DD.span_scrub(d, span_words=SPAN_WORDS, min_df=SPAN_MIN_DF)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("doc_spans"),
            F.count_if(F.col("scrubbed")).alias("doc_scrubbed"),
        )
    )
    return (
        per_doc.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("doc_spans").alias("total_spans"),
            F.sum("doc_scrubbed").alias("scrubbed_spans"),
        )
        .select(
            "source",
            "n_docs",
            "total_spans",
            "scrubbed_spans",
            F.round(
                F.lit(1.0)
                - F.col("scrubbed_spans").cast("double")
                / F.col("total_spans").cast("double"),
                6,
            ).alias("kept_ratio"),
        )
        .orderBy("source")
    )


def q136_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution fuzzy self-match over part names
    (operators/dedup.fuzzy_name_pairs): distinct names canonicalized
    first, token-blocked candidates (df-cut bounded), Levenshtein <= 3
    verify in codegen, row counts attached by broadcast join. The
    dedupe-before-join shape that keeps ER sub-quadratic in rows."""
    p = load_table(spark, sf_dir, "part")
    return DD.fuzzy_name_pairs(
        p,
        "p_name",
        max_dist=FUZZY_MAX_DIST,
        max_token_freq=FUZZY_MAX_TOKEN_FREQ,
    ).orderBy("name_a", "name_b")


def q137_model_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source ROC-AUC of the hashed linear quality scorer (q111)
    against the rule-based quality gate (q37) as label
    (operators/evaluation.grouped_auc): does the learned filter rank
    rule-passing docs above rule-failing ones, source by source? The
    rank-sum identity makes each group one window pass — a single
    source exchange, three integers of state per group — instead of
    the quadratic positive×negative join."""
    from spark_nnd_spark.operators.evaluation import grouped_auc  # noqa: PLC0415

    d = load_table(spark, sf_dir, "documents")
    n_tok = TX.token_count_expr("text")
    stop = TX.stopword_ratio_expr("text")
    ttr = TX.type_token_ratio_expr("text")
    scored = d.select(
        "doc_id",
        "source",
        F.round(TX.linear_score_expr("text"), 6).alias("score"),
        ((n_tok >= 5) & (stop <= 0.6) & (ttr >= 0.3)).alias("label"),
    )
    return (
        grouped_auc(scored, "source", "score", "label", "doc_id")
        .select(
            "source",
            "n_pos",
            "n_neg",
            # single-class groups have no defined AUC; -1.0 is the
            # out-of-range sentinel (AUC lives in [0, 1]) that keeps
            # the output column non-null for the hash compare
            F.coalesce(F.round("auc", 6), F.lit(-1.0)).alias("auc"),
        )
        .orderBy("source")
    )


CALIB_BINS = 10


def q139_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram bins of the hashed linear quality scorer
    (q111) against the rule-based gate (q37) as label
    (operators/evaluation.calibration_bins) — the calibration audit
    beside q137's discrimination audit. One narrow scan + an
    O(n_bins)-group aggregate; bin ids are floor(score*n) integer
    arithmetic on the 6-decimal-rounded score, so cells replay
    exactly."""
    from spark_nnd_spark.operators.evaluation import calibration_bins  # noqa: PLC0415

    d = load_table(spark, sf_dir, "documents")
    n_tok = TX.token_count_expr("text")
    stop = TX.stopword_ratio_expr("text")
    ttr = TX.type_token_ratio_expr("text")
    scored = d.select(
        F.round(TX.linear_score_expr("text"), 6).alias("score"),
        ((n_tok >= 5) & (stop <= 0.6) & (ttr >= 0.3)).alias("label"),
    )
    return calibration_bins(
        scored, "score", "label", n_bins=CALIB_BINS
    ).orderBy("bin")


# DSIR knobs: src0 is the "target" slice (5% of the corpus) the
# mixture should resemble; top-100 is the selected subset.
DSIR_TARGET_SOURCE = "src0"
DSIR_TOP_K = 100


def q140_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (operators/sampling.dsir_log_weights,
    Xie et al. 2023): per-doc log importance weight under
    target-vs-raw smoothed unigram distributions (target = the src0
    slice), then the top-k selection the resampling step consumes —
    ranked by the 6dp-rounded weight with a doc_id tiebreak so the
    cut is deterministic cross-engine. One token-stream groupBy builds
    BOTH distributions (count + count_if on the same shuffle), one
    token-keyed scoring join, one per-doc fold. The global cut is
    orderBy().limit() — Catalyst's TakeOrderedAndProject
    (per-partition top-k, merge of k·partitions rows), NOT a global
    rank window, which would sort the whole corpus in one partition;
    rank is then assigned over the k survivors only."""
    from spark_nnd_spark.operators.sampling import dsir_log_weights  # noqa: PLC0415

    d = load_table(spark, sf_dir, "documents").withColumn(
        "is_target", F.col("source") == DSIR_TARGET_SOURCE
    )
    w = dsir_log_weights(
        d, TX.tokens_expr("text"), "is_target", id_col="doc_id"
    )
    top = w.orderBy(F.desc("log_weight"), F.asc("doc_id")).limit(DSIR_TOP_K)
    from pyspark.sql import Window  # noqa: PLC0415

    rank = F.row_number().over(
        Window.orderBy(F.desc("log_weight"), F.asc("doc_id"))
    )
    return (
        top.withColumn("rank", rank)  # window over k rows, not the corpus
        .select("doc_id", "n_tokens", "log_weight", "rank")
        .orderBy("rank")
    )


def q141_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split (operators/sampling.
    leakage_safe_split): the split bucket hashes the near-dup
    COMPONENT label, never the doc id, so duplicate clusters cannot
    straddle train and test — the eval-contamination guard. Components
    come from the persisted-index LSH pair stream (q31's kernel);
    singleton docs are their own component and never enter the
    propagation shuffle."""
    d = load_table(spark, sf_dir, "documents")
    pairs = _indexed_lsh_pairs(spark, sf_dir)
    from spark_nnd_spark.operators.sampling import leakage_safe_split  # noqa: PLC0415

    return leakage_safe_split(d, pairs, id_col="doc_id").orderBy("doc_id")


CURR_SHARDS = 8
# pair-sketch k: large enough that 190 source pairs get a usable
# resemblance estimate, small enough that the estimator branch (not
# the exact-set fallback) is what the oracle certifies
KMV_PAIR_K = 32


def q145_kmv_source_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source vocabulary resemblance from KMV sketch ALGEBRA
    (operators/sketches.kmv_group_minhashes + kmv_pair_jaccard, Beyer
    et al. 2007): the corpus reduces once to O(sources·k) k-min rows,
    then every one of the O(sources²) pairwise Jaccard questions is
    answered from sketches — never a second corpus scan, unlike q71's
    exact overlap matrix which pays a posting self-join. The exact
    distinct-set Jaccard rides along as the calibration column (the
    q109/q33 convention)."""
    from spark_nnd_spark.operators import sketches as SK  # noqa: PLC0415

    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.select("source", F.explode(TX.tokens_expr("text")).alias("token"))
        .filter(F.col("token") != "")
        .select(
            "source",
            SK.kmv_mix_expr(TX.token_hash_lambda(F.col("token"))).alias("h"),
        )
        .localCheckpoint(eager=True)  # feeds the sketch AND the exact side
    )
    mins = SK.kmv_group_minhashes(toks, "source", F.col("h"), k=KMV_PAIR_K)
    est = SK.kmv_pair_jaccard(mins, k=KMV_PAIR_K)
    dt = toks.distinct().localCheckpoint(eager=True)
    xa = dt.select(F.col("source").alias("grp_a"), "h")
    xb = dt.select(F.col("source").alias("grp_b"), "h")
    inter = (
        xa.join(xb, "h")
        .filter(F.col("grp_a") < F.col("grp_b"))
        .groupBy("grp_a", "grp_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sizes = dt.groupBy("source").agg(F.count("*").alias("n"))
    exact = (
        inter.join(sizes.select(F.col("source").alias("grp_a"), F.col("n").alias("n_a")), "grp_a")
        .join(sizes.select(F.col("source").alias("grp_b"), F.col("n").alias("n_b")), "grp_b")
        .select(
            "grp_a",
            "grp_b",
            F.round(
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
                6,
            ).alias("jaccard_exact"),
        )
    )
    return (
        est.join(exact, ["grp_a", "grp_b"], "left")  # zero-overlap pairs
        .select(
            F.col("grp_a").alias("source_a"),
            F.col("grp_b").alias("source_b"),
            "n_union_kept",
            "n_both",
            "jaccard_est",
            F.coalesce(F.col("jaccard_exact"), F.lit(0.0)).alias(
                "jaccard_exact"
            ),
        )
        .orderBy("source_a", "source_b")
    )


# Late-interaction knobs: 3 literal topic queries over corpus-vocab
# words; 16-bit sign vectors from the portable token hash make every
# token-pair cosine integer-exact ((16 - 2·hamming)/16).
LI_QUERIES = [(0, "spark table scan"), (1, "fast value sort"), (2, "window group agg")]
LI_MASK = (1 << 16) - 1
LI_DIM = 16
LI_SHORTLIST = 20
LI_K = 5


def q146_late_interaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage modern retrieval: a BM25 shortlist (q68's kernel,
    generalized to multiple queries) reranked by ColBERT-style late
    interaction (Khattab & Zaharia 2020) — score(q, d) = mean over
    q's tokens of the max cosine against d's tokens, with token
    embeddings as 16-bit SIGN vectors of the portable polynomial hash,
    so every token-pair cosine is (16 − 2·hamming)/16: integer-exact,
    hash-checkable, the q129 discipline applied to multi-vector
    scoring.

    Scale (100 TB): the corpus is touched only by the posting-filtered
    BM25 stage (the exchange carries docs containing a query term);
    the quadratic token×token interaction runs ONLY over the
    O(queries·shortlist) reranked docs — the cost cap that makes late
    interaction deployable, exactly how ColBERT serves. A learned
    embedding table would swap in for the hash projection behind the
    same (token → vector) join; the plumbing is identical.

    The ranked list is materialized once per (session, sf_dir)
    (_li_ranked_for): q158's eval and q187's negative mining both run
    THIS retriever as their evidence source, and re-paying the
    shortlist+rerank per consumer is three corpus passes for one
    unchanged artifact."""
    return _li_ranked_for(spark, sf_dir).orderBy("query_id", "rank")


_LI_RANKED_CACHE: dict[tuple[str, str], DataFrame] = {}


def _li_ranked_for(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _LI_RANKED_CACHE:
        _LI_RANKED_CACHE[key] = _li_ranked_plan(
            spark, sf_dir
        ).localCheckpoint(eager=True)
    return _LI_RANKED_CACHE[key]


def _li_ranked_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    qterms = spark.createDataFrame(
        [(qid, t) for qid, text in LI_QUERIES for t in text.split(" ")],
        "query_id int, token string",
    )
    all_terms = sorted({t for _, text in LI_QUERIES for t in text.split(" ")})
    # filter to query terms INSIDE the token array, before the explode
    # generates a row per corpus token (guide §2.3 — same rows survive,
    # duplicates retained for tf; the explode fans out only matches)
    toks = d.select(
        "doc_id",
        TX.token_count_expr("text").cast("double").alias("dl"),
        F.explode(
            F.filter(TX.tokens_expr("text"), lambda t: t.isin(*all_terms))
        ).alias("token"),
    )
    tf = (
        toks.groupBy("doc_id", "token", "dl")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=True)  # feeds df counts AND scoring
    )
    df_ = tf.groupBy("token").agg(F.count("*").alias("df"))
    stats = d.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg(TX.token_count_expr("text")).alias("avgdl"),
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    term_score = idf * (
        F.col("tf") * (BM25_K1 + 1)
        / (F.col("tf") + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl")))
    )
    from pyspark.sql import Window  # noqa: PLC0415

    bm25 = (
        tf.join(F.broadcast(qterms), "token")
        .join(F.broadcast(df_), "token")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        # round(6) BEFORE the shortlist cut: the raw double sum is
        # summation-order-sensitive, and an ulp difference vs the
        # oracle at the rank-20 boundary would flip shortlist
        # membership (the same discipline as li_score/q68).
        .agg(F.round(F.sum(term_score), 6).alias("bm25"))
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("bm25"), F.asc("doc_id"))
    short = (
        bm25.withColumn("crank", F.row_number().over(wq))
        .filter(F.col("crank") <= LI_SHORTLIST)
        .select("query_id", "doc_id")
        .localCheckpoint(eager=True)  # tiny; the rerank joins it twice
    )
    h16 = lambda c: TX.token_hash_lambda(c).bitwiseAND(F.lit(LI_MASK))  # noqa: E731
    qt = qterms.select("query_id", h16(F.col("token")).alias("qh")).distinct()
    # Rerank-side pruning (guide §2.3/§3.2): semi-join the corpus down
    # to shortlist docs BEFORE tokenizing — the (doc_id, token)
    # distinct below is O(shortlist docs), not a full-corpus tokenize
    # + exchange (the former plan deduped every (doc_id, token) pair
    # in the corpus just to throw all but ~shortlist away at the join).
    sdocs = short.select("doc_id").distinct()
    dt = (
        short.join(
            d.join(F.broadcast(sdocs), "doc_id", "left_semi")
            .select("doc_id", F.explode(TX.tokens_expr("text")).alias("token"))
            .filter(F.col("token") != "")
            .distinct(),
            "doc_id",
        )
        .select("query_id", "doc_id", h16(F.col("token")).alias("dh"))
        .distinct()
    )
    cos = (
        F.lit(LI_DIM)
        - 2 * F.bit_count(F.col("qh").bitwiseXOR(F.col("dh")))
    ) / F.lit(float(LI_DIM))
    maxsim = (
        dt.join(F.broadcast(qt), "query_id")
        .groupBy("query_id", "doc_id", "qh")
        .agg(F.max(cos).alias("mx"))
    )
    li = maxsim.groupBy("query_id", "doc_id").agg(
        F.round(F.avg("mx"), 6).alias("li_score")
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.desc("li_score"), F.asc("doc_id")
    )
    return (
        li.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= LI_K)
        .select("query_id", "doc_id", "rank", "li_score")
    )


def q147_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dataset card — the datasheet table a corpus release
    publishes: volume (docs, tokens, mean length), exact-duplicate
    rate, rule-gate pass rate, and the dominant predicted language
    with its share. One corpus scan feeds a source aggregate and a
    (source, lang) mode aggregate (deterministic count-then-lang
    tiebreak); every cell is exact-count arithmetic or a round(6)
    ratio, so the card replays bit-for-bit. One card pass per session
    (_source_card_for) — q150's CURRENT snapshot is this same card."""
    return _source_card_for(spark, sf_dir)


# The full-corpus card is computed by q147 AND as q150's current
# snapshot — one pass per (session, sf_dir); q150's previous snapshot
# (corpus minus the newest decile) stays inline, a different slice.
_SOURCE_CARD_CACHE: dict[tuple[str, str], DataFrame] = {}


def _source_card_for(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _SOURCE_CARD_CACHE:
        _SOURCE_CARD_CACHE[key] = _source_card(
            load_table(spark, sf_dir, "documents")
        ).localCheckpoint(eager=True)
    return _SOURCE_CARD_CACHE[key]


def _source_card(d: DataFrame) -> DataFrame:
    """The q147 card over an arbitrary documents slice — shared with
    q150's drift diff, which builds two snapshots of it."""
    n_tok = TX.token_count_expr("text")
    stop = TX.stopword_ratio_expr("text")
    ttr = TX.type_token_ratio_expr("text")
    base = d.select(
        "source",
        n_tok.alias("nt"),
        F.md5("text").alias("digest"),
        ((n_tok >= 5) & (stop <= 0.6) & (ttr >= 0.3))
        .cast("int")
        .alias("gate"),
        TX.predicted_lang_expr("text").alias("lang"),
    ).localCheckpoint(eager=True)  # feeds both aggregates
    agg = base.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("nt").alias("n_tokens"),
        F.round(F.avg(F.col("nt").cast("double")), 6).alias("mean_tokens"),
        F.round(
            F.lit(1.0)
            - F.countDistinct("digest").cast("double")
            / F.count("*").cast("double"),
            6,
        ).alias("dup_ratio"),
        F.round(F.avg(F.col("gate").cast("double")), 6).alias("quality_pass_rate"),
    )
    from pyspark.sql import Window  # noqa: PLC0415

    lc = base.groupBy("source", "lang").agg(F.count("*").alias("n"))
    wl = Window.partitionBy("source").orderBy(F.desc("n"), F.asc("lang"))
    top = (
        lc.withColumn("rn", F.row_number().over(wl))
        .filter(F.col("rn") == 1)
        .select("source", F.col("lang").alias("top_lang"), F.col("n").alias("tn"))
    )
    return (
        agg.join(top, "source")
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "mean_tokens",
            "dup_ratio",
            "quality_pass_rate",
            "top_lang",
            F.round(
                F.col("tn").cast("double") / F.col("n_docs").cast("double"), 6
            ).alias("top_lang_share"),
        )
        .orderBy("source")
    )


def q142_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase annealed curriculum manifest — the (epoch, shard, pos,
    doc_id) data-order file a training loader consumes: epoch 1 is the
    whole corpus under one seeded-hash shuffle, epoch 2 (the
    "annealing" phase of Llama-3/MiniCPM-style schedules) re-shuffles
    only the docs passing the GBDT quality gate (q130's scorer) under
    a fresh seed. Fully deterministic: re-running the job, or
    re-materializing one lost (epoch, shard), reproduces byte-equal
    order. Two narrow scans + one shard exchange per epoch (the q113
    kernel, never a global sort); the gate is a codegen expression in
    the scan."""
    from spark_nnd_spark.operators import sampling as SA  # noqa: PLC0415

    d = load_table(spark, sf_dir, "documents")
    ep1 = (
        SA.assign_shards(
            d.select("doc_id"), n_shards=CURR_SHARDS, seed="ep1"
        )
        .select(F.lit(1).alias("epoch"), "doc_id", "shard", "pos")
    )
    kept = d.filter(TX.tree_score_expr("text") > 0.0).select("doc_id")
    ep2 = (
        SA.assign_shards(kept, n_shards=CURR_SHARDS, seed="ep2")
        .select(F.lit(2).alias("epoch"), "doc_id", "shard", "pos")
    )
    return ep1.unionByName(ep2).orderBy("epoch", "shard", "pos")


# q149 mixture-solve fractions: budget = 90% of corpus tokens, per-source
# cap = 6% of the budget — on THIS corpus (20 near-equal sources ≈5% of
# tokens each) that exercises all three branches: small sources saturate
# (taken whole), the largest hit the cap, the rest share the fill level.
MIX_BUDGET = (9, 10)
MIX_CAP = (6, 100)


def q149_budget_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget-constrained mixture solve (operators/sampling.
    budget_waterfill): q112 mixes by a fixed temperature rule; this
    SOLVES for per-source sampling rates given a total token budget and
    a per-source cap — waterfilling (sort by effective availability,
    take small sources whole, share the rest at a common integer fill
    level, remainder one token each in sort order). Deterministic
    integer arithmetic end-to-end, so the solve replays bit-for-bit.

    Scale (100 TB): the corpus is touched by ONE map-side-combined
    (source) aggregate (q69's kernel); the solve itself windows over
    O(sources) rows — a constant-cost step regardless of corpus size."""
    from spark_nnd_spark.operators import sampling as SA  # noqa: PLC0415

    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.sum(
            F.size(F.filter(TX.tokens_expr("text"), lambda t: t != F.lit("")))
        ).alias("tokens")
    )
    return SA.budget_waterfill(
        per, budget_frac=MIX_BUDGET, cap_frac=MIX_CAP
    ).orderBy("source")


# q150: the "previous snapshot" is the corpus minus each source's
# newest ingest batch — testdata deals doc_ids round-robin by source
# (doc_id % n_sources = source index), so the per-source SEQUENCE
# number is doc_id div DRIFT_DIV, and dropping its last decile removes
# ~10% of every source's docs (a plain doc_id % 10 cut would delete two
# whole sources instead). Drift above 2% relative change is flagged.
# The six card metrics, unpivoted.
DRIFT_DIV, DRIFT_MOD, DRIFT_REM = 20, 10, 9
DRIFT_EPS = 0.02
CARD_METRICS = [
    "n_docs",
    "n_tokens",
    "mean_tokens",
    "dup_ratio",
    "quality_pass_rate",
    "top_lang_share",
]


def q150_card_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-card drift alerting — the monitoring loop a continuously-
    ingested corpus runs daily: q147's per-source card computed over
    two snapshots (previous = corpus minus the newest decile, current =
    full corpus), unpivoted to (source, metric) rows, with the relative
    delta and a >2% drift flag. Rounded-to-6dp deltas on both sides
    make the flag boundary engine-exact (the q68 discipline).

    Scale (100 TB): two card passes (each one map-side-combined corpus
    aggregate, O(sources) output) + an O(sources·metrics) join — the
    diff itself never touches the corpus. In production the previous
    card would be READ from the last snapshot (the q110 SCD2
    convention), making this one scan; computing both here keeps the
    query self-contained and replayable."""
    d = load_table(spark, sf_dir, "documents")
    prev = _source_card(
        d.filter(
            F.expr(f"pmod(doc_id div {DRIFT_DIV}, {DRIFT_MOD})") != DRIFT_REM
        )
    )
    curr = _source_card_for(spark, sf_dir)
    stack = F.expr(
        "stack("
        + str(len(CARD_METRICS))
        + ", "
        + ", ".join(f"'{m}', cast({m} as double)" for m in CARD_METRICS)
        + ") as (metric, value)"
    )

    def unpivot(card: DataFrame, val: str) -> DataFrame:
        return card.select("source", stack).select(
            "source", "metric", F.col("value").alias(val)
        )

    rel = F.round(
        (F.col("new_value") - F.col("old_value"))
        / F.greatest(F.abs("old_value"), F.lit(1e-12)),
        6,
    )
    # FULL outer join (ADVICE r9): a source absent from the previous
    # snapshot (brand-new ingest) — or absent from the current one
    # (disappeared) — must still alert. Coalescing the missing side to
    # 0.0 routes both cases through the 1e-12-guarded relative delta,
    # which maps them to maximal drift (flagged) with a NULL-free
    # schema (driver-compare sorts crash on NULLs).
    return (
        unpivot(prev, "old_value")
        .join(unpivot(curr, "new_value"), ["source", "metric"], "full_outer")
        .select(
            "source",
            "metric",
            F.coalesce("old_value", F.lit(0.0)).alias("old_value"),
            F.coalesce("new_value", F.lit(0.0)).alias("new_value"),
        )
        .select(
            "source",
            "metric",
            "old_value",
            "new_value",
            rel.alias("rel_delta"),
            (F.abs(rel) >= F.lit(DRIFT_EPS)).alias("flagged"),
        )
        .orderBy("source", "metric")
    )


# q153 threshold grid: the q16 pipeline verifies pairs down to J=0.2,
# so the sweep starts there, and the upper taus sit INSIDE the corpus's
# observed pair band (J = 0.90-0.99 on this synthetic near-dup fixture)
# so the curve actually bends; 6dp-rounded jaccard on both sides makes
# every >= tau boundary engine-exact.
DEDUP_SWEEP_TAUS = [0.2, 0.5, 0.9, 0.95, 0.97, 0.98, 0.99]


def q153_dedup_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup threshold calibration curve — the table an operator
    consults BEFORE picking tau: for each candidate threshold, how many
    verified near-dup pairs qualify and how many docs the greedy-by-id
    keep rule (the q138/q61 convention: drop any doc with a smaller-id
    neighbor at J >= tau) would remove, as a corpus fraction. ONE pairs
    materialization (the q16 MinHash-LSH pipeline) serves every
    threshold: each pair explodes over the qualifying taus (a narrow
    map, no join), one O(taus) aggregate, and a broadcast fill-in so
    zero-pair thresholds still emit their row.

    Scale (100 TB): the expensive thing — banded LSH + verification —
    runs ONCE; the sweep itself is O(pairs · taus) narrow work. This is
    why calibration sweeps should never re-run the pair pipeline per
    threshold."""
    d = load_table(spark, sf_dir, "documents")
    pairs = DD.minhash_lsh_pairs(
        d, num_hashes=16, bands=4, n=3, threshold=0.2, max_band_freq=MAX_BAND_FREQ
    )
    return _sweep_from_pairs(spark, d, pairs)


def _sweep_from_pairs(
    spark: SparkSession, d: DataFrame, pairs: DataFrame
) -> DataFrame:
    """The tau sweep over an arbitrary verified-pairs source — shared
    by q153 (inline LSH pipeline) and q161 (persisted index), so the
    curve semantics can never drift between them."""
    pairs = pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("j"))
    taus = spark.createDataFrame(
        [(t,) for t in DEDUP_SWEEP_TAUS], "tau double"
    )
    qual = pairs.select(
        F.explode(
            F.filter(
                F.array(*[F.lit(t) for t in DEDUP_SWEEP_TAUS]),
                lambda t: F.col("j") >= t,
            )
        ).alias("tau"),
        "id_a",
        "id_b",
    )
    stats = qual.groupBy("tau").agg(
        F.count("*").alias("n_pairs"),
        F.countDistinct("id_b").alias("n_dropped"),
    )
    n_docs = d.agg(F.count("*").alias("n_docs"))
    return (
        taus.join(F.broadcast(stats), "tau", "left")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "tau",
            F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
            F.coalesce("n_dropped", F.lit(0)).alias("n_dropped"),
            F.round(
                F.coalesce("n_dropped", F.lit(0)) / F.col("n_docs"), 6
            ).alias("drop_rate"),
        )
        .orderBy("tau")
    )


# q154 candidate context lengths: spans the corpus's per-source token
# totals (~1.4k at sf0.01) so every tradeoff direction is visible.
PACK_LENS = [128, 256, 512, 1024]


def q154_packing_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-length decision curve for sequence packing — for each
    candidate window length, what the q66 packing convention costs:
    how many docs straddle a pack boundary (attention-mask complexity /
    coherence loss), how many packs the corpus needs, and the padding
    the final partial pack per source would pay. Larger windows cut
    packs and relative tail waste but straddle more docs — this table
    is how an operator picks max_len before exporting.

    One per-source ordered cumsum pass (q66's window) serves every
    length: each doc explodes over the candidate lengths (narrow map),
    per-source totals feed the pack/padding arithmetic, all integer
    floor-division — bit-exact in any engine.

    Scale (100 TB): the corpus pays one source-partitioned window (the
    q66 exchange); the curve itself is O(docs · lengths) narrow work +
    O(sources · lengths) aggregates. Like q153: never re-run the
    expensive pass per grid point."""
    from pyspark.sql import Window  # noqa: PLC0415

    d = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    n = TX.token_count_expr("text")
    per = d.select(
        "source",
        n.cast("long").alias("n"),
        F.sum(n).over(w).cast("long").alias("cum"),
    ).localCheckpoint(eager=True)  # feeds the doc grid AND source totals
    lens = F.explode(F.array(*[F.lit(x) for x in PACK_LENS])).alias("context_len")
    doc_grid = per.select(lens, "n", "cum").withColumn(
        "straddled",
        (F.col("n") > 0)
        & (
            F.expr("(cum - n) div context_len") != F.expr("(cum - 1) div context_len")
        ),
    )
    doc_stats = doc_grid.groupBy("context_len").agg(
        F.sum(F.col("straddled").cast("long")).alias("n_straddled"),
        F.count("*").alias("n_docs"),
    )
    src = per.groupBy("source").agg(F.sum("n").alias("total"))
    src_stats = (
        src.select(lens, "total")
        .withColumn("packs", F.expr("(total - 1) div context_len") + 1)
        .groupBy("context_len")
        .agg(
            F.sum("packs").alias("n_packs"),
            F.sum(F.col("packs") * F.col("context_len") - F.col("total")).alias(
                "padded_tokens"
            ),
        )
    )
    return (
        doc_stats.join(src_stats, "context_len")
        .select(
            "context_len",
            "n_packs",
            "n_straddled",
            "padded_tokens",
            F.round(F.col("n_straddled") / F.col("n_docs"), 6).alias(
                "straddle_rate"
            ),
            F.round(
                F.col("padded_tokens")
                / (F.col("n_packs") * F.col("context_len")),
                6,
            ).alias("waste_rate"),
        )
        .orderBy("context_len")
    )


# q155 gate thresholds: entropy floor sits at the corpus p10 (~2.774 at
# sf0.01) so the gate is non-trivial; the near-dup cut reuses the
# corpus's observed pair band (q153).
ENTROPY_MIN = 2.78
BOARD_NEARDUP_TAU = 0.9


# One curation board per (session, sf_dir): q155 publishes it, q181
# ablates it, q190 exports through it — the _chunk_index_for
# convention, so composers reuse one materialization instead of each
# re-running the board pipeline (measured ~2.6x on q181 pre-cache).
_BOARD_CACHE: dict[tuple[str, str], DataFrame] = {}


def _board_for(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _BOARD_CACHE:
        d = load_table(spark, sf_dir, "documents")
        # the session pairs table IS the inline minhash_lsh_pairs(16,
        # 4, 3, 0.2, cap) result row-for-row (asserted index==inline in
        # test_operators) — the board's drop set filters it instead of
        # re-running a full LSH pipeline (signatures + banding +
        # self-join + verify) inside the heaviest build of the bench
        drops = (
            _indexed_lsh_pairs(spark, sf_dir)
            .filter(F.round("jaccard", 6) >= BOARD_NEARDUP_TAU)
            .select(F.col("id_b").alias("doc_id"))
            .distinct()
        )
        _BOARD_CACHE[key] = board_compose(board_gates(d), drops).localCheckpoint(
            eager=True
        )
    return _BOARD_CACHE[key]


def q155_curation_board(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation scoreboard — every per-doc quality signal the
    engine computes, composed into one keep/drop table with per-gate
    verdicts and a failure-reason string: GBDT margin (q130), Gopher
    repetition stats (q128), char entropy (q72), and the greedy-by-id
    near-dup verdict (q16 pairs at J >= 0.9). This is the final table
    a training-data build materializes before writing shards — and the
    provenance record auditors read ("why was doc X dropped?").

    Scale (100 TB): every text signal is a codegen expression in ONE
    corpus scan (no signal pays its own pass); the only join is the
    broadcast near-dup drop set (O(dup docs)); one presentation sort.
    Reasons are a fixed-order filtered array join — deterministic, no
    NULLs. The composed board is session-cached (``_board_for``) so
    q181/q190 reuse one materialization."""
    return _board_for(spark, sf_dir).orderBy("doc_id")


def board_gates(d: DataFrame, model_w: dict | None = None) -> DataFrame:
    """Per-doc text quality gates of the curation scoreboard — every
    signal a codegen expression in one scan of (doc_id, text); shared
    by q155 (inline), q159 (index-served), q170 (model-scored) and the
    streaming gate. When ``model_w`` (a q169-trained weight dict) is
    given, the board gains the learned-classifier gate: model_score =
    the 6dp sigmoid of the LR logit over the same text features the
    trainer used, model_keep = score >= MODEL_KEEP_TAU — the
    fastText-style model-in-the-loop filter, still one codegen
    expression in the same scan."""
    s2 = TX.repetition_stats_expr(TX.ngrams_expr("text", 2))
    s3 = TX.repetition_stats_expr(TX.ngrams_expr("text", 3))
    n2 = F.size(TX.ngrams_expr("text", 2)).cast("long")
    n3 = F.size(TX.ngrams_expr("text", 3)).cast("long")
    top2 = F.when(F.col("n2") > 0, F.col("s2.best").cast("double") / F.col("n2")).otherwise(F.lit(0.0))
    dup3 = F.when(F.col("n3") > 0, F.col("s3.dup").cast("double") / F.col("n3")).otherwise(F.lit(0.0))
    chars = F.split(F.col("text"), "")
    alphabet = F.array_sort(F.array_distinct(chars))
    total = F.size(chars).cast("double")

    def _p(c):
        return F.size(F.filter(chars, lambda x: x == c)) / total

    ent = -F.aggregate(
        F.transform(alphabet, lambda c: _p(c) * F.log(_p(c))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    from spark_nnd_spark.functions.numeric import round_half_up_expr  # noqa: PLC0415

    first = [
        F.col("doc_id"),
        TX.tree_score_expr("text").alias("margin_raw"),
        s2.alias("s2"),
        s3.alias("s3"),
        n2.alias("n2"),
        n3.alias("n3"),
        round_half_up_expr(ent).alias("entropy"),
    ]
    final = [
        F.col("doc_id"),
        F.col("entropy"),
        F.round("margin_raw", 6).alias("margin"),
        (F.col("margin_raw") > 0.0).alias("quality_keep"),
        (
            (top2 <= F.lit(REP_TOP2_MAX)) & (dup3 <= F.lit(REP_DUP3_MAX))
        ).alias("rep_keep"),
        (F.col("entropy") >= F.lit(ENTROPY_MIN)).alias("entropy_keep"),
    ]
    if model_w is not None:
        # same feature expressions as _lr_feats / the q169 trainer, so
        # the served score replays the training-time arithmetic exactly
        xn = TX.token_count_expr("text").cast("double") / F.lit(100.0)
        z = (
            (F.lit(model_w["bias"]) + F.lit(model_w["ntok"]) * xn)
            + F.lit(model_w["stop"]) * TX.stopword_ratio_expr("text")
        ) + F.lit(model_w["ttr"]) * TX.type_token_ratio_expr("text")
        first.append(
            F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6).alias(
                "model_score"
            )
        )
        final.extend(
            [
                F.col("model_score"),
                (F.col("model_score") >= F.lit(MODEL_KEEP_TAU)).alias(
                    "model_keep"
                ),
            ]
        )
    return d.select(*first).select(*final)


def board_compose(scored: DataFrame, drops: DataFrame) -> DataFrame:
    """Compose the text gates with a near-dup drop set (doc_id rows —
    whatever tier produced it: inline pairs, persisted index, or a
    streaming probe) into the final keep/drop board with deterministic
    fixed-order reason strings. If ``scored`` carries the model gate
    (board_gates(model_w=...)), the verdict and reasons fold it in —
    q155/q159/q170 and the streaming gate all share this compose."""
    with_model = "model_keep" in scored.columns
    gates = scored.join(
        F.broadcast(drops.select("doc_id").withColumn("dropped", F.lit(True))),
        "doc_id",
        "left",
    ).withColumn("dedup_keep", F.col("dropped").isNull())
    reason_flags = [
        F.when(~F.col("dedup_keep"), F.lit("neardup")),
        F.when(~F.col("entropy_keep"), F.lit("entropy")),
        F.when(~F.col("quality_keep"), F.lit("quality")),
        F.when(~F.col("rep_keep"), F.lit("repetition")),
    ]
    keep = (
        F.col("quality_keep")
        & F.col("rep_keep")
        & F.col("entropy_keep")
        & F.col("dedup_keep")
    )
    mid_cols: list = []
    if with_model:
        reason_flags.append(F.when(~F.col("model_keep"), F.lit("model")))
        keep = keep & F.col("model_keep")
        mid_cols = ["model_score", "model_keep"]
    reasons = F.concat_ws(
        ",", F.filter(F.array(*reason_flags), lambda x: x.isNotNull())
    )
    return gates.select(
        "doc_id",
        "margin",
        "entropy",
        "quality_keep",
        "rep_keep",
        "entropy_keep",
        "dedup_keep",
        *mid_cols,
        keep.alias("keep"),
        reasons.alias("reasons"),
    )


# q151 PII planting moduli: the synthetic corpus contains no PII-shaped
# strings (verified: zero regex hits at every SF), so the query PLANTS
# deterministic PII derived from doc_id — the injection is part of the
# replayable query text, like every other planted fixture — and then
# detects/redacts it with the production helpers.
PII_EMAIL_MOD, PII_IP_MOD, PII_PHONE_MOD = 7, 11, 13


def q151_pii_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detect + redact audit (functions/text.pii_count_expr /
    pii_redact_expr): per-doc counts of each PII kind and the md5 of
    the redacted text. Patterns are deliberately lookaround-free (the
    Java-regex ∩ RE2 class), so counts AND replacements replay exactly
    in DuckDB — this query is the cross-engine proof of that claim.

    Scale (100 TB): pure codegen regexp projections in the scan (no
    UDF, no shuffle until the final ORDER BY) — the shape of every
    production PII scrub pass."""
    d = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    aug = F.concat(
        F.col("text"),
        F.when(
            did % PII_EMAIL_MOD == 0,
            F.concat(F.lit(" contact user"), did.cast("string"), F.lit("@example.com")),
        ).otherwise(F.lit("")),
        F.when(
            did % PII_IP_MOD == 0,
            F.concat(F.lit(" host 10.0."), (did % 256).cast("string"), F.lit(".1")),
        ).otherwise(F.lit("")),
        F.when(
            did % PII_PHONE_MOD == 0,
            F.concat(
                F.lit(" call 415-555-"),
                F.lpad((did % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
    )
    return (
        d.select("doc_id", aug.alias("aug"))
        .select(
            "doc_id",
            TX.pii_count_expr("aug", "email").alias("n_email"),
            TX.pii_count_expr("aug", "ip").alias("n_ip"),
            TX.pii_count_expr("aug", "phone").alias("n_phone"),
            F.md5(TX.pii_redact_expr("aug")).alias("redacted_md5"),
        )
        .orderBy("doc_id")
    )


BPE_TOPK = 30


def q152_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First BPE merge iteration: the corpus-wide census of adjacent
    character pairs inside tokens (functions/text.char_pairs_expr —
    the merge-candidate enumeration), cut to the top-k most frequent.
    The pair census is ONE map-side-combined aggregate over the token
    stream; the global cut is orderBy().limit() =
    TakeOrderedAndProject (per-partition top-k + k·partitions merge,
    the q140 discipline — never a global rank window), and only the k
    survivors are ranked."""
    d = load_table(spark, sf_dir, "documents")
    pairs = (
        d.select(F.explode(TX.tokens_expr("text")).alias("tok"))
        .filter(F.length("tok") >= 2)
        .select(F.explode(TX.char_pairs_expr("tok")).alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(BPE_TOPK)
    )
    from pyspark.sql import Window  # noqa: PLC0415

    w = Window.orderBy(F.desc("n"), F.asc("pair"))
    return pairs.withColumn("rank", F.row_number().over(w)).orderBy("rank")


# q156 exact-span dedup: gram width / minimum reported span (tokens).
# The planted passage is 12 tokens with block-keyed first+last tokens:
# same-block pairs share all 12 (== SPAN_MIN, reported); cross-block
# pairs share only the 10 middle tokens (< SPAN_MIN, excluded) — the
# plant probes the threshold from both sides. Plant density is 1/100
# docs with the shared-passage group keyed by doc_id div 400, so the
# planted pair count grows LINEARLY with corpus size (a single global
# passage would grow quadratically and swamp the bench tier).
SPAN_GRAM_LEN = 6
SPAN_MIN_TOKENS = 12
SPAN_PLANT_MOD = 100
SPAN_PLANT_REM = 7
SPAN_PLANT_BLOCK = 400
SPAN_PASSAGE_MID = "quick brown fox jumps over the lazy dog again tail"


def _span_planted(d: DataFrame) -> DataFrame:
    """Corpus with the deterministic verbatim passage appended (the
    q151 planting convention: the synthetic corpus has no verbatim
    cross-doc passages, so the fixture is part of the replayable query
    text). Out-of-vocabulary passage tokens keep the span from
    extending into surrounding text."""
    did = F.col("doc_id")
    blk = (did / SPAN_PLANT_BLOCK).cast("long").cast("string")
    return d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                did % SPAN_PLANT_MOD == SPAN_PLANT_REM,
                F.concat(
                    F.lit(" pb"), blk,
                    F.lit(f" {SPAN_PASSAGE_MID} pe"), blk,
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )


# q156 (pair scores), q167 (keep-one-copy rewrite) and q190 (curated
# export) all run the SAME island kernel over the SAME planted corpus
# (identical gram_len / df-cap / plant), and q167/q190 additionally
# share the whole rewrite. One kernel run per (session, sf_dir) — the
# _nnd_graph / _graph_search convention; oracles replay the full
# inline pipelines, and bench.py registers both as cold builds so the
# per-query rows stay warm-path.
_SPAN_ISLANDS_CACHE: dict[tuple[str, str], DataFrame] = {}
_SPAN_REWRITE_CACHE: dict[tuple[str, str], DataFrame] = {}


def _span_islands_for(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _SPAN_ISLANDS_CACHE:
        d = load_table(spark, sf_dir, "documents")
        _SPAN_ISLANDS_CACHE[key] = DD._span_islands(  # noqa: SLF001
            _span_planted(d), "text", "doc_id", SPAN_GRAM_LEN, None
        ).localCheckpoint(eager=True)
    return _SPAN_ISLANDS_CACHE[key]


def _span_rewrite_for(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _SPAN_REWRITE_CACHE:
        d = load_table(spark, sf_dir, "documents")
        _SPAN_REWRITE_CACHE[key] = DD.span_remove_rewrite(
            _span_planted(d),
            gram_len=SPAN_GRAM_LEN,
            min_span_tokens=SPAN_MIN_TOKENS,
            islands=_span_islands_for(spark, sf_dir),
        ).localCheckpoint(eager=True)
    return _SPAN_REWRITE_CACHE[key]


def q156_exact_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring span dedup (operators/dedup.exact_span_pairs —
    Lee et al. 2022): maximal verbatim token runs >= SPAN_MIN_TOKENS
    across document pairs, found via a positional gram inverted index
    + diagonal island merge. The one dedup tier the set-based family
    (q16/q42/q88/q91/q138) cannot express: a 12-token copied passage
    inside two otherwise-unrelated documents is invisible to
    whole-document MinHash (asserted in tests) but surfaces here as an
    exact span. The corpus's own planted near-dup pairs also emit
    their long shared runs — both signals are deterministic.

    Scale (100 TB): shuffle is O(repeated grams) — unique content
    never collides in the posting join — and the island windows
    partition by (pair, diagonal); see the operator docstring."""
    d = load_table(spark, sf_dir, "documents")
    return (
        DD.exact_span_pairs(
            _span_planted(d),
            gram_len=SPAN_GRAM_LEN,
            min_span_tokens=SPAN_MIN_TOKENS,
            islands=_span_islands_for(spark, sf_dir),
        )
        .select(
            "id_a",
            "id_b",
            F.col("n_spans").cast("long").alias("n_spans"),
            F.col("max_span_tokens").cast("long").alias("max_span_tokens"),
            F.col("matched_tokens").cast("long").alias("matched_tokens"),
        )
        .orderBy("id_a", "id_b")
    )


BPE_MERGE_ROUNDS = 3


def _bpe_pair_census(cur: DataFrame) -> DataFrame:
    """Weighted adjacent-symbol-pair census over the (count, syms)
    vocabulary table — q152's census generalized from characters to
    the current merge round's symbols. The guard matters: Spark's
    sequence(1, 0) counts DOWN (char_pairs_expr's documented trap)."""
    s = F.col("syms")
    pairs = F.when(
        F.size(s) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(s) - 1),
            lambda i: F.struct(
                F.element_at(s, i).alias("l"),
                F.element_at(s, i + 1).alias("r"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
    return (
        cur.select("c", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("c").alias("n"))
    )


_BPE_SEP = "\x00"  # never appears in a symbol (tokens are \\w+ runs)


def _bpe_apply_merges(
    cur: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """Greedy left-to-right non-overlapping application of a
    SYMBOL-DISJOINT merge batch, as ONE array fold: append each symbol
    unless (last accumulator symbol, incoming symbol) is a selected
    pair — looked up in a single O(|batch|) map literal — in which
    case the pair collapses to its concatenation. Exact textbook
    semantics on runs ('aaa' + merge(a,a) -> [aa, a]); because the
    batch is symbol-disjoint (no symbol of one pair appears in, or is
    produced by, another — enforced by ``_select_compatible``), the
    batched fold equals applying the merges sequentially in any
    order. One narrow pass regardless of batch size. try_element_at:
    ANSI mode throws on element_at(empty, -1) / missing map keys."""
    m = F.create_map(
        *[
            x
            for left, right in merges
            for x in (F.lit(left + _BPE_SEP + right), F.lit(left + right))
        ]
    )
    merged = F.aggregate(
        "syms",
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            F.try_element_at(
                m,
                F.concat(
                    F.coalesce(F.try_element_at(acc, F.lit(-1)), F.lit("")),
                    F.lit(_BPE_SEP),
                    x,
                ),
            ).isNotNull(),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.try_element_at(
                        m,
                        F.concat(
                            F.try_element_at(acc, F.lit(-1)),
                            F.lit(_BPE_SEP),
                            x,
                        ),
                    )
                ),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    keep = [c for c in cur.columns if c != "syms"]
    return cur.select(*keep, merged.alias("syms"))


def _bpe_apply_merge(cur: DataFrame, left: str, right: str) -> DataFrame:
    """Single-merge convenience wrapper over the batch kernel."""
    return _bpe_apply_merges(cur, [(left, right)])


def _select_compatible(rows, want: int) -> list[tuple[str, str, int]]:
    """Greedy top-``want`` SYMBOL-DISJOINT pair selection from a census
    ranked (n desc, l, r): a pair is admitted only if its left, right,
    AND concatenated symbol are all unused by earlier admissions — the
    condition under which batched application is order-free AND each
    admitted pair's census count is unaffected by the others (merging
    (a,b) can only change adjacencies that involve a or b)."""
    used: set[str] = set()
    sel: list[tuple[str, str, int]] = []
    for row in rows:
        left, right = row.l, row.r
        if {left, right, left + right} & used:
            continue
        sel.append((left, right, row.n))
        used.update((left, right, left + right))
        if len(sel) == want:
            break
    return sel


def bpe_train_merges(
    cur: DataFrame,
    n_merges: int,
    merges_per_round: int = 1,
    cand_factor: int = 4,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """BPE merge training over a (c, syms) vocabulary table, batched:
    each DRIVER round takes one census, collects the top
    O(merges_per_round·cand_factor) candidate pairs, greedily admits
    up to ``merges_per_round`` symbol-disjoint ones, and applies them
    all in ONE narrow fold — so the driver round count is
    ceil(n_merges / M), not n_merges. At M=1 this is exactly the
    sequential textbook loop (q157/q163's oracle-unrolled semantics);
    at M>1 the admitted pairs are the sequential choices whose counts
    the batch could not have changed (symbol-disjointness), the
    standard batched-BPE trade: a newly CREATED pair cannot be picked
    until the next round, so merge ORDER can differ from strict
    sequential training while each admitted count is exact.

    Returns (merges [(l, r, n-at-selection)...], the post-merge
    vocabulary table). Real tokenizers need 10⁴–10⁵ merges; with
    M=512 that is tens of driver rounds over the O(vocab) table — the
    corpus is never re-read (BENCH_BPE_SCALE.json).
    """
    cur = cur.localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    while len(merges) < n_merges:
        want = min(merges_per_round, n_merges - len(merges))
        top = (
            _bpe_pair_census(cur)
            .orderBy(F.desc("n"), F.asc("l"), F.asc("r"))
            .limit(max(want * cand_factor, want + 8))
            .collect()
        )
        sel = _select_compatible(top, want)
        if not sel:
            break  # vocabulary fully merged / no adjacent pairs left
        merges.extend(sel)
        cur = _bpe_apply_merges(
            cur, [(left, right) for left, right, _ in sel]
        ).localCheckpoint(eager=True)
    return merges, cur


def q157_bpe_merge_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative BPE tokenizer training — BPE_MERGE_ROUNDS greedy merge
    iterations (census -> select best pair -> apply merge -> re-census),
    the loop q152 computes exactly one step of, returning the merge
    table (rank, pair, n-at-selection). The first text workload on the
    engine's driver-loop + per-iteration localCheckpoint discipline
    (the NND build / q59 Lloyd-step convention); the DuckDB oracle
    unrolls the same fixed rounds the way q96 unrolls PageRank.
    Tie-break (n DESC, l, r) is total, so every round is deterministic
    in both engines.

    Scale (100 TB): the corpus is read ONCE into a (word, count)
    vocabulary (one map-side-combined aggregate — BPE's standard
    word-frequency preprocessing); every merge round then folds over
    the O(vocab) table, never the corpus. Per round: one narrow fold,
    one pair census exchange of O(distinct pairs), and a
    TakeOrderedAndProject for the argmax — the selected pair is the
    one O(1) driver scalar (the reference's own convergence-test
    class, NND.scala:118) that parameterizes the next round's fold."""
    d = load_table(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(TX.tokens_expr("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    cur = vocab.select("c", F.split("tok", "").alias("syms"))
    merges, _ = bpe_train_merges(cur, BPE_MERGE_ROUNDS, merges_per_round=1)
    return spark.createDataFrame(
        [
            (rk, f"{left}+{right}", int(n))
            for rk, (left, right, n) in enumerate(merges, 1)
        ],
        "rank int, pair string, n long",
    ).orderBy("rank")


# q158 retrieval-eval fixture: graded relevance derived from doc_id
# (the q151 planting convention — the synthetic corpus ships no qrels,
# so the labels are part of the replayable query text). EVAL_K = 5
# because the shallowest retriever list (q146's LI_K) is 5 deep.
EVAL_K = 5
REL_G2_MOD, REL_G2_REM = 17, 2  # grade-2 (highly relevant) docs
REL_G1_MOD, REL_G1_REM = 7, 3   # grade-1 docs (grade-2 wins overlaps)


def _rel_grade(did) -> Column:
    return (
        F.when(did % REL_G2_MOD == REL_G2_REM, F.lit(2))
        .when(did % REL_G1_MOD == REL_G1_REM, F.lit(1))
        .otherwise(F.lit(0))
    )


def _rel_grade_sql(did: str = "doc_id") -> str:
    return (
        f"CASE WHEN {did} % {REL_G2_MOD} = {REL_G2_REM} THEN 2 "
        f"WHEN {did} % {REL_G1_MOD} = {REL_G1_REM} THEN 1 ELSE 0 END"
    )


def q158_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@k and recall@k for every retriever the engine ships —
    BM25 (q68), hybrid RRF (q80), late interaction (q146) — against
    the deterministic doc_id-derived graded-relevance fixture. The
    metric an operator actually tunes retrievers with; running the
    RETRIEVER QUERIES THEMSELVES as the ranked lists means any change
    to their scoring becomes driver-detectable here, the way q33 made
    ANN recall driver-detectable.

    nDCG uses the standard exponential gain (2^rel - 1)/log2(rank+1)
    with the ideal DCG computed from the corpus's top-k grades;
    recall@k = |top-k ∩ relevant| / |relevant|. Multi-query retrievers
    are macro-averaged (per-query metrics rounded to 6dp first, both
    engines).

    Scale (100 TB): each retriever already ends in a top-N
    (TakeOrderedAndProject); the eval runs on O(retrievers · k) rows
    plus one O(1) corpus aggregate for |relevant| and the ideal DCG —
    the eval itself never touches the corpus again."""
    from pyspark.sql import Window  # noqa: PLC0415

    runs = []
    bm = q68_bm25(spark, sf_dir).select(
        F.lit("bm25").alias("retriever"),
        F.lit(0).alias("query_id"),
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
        .alias("rank"),
    )
    runs.append(bm)
    runs.append(
        q80_hybrid_rrf(spark, sf_dir).select(
            F.lit("hybrid_rrf").alias("retriever"),
            F.lit(0).alias("query_id"),
            "doc_id",
            F.col("rank").cast("int").alias("rank"),
        )
    )
    runs.append(
        q146_late_interaction(spark, sf_dir).select(
            F.lit("late_interaction").alias("retriever"),
            "query_id",
            "doc_id",
            "rank",
        )
    )
    lists = runs[0]
    for r in runs[1:]:
        lists = lists.unionAll(r)
    lists = lists.filter(F.col("rank") <= EVAL_K)

    d = load_table(spark, sf_dir, "documents")
    rel = _rel_grade(F.col("doc_id"))
    # ideal DCG: corpus top-k grades in ideal order (TakeOrdered, then
    # a k-row window) + |relevant| for the recall denominator
    ideal = (
        d.select(rel.alias("rel"), "doc_id")
        .orderBy(F.desc("rel"), F.asc("doc_id"))
        .limit(EVAL_K)
        .withColumn(
            "irank",
            F.row_number().over(Window.orderBy(F.desc("rel"), F.asc("doc_id"))),
        )
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), F.col("rel")) - 1.0)
                / F.log2(F.col("irank") + 1.0)
            ).alias("idcg")
        )
    )
    nrel = d.agg(F.count_if(rel > 0).alias("n_rel"))
    per_q = (
        lists.withColumn("rel", _rel_grade(F.col("doc_id")))
        .groupBy("retriever", "query_id")
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), F.col("rel")) - 1.0)
                / F.log2(F.col("rank") + 1.0)
            ).alias("dcg"),
            F.count_if(F.col("rel") > 0).alias("hits"),
        )
        .crossJoin(F.broadcast(ideal))
        .crossJoin(F.broadcast(nrel))
        .select(
            "retriever",
            "query_id",
            F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg"),
            F.round(F.col("hits") / F.col("n_rel"), 6).alias("recall"),
        )
    )
    return (
        per_q.groupBy("retriever")
        .agg(
            F.count("*").cast("long").alias("n_queries"),
            F.round(F.avg("ndcg"), 6).alias("ndcg_at_k"),
            F.round(F.avg("recall"), 6).alias("recall_at_k"),
        )
        .orderBy("retriever")
    )


def q159_indexed_board(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q155's curation scoreboard with the near-dup drop set served
    from the PERSISTED index (operators/dedup.neardup_pairs_index via
    _indexed_lsh_pairs) instead of re-running the MinHash-LSH pair
    pipeline inline — the VERDICT r9 nit: at 100 TB the board reads
    the drop set off the index artifact the ingest loop maintains,
    never re-shingling the corpus. Index pairs == inline pairs
    (asserted in tests), so the board is row-identical to q155 and
    shares its oracle SQL — the q103/q105 indexed-twin convention.

    Scale: one corpus scan for the text gates (all codegen), a
    broadcast O(dup docs) drop set read from parquet, one sort."""
    d = load_table(spark, sf_dir, "documents")
    drops = (
        _indexed_lsh_pairs(spark, sf_dir)
        .filter(F.round("jaccard", 6) >= BOARD_NEARDUP_TAU)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    return board_compose(board_gates(d), drops).orderBy("doc_id")


# q160 logistic-regression training step: literal init weights and
# learning rate (the q59 Lloyd-step convention — one exactly-replayable
# iteration of an iterative trainer); features are the card's portable
# text ratios; the label is the q147 rule gate, so the step closes the
# train->score loop curation pipelines run (learn a scorer that mimics
# the hand rule, then score with it). Sigmoid outputs and gradient
# means are rounded to 6dp before reuse — the engines' libm exp()
# differ in the last ulp and double-sum order is nondeterministic, so
# rounding at each handoff is what makes the epoch bit-replayable
# (the q146 round-before-cut discipline).
LR_W0 = {"bias": 0.0, "ntok": 0.1, "stop": -0.2, "ttr": 0.3}
LR_RATE = 0.5
LR_SCORE_SAMPLE = 20


def q160_lr_train_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One closed-form logistic-regression gradient epoch over doc
    features + scoring with the UPDATED weights in the same query:
    w_new_j = w0_j + rate * round(avg((y - p) * x_j), 6) with
    p = round(sigmoid(w0 . x), 6). Output: 4 'weight' rows (the merge
    table of the trainer) and LR_SCORE_SAMPLE 'score' rows (the first
    docs by id scored with w_new) — both tiers hash-checkable.

    Scale (100 TB): the epoch is ONE map-side-combined aggregate over
    the corpus (4 feature-gradient means, O(1) output) — the classic
    distributed-GD shape; the updated weights broadcast back as a
    one-row cross join, and only the k-doc score sample pays a
    TakeOrderedAndProject. Feature expressions are codegen arithmetic
    in the same scan that computes the label."""
    d = load_table(spark, sf_dir, "documents")
    ntok = TX.token_count_expr("text")
    feats = d.select(
        "doc_id",
        (ntok.cast("double") / F.lit(100.0)).alias("x_ntok"),
        TX.stopword_ratio_expr("text").alias("x_stop"),
        TX.type_token_ratio_expr("text").alias("x_ttr"),
        (
            (ntok >= 5)
            & (TX.stopword_ratio_expr("text") <= 0.6)
            & (TX.type_token_ratio_expr("text") >= 0.3)
        )
        .cast("double")
        .alias("y"),
    )
    z0 = (
        (F.lit(LR_W0["bias"]) + F.lit(LR_W0["ntok"]) * F.col("x_ntok"))
        + F.lit(LR_W0["stop"]) * F.col("x_stop")
    ) + F.lit(LR_W0["ttr"]) * F.col("x_ttr")
    p0 = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z0)), 6)
    resid = feats.select(
        "doc_id", "x_ntok", "x_stop", "x_ttr", (F.col("y") - p0).alias("e")
    )
    grads = resid.agg(
        F.round(F.avg("e"), 6).alias("g_bias"),
        F.round(F.avg(F.col("e") * F.col("x_ntok")), 6).alias("g_ntok"),
        F.round(F.avg(F.col("e") * F.col("x_stop")), 6).alias("g_stop"),
        F.round(F.avg(F.col("e") * F.col("x_ttr")), 6).alias("g_ttr"),
    )
    upd = grads.select(
        *[
            (F.lit(LR_W0[n]) + F.lit(LR_RATE) * F.col(f"g_{n}")).alias(f"w_{n}")
            for n in ("bias", "ntok", "stop", "ttr")
        ],
        "g_bias",
        "g_ntok",
        "g_stop",
        "g_ttr",
    )
    weights = upd.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("k"),
                        F.lit(n).alias("name"),
                        F.round(F.col(f"g_{n}"), 6).alias("grad"),
                        F.round(F.col(f"w_{n}"), 6).alias("value"),
                    )
                    for i, n in enumerate(("bias", "ntok", "stop", "ttr"))
                ]
            )
        ).alias("w")
    ).select(
        F.lit("weight").alias("kind"),
        F.col("w.k").cast("long").alias("k"),
        "w.name",
        "w.grad",
        "w.value",
    )
    z1 = (
        (F.col("w_bias") + F.col("w_ntok") * F.col("x_ntok"))
        + F.col("w_stop") * F.col("x_stop")
    ) + F.col("w_ttr") * F.col("x_ttr")
    scores = (
        feats.orderBy("doc_id")
        .limit(LR_SCORE_SAMPLE)
        .crossJoin(F.broadcast(upd))
        .select(
            F.lit("score").alias("kind"),
            F.col("doc_id").alias("k"),
            F.lit("p").alias("name"),
            F.lit(0.0).alias("grad"),
            F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z1)), 6).alias("value"),
        )
    )
    return weights.unionAll(scores).orderBy("kind", "k")


def q163_bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLY — the encode half that closes q157's train loop:
    run the same BPE_MERGE_ROUNDS greedy merges, then encode the WHOLE
    corpus with the learned merge table and report per-source
    compression: token count, symbol count before merges (= characters,
    the byte-level start), symbols after, and the compression ratio.
    The table an operator reads to decide whether M merge rounds paid
    for themselves, per source.

    Scale (100 TB): training folds over the O(vocab) word-frequency
    table (q157); ENCODING joins the corpus token stream to the
    post-merge vocab by word — a broadcast join (the vocab is tiny by
    Zipf), so the corpus pays one tokenize scan + one map-side-combined
    source aggregate and the quadratic-ish fold work never touches
    corpus rows."""
    d = load_table(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(TX.tokens_expr("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    _, cur = bpe_train_merges(
        vocab.select("tok", "c", F.split("tok", "").alias("syms")),
        BPE_MERGE_ROUNDS,
        merges_per_round=1,
    )
    enc = cur.select(
        "tok",
        F.length("tok").cast("long").alias("n_sym_before"),
        F.size("syms").cast("long").alias("n_sym_after"),
    )
    toks = d.select("source", F.explode(TX.tokens_expr("text")).alias("tok"))
    return (
        toks.join(F.broadcast(enc), "tok")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("n_sym_before").alias("syms_before"),
            F.sum("n_sym_after").alias("syms_after"),
        )
        .select(
            "source",
            "n_tokens",
            "syms_before",
            "syms_after",
            F.round(
                F.col("syms_before") / F.col("syms_after").cast("double"), 6
            ).alias("compression"),
        )
        .orderBy("source")
    )


def q164_dup_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication flow matrix — the provenance table a
    corpus audit reads to see WHICH sources duplicate WHICH: verified
    near-dup pairs (the q16 pipeline at the q155 tau) aggregated by
    (source of the kept smaller-id doc, source of the dropped doc),
    with pair counts and the distinct dropped-doc count. Diagonal rows
    are intra-source duplication; off-diagonal rows are cross-source
    contamination flow (mirrors/scrapes).

    Scale (100 TB): the pair pipeline is the banded LSH plan with its
    measured O(N) shuffle; the source attach BROADCASTS the verified
    O(dup-pairs) stream — the small side by construction — so the
    O(docs)-keyed (doc_id, source) projection streams map-side and
    never shuffles or broadcasts (an explicit corpus-side broadcast
    hint would bypass autoBroadcastJoinThreshold and OOM the driver at
    scale); the matrix aggregate is O(sources²)."""
    d = load_table(spark, sf_dir, "documents")
    # same (16, 4, 3, 0.2, cap) verified-pairs table as the other
    # corpus-health consumers — served from the session materialization
    # (_indexed_lsh_pairs; index == inline asserted in tests, oracle
    # still replays the inline pipeline) instead of re-running the
    # banded self-join + Jaccard verify a fourth time per session
    pairs = _indexed_lsh_pairs(spark, sf_dir).filter(
        F.round("jaccard", 6) >= BOARD_NEARDUP_TAU
    )
    src = d.select("doc_id", "source")
    sa = src.select(
        F.col("doc_id").alias("id_a"), F.col("source").alias("source_kept")
    )
    sb = src.select(
        F.col("doc_id").alias("id_b"), F.col("source").alias("source_dropped")
    )
    kept = F.broadcast(pairs).join(sa, "id_a")
    return (
        F.broadcast(kept).join(sb, "id_b")
        .groupBy("source_kept", "source_dropped")
        .agg(
            F.count("*").alias("n_pairs"),
            F.countDistinct("id_b").alias("n_docs_dropped"),
        )
        .orderBy("source_kept", "source_dropped")
    )


# q165 bigram LM: add-one smoothing over the corpus's own bigram
# counts (train == score corpus, the CCNet quality-filter convention,
# Wenzek et al. 2020); natural-log perplexity, rounded at the handoff
# points so the doubles replay across engines.
LM_PPL_SAMPLE = 0  # 0 = score every doc


def q165_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model perplexity per document — the classic
    LM-based quality signal (CCNet): train add-one-smoothed bigram
    probabilities on the corpus, score each doc with
    ppl = exp(-mean log P(w2|w1)). Low-ppl docs are fluent/common
    phrasing, high-ppl docs are noise — the knob production filters
    threshold on.

    Scale (100 TB): training is one map-side-combined bigram count
    aggregate (O(distinct bigrams) output) + one unigram aggregate;
    scoring joins the doc bigram stream to the count tables — both
    sides keyed on the bigram/unigram, an equi-join Catalyst can
    broadcast while the tables fit (vocab-saturated corpora) and
    shuffle-hash otherwise; the per-doc aggregate combines map-side.
    No Python, no quadratic stage."""
    from spark_nnd_spark.operators import text_stats as TS  # noqa: PLC0415

    # q165's declared identity IS the inline pipeline: its own
    # tokenize+explode bigram stream (checkpointed per call — it feeds
    # both the counts aggregate and the scoring join), its own trained
    # counts. The r15 session-shared stream (_doc_bigrams_for) broke
    # that identity (VERDICT r15 #5) and was removed in r16; q195 is
    # the stats-SERVED twin and pays its own stream there.
    doc_bg = TS.doc_bigrams(load_table(spark, sf_dir, "documents"))
    bg_counts = TS.bigram_counts(doc_bg)
    return _ppl_score(doc_bg, bg_counts).orderBy("doc_id")


def _ppl_score(doc_bg: DataFrame, bg_counts: DataFrame) -> DataFrame:
    """q165's add-one-smoothed bigram scorer over a (w1, w2, n) counts
    table — unigram totals and the vocab size DERIVE from the counts
    (Σn per w1 == the bigram-stream w1 count; distinct w2 == the
    stream's distinct w2), so the inline and index-served paths share
    one scorer and cannot drift."""
    from spark_nnd_spark.functions.numeric import round_half_up_expr  # noqa: PLC0415

    uni = bg_counts.groupBy("w1").agg(F.sum("n").alias("c1"))
    vocab_n = bg_counts.select(F.countDistinct("w2").alias("v"))
    # per-bigram log-prob quantized to INTEGER micro-nats (floor(ln*1e6
    # + 0.5) as BIGINT): the per-doc sum is then exact integer
    # arithmetic — order-free — where a sum of rounded DOUBLES differs
    # in the last ulp by partial-sum order, and a doc mean landing
    # EXACTLY on a .5e-6 boundary then flips the final rounding
    # (measured: doc 148 at sf0.01). ln() itself agrees across engines
    # far past 6dp (verified per-bigram).
    logp_int = F.floor(
        F.log(
            (F.col("n") + 1.0)
            / (F.col("c1").cast("double") + F.col("v").cast("double"))
        )
        * F.lit(1e6)
        + F.lit(0.5)
    ).cast("long")
    scored = (
        doc_bg.join(bg_counts, ["w1", "w2"])
        .join(uni, "w1")
        .crossJoin(F.broadcast(vocab_n))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum(logp_int).alias("slp_int"),
        )
    )
    return scored.select(
        "doc_id",
        "n_bigrams",
        round_half_up_expr(
            F.exp(
                -(
                    F.col("slp_int").cast("double")
                    / (F.col("n_bigrams").cast("double") * F.lit(1e6))
                )
            )
        ).alias("ppl"),
    )


def q166_decontam_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decontamination LEADERBOARD REPORT — every leakage tier the
    engine runs, composed into one summary an eval owner reads before
    trusting a benchmark number: embedding-space paraphrase leakage
    (q148), verbatim span leakage (q162) and shingle-overlap span
    contamination (q78), one row per tier with the flagged train-doc
    count, the distinct eval/corpus items implicated, and the tier's
    total evidence volume. The composition mirrors q158: each tier's
    own query RUNS as the evidence source, so any tier change is
    driver-detectable here too.

    Scale: each tier already ends in a small verdict/pair set; the
    report aggregates O(flagged) rows per tier — it adds no corpus
    work of its own."""
    from spark_nnd_spark.queries.knn import (  # noqa: PLC0415
        q148_embedding_decontam,
    )

    emb = q148_embedding_decontam(spark, sf_dir)
    span = q162_indexed_spans(spark, sf_dir)
    sh = q78_contamination_pairs(spark, sf_dir)
    rows = [
        emb.filter(F.col("contaminated"))
        .agg(
            F.count("*").cast("long").alias("n_flagged"),
            F.countDistinct("first_eval_id").cast("long").alias("n_refs"),
            F.sum("n_eval_hits").cast("long").alias("evidence"),
        )
        .select(F.lit("embedding").alias("tier"), "*"),
        span.agg(
            F.countDistinct("batch_id").cast("long").alias("n_flagged"),
            F.countDistinct("index_id").cast("long").alias("n_refs"),
            F.sum("matched_tokens").cast("long").alias("evidence"),
        ).select(F.lit("span").alias("tier"), "*"),
        sh.agg(
            F.countDistinct("doc_id").cast("long").alias("n_flagged"),
            F.countDistinct("bench_id").cast("long").alias("n_refs"),
            F.sum("n_shared").cast("long").alias("evidence"),
        ).select(F.lit("shingle").alias("tier"), "*"),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out.select(
        "tier",
        F.coalesce("n_flagged", F.lit(0)).alias("n_flagged"),
        F.coalesce("n_refs", F.lit(0)).alias("n_refs"),
        F.coalesce("evidence", F.lit(0)).alias("evidence"),
    ).orderBy("tier")


def q167_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DEDUPLICATED CORPUS — q156 detects verbatim duplicated
    spans; this emits what Lee et al. 2022 actually train on: every
    duplicated run of >= SPAN_MIN_TOKENS tokens survives in exactly
    one document (the smallest doc_id holding it) and is cut from all
    others (operators/dedup.span_remove_rewrite). One row per corpus
    doc: (doc_id, cleaned_text, n_spans_cut, tokens_cut) — untouched
    docs pass through with 0/0, so the result IS the training corpus,
    not a diff. Runs over the same planted corpus as q156 (the plant
    is part of the replayable query text), so the planted passage is
    kept once per plant block and cut everywhere else — asserted
    one-survivor in tests.

    Scale (100 TB): the island kernel is q156's (O(repeated grams)
    shuffle); the rewrite adds only O(cut intervals) wide work (one
    distinct + per-doc interval-union window + collect_list) and a
    LEFT join whose small side is the cut set; the token slice is a
    narrow codegen array filter — the corpus text shuffles ZERO times
    beyond the posting join."""
    return _span_rewrite_for(spark, sf_dir).orderBy("doc_id")


# Persisted image-hash index over the non-src0 corpus (the q103/q162
# split), built once per (session, sf_dir).
_IMAGE_IDX_CACHE: dict[tuple[str, str], str] = {}


def _image_index_for(spark: SparkSession, sf_dir: str) -> str:
    from spark_nnd_spark.session import session_scratch_dir  # noqa: PLC0415

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _IMAGE_IDX_CACHE:
        path = session_scratch_dir("image_idx_")
        d = load_table(spark, sf_dir, "documents")
        MM.build_image_index(
            d.filter(F.col("source") != "src0").select(
                "doc_id", F.encode("text", "UTF-8").alias("payload")
            ),
            path,
            id_col="doc_id",
        )
        _IMAGE_IDX_CACHE[key] = path
    return _IMAGE_IDX_CACHE[key]


def q168_indexed_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time perceptual image dedup served from the PERSISTED
    image-hash index (operators/multimodal.build_image_index /
    image_query_index — the 7th index family): the src0 slice probes
    as the incoming batch, the rest of the corpus is indexed once, and
    every (batch image, stored image) pair within hamming <= 3 of the
    64-bit aHash is reported — q104's banded pigeonhole kernel with
    the corpus side read from storage, closing the modality gap: image
    columns now have the same index-served dedup path as text (q103)
    and vectors (q127/q134).

    Pigeonhole-exact at hamming <= 3 with 4 bands, so the all-pairs
    one-sided DuckDB oracle must agree row-for-row (and probe==inline
    is asserted in tests). Scale: the batch side broadcasts; the
    stored bands stream through the join with zero shuffle — probe
    cost is O(batch + matches), independent of corpus size."""
    d = load_table(spark, sf_dir, "documents")
    idx = _image_index_for(spark, sf_dir)
    batch = d.filter(F.col("source") == "src0").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return (
        MM.image_query_index(spark, idx, batch, max_hamming=3, id_col="doc_id")
        .select("batch_id", "index_id", F.col("hamming").cast("int").alias("hamming"))
        .orderBy("batch_id", "index_id")
    )


LR_EPOCHS = 3


# Session-cached trained-classifier artifact (the _NND_CACHE pattern:
# a pipeline trains the model ONCE and every consumer — the q169
# curve, the q170 board gate, the q192 calibration audit — serves the
# same weights; before r15 each of the three recomputed the CC split,
# the feature table and the 3 GD epochs from scratch). The bench
# pre-builds it as build_lr_model so the per-query rows stay
# warm-path.
_LR_MODEL_CACHE: dict[tuple[str, str], tuple[DataFrame, dict, list]] = {}


def _lr_model_for(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, dict, list]:
    """(feats, final weights, per-epoch raw rows) — trained once per
    (session, sf_dir) over the q141 leakage-safe train slice."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _LR_MODEL_CACHE:
        feats = _lr_feats(spark, sf_dir)
        w, raw_rows = _lr_epochs(feats.filter(F.col("split") == "train"))
        _LR_MODEL_CACHE[key] = (feats, w, raw_rows)
    return _LR_MODEL_CACHE[key]


def _lr_feats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, split, x_ntok, x_stop, x_ttr, y) for every doc,
    with the q141 leakage-safe split attached — the training table
    behind q169/q170, computed once and checkpointed (the split pays
    the CC propagation; the features are codegen text expressions)."""
    from spark_nnd_spark.operators.sampling import leakage_safe_split  # noqa: PLC0415

    d = load_table(spark, sf_dir, "documents")
    sp = leakage_safe_split(
        d, _indexed_lsh_pairs(spark, sf_dir), id_col="doc_id"
    ).select("doc_id", "split")
    ntok = TX.token_count_expr("text")
    stop = TX.stopword_ratio_expr("text")
    ttr = TX.type_token_ratio_expr("text")
    return (
        d.join(sp, "doc_id")
        .select(
            "doc_id",
            "source",
            "split",
            (ntok.cast("double") / F.lit(100.0)).alias("x_ntok"),
            stop.alias("x_stop"),
            ttr.alias("x_ttr"),
            ((ntok >= 5) & (stop <= 0.6) & (ttr >= 0.3))
            .cast("double")
            .alias("y"),
        )
        .localCheckpoint(eager=True)  # split + features computed ONCE
    )


def _lr_z(w: dict) -> F.Column:
    """The linear logit over the _lr_feats feature columns — paren
    shape pinned so the oracle's double arithmetic replays exactly."""
    return (
        (F.lit(w["bias"]) + F.lit(w["ntok"]) * F.col("x_ntok"))
        + F.lit(w["stop"]) * F.col("x_stop")
    ) + F.lit(w["ttr"]) * F.col("x_ttr")


def _lr_epochs(train: DataFrame) -> tuple[dict, list]:
    """LR_EPOCHS full-batch GD epochs over the train slice; returns the
    final weights and the per-epoch (kind, epoch, name, raw) rows.
    Each epoch is ONE map-side-combined aggregate returning a single
    row (the convergence-scalar class); losses and gradient means
    accumulate as INTEGER micro-units so they replay order-free across
    engines (the q165 trick — round(AVG(doubles), 6) hit a .5e-6
    boundary at sf0.01)."""
    w = dict(LR_W0)
    raw_rows: list[tuple] = []
    for e in range(1, LR_EPOCHS + 1):
        p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-_lr_z(w))), 6)
        pc = F.least(F.greatest(p, F.lit(0.000001)), F.lit(0.999999))
        nats = F.floor(
            -(
                F.col("y") * F.log(pc)
                + (F.lit(1.0) - F.col("y")) * F.log(F.lit(1.0) - pc)
            )
            * F.lit(1000000.0)
            + F.lit(0.5)
        ).cast("long")
        err = F.col("y") - p

        def _gmean(contrib: F.Column) -> F.Column:
            s = F.sum(
                F.floor(contrib * F.lit(1000000.0) + F.lit(0.5)).cast("long")
            )
            return F.round(
                (s.cast("double") / F.count(F.lit(1)).cast("double"))
                / F.lit(1000000.0),
                6,
            )

        r = train.agg(
            F.sum(nats).alias("nats"),
            F.count(F.lit(1)).alias("n"),
            _gmean(err).alias("g_bias"),
            _gmean(err * F.col("x_ntok")).alias("g_ntok"),
            _gmean(err * F.col("x_stop")).alias("g_stop"),
            _gmean(err * F.col("x_ttr")).alias("g_ttr"),
        ).first()
        # pure IEEE double ops on collected scalars — identical in the
        # oracle's SQL double arithmetic; the final rounding happens
        # Spark-side (F.round) so both engines round identically
        raw_rows.append(("loss", e, "train", r["nats"] / r["n"] / 1e6))
        for name in ("bias", "ntok", "stop", "ttr"):
            w[name] = w[name] + LR_RATE * r[f"g_{name}"]
            raw_rows.append(("weight", e, name, w[name]))
    return w, raw_rows


def q169_lr_train_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic-regression training to convergence with a held-out
    evaluation — the train→eval loop a curation pipeline actually runs,
    closing q160's single step: LR_EPOCHS full-batch GD epochs over
    the TRAIN slice of the q141 leakage-safe split (duplicate clusters
    never straddle train/test, so the eval is leakage-clean), then the
    q137 rank-sum AUC of the final model on the held-out TEST slice.

    Output, one uniform (kind, epoch, name, value) table:
    - ('loss', e, 'train', L_e): mean log-loss at the START of epoch e
      (pre-update weights) — monotone decreasing rows are the
      convergence evidence (asserted in tests). Per-doc losses are
      summed as INTEGER micro-nats (floor(nats*1e6 + .5), the q165
      order-free exactness trick) with the 6dp-rounded sigmoid clamped
      to [1e-6, 1-1e-6] so a saturated doc cannot emit ±inf.
    - ('weight', e, feature, w): the 4 weights after each epoch —
      rounded at 7 decimals because LR_RATE=0.5 × 6-decimal gradients
      makes every weight an EXACT 7-decimal value, so a 6dp round
      hits the .5 half-boundary systematically (sf0.01 found
      w = 0.5009925 rounding 0.500993 vs 0.500992 across engines).
    - ('auc', LR_EPOCHS, source, auc): per-source held-out AUC of the
      final model (q137's integer rank-sum kernel; -1.0 sentinel for
      single-class groups).

    Scale (100 TB): each epoch is ONE map-side-combined aggregate over
    the train slice returning a single row (grads + loss — the
    reference's convergence-scalar class, NND.scala's per-iteration
    sum counter); the split is computed once and checkpointed; the
    eval is one source-keyed window pass. The driver loop holds
    O(features) state."""
    from spark_nnd_spark.operators.evaluation import grouped_auc  # noqa: PLC0415

    feats, w, raw_rows = _lr_model_for(spark, sf_dir)
    base = spark.createDataFrame(
        raw_rows, "kind string, epoch long, name string, raw double"
    ).select(
        "kind",
        "epoch",
        "name",
        F.when(F.col("kind") == "weight", F.round("raw", 7))
        .otherwise(F.round("raw", 6))
        .alias("value"),
    )
    scored = feats.filter(F.col("split") == "test").select(
        "doc_id",
        "source",
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-_lr_z(w))), 6).alias("score"),
        (F.col("y") == F.lit(1.0)).alias("label"),
    )
    aucs = grouped_auc(scored, "source", "score", "label", "doc_id").select(
        F.lit("auc").alias("kind"),
        F.lit(LR_EPOCHS).cast("long").alias("epoch"),
        F.col("source").alias("name"),
        F.coalesce(F.round("auc", 6), F.lit(-1.0)).alias("value"),
    )
    return base.unionAll(aucs).orderBy("kind", "epoch", "name")


MODEL_KEEP_TAU = 0.5


def q170_model_board(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MODEL-SCORED curation board — q155's scoreboard with the
    q169-trained logistic classifier wired in as a first-class gate
    (model_score / model_keep columns, 'model' reason, verdict folds
    it in): the "model-in-the-loop filtering" shape every modern
    corpus build runs (fastText-style quality classifiers), closing
    the loop train (q169) → serve (this board + the streaming gate,
    which inherit the gate through the shared board_gates /
    board_compose helpers).

    The served score replays the training-time arithmetic exactly
    (same feature expressions, same 6dp sigmoid), so the whole
    pipeline — split, 3 GD epochs, scoring, verdicts — hash-checks
    against a single DuckDB replay.

    Scale (100 TB): training is q169's three single-row aggregates;
    serving adds ZERO passes — the model score is one more codegen
    expression in the same corpus scan the other text gates share;
    the near-dup drop set comes from the persisted index (q159's
    path)."""
    d = load_table(spark, sf_dir, "documents")
    feats, w, _ = _lr_model_for(spark, sf_dir)
    drops = (
        _indexed_lsh_pairs(spark, sf_dir)
        .filter(F.round("jaccard", 6) >= BOARD_NEARDUP_TAU)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    return board_compose(board_gates(d, model_w=w), drops).orderBy("doc_id")


# CCNet reference slice: src1 plays Wikipedia (deterministic,
# non-probing — src0 is the ingest-batch side everywhere else).
REF_LM_SOURCE = "src1"


def q171_ref_lm_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style reference-LM perplexity bucketing (operators/
    sampling.ref_lm_buckets, Wenzek et al. 2020): every document
    scored by mean token log-probability under an add-one-smoothed
    unigram LM trained ONLY on the trusted reference slice
    (source = src1 stands in for Wikipedia), then per-language ntile
    thirds — tile 1 is the slice CCNet keeps outright, tile 3 is the
    quarantine tail. The language-conditioned complement of q165's
    self-trained bigram perplexity and q140's global DSIR top-k.

    Scale (100 TB): one exploded-token aggregate builds the reference
    counts + vocab size at O(vocab); scoring is a token-keyed join +
    one per-doc fold; the tiles cost one lang-partitioned sort (at
    true scale the same tiles come from two broadcast cutoffs off the
    q126 histogram sketch — boundary rows only)."""
    from spark_nnd_spark.operators.sampling import ref_lm_buckets  # noqa: PLC0415

    d = load_table(spark, sf_dir, "documents").withColumn(
        "is_ref", F.col("source") == REF_LM_SOURCE
    )
    return (
        ref_lm_buckets(
            d, tokens_col=TX.tokens_expr("text"), ref_col="is_ref"
        )
        .select(
            "doc_id",
            "lang",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            "logprob",
            F.col("bucket").cast("int").alias("bucket"),
        )
        .orderBy("doc_id")
    )


def q161_indexed_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q153's threshold calibration curve with the verified pairs
    served from the PERSISTED near-dup index (the r9 VERDICT nit,
    closed for the sweep the way q159 closed it for the board): the
    LSH+verify pipeline is not re-run — the curve reads
    neardup_pairs_index. Index pairs == inline pairs (asserted in
    tests), so the curve is row-identical to q153 and shares its
    oracle SQL."""
    d = load_table(spark, sf_dir, "documents")
    return _sweep_from_pairs(spark, d, _indexed_lsh_pairs(spark, sf_dir))


# q162 span-contamination plant: doc_id % 50 == 0 lands in BOTH the
# src0 batch (doc_id % 20 == 0) and the src10 corpus side, block-keyed
# by doc_id div 400 like q156 — so planted (batch doc, corpus doc)
# span hits exist at every SF and grow linearly.
SPAN_PROBE_MOD = 50
_SPAN_IDX_CACHE: dict[tuple[str, str], str] = {}


def _span_planted_probe(d: DataFrame) -> DataFrame:
    did = F.col("doc_id")
    blk = (did / SPAN_PLANT_BLOCK).cast("long").cast("string")
    return d.select(
        "doc_id",
        "source",
        F.concat(
            F.col("text"),
            F.when(
                did % SPAN_PROBE_MOD == 0,
                F.concat(
                    F.lit(" pb"), blk,
                    F.lit(f" {SPAN_PASSAGE_MID} pe"), blk,
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )


def _span_index_for(spark: SparkSession, sf_dir: str) -> str:
    """Session-cached span index over the planted non-src0 corpus."""
    from spark_nnd_spark.session import session_scratch_dir  # noqa: PLC0415

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _SPAN_IDX_CACHE:
        path = session_scratch_dir("span_idx_")
        d = _span_planted_probe(load_table(spark, sf_dir, "documents"))
        DD.build_span_index(
            d.filter(F.col("source") != "src0"), path, gram_len=SPAN_GRAM_LEN
        )
        _SPAN_IDX_CACHE[key] = path
    return _SPAN_IDX_CACHE[key]


def q162_indexed_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time verbatim-span contamination served from the
    PERSISTED span index (operators/dedup.build_span_index /
    span_query_index): the src0 slice probes, the rest of the corpus
    is indexed once — q156's island-merge kernel with the corpus side
    read from storage, the Lee et al. 2022 decontamination shape at
    the moment it actually runs (per ingest batch, not corpus x
    corpus). The planted cross-source passage guarantees deterministic
    hits; natural near-dup spans that cross the src0 boundary surface
    too.

    Scale: the corpus is tokenized ONCE at index build; each probe
    shuffles O(batch grams + matching corpus grams) and the island
    windows are (pair, diagonal)-keyed — same contract as q156, minus
    the per-query corpus scan.

    The probe result is materialized once per (session, sf_dir)
    (_indexed_spans_for): q166's decontamination report runs THIS
    query as its span-tier evidence, and the probe is the expensive
    part of both rows."""
    return _indexed_spans_for(spark, sf_dir).orderBy("batch_id", "index_id")


_INDEXED_SPANS_CACHE: dict[tuple[str, str], DataFrame] = {}


def _indexed_spans_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _span_planted_probe(load_table(spark, sf_dir, "documents"))
    idx = _span_index_for(spark, sf_dir)
    return DD.span_query_index(
        spark,
        idx,
        d.filter(F.col("source") == "src0"),
        min_span_tokens=SPAN_MIN_TOKENS,
    ).select(
        "batch_id",
        "index_id",
        F.col("n_spans").cast("long").alias("n_spans"),
        F.col("max_span_tokens").cast("long").alias("max_span_tokens"),
        F.col("matched_tokens").cast("long").alias("matched_tokens"),
    )


def _indexed_spans_for(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _INDEXED_SPANS_CACHE:
        _INDEXED_SPANS_CACHE[key] = _indexed_spans_plan(
            spark, sf_dir
        ).localCheckpoint(eager=True)
    return _INDEXED_SPANS_CACHE[key]


def q172_indexed_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time span-decontamination REWRITE served from the
    PERSISTED span index (operators/dedup.span_scrub_index): q162
    flags the src0 batch docs that verbatim-share >= SPAN_MIN_TOKENS
    tokens with indexed content; this emits what the pipeline actually
    admits — the batch with every such run CUT from the text (one row
    per batch doc: cleaned_text, n_spans_cut, tokens_cut; clean docs
    pass through 0/0). The index side is the canonical/protected copy
    (eval benchmarks, opted-out docs), so every batch-side occurrence
    is removed — the ingest complement of q167's corpus-internal
    keep-one-copy rewrite.

    Scale: q162's probe kernel verbatim (batch broadcasts, stored
    postings never shuffle — BENCH_SPAN_SCALE's flat contract) plus
    O(cut intervals) rewrite work and a narrow token slice."""
    d = _span_planted_probe(load_table(spark, sf_dir, "documents"))
    idx = _span_index_for(spark, sf_dir)
    return (
        DD.span_scrub_index(
            spark,
            idx,
            d.filter(F.col("source") == "src0"),
            min_span_tokens=SPAN_MIN_TOKENS,
        )
        .orderBy("doc_id")
    )


PACKW_BLOCK_DOCS = 32  # docs per independent packing shard


def q173_pack_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHOLE-document packing manifest (operators/sampling.
    pack_whole_docs) — the export q66 cannot produce: next-fit greedy
    packing that never splits a document across context windows (the
    SFT / cross-doc-attention-masking convention). Each source's docs,
    in stable id order, are cut into PACKW_BLOCK_DOCS-doc shards that
    pack independently; (source, block, bin) is the global pack key,
    ``fill_after`` the running pack occupancy, ``oversize`` flags docs
    longer than the window (a pack of their own — the exporter's
    truncation list). Pairs with q154: that curve prices the straddle
    convention, this manifest is the alternative when coherence wins.

    Scale (100 TB): one corpus text scan (token counts), then only
    (id, count) manifest rows move — a source window exchange and a
    (source, block) hash exchange into bounded 32-row groups; the
    next-fit fold is a narrow in-array aggregate (packing is a left
    fold over (fill, bin) state, sharded to parallelize a sequential
    algorithm). No Python, no collect, no global sort."""
    from spark_nnd_spark.operators import sampling as SA  # noqa: PLC0415

    d = load_table(spark, sf_dir, "documents")
    return SA.pack_whole_docs(
        d,
        TX.token_count_expr("text"),
        context_len=PACK_CONTEXT,
        block_docs=PACKW_BLOCK_DOCS,
    ).orderBy("doc_id")


def q174_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SOFT dedup — instead of dropping near-duplicates (q61's binary
    keep), downweight them: every doc in a near-dup cluster gets loss
    weight 1/cluster_size, so each distinct content unit contributes
    one document's worth of gradient regardless of how many copies the
    crawl found (the SlimPajama/Galactica-style alternative when
    dropping is too aggressive). Clusters are the q31/q82 kernel
    (indexed LSH pairs → connected components); singletons weight 1.
    Emits the per-doc training manifest: (doc_id, component,
    cluster_size, n_tokens, weight, effective_tokens) — summing
    effective_tokens gives the deduplicated token budget q149 should
    actually solve against.

    Scale (100 TB): pairs come from the persisted near-dup index
    (never re-shingling the corpus); connected components is the
    large/small-star iteration over O(pairs) edges; the final join
    attaches O(clustered docs) labels to the corpus — the corpus text
    itself is scanned once for token counts and never shuffled (the
    weight join is id-keyed). Weight arithmetic is one double division
    of exact integers, deterministic in any engine."""
    d = load_table(spark, sf_dir, "documents")
    comp = _components_for(spark, sf_dir).select(
        F.col("id").alias("doc_id"), "component"
    )
    sizes = comp.groupBy("component").agg(
        F.count("*").cast("long").alias("cluster_size")
    )
    cs = comp.join(sizes, "component")
    return (
        d.select(
            "doc_id", TX.token_count_expr("text").cast("long").alias("n_tokens")
        )
        .join(cs, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).cast("long").alias("component"),
            F.coalesce("cluster_size", F.lit(1)).cast("long").alias("cluster_size"),
            "n_tokens",
            F.round(
                F.lit(1.0) / F.coalesce("cluster_size", F.lit(1)), 6
            ).alias("weight"),
            F.round(
                F.col("n_tokens") / F.coalesce("cluster_size", F.lit(1)), 6
            ).alias("effective_tokens"),
        )
        .orderBy("doc_id")
    )


BOILER_N = 3       # shingle width for boilerplate detection
BOILER_TOPK = 10   # boilerplate candidates reported per source


def q175_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source BOILERPLATE extraction — the template/navigation text
    a crawl repeats across a site's pages (cookie banners, headers,
    license blurbs). For each source, the BOILER_TOPK distinct
    3-token shingles with the highest document frequency, with their
    in-source coverage fraction: the table an operator reads before
    writing source-specific scrub rules (q73's blocklist) or setting
    the span-dedup df-cut (dedup.derived_df_cap's budget rule prices
    these same high-df grams). Deterministic tiebreak (df DESC,
    shingle ASC) keeps the cut stable cross-engine.

    Scale (100 TB): one corpus scan explodes per-doc DISTINCT shingles
    (O(tokens) narrow work), map-side combined into (source, shingle)
    counts — the only corpus-sized exchange; the per-source top-k is a
    WindowGroupLimit (map-side partial top-k, never a global sort) and
    the doc totals ride a tiny O(sources) broadcast join."""
    from pyspark.sql import Window  # noqa: PLC0415

    d = load_table(spark, sf_dir, "documents")
    posts = d.select(
        "source", F.explode(TX.shingles_expr("text", BOILER_N)).alias("shingle")
    )
    dfreq = posts.groupBy("source", "shingle").agg(
        F.count("*").cast("long").alias("df")
    )
    nd = d.groupBy("source").agg(F.count("*").cast("long").alias("n_docs"))
    w = Window.partitionBy("source").orderBy(F.desc("df"), F.asc("shingle"))
    return (
        dfreq.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BOILER_TOPK)
        .join(F.broadcast(nd), "source")
        .select(
            "source",
            F.col("rank").cast("long").alias("rank"),
            "shingle",
            "df",
            "n_docs",
            F.round(F.col("df") / F.col("n_docs"), 6).alias("coverage"),
        )
        .orderBy("source", "rank")
    )


def q181_gate_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-gate ABLATION of the curation board — which filter does the
    work: for each q155 gate, how many docs it fails (n_fail) and how
    many it ALONE would remove (n_fail_only — docs every other gate
    keeps), the two numbers an operator reads before loosening or
    dropping a filter (a gate with n_fail_only ≈ 0 is redundant; a
    large one is load-bearing). One board pass (the q155 pipeline),
    one aggregate, four rows.

    Scale (100 TB): inherits q155's one-scan contract; the ablation
    adds a single map-side-combined aggregate over the board and a
    4-row presentation union. The board is the session-cached q155
    materialization — an ablation after a board run costs only the
    aggregate."""
    board = _board_for(spark, sf_dir)
    gates = {
        "dedup": "dedup_keep",
        "entropy": "entropy_keep",
        "quality": "quality_keep",
        "repetition": "rep_keep",
    }
    aggs = [F.count("*").alias("n_docs")]
    for g, c in gates.items():
        others = [v for v in gates.values() if v != c]
        only = ~F.col(c)
        for o in others:
            only = only & F.col(o)
        aggs.append(F.sum((~F.col(c)).cast("long")).alias(f"fail_{g}"))
        aggs.append(F.sum(only.cast("long")).alias(f"only_{g}"))
    one = board.agg(*aggs).localCheckpoint(eager=True)
    rows = [
        one.select(
            F.lit(g).alias("gate"),
            F.col(f"fail_{g}").alias("n_fail"),
            F.col(f"only_{g}").alias("n_fail_only"),
            F.col("n_docs"),
            F.round(F.col(f"fail_{g}") / F.col("n_docs"), 6).alias("fail_frac"),
        )
        for g in gates
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("gate")


def q182_pack_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PACKED TRAINING SHARDS themselves — q173 assigns pack
    coordinates; this emits what the trainer reads: one row per pack
    with the member documents' text concatenated in id order, the
    member count, the token fill and the padding the fixed window
    pays (the q154 waste, now per-pack). Whole docs only — the q66
    straddle export is the other convention.

    Scale (100 TB): the manifest join is id-keyed (manifest rows are
    4 integers); the only text movement is ONE exchange of each doc
    into its (source, block) shard — the same bytes any shard export
    writer ships — grouped into bounded 32-doc packs. No Python, no
    global sort beyond presentation."""
    from spark_nnd_spark.operators import sampling as SA  # noqa: PLC0415

    d = load_table(spark, sf_dir, "documents")
    manifest = SA.pack_whole_docs(
        d,
        TX.token_count_expr("text"),
        context_len=PACK_CONTEXT,
        block_docs=PACKW_BLOCK_DOCS,
    )
    joined = manifest.join(d.select("doc_id", "text"), "doc_id")
    return (
        joined.groupBy("source", "block", "bin")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("fill"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "text"))),
                    lambda s: s["text"],
                ),
                " ",
            ).alias("packed_text"),
        )
        .select(
            "source",
            "block",
            "bin",
            "n_docs",
            "fill",
            F.greatest(F.lit(PACK_CONTEXT) - F.col("fill"), F.lit(0))
            .cast("long")
            .alias("padding"),
            "packed_text",
        )
        .orderBy("source", "block", "bin")
    )


ZIPF_TOP = 100  # vocabulary head the power law is fit over


def q183_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law FIT over the vocabulary head — the OLS slope of
    ln(freq) on ln(rank) for the top-ZIPF_TOP tokens: the power-law
    exponent (≈ −1 for natural text) that corpus-quality audits read
    as a diversity/degeneracy signal (a too-steep head means template
    or boilerplate domination; q70 shows the head, this fits it).
    Cross-engine exactness: the log coordinates quantize to integer
    micro-nats (the q165 discipline), so every OLS sum is an exact
    integer and the closed-form slope/intercept are deterministic
    double expressions over exact inputs.

    Scale (100 TB): one map-side-combined vocab count, a
    TakeOrderedAndProject head cut (never a global sort), then the
    rank window and the fit run over ZIPF_TOP rows."""
    from pyspark.sql import Window  # noqa: PLC0415

    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(TX.tokens_expr("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(ZIPF_TOP)
    )
    w = Window.orderBy(F.desc("n"), F.asc("token"))
    pts = counts.select(
        F.row_number().over(w).alias("rank"), "n"
    ).select(
        F.floor(F.log(F.col("rank").cast("double")) * 1e6 + F.lit(0.5))
        .cast("long")
        .alias("x"),
        F.floor(F.log(F.col("n").cast("double")) * 1e6 + F.lit(0.5))
        .cast("long")
        .alias("y"),
    )
    agg = pts.agg(
        F.count("*").alias("k"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (
        (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    )
    intercept = (
        (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
        / F.col("k")
        / F.lit(1.0e6)
    )
    return agg.select(
        F.col("k").cast("long").alias("n_top"),
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
    )


HEAPS_GRID = 10  # corpus-prefix checkpoints the growth law is fit over


def q184_heaps_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law FIT — vocabulary growth V ∝ T^β over corpus prefixes
    (docs in stable id order, HEAPS_GRID checkpoints): the exponent
    corpus audits read as a saturation signal (β → 0 means new data
    stops adding vocabulary — heavy duplication or closed-domain
    text; natural corpora sit near β ≈ 0.5). Companion to q183: Zipf
    fits the head's shape, Heaps fits the tail's growth. One token
    pass computes each token's FIRST document and each prefix's token
    total; the checkpoint grid and the micro-nat OLS (the q183
    kernel) are O(grid) arithmetic over exact integers.

    Scale (100 TB): one exploded-token aggregate (map-side combined to
    O(vocab) first-doc rows + O(docs) per-doc counts); the grid
    explode is ×HEAPS_GRID on those aggregates, never on the corpus."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(TX.tokens_expr("text")).alias("token"))
    firsts = toks.groupBy("token").agg(F.min("doc_id").alias("fd"))
    percnt = d.select(
        "doc_id", TX.token_count_expr("text").cast("long").alias("n")
    )
    nrow = d.agg(F.count("*").alias("n_docs"))
    ks = F.explode(
        F.array(*[F.lit(k) for k in range(1, HEAPS_GRID + 1)])
    ).alias("k")
    # threshold t_k = (n_docs * k) div GRID; prefix = doc_id < t_k
    vk = (
        firsts.crossJoin(F.broadcast(nrow))
        .select(ks, "fd", "n_docs")
        .filter(F.col("fd") < F.expr(f"(n_docs * k) div {HEAPS_GRID}"))
        .groupBy("k")
        .agg(F.count("*").alias("vocab"))
    )
    tk = (
        percnt.crossJoin(F.broadcast(nrow))
        .select(ks, "doc_id", "n", "n_docs")
        .filter(F.col("doc_id") < F.expr(f"(n_docs * k) div {HEAPS_GRID}"))
        .groupBy("k")
        .agg(F.sum("n").alias("toks"))
    )
    pts = vk.join(tk, "k").select(
        F.floor(F.log(F.col("toks").cast("double")) * 1e6 + F.lit(0.5))
        .cast("long")
        .alias("x"),
        F.floor(F.log(F.col("vocab").cast("double")) * 1e6 + F.lit(0.5))
        .cast("long")
        .alias("y"),
    )
    agg = pts.agg(
        F.count("*").alias("kk"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    beta = (
        (F.col("kk") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / (F.col("kk") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    )
    intercept = (
        (F.col("sy").cast("double") - beta * F.col("sx").cast("double"))
        / F.col("kk")
        / F.lit(1.0e6)
    )
    return agg.select(
        F.col("kk").cast("long").alias("n_points"),
        F.round(beta, 6).alias("beta"),
        F.round(intercept, 6).alias("intercept"),
    )


RAG_CHUNK_SIZE = 64    # retrieval-unit token window (q186/q191)
RAG_CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks


def q186_chunk_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window CHUNK export (operators/sampling.
    chunk_tokens) — the retrieval-corpus twin of the q182 pack export:
    packing JOINS whole documents into training windows; chunking
    SPLITS each document into size-64 / stride-48 retrievable units
    (16-token overlap keeps boundary context inside a chunk), the unit
    every RAG index ingests. q65 is the inline PRETRAINING chunker
    (count-derived starts, no coordinates); this is the operator-backed
    RAG export — start offsets, true tail length, a streaming ingest
    twin (chunk_stream) and a retrieval read path (q191) on top. Emits per chunk its coordinates, true
    token length (the tail chunk is short — the embedder pads, not the
    engine) and text.

    Scale (100 TB): a pure narrow projection — tokenize, an
    O(n/stride) generator, a slice per chunk; ZERO exchanges beyond
    the presentation sort, so the export runs at scan width on any
    cluster size."""
    from spark_nnd_spark.operators import sampling as SA  # noqa: PLC0415

    d = load_table(spark, sf_dir, "documents")
    return SA.chunk_tokens(
        d, size=RAG_CHUNK_SIZE, stride=RAG_CHUNK_STRIDE
    ).orderBy("doc_id", "chunk_idx")


def q187_retrieval_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETRIEVER-RANKED hard-negative mining — q143 mines negatives in
    embedding space (closest wrong-label vectors); this mines the
    contrastive-training data every dense retriever is trained on
    (in-batch negatives are easy; the hard ones come from a first-pass
    retriever ranking non-relevant docs highly, per DPR, Karpukhin et
    al. 2020). For each query of the late-interaction retriever
    (q146 — run HERE, so retriever changes stay driver-detectable, the
    q158 convention): anchor = its best-ranked relevant doc, negatives
    = every non-relevant doc on the ranked list, with rank coordinates
    and the score margin the trainer weights pairs by.

    Scale (100 TB): the corpus is touched only inside the retriever
    (posting-filtered BM25 → bounded rerank); mining itself is a
    window + self-join over the O(queries · k) ranked rows — free."""
    from pyspark.sql import Window  # noqa: PLC0415

    li = q146_late_interaction(spark, sf_dir)
    graded = li.select(
        "query_id", "doc_id", "rank", "li_score",
        _rel_grade(F.col("doc_id")).alias("rel"),
    )
    w = Window.partitionBy("query_id").orderBy("rank")
    pos = (
        graded.filter(F.col("rel") > 0)
        .withColumn("pr", F.row_number().over(w))
        .filter(F.col("pr") == 1)
        .select(
            "query_id",
            F.col("doc_id").alias("pos_doc_id"),
            F.col("rank").alias("pos_rank"),
            F.col("li_score").alias("pos_score"),
        )
    )
    neg = graded.filter(F.col("rel") == 0).select(
        "query_id",
        F.col("doc_id").alias("neg_doc_id"),
        F.col("rank").alias("neg_rank"),
        F.col("li_score").alias("neg_score"),
    )
    return (
        pos.join(neg, "query_id")
        .select(
            "query_id",
            "pos_doc_id",
            "neg_doc_id",
            "pos_rank",
            "neg_rank",
            F.round(F.col("pos_score") - F.col("neg_score"), 6).alias("margin"),
        )
        .orderBy("query_id", "neg_rank")
    )


JS_Q = 1_000_000_000_000  # pico-nat quantization for JS terms
LN2 = 0.6931471805599453  # shared literal so both engines use one ln(2)


def q188_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen–Shannon divergence between the per-source
    unigram token distributions — the distribution-shift matrix a
    mixture designer reads before weighting sources (complements q147's
    per-source card and q150's drift alert: those compare summary
    metrics, this compares the actual language). JS (in nats, 0 ≤ js ≤
    ln 2) is symmetric and finite on non-overlapping support, unlike
    KL. Disjoint-support token mass needs no anti-join: Σ over tokens
    only in A of ½·p·ln2 = ½·ln2·(1 − covered_A), so the shared-token
    join plus per-pair covered-probability sums is the whole
    computation. Per-token contributions quantize to integer pico-nats
    (the q165 trick) so the per-pair sum is order-free and replays
    exactly cross-engine.

    Scale (100 TB): one map-side-combined (source, token) aggregate;
    the pair join is the counts table self-joined on token —
    O(vocab · sources²) rows where sources is a dashboard dimension
    (tens), never a corpus rescan; no Python anywhere."""
    from spark_nnd_spark.operators import text_stats as TS  # noqa: PLC0415

    d = load_table(spark, sf_dir, "documents")
    return TS.js_divergence_pairs(TS._token_counts(d)).orderBy(  # noqa: SLF001
        "source_a", "source_b"
    )


SELECT_PCT = 30  # per-source keep fraction for q189


def q189_quality_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the TOP ``SELECT_PCT``% of each source's documents by the
    q111 quality score — the per-source selection step between scoring
    (q111/q170) and mixing (q112/q149) — designed WITHOUT a per-source
    sort: a rank window partitioned by a handful of sources
    single-threads each source at 100 TB. Instead the score's 6-decimal
    grid makes an EXACT histogram: one map-side-combined
    (source, score) count, a cumulative window over the O(sources ·
    grid) histogram (never the corpus), per-source integer quota
    k = n·pct div 100, then docs join their bucket's verdict — buckets
    strictly above the threshold are kept whole, and only the single
    boundary bucket per source ranks its members (by doc_id) to fill
    the remaining quota, so the only window over document rows is
    bounded by one score-tie bucket.

    Emits the kept docs (doc_id, source, score) — the artifact the
    next pipeline stage reads."""
    from pyspark.sql import Window  # noqa: PLC0415

    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "source",
        F.round(TX.linear_score_expr("text"), 6).alias("score"),
    )
    hist = scored.groupBy("source", "score").agg(F.count("*").alias("cnt"))
    wcum = Window.partitionBy("source").orderBy(F.desc("score"))
    cum = hist.withColumn("cum", F.sum("cnt").over(wcum)).withColumn(
        "above", F.col("cum") - F.col("cnt")
    )
    quota = hist.groupBy("source").agg(
        F.expr(f"(sum(cnt) * {SELECT_PCT}) div 100").alias("k")
    )
    verdict = cum.join(quota, "source").select(
        "source",
        "score",
        (F.col("cum") <= F.col("k")).alias("full"),
        (F.col("above") < F.col("k")).alias("touch"),
        (F.col("k") - F.col("above")).alias("room"),
    )
    joined = scored.join(verdict, ["source", "score"]).filter(F.col("touch"))
    wtie = Window.partitionBy("source", "score").orderBy("doc_id")
    return (
        joined.withColumn(
            "tie_rank",
            F.when(F.col("full"), F.lit(0)).otherwise(
                F.row_number().over(wtie)
            ),
        )
        .filter(F.col("full") | (F.col("tie_rank") <= F.col("room")))
        .select("doc_id", "source", "score")
        .orderBy("source", "doc_id")
    )


def q190_corpus_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FINAL curated training corpus — the artifact every previous
    stage exists to produce, composed end-to-end: the q155 curation
    board decides WHICH documents survive (quality + repetition +
    entropy gates, near-dup keep-one), the q167 span-removal rewrite
    decides WHAT TEXT each survivor contributes (every duplicated
    >= SPAN_MIN_TOKENS run kept in exactly one doc, over the same
    planted corpus as q156/q167 — the plant is part of the replayable
    query text). One row per exported doc: provenance-complete
    (source, cleaned text, post-cut token count, spans/tokens cut).
    The oracle COMPOSES the q155 and q167 oracles, so this tier is
    driver-green only if both upstream artifacts are.

    Scale (100 TB): the board pays one text scan, the span kernel
    O(repeated grams); the composition adds only id-keyed equi-joins
    with no explicit broadcast of any corpus-keyed side (the q164
    lesson — AQE picks the build side from runtime sizes)."""
    d = load_table(spark, sf_dir, "documents")
    keep = _board_for(spark, sf_dir).filter(F.col("keep")).select("doc_id")
    rew = _span_rewrite_for(spark, sf_dir)
    return (
        rew.join(keep, "doc_id")
        .join(d.select("doc_id", "source"), "doc_id")
        .select(
            "doc_id",
            "source",
            F.col("cleaned_text").alias("text_out"),
            F.when(F.col("cleaned_text") == "", F.lit(0))
            .otherwise(F.size(TX.tokens_expr("cleaned_text")))
            .cast("long")
            .alias("n_tokens_out"),
            "n_spans_cut",
            "tokens_cut",
        )
        .orderBy("doc_id")
    )


def q191_chunk_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 over the CHUNK corpus — the RAG read path over q186's
    export (q68 retrieves documents; a RAG index retrieves the
    overlapping token windows themselves, so the hit is already
    context-sized). Same scoring as q68 with chunk-grained stats
    (dl = the chunk's true token length, avgdl/N over chunks); scores
    round to 6dp BEFORE the top-N cut (the q146 boundary discipline)
    and ties break on (doc_id, chunk_idx).

    Scale (100 TB): chunking is the q186 narrow fan-out; the posting
    scan filters to query terms BEFORE any shuffle, so the exchange
    carries O(chunks containing a query term); df/stats are broadcast
    one-row joins; the cut is a TakeOrdered."""
    from spark_nnd_spark.operators import sampling as SA  # noqa: PLC0415

    d = load_table(spark, sf_dir, "documents")
    ch = SA.chunk_tokens(d, size=RAG_CHUNK_SIZE, stride=RAG_CHUNK_STRIDE)
    toks = ch.select(
        "doc_id",
        "chunk_idx",
        F.col("n_tokens").cast("double").alias("dl"),
        F.explode(TX.tokens_expr("chunk_text")).alias("token"),
    ).filter(F.col("token").isin(BM25_QUERY))
    tf = (
        toks.groupBy("doc_id", "chunk_idx", "dl", "token")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=True)
    )
    df_ = tf.groupBy("token").agg(F.count("*").alias("df"))
    stats = ch.agg(
        F.count("*").cast("double").alias("n_chunks"),
        F.avg(F.col("n_tokens").cast("double")).alias("avgdl"),
    )
    idf = F.log(
        (F.col("n_chunks") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    term_score = idf * (
        F.col("tf") * (BM25_K1 + 1)
        / (F.col("tf") + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl")))
    )
    scored = (
        tf.join(F.broadcast(df_), "token")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id", "chunk_idx")
        .agg(
            F.round(F.sum(term_score), 6).alias("score"),
            F.count("*").alias("n_terms"),
        )
    )
    return (
        scored.orderBy(F.desc("score"), "doc_id", "chunk_idx")
        .limit(BM25_TOPN)
        .select("doc_id", "chunk_idx", "n_terms", "score")
    )


def q192_model_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram of the q169-TRAINED classifier on the
    HELD-OUT split — the calibration audit of the actual model in the
    loop (q139 calibrates the fixed hashed scorer; q137/q169 measure
    the trained model's discrimination; this closes train → eval →
    calibrate): per probability decile of the test slice, count, mean
    predicted probability and empirical positive rate. A model used as
    a curation gate (q170) is thresholded on these probabilities —
    mis-calibration here means the MODEL_KEEP_TAU cut keeps a
    different mass than intended.

    Scale (100 TB): training is q169's three single-row aggregates;
    scoring the held-out slice is one codegen expression; the bins are
    an O(CALIB_BINS)-group map-side-combined aggregate."""
    from spark_nnd_spark.operators.evaluation import calibration_bins  # noqa: PLC0415

    feats, w, _ = _lr_model_for(spark, sf_dir)
    held = feats.filter(F.col("split") == "test")
    p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-_lr_z(w))), 6)
    scored = held.select(p.alias("score"), F.col("y").alias("label"))
    return calibration_bins(
        scored, "score", "label", n_bins=CALIB_BINS
    ).orderBy("bin")


BUCKET_MIN = 8    # smallest padded sequence length
BUCKET_MAX = 512  # training context cap for q193


def q193_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-BUCKETED batching audit — the trainer-side complement of
    packing (q66/q173 pack to eliminate padding; when an SFT/reranker
    trainer must keep one doc per row, it instead BUCKETS by length so
    each batch pads to its bucket, not the global max). Buckets are
    powers of two clamped to [BUCKET_MIN, BUCKET_MAX]; per bucket:
    docs, real tokens, padded slots (docs · bucket, overlong docs
    truncate to the cap) and the padding fraction — plus what the same
    batch would waste padded to the GLOBAL max, the number that
    justifies bucketing. Pure integer arithmetic end-to-end.

    Scale (100 TB): one narrow projection (token count → bucket id) +
    one map-side-combined O(buckets) aggregate; the global max rides a
    one-row broadcast."""
    d = load_table(spark, sf_dir, "documents")
    n = TX.token_count_expr("text").cast("long")
    capped = F.least(n, F.lit(BUCKET_MAX))
    # explicit CASE ladder, not pow(2, ceil(log2(n))): float log2 at an
    # exact power of two is an engine-dependent ulp hazard
    sizes = []
    b = BUCKET_MIN
    while b < BUCKET_MAX:
        sizes.append(b)
        b *= 2
    bucket = F.lit(BUCKET_MAX).cast("long")
    for s in reversed(sizes):
        bucket = F.when(capped <= s, F.lit(s).cast("long")).otherwise(bucket)
    base = d.select(capped.alias("n"), bucket.alias("bucket"))
    gmax = base.agg(F.max("n").alias("gmax"))
    per = base.groupBy("bucket").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n").cast("long").alias("tokens"),
    )
    return (
        per.crossJoin(F.broadcast(gmax))
        .select(
            "bucket",
            "n_docs",
            "tokens",
            (F.col("bucket") * F.col("n_docs") - F.col("tokens"))
            .cast("long")
            .alias("pad_slots"),
            F.round(
                (F.col("bucket") * F.col("n_docs") - F.col("tokens"))
                .cast("double")
                / (F.col("bucket") * F.col("n_docs")).cast("double"),
                6,
            ).alias("pad_frac"),
            F.round(
                (F.col("gmax") * F.col("n_docs") - F.col("tokens"))
                .cast("double")
                / (F.col("gmax") * F.col("n_docs")).cast("double"),
                6,
            ).alias("pad_frac_unbucketed"),
        )
        .orderBy("bucket")
    )


# One token-stats sidecar per (session, sf_dir) — the _cov_stats_for
# convention (build once, every probe reuses it).
_TOKSTATS_CACHE: dict[tuple[str, str], str] = {}


def _token_stats_for(spark: SparkSession, sf_dir: str) -> str:
    from spark_nnd_spark.operators.text_stats import build_token_stats  # noqa: PLC0415
    from spark_nnd_spark.session import session_scratch_dir  # noqa: PLC0415

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _TOKSTATS_CACHE:
        path = session_scratch_dir("token_stats_")
        build_token_stats(load_table(spark, sf_dir, "documents"), path)
        _TOKSTATS_CACHE[key] = path
    return _TOKSTATS_CACHE[key]


def q194_indexed_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q188's distribution-shift matrix served from the PERSISTED
    mergeable token statistics (operators/text_stats — the 9th index
    family, and the second ALGEBRAIC one: stored exact integer counts
    make extend addition and retraction subtraction, extend ==
    fresh-rebuild EXACT, with the same atomic versioned commits as the
    covariance sidecar). The probe reads O(sources · vocab) stored
    rows and never rescans the corpus — a continuously-ingesting
    pipeline keeps the source-similarity dashboard current by merging
    batch counts, not by re-tokenizing 100 TB. Shares q188's oracle:
    index-served == inline is itself the assertion (the q159/q161/
    q179 convention)."""
    from spark_nnd_spark.operators.text_stats import (  # noqa: PLC0415
        js_divergence_pairs,
        token_counts_from_stats,
    )

    path = _token_stats_for(spark, sf_dir)
    return js_divergence_pairs(token_counts_from_stats(spark, path)).orderBy(
        "source_a", "source_b"
    )


# One bigram-LM sidecar per (session, sf_dir).
_BGSTATS_CACHE: dict[tuple[str, str], str] = {}


def _bigram_stats_for(spark: SparkSession, sf_dir: str) -> str:
    from spark_nnd_spark.operators.text_stats import build_bigram_stats  # noqa: PLC0415
    from spark_nnd_spark.session import session_scratch_dir  # noqa: PLC0415

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _BGSTATS_CACHE:
        path = session_scratch_dir("bigram_stats_")
        build_bigram_stats(load_table(spark, sf_dir, "documents"), path)
        _BGSTATS_CACHE[key] = path
    return _BGSTATS_CACHE[key]


def q195_indexed_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q165's bigram-LM perplexity with the TRAINED MODEL served from
    the persisted bigram statistics (operators/text_stats — the same
    algebraic family as the unigram counts: extend == addition, exact).
    The scoring pass inherently touches each scored document once; what
    the index removes is the TRAINING tally — a continuously-ingesting
    pipeline keeps the corpus LM current by merging batch counts
    (token_stats_stream's convention) instead of re-tokenizing 100 TB
    per refresh, and unigram totals + vocab size derive from the stored
    table at probe time. Shares q165's oracle: served == inline is the
    assertion (the q159/q161/q179/q194 convention)."""
    from spark_nnd_spark.operators.text_stats import (  # noqa: PLC0415
        bigram_counts_from_stats,
        doc_bigrams,
    )

    path = _bigram_stats_for(spark, sf_dir)
    doc_bg = doc_bigrams(load_table(spark, sf_dir, "documents"))
    return _ppl_score(
        doc_bg, bigram_counts_from_stats(spark, path)
    ).orderBy("doc_id")


def q196_indexed_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q140's DSIR selection with BOTH distributions served from the
    persisted token statistics: raw counts are Σ over sources of the
    stored (source, token, n) rows, target counts the source = src0
    slice of the same table — the q140 inline tally derives exactly,
    so the trained importance model never re-tokenizes the corpus (the
    scoring pass inherently reads each scored doc once; the TALLY is
    what the sidecar removes, the q195 perplexity convention). Shares
    q140's oracle: served == inline is the assertion."""
    from pyspark.sql import Window  # noqa: PLC0415

    from spark_nnd_spark.operators.sampling import dsir_score  # noqa: PLC0415
    from spark_nnd_spark.operators.text_stats import (  # noqa: PLC0415
        token_counts_from_stats,
    )

    d = load_table(spark, sf_dir, "documents")
    counts = token_counts_from_stats(
        spark, _token_stats_for(spark, sf_dir)
    )
    vocab = (
        counts.filter(F.col("token") != "")
        .groupBy("token")
        .agg(
            F.sum("n").alias("raw_cnt"),
            F.sum(
                F.when(
                    F.col("source") == DSIR_TARGET_SOURCE, F.col("n")
                ).otherwise(F.lit(0))
            ).alias("tgt_cnt"),
        )
        .localCheckpoint(eager=True)
    )
    toks = d.select(
        "doc_id", F.explode(TX.tokens_expr("text")).alias("token")
    ).filter(F.col("token") != "")
    w = dsir_score(toks, vocab)
    top = w.orderBy(F.desc("log_weight"), F.asc("doc_id")).limit(DSIR_TOP_K)
    rank = F.row_number().over(
        Window.orderBy(F.desc("log_weight"), F.asc("doc_id"))
    )
    return (
        top.withColumn("rank", rank)
        .select("doc_id", "n_tokens", "log_weight", "rank")
        .orderBy("rank")
    )


def q197_indexed_ref_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q171's CCNet reference-LM buckets with the TRAINED LM served
    from the persisted token statistics: the reference counts are the
    source = src1 slice of the stored (source, token, n) table and the
    smoothing vocabulary is the table's full token set — the q171
    inline tally derives exactly. The fourth probe the one maintained
    sidecar serves (divergence q194, perplexity q195, DSIR q196, this)
    — the 'one merged statistic powers every distribution-based
    curation signal' property that makes the family worth persisting.
    Shares q171's oracle: served == inline is the assertion."""
    from spark_nnd_spark.operators.sampling import ref_lm_score  # noqa: PLC0415
    from spark_nnd_spark.operators.text_stats import (  # noqa: PLC0415
        token_counts_from_stats,
    )

    d = load_table(spark, sf_dir, "documents")
    counts = token_counts_from_stats(
        spark, _token_stats_for(spark, sf_dir)
    )
    vocab = (
        counts.filter(F.col("token") != "")
        .groupBy("token")
        .agg(
            F.sum(
                F.when(
                    F.col("source") == REF_LM_SOURCE, F.col("n")
                ).otherwise(F.lit(0))
            ).alias("ref_cnt")
        )
        .localCheckpoint(eager=True)
    )
    toks = d.select(
        "doc_id", "lang", F.explode(TX.tokens_expr("text")).alias("token")
    ).filter(F.col("token") != "")
    return (
        ref_lm_score(toks, vocab)
        .select(
            "doc_id",
            "lang",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            "logprob",
            F.col("bucket").cast("int").alias("bucket"),
        )
        .orderBy("doc_id")
    )


CHUNK_ID_MUL = 1024  # chunk_id = doc_id * MUL + chunk_idx (idx < MUL)


def packed_chunk_id(doc_col: str, idx_col: str) -> Column:
    """``doc_id * CHUNK_ID_MUL + chunk_idx`` with a RUNTIME guard: a
    document with ``chunk_idx >= CHUNK_ID_MUL`` (≈49k tokens at the
    RAG stride — book-length, exactly what a 100 TB corpus contains)
    would silently alias into the next doc_id's chunk space; instead
    the build fails with a clear error. The guard is a JVM-side
    ``raise_error`` branch inside the projection — zero extra passes,
    fails on first offending row at index-build time."""
    guarded_idx = F.when(
        F.col(idx_col) >= CHUNK_ID_MUL,
        F.raise_error(
            F.concat(
                F.lit(
                    f"chunk_idx >= CHUNK_ID_MUL ({CHUNK_ID_MUL}) for "
                    "doc_id="
                ),
                F.col(doc_col).cast("string"),
                F.lit(
                    "; packed chunk ids would collide — raise "
                    "CHUNK_ID_MUL or split the document"
                ),
            )
        ).cast("long"),
    ).otherwise(F.col(idx_col))
    return F.col(doc_col) * CHUNK_ID_MUL + guarded_idx

# One chunk-grained BM25 index per (session, sf_dir).
_CHUNKIDX_CACHE: dict[tuple[str, str], str] = {}


def _chunk_index_for(spark: SparkSession, sf_dir: str) -> str:
    from spark_nnd_spark.operators import sampling as SA  # noqa: PLC0415
    from spark_nnd_spark.operators.retrieval import build_text_index  # noqa: PLC0415
    from spark_nnd_spark.session import session_scratch_dir  # noqa: PLC0415

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _CHUNKIDX_CACHE:
        path = session_scratch_dir("chunk_idx_")
        ch = SA.chunk_tokens(
            load_table(spark, sf_dir, "documents"),
            size=RAG_CHUNK_SIZE,
            stride=RAG_CHUNK_STRIDE,
        ).select(
            packed_chunk_id("doc_id", "chunk_idx").alias("chunk_id"),
            "chunk_text",
        )
        build_text_index(ch, path, text_col="chunk_text", id_col="chunk_id")
        _CHUNKIDX_CACHE[key] = path
    return _CHUNKIDX_CACHE[key]


def q198_indexed_chunk_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q191's chunk retrieval served from a PERSISTED chunk-grained
    BM25 index — the RAG serving shape: chunk once at ingest (the
    q186 export feeds the same build), persist token-sorted postings
    keyed by chunk_id = doc_id·1024 + chunk_idx, and answer queries
    from O(postings of the query terms) with the full tombstone
    lifecycle the text family already carries (retracting a document
    retracts its chunks — right-to-be-forgotten reaches the RAG index).
    The synthetic chunk_id preserves (doc_id, chunk_idx) lexicographic
    order, so the ranked cut is identical to the inline tier. Shares
    q191's oracle: served == inline is the assertion."""
    from spark_nnd_spark.operators.retrieval import bm25_query_index  # noqa: PLC0415

    path = _chunk_index_for(spark, sf_dir)
    scored = bm25_query_index(
        spark, path, BM25_QUERY, k1=BM25_K1, b=BM25_B, id_col="chunk_id"
    ).select(
        "chunk_id",
        "n_terms",
        F.round("score", 6).alias("score"),
    )
    return (
        scored.orderBy(F.desc("score"), "chunk_id")
        .limit(BM25_TOPN)
        .select(
            F.expr(f"chunk_id div {CHUNK_ID_MUL}").cast("long").alias("doc_id"),
            F.pmod(F.col("chunk_id"), F.lit(CHUNK_ID_MUL))
            .cast("long")
            .alias("chunk_idx"),
            "n_terms",
            "score",
        )
    )


# -------------------- domain-grain curation (q203/q204, C4/RefinedWeb)
# The driver's documents fixture carries no url/domain column
# (FIXTURES.md records the ask), so the domain is PLANTED from
# (doc_id, source) — the q151 PII convention: the plant is part of
# the replayable query text, deterministic in both engines.
DOMAIN_MOD = 7                 # domains per source
DOMAIN_MIN_DOCS = 2            # below this a domain can't prove quality
DOMAIN_KEEP_TAU = 0.6          # min fraction of docs passing the q37 gate
DOMAIN_BLOCK_RESIDUES = (2, 5)  # the literal blocklist: d2.*/d5.* domains


def _domain_expr() -> Column:
    return F.concat(
        F.lit("d"),
        (F.col("doc_id") % DOMAIN_MOD).cast("string"),
        F.lit("."),
        F.col("source"),
        F.lit(".example"),
    )


def _domain_sql() -> str:
    return f"'d' || (doc_id % {DOMAIN_MOD})::VARCHAR || '.' || source || '.example'"


def q203_domain_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-DOMAIN quality aggregation — the C4/RefinedWeb curation
    grain: roll every doc's quality signals up to its domain and
    decide keep/drop per domain (n_docs, token mass, mean stopword
    ratio, fraction passing the q37 doc gate; a domain survives when
    enough of its docs do AND it has enough docs to judge). Per-doc
    ratios are micro-quantized to integers before summing (the q188
    pico-nat convention) so the domain means are order-free and
    hash-stable cross-engine.

    Scale (100 TB): one codegen text scan + ONE map-side-combined
    aggregate keyed by domain — O(domains) output rows; no joins."""
    d = load_table(spark, sf_dir, "documents")
    n_tok = TX.token_count_expr("text")
    stop = TX.stopword_ratio_expr("text")
    ttr = TX.type_token_ratio_expr("text")
    doc_keep = (n_tok >= 5) & (stop <= 0.6) & (ttr >= 0.3)
    per_doc = d.select(
        _domain_expr().alias("domain"),
        n_tok.alias("n_tokens"),
        F.round(stop * 1e6).cast("long").alias("sw_u"),
        doc_keep.cast("long").alias("keep_i"),
    )
    n = F.count("*")
    keep_frac = F.round(F.sum("keep_i") / n, 6)
    return (
        per_doc.groupBy("domain")
        .agg(
            n.cast("long").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.round(F.sum("sw_u") / (n * 1e6), 6).alias("mean_stopword"),
            keep_frac.alias("keep_frac"),
            (
                (keep_frac >= DOMAIN_KEEP_TAU)
                & (n >= DOMAIN_MIN_DOCS)
            ).alias("domain_keep"),
        )
        .orderBy("domain")
    )


def q204_domain_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-blocklist + learned-domain-quality gate applied back at
    DOC grain — the C4 filter shape: a doc is dropped when its domain
    is on the literal blocklist OR failed q203's quality vote. One row
    per doc with the full provenance (domain, on_blocklist,
    domain_keep, keep).

    Scale (100 TB): the corpus pays one scan; both gates arrive by
    broadcast (the blocklist is a literal, the q203 verdict table is
    O(domains) rows) — no corpus-keyed shuffle."""
    d = load_table(spark, sf_dir, "documents")
    verdicts = q203_domain_quality(spark, sf_dir).select(
        "domain", "domain_keep"
    )
    blocked_lit = F.array(
        *[F.lit(f"d{r}") for r in DOMAIN_BLOCK_RESIDUES]
    )
    docs = d.select(
        "doc_id",
        _domain_expr().alias("domain"),
        F.array_contains(
            blocked_lit, F.concat(F.lit("d"), (F.col("doc_id") % DOMAIN_MOD).cast("string"))
        ).alias("on_blocklist"),
    )
    return (
        docs.join(F.broadcast(verdicts), "domain", "left")
        .select(
            "doc_id",
            "domain",
            "on_blocklist",
            F.coalesce("domain_keep", F.lit(False)).alias("domain_keep"),
            (
                ~F.col("on_blocklist")
                & F.coalesce("domain_keep", F.lit(False))
            ).alias("keep"),
        )
        .orderBy("doc_id")
    )


def _domain_quality_oracle() -> str:
    tok = TX.token_count_sql()
    stop = TX.stopword_ratio_sql()
    ttr = TX.type_token_ratio_sql()
    return f"""
        WITH per_doc AS (
            SELECT {_domain_sql()} AS domain,
                   {tok} AS n_tokens,
                   CAST(round(({stop}) * 1e6) AS BIGINT) AS sw_u,
                   CASE WHEN {tok} >= 5 AND {stop} <= 0.6 AND {ttr} >= 0.3
                        THEN 1 ELSE 0 END AS keep_i
            FROM documents
        )
        SELECT domain,
               COUNT(*)::BIGINT AS n_docs,
               SUM(n_tokens)::BIGINT AS n_tokens,
               round(SUM(sw_u) / (COUNT(*) * 1e6), 6) AS mean_stopword,
               round(SUM(keep_i) / COUNT(*), 6) AS keep_frac,
               (round(SUM(keep_i) / COUNT(*), 6) >= {DOMAIN_KEEP_TAU}
                AND COUNT(*) >= {DOMAIN_MIN_DOCS}) AS domain_keep
        FROM per_doc GROUP BY domain ORDER BY domain
    """


def _domain_blocklist_oracle() -> str:
    residues = ", ".join(f"'d{r}'" for r in DOMAIN_BLOCK_RESIDUES)
    return f"""
        WITH verdicts AS (
            SELECT domain, domain_keep FROM ({_domain_quality_oracle()})
        ),
        docs AS (
            SELECT doc_id, {_domain_sql()} AS domain,
                   ('d' || (doc_id % {DOMAIN_MOD})::VARCHAR) IN ({residues})
                       AS on_blocklist
            FROM documents
        )
        SELECT d.doc_id, d.domain, d.on_blocklist,
               COALESCE(v.domain_keep, FALSE) AS domain_keep,
               (NOT d.on_blocklist AND COALESCE(v.domain_keep, FALSE)) AS keep
        FROM docs d LEFT JOIN verdicts v USING (domain)
        ORDER BY d.doc_id
    """


_WINNOW_IDX_CACHE: dict[tuple[str, str], str] = {}


def _winnow_index_for(spark: SparkSession, sf_dir: str) -> str:
    """Session-cached winnow index over the non-src0 corpus slice."""
    from spark_nnd_spark.session import session_scratch_dir  # noqa: PLC0415

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _WINNOW_IDX_CACHE:
        path = session_scratch_dir("winnow_idx_")
        d = load_table(spark, sf_dir, "documents")
        DD.build_winnow_index(
            d.filter(F.col("source") != "src0"),
            path,
            n=WINNOW_N,
            w=WINNOW_W,
        )
        _WINNOW_IDX_CACHE[key] = path
    return _WINNOW_IDX_CACHE[key]


def q205_indexed_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time copied-passage detection served from the PERSISTED
    winnow index (operators/dedup.build_winnow_index /
    winnow_query_index, the eleventh index family): the src0 slice
    probes as the incoming batch, the rest of the corpus is
    fingerprinted once — q91's winnowed inverted-index join with the
    corpus side read from storage. Winnowing's window guarantee (any
    shared ~W+N-token run surfaces a common selected fingerprint)
    makes this the cheap standing plagiarism gate: stored postings are
    ~2/(W+1) the span index's gram stream.

    The boilerplate cut uses the STORED per-fingerprint df (fp_stats),
    so the served verdicts mirror an index-side census, not a per-batch
    corpus rescan.

    Scale: the batch's fingerprint set broadcasts into the fp-sorted
    postings scan — O(matching postings) shuffle, the corpus never
    re-shingled per batch (BENCH_SPAN_SCALE's flat-probe contract,
    winnow edition)."""
    d = load_table(spark, sf_dir, "documents")
    idx = _winnow_index_for(spark, sf_dir)
    return (
        DD.winnow_query_index(
            spark,
            idx,
            d.filter(F.col("source") == "src0"),
            min_shared=WINNOW_MIN_SHARED,
            max_fp_freq=MAX_SHINGLE_FREQ,
        )
        .orderBy("batch_id", "index_id")
    )


def q206_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user dense hourly grid with last-observation-carried-forward
    fill (operators/events.gap_fill_locf) — the hypertable gap-fill /
    LOCF interpolation shape (TimescaleDB time_bucket_gapfill + locf):
    gap slots get n_events=0, NULL bucket average, and the carried
    v_locf. Exact integer-cents bucket sums keep the averages
    order-free; one half-up rounding makes them engine-replayable.

    Scale: one map-side-combined (user, bucket) aggregate, an O(users)
    bounds aggregate, and a narrow per-user sequence explode; the LOCF
    window runs inside the existing user_id partitioning — no global
    sort, slots bounded by retention/grain."""
    e = load_table(spark, sf_dir, "events")
    return EV.gap_fill_locf(e).orderBy("user_id", "slot_epoch")


GAPFILL_GRAIN = 900   # 15-minute slots — exercises the generic branch
GAPFILL_USER_MOD = 15  # deterministic user slice: a 4x-finer grain
#                        multiplies the dense grid 4x, so the parity
#                        row samples 1/15 of the users to keep the
#                        compare O(q206-sized) — branch coverage is
#                        per-expression, not per-row


def q210_gapfill_grain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q206's hypertable gap-fill at a NON-DEFAULT grain (15-minute
    slots): the same LOCF + linear-interpolation grid through the
    operator's generic epoch-modulo bucketing branch instead of the
    hourly date_trunc fast path — cross-engine parity for arbitrary
    ``grain_seconds`` (the r13 advice's untested branch, now
    hash-checked against a grain-parameterized DuckDB oracle).

    Scale: identical plan shape to q206 — one map-side-combined
    (user, bucket) aggregate, O(users) bounds, narrow sequence
    explode; a finer grain only multiplies the O(users·slots) grid,
    bounded by the same max_slots_per_series guard."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") % GAPFILL_USER_MOD == 0
    )
    return EV.gap_fill_locf(e, grain_seconds=GAPFILL_GRAIN).orderBy(
        "user_id", "slot_epoch"
    )


_WINNOW_FULL_IDX_CACHE: dict[tuple[str, str], str] = {}


def _winnow_full_index_for(spark: SparkSession, sf_dir: str) -> str:
    """Session-cached winnow index over the WHOLE corpus (the
    _neardup_full_index_for convention) — backs the index-served
    corpus-pairs sweep, whose oracle is q91's."""
    from spark_nnd_spark.session import session_scratch_dir  # noqa: PLC0415

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _WINNOW_FULL_IDX_CACHE:
        path = session_scratch_dir("winnow_fidx_")
        DD.build_winnow_index(
            load_table(spark, sf_dir, "documents"),
            path,
            n=WINNOW_N,
            w=WINNOW_W,
        )
        _WINNOW_FULL_IDX_CACHE[key] = path
    return _WINNOW_FULL_IDX_CACHE[key]


def q209_indexed_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q91's corpus-level winnowed copy-pair sweep served ENTIRELY
    from the persisted winnow index (operators/dedup.
    winnow_pairs_index): the stored per-doc fingerprints self-join on
    fp under the stored-df boilerplate cut — no document text touched.
    Shares q91's oracle, so served == inline is the assertion (the
    q103/q198 discipline).

    Scale: the pair sweep is the inline q91 join minus the per-query
    shingle+winnow pass over 100 TB of text — postings computed once
    at ingest, every sweep joins stored integers."""
    idx = _winnow_full_index_for(spark, sf_dir)
    return (
        DD.winnow_pairs_index(
            spark,
            idx,
            min_shared=WINNOW_MIN_SHARED,
            max_fp_freq=MAX_SHINGLE_FREQ,
        )
        .orderBy("id_a", "id_b")
    )


def q207_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly OHLC bars — the classic hypertable downsampling
    rollup (candlesticks): open/close are the bucket's first/last
    value in ingest order (event_id — unique, so the pick is exact),
    high/low the extremes, all through exact integer cents so every
    bar replays bit-identically. Pairs with q206: gap-fill densifies,
    OHLC downsamples.

    Scale (100 TB): ONE map-side-combined aggregate keyed by (user,
    bucket) — min_by/max_by partials carry a single (value, key) pair
    per group per partition, so the exchange is O(users·buckets), not
    O(events); no window, no join, no sort beyond presentation."""
    e = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    return (
        e.select(
            "user_id",
            F.date_trunc("hour", F.col("ts")).cast("long").alias("slot_epoch"),
            cents.alias("c"),
            "event_id",
        )
        .groupBy("user_id", "slot_epoch")
        .agg(
            (F.min_by("c", "event_id") / 100.0).alias("open"),
            (F.max("c") / 100.0).alias("high"),
            (F.min("c") / 100.0).alias("low"),
            (F.max_by("c", "event_id") / 100.0).alias("close"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id", "slot_epoch")
    )


# One persisted continuous-aggregate rollup per (session, sf_dir) —
# the 12th family (operators/event_rollup): hourly mergeable partials
# over the events table, maintained incrementally.
_ROLLUP_CACHE: dict[tuple[str, str], str] = {}


def _event_rollup_for(spark: SparkSession, sf_dir: str) -> str:
    from spark_nnd_spark.operators.event_rollup import build_event_rollup  # noqa: PLC0415
    from spark_nnd_spark.session import session_scratch_dir  # noqa: PLC0415

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _ROLLUP_CACHE:
        path = session_scratch_dir("event_rollup_")
        build_event_rollup(load_table(spark, sf_dir, "events"), path)
        _ROLLUP_CACHE[key] = path
    return _ROLLUP_CACHE[key]


def q212_rollup_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q207's hourly OHLC bars served ENTIRELY from the persisted
    continuous-aggregate rollup (operators/event_rollup, the 12th
    family): open/close read the stored ingest-order endpoints,
    high/low the stored extremes — the raw events table is never
    scanned (plan-asserted). Shares q207's oracle, so served ==
    inline is the assertion (the q194/q209 discipline).

    Scale: the probe is one O(users·buckets) rollup read; the
    events-table pass happened once at build/ingest and is maintained
    per batch by mergeable-partial extension."""
    from spark_nnd_spark.operators.event_rollup import ohlc_from_rollup  # noqa: PLC0415

    return ohlc_from_rollup(spark, _event_rollup_for(spark, sf_dir)).orderBy(
        "user_id", "slot_epoch"
    )


def q213_rollup_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC + volume RE-BUCKETED from the stored hourly partials
    — the cross-grain merge that makes continuous aggregates worth
    persisting (TimescaleDB's hierarchical caggs): count/sum add,
    min/max lattice, endpoints compare event ids, so hour → day
    re-aggregation is exact without touching raw events. The oracle
    re-derives the same bars from the events table directly, so the
    hash certifies merge-closure end to end.

    Scale: one O(rollup) groupBy, exchange keyed (user, day) —
    corpus-size-independent per retention window."""
    from spark_nnd_spark.operators.event_rollup import (  # noqa: PLC0415
        daily_bars_from_rollup,
    )

    return daily_bars_from_rollup(
        spark, _event_rollup_for(spark, sf_dir)
    ).orderBy("user_id", "day_epoch")


# q215's invalidation plant: events with event_id % REFRESH_DEL_MOD == 0
# whose ts lands in [REFRESH_WIN_LO, REFRESH_WIN_HI) are "deleted" from
# the hypertable; the rollup is refreshed over exactly that window.
REFRESH_DEL_MOD = 101
REFRESH_WIN_LO = 1704844800   # 2024-01-10T00:00:00Z (grain-aligned)
REFRESH_WIN_HI = 1705708800   # 2024-01-20T00:00:00Z
_ROLLUP_REFRESH_CACHE: dict[tuple[str, str], str] = {}


def _refreshed_rollup_for(spark: SparkSession, sf_dir: str) -> str:
    """Session-cached rollup that has LIVED the invalidation story:
    built over the full events table, then refreshed over a 10-day
    window after a deterministic slice of that window's events was
    deleted from the source — what q215 serves bars from."""
    from spark_nnd_spark.operators.event_rollup import (  # noqa: PLC0415
        build_event_rollup,
        refresh_event_rollup,
    )
    from spark_nnd_spark.session import session_scratch_dir  # noqa: PLC0415

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _ROLLUP_REFRESH_CACHE:
        path = session_scratch_dir("event_rollup_refresh_")
        e = load_table(spark, sf_dir, "events")
        build_event_rollup(e, path)
        ts_sec = F.col("ts").cast("long")
        in_win = (ts_sec >= REFRESH_WIN_LO) & (ts_sec < REFRESH_WIN_HI)
        deleted = (F.col("event_id") % REFRESH_DEL_MOD == 0) & in_win
        refresh_event_rollup(
            spark, path, e.filter(~deleted), REFRESH_WIN_LO, REFRESH_WIN_HI
        )
        _ROLLUP_REFRESH_CACHE[key] = path
    return _ROLLUP_REFRESH_CACHE[key]


def q215_rollup_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bars served from a rollup AFTER an invalidation refresh
    (operators/event_rollup.refresh_event_rollup — TimescaleDB's
    re-aggregate-the-window answer to source deletions): a
    deterministic slice of a 10-day window's events is deleted from
    the hypertable and exactly that grain-aligned window is
    re-aggregated; buckets outside it keep their original partials.
    The oracle computes the bars directly from the post-deletion
    events table, so the hash certifies BOTH halves — the refreshed
    window matches the modified source AND the untouched buckets
    still match the original — through the driver gate.

    Scale: the refresh re-aggregates one window's events (pruned scan
    on a ts-partitioned hypertable) + an O(rollup) filtered commit;
    the probe stays a rollup-only read."""
    from spark_nnd_spark.operators.event_rollup import ohlc_from_rollup  # noqa: PLC0415

    return ohlc_from_rollup(spark, _refreshed_rollup_for(spark, sf_dir)).orderBy(
        "user_id", "slot_epoch"
    )


def _rollup_refresh_oracle() -> str:
    return f"""
        WITH e AS (
            SELECT user_id,
                   (epoch_us(date_trunc('hour', ts::TIMESTAMP)) // 1000000)
                       AS slot_epoch,
                   CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c,
                   event_id
            FROM events
            WHERE NOT (
                event_id % {REFRESH_DEL_MOD} = 0
                AND (epoch_us(ts::TIMESTAMP) // 1000000) >= {REFRESH_WIN_LO}
                AND (epoch_us(ts::TIMESTAMP) // 1000000) < {REFRESH_WIN_HI}
            )
        )
        SELECT user_id, slot_epoch,
               arg_min(c, event_id) / 100.0 AS open,
               MAX(c) / 100.0 AS high,
               MIN(c) / 100.0 AS low,
               arg_max(c, event_id) / 100.0 AS close,
               COUNT(*) AS n_events
        FROM e GROUP BY 1, 2 ORDER BY user_id, slot_epoch
    """


def q214_rollup_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q206's dense LOCF + interpolation grid served from the stored
    continuous-aggregate rollup: the per-bucket integers the grid
    stage needs (count, exact cents sum) ARE rollup partials, so the
    dashboard is one O(rollup) read + the narrow grid explode — raw
    events never scanned (plan-asserted). The third probe the one
    maintained rollup serves (q212 bars, q213 daily re-buckets, this)
    — the 'one merged statistic powers every dashboard' property that
    makes the family worth persisting (the q194-q197 argument, applied
    to the hypertable). Shares q206's oracle: served == inline is the
    assertion."""
    from spark_nnd_spark.operators.event_rollup import rollup_table  # noqa: PLC0415
    from spark_nnd_spark.operators.events import (  # noqa: PLC0415
        gap_fill_locf_from_buckets,
    )

    hourly = rollup_table(spark, _event_rollup_for(spark, sf_dir)).select(
        "user_id",
        "slot_epoch",
        F.col("n").alias("n_events"),
        F.col("c_sum").alias("_cents"),
    )
    return gap_fill_locf_from_buckets(hourly).orderBy("user_id", "slot_epoch")


def _rollup_daily_oracle() -> str:
    return """
        WITH e AS (
            SELECT user_id,
                   (epoch_us(ts::TIMESTAMP) // 1000000)
                     - (epoch_us(ts::TIMESTAMP) // 1000000) % 86400
                       AS day_epoch,
                   CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c,
                   event_id
            FROM events
        )
        SELECT user_id, day_epoch,
               arg_min(c, event_id) / 100.0 AS open,
               MAX(c) / 100.0 AS high,
               MIN(c) / 100.0 AS low,
               arg_max(c, event_id) / 100.0 AS close,
               COUNT(*) AS n_events,
               SUM(c) / 100.0 AS volume
        FROM e GROUP BY 1, 2 ORDER BY user_id, day_epoch
    """


def _ohlc_bars_oracle() -> str:
    return """
        WITH e AS (
            SELECT user_id,
                   (epoch_us(date_trunc('hour', ts::TIMESTAMP)) // 1000000)
                       AS slot_epoch,
                   CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c,
                   event_id
            FROM events
        )
        SELECT user_id, slot_epoch,
               arg_min(c, event_id) / 100.0 AS open,
               MAX(c) / 100.0 AS high,
               MIN(c) / 100.0 AS low,
               arg_max(c, event_id) / 100.0 AS close,
               COUNT(*) AS n_events
        FROM e GROUP BY user_id, slot_epoch
        ORDER BY user_id, slot_epoch
    """


def _indexed_winnow_oracle() -> str:
    hs = TX.ordered_shingle_hashes_sql("text", WINNOW_N)
    sel = TX.winnow_select_sql("hs", WINNOW_W)
    return f"""
        WITH h AS (
            SELECT doc_id, source, {hs} AS hs FROM documents
        ),
        fp0 AS (
            SELECT doc_id, source, unnest({sel}) AS fp FROM h
        ),
        idx AS (
            SELECT doc_id, fp FROM fp0 WHERE source <> 'src0'
            QUALIFY COUNT(*) OVER (PARTITION BY fp) <= {MAX_SHINGLE_FREQ}
        ),
        b AS (SELECT doc_id, fp FROM fp0 WHERE source = 'src0')
        SELECT b.doc_id AS batch_id, i.doc_id AS index_id,
               COUNT(*) AS n_shared
        FROM b JOIN idx i ON b.fp = i.fp
        GROUP BY 1, 2 HAVING COUNT(*) >= {WINNOW_MIN_SHARED}
        ORDER BY batch_id, index_id
    """


def _gapfill_locf_oracle(grain: int = 3600, user_mod: int | None = None) -> str:
    from spark_nnd_spark.functions.numeric import round_half_up_sql

    v_hour = round_half_up_sql("h.cents / (100.0 * h.n_events)")
    # hourly grain buckets via date_trunc (the operator's fast path);
    # any other grain via epoch-second modulo — mirroring the two
    # branches of operators/events.gap_fill_locf exactly
    bucket = (
        "(epoch_us(date_trunc('hour', ts::TIMESTAMP)) // 1000000)"
        if grain == 3600
        else (
            "((epoch_us(ts::TIMESTAMP) // 1000000)"
            f" - (epoch_us(ts::TIMESTAMP) // 1000000) % {grain})"
        )
    )
    return f"""
        WITH hourly AS (
            SELECT user_id,
                   {bucket}
                       AS slot_epoch,
                   COUNT(*) AS n_events,
                   SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS cents
            FROM events
            WHERE {"TRUE" if user_mod is None else f"user_id % {user_mod} = 0"}
            GROUP BY 1, 2
        ),
        b AS (
            SELECT user_id, MIN(slot_epoch) AS mn, MAX(slot_epoch) AS mx
            FROM hourly GROUP BY 1
        ),
        grid AS (
            SELECT user_id, unnest(range(mn, mx + {grain}, {grain}))
                       AS slot_epoch
            FROM b
        ),
        j AS (
            SELECT g.user_id, g.slot_epoch,
                   COALESCE(h.n_events, 0)::BIGINT AS n_events,
                   {v_hour} AS v_hour
            FROM grid g LEFT JOIN hourly h USING (user_id, slot_epoch)
        ),
        k AS (
            SELECT *,
                   last_value(v_hour IGNORE NULLS) OVER wb AS prev_v,
                   last_value(CASE WHEN v_hour IS NOT NULL THEN slot_epoch END
                              IGNORE NULLS) OVER wb AS prev_t,
                   first_value(v_hour IGNORE NULLS) OVER wf AS next_v,
                   first_value(CASE WHEN v_hour IS NOT NULL THEN slot_epoch END
                               IGNORE NULLS) OVER wf AS next_t
            FROM j
            WINDOW wb AS (PARTITION BY user_id ORDER BY slot_epoch
                          ROWS UNBOUNDED PRECEDING),
                   wf AS (PARTITION BY user_id ORDER BY slot_epoch
                          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT user_id, slot_epoch, n_events, v_hour, prev_v AS v_locf,
               CASE WHEN next_t = prev_t THEN prev_v
                    ELSE {round_half_up_sql(
                        "prev_v + (next_v - prev_v) * "
                        "((slot_epoch - prev_t) / CAST(next_t - prev_t AS DOUBLE))"
                    )} END AS v_lerp
        FROM k ORDER BY user_id, slot_epoch
    """


PIPELINE_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q11_doc_stats": q11_doc_stats,
    "q12_exact_dedup": q12_exact_dedup,
    "q13_fingerprint_dedup": q13_fingerprint_dedup,
    "q14_jaccard_pairs": q14_jaccard_pairs,
    "q15_minhash_signatures": q15_minhash_signatures,
    "q16_minhash_lsh_pairs": q16_minhash_lsh_pairs,
    "q17_simhash_buckets": q17_simhash_buckets,
    "q31_neardup_components": q31_neardup_components,
    "q18_ann_brute_topk": q18_ann_brute_topk,
    "q19_embedding_neardup": q19_embedding_neardup,
    "q27_image_stats": q27_image_stats,
    "q28_frame_sample": q28_frame_sample,
    "q29_audio_stats": q29_audio_stats,
    "q20_sessionize": q20_sessionize,
    "q21_tumbling_counts": q21_tumbling_counts,
    "q22_running_value": q22_running_value,
    "q23_latest_event": q23_latest_event,
    "q32_json_props": q32_json_props,
    "q34_asof_join": q34_asof_join,
    "q35_token_topk": q35_token_topk,
    "q36_lang_bigrams": q36_lang_bigrams,
    "q37_quality_filter": q37_quality_filter,
    "q38_value_quantiles": q38_value_quantiles,
    "q39_tfidf_topk": q39_tfidf_topk,
    "q40_stratified_sample": q40_stratified_sample,
    "q41_rollup_counts": q41_rollup_counts,
    "q42_simhash_neardup": q42_simhash_neardup,
    "q43_nearby_events": q43_nearby_events,
    "q44_label_centroids": q44_label_centroids,
    "q48_event_gaps": q48_event_gaps,
    "q49_pivot_counts": q49_pivot_counts,
    "q50_repetition": q50_repetition,
    "q51_decontaminate": q51_decontaminate,
    "q58_funnel_stages": q58_funnel_stages,
    "q60_unigram_logprob": q60_unigram_logprob,
    "q61_dedup_keep": q61_dedup_keep,
    "q64_minhash_calibration": q64_minhash_calibration,
    "q65_chunk_documents": q65_chunk_documents,
    "q66_pack_sequences": q66_pack_sequences,
    "q68_bm25": q68_bm25,
    "q69_token_budget": q69_token_budget,
    "q70_zipf_head": q70_zipf_head,
    "q71_source_overlap": q71_source_overlap,
    "q72_char_entropy": q72_char_entropy,
    "q73_blocklist_scrub": q73_blocklist_scrub,
    "q74_shingle_novelty": q74_shingle_novelty,
    "q75_filter_cascade": q75_filter_cascade,
    "q76_quantized_topk": q76_quantized_topk,
    "q77_weighted_sample": q77_weighted_sample,
    "q78_contamination_pairs": q78_contamination_pairs,
    "q79_pq_adc_topk": q79_pq_adc_topk,
    "q80_hybrid_rrf": q80_hybrid_rrf,
    "q81_retention_cohorts": q81_retention_cohorts,
    "q82_cluster_sizes": q82_cluster_sizes,
    "q83_incremental_dedup": q83_incremental_dedup,
    "q84_event_anomaly": q84_event_anomaly,
    "q85_type_affinity": q85_type_affinity,
    "q86_lang_confusion": q86_lang_confusion,
    "q87_bigram_lm": q87_bigram_lm,
    "q88_containment_pairs": q88_containment_pairs,
    "q89_length_deciles": q89_length_deciles,
    "q90_event_transitions": q90_event_transitions,
    "q91_winnow_pairs": q91_winnow_pairs,
    "q92_decay_engagement": q92_decay_engagement,
    "q93_token_pmi": q93_token_pmi,
    "q94_group_sample": q94_group_sample,
    "q95_user_lifecycle": q95_user_lifecycle,
    "q96_pagerank": q96_pagerank,
    "q97_cross_modal": q97_cross_modal,
    "q98_cluster_reps": q98_cluster_reps,
    "q99_oov_rate": q99_oov_rate,
    "q100_phash_buckets": q100_phash_buckets,
    "q101_source_drift": q101_source_drift,
    "q102_behavior_entropy": q102_behavior_entropy,
    "q103_indexed_dedup": q103_indexed_dedup,
    "q104_phash_pairs": q104_phash_pairs,
    "q105_indexed_lsh_pairs": q105_indexed_lsh_pairs,
    "q106_indexed_jaccard": q106_indexed_jaccard,
    "q107_indexed_containment": q107_indexed_containment,
    "q108_indexed_bm25": q108_indexed_bm25,
    "q109_kmv_distinct_tokens": q109_kmv_distinct_tokens,
    "q110_scd2_history": q110_scd2_history,
    "q111_model_scores": q111_model_scores,
    "q112_temperature_mix": q112_temperature_mix,
    "q113_shard_assign": q113_shard_assign,
    "q114_mrl_two_stage": q114_mrl_two_stage,
    "q115_bloom_semi_join": q115_bloom_semi_join,
    "q116_two_phase_topk": q116_two_phase_topk,
    "q117_percentile_trim": q117_percentile_trim,
    "q119_hopping_counts": q119_hopping_counts,
    "q120_label_propagation": q120_label_propagation,
    "q121_triangle_counts": q121_triangle_counts,
    "q122_cms_heavy_hitters": q122_cms_heavy_hitters,
    "q123_indexed_mrl": q123_indexed_mrl,
    "q124_partitioned_roundtrip": q124_partitioned_roundtrip,
    "q125_unpivot_measures": q125_unpivot_measures,
    "q126_hist_quantiles": q126_hist_quantiles,
    "q128_repetition_metrics": q128_repetition_metrics,
    "q129_binary_topk": q129_binary_topk,
    "q130_tree_ensemble_scores": q130_tree_ensemble_scores,
    "q131_retracted_probe": q131_retracted_probe,
    "q132_embedding_outliers": q132_embedding_outliers,
    "q133_source_filter_funnel": q133_source_filter_funnel,
    "q134_indexed_binary": q134_indexed_binary,
    "q135_span_scrub": q135_span_scrub,
    "q136_fuzzy_match": q136_fuzzy_match,
    "q137_model_auc": q137_model_auc,
    "q139_calibration_bins": q139_calibration_bins,
    "q140_dsir_weights": q140_dsir_weights,
    "q141_leakage_safe_split": q141_leakage_safe_split,
    "q142_curriculum_order": q142_curriculum_order,
    "q145_kmv_source_jaccard": q145_kmv_source_jaccard,
    "q146_late_interaction": q146_late_interaction,
    "q147_data_card": q147_data_card,
    "q149_budget_mixture": q149_budget_mixture,
    "q150_card_drift": q150_card_drift,
    "q151_pii_audit": q151_pii_audit,
    "q152_bpe_pairs": q152_bpe_pairs,
    "q153_dedup_sweep": q153_dedup_sweep,
    "q154_packing_curve": q154_packing_curve,
    "q155_curation_board": q155_curation_board,
    "q156_exact_spans": q156_exact_spans,
    "q157_bpe_merge_rounds": q157_bpe_merge_rounds,
    "q158_retrieval_eval": q158_retrieval_eval,
    "q159_indexed_board": q159_indexed_board,
    "q160_lr_train_step": q160_lr_train_step,
    "q161_indexed_sweep": q161_indexed_sweep,
    "q162_indexed_spans": q162_indexed_spans,
    "q163_bpe_encode_stats": q163_bpe_encode_stats,
    "q164_dup_flow": q164_dup_flow,
    "q165_lm_perplexity": q165_lm_perplexity,
    "q166_decontam_report": q166_decontam_report,
    "q167_span_removal": q167_span_removal,
    "q168_indexed_phash": q168_indexed_phash,
    "q169_lr_train_curve": q169_lr_train_curve,
    "q170_model_board": q170_model_board,
    "q171_ref_lm_buckets": q171_ref_lm_buckets,
    "q172_indexed_scrub": q172_indexed_scrub,
    "q173_pack_manifest": q173_pack_manifest,
    "q174_dedup_weights": q174_dedup_weights,
    "q175_boilerplate_ngrams": q175_boilerplate_ngrams,
    "q181_gate_ablation": q181_gate_ablation,
    "q182_pack_export": q182_pack_export,
    "q183_zipf_fit": q183_zipf_fit,
    "q184_heaps_fit": q184_heaps_fit,
    "q186_chunk_export": q186_chunk_export,
    "q187_retrieval_negatives": q187_retrieval_negatives,
    "q188_source_divergence": q188_source_divergence,
    "q189_quality_select": q189_quality_select,
    "q190_corpus_export": q190_corpus_export,
    "q191_chunk_bm25": q191_chunk_bm25,
    "q192_model_calibration": q192_model_calibration,
    "q193_length_buckets": q193_length_buckets,
    "q194_indexed_divergence": q194_indexed_divergence,
    "q195_indexed_perplexity": q195_indexed_perplexity,
    "q196_indexed_dsir": q196_indexed_dsir,
    "q197_indexed_ref_lm": q197_indexed_ref_lm,
    "q198_indexed_chunk_bm25": q198_indexed_chunk_bm25,
    "q203_domain_quality": q203_domain_quality,
    "q204_domain_blocklist": q204_domain_blocklist,
    "q205_indexed_winnow": q205_indexed_winnow,
    "q206_gapfill_locf": q206_gapfill_locf,
    "q210_gapfill_grain": q210_gapfill_grain,
    "q207_ohlc_bars": q207_ohlc_bars,
    "q212_rollup_ohlc": q212_rollup_ohlc,
    "q213_rollup_daily": q213_rollup_daily,
    "q214_rollup_gapfill": q214_rollup_gapfill,
    "q215_rollup_refresh": q215_rollup_refresh,
    "q209_indexed_winnow_pairs": q209_indexed_winnow_pairs,
}


def _cc_ctes(sh: str, mh: str) -> str:
    """Shared recursive-CTE prefix: MinHash-LSH candidate pairs →
    Jaccard verify → transitive closure (``reach``). q31 reads the
    component labels off it; q61 layers the keep/drop verdict on top."""
    return f"""
            WITH RECURSIVE sigs AS (SELECT doc_id, {mh} AS mh, {sh} AS s FROM documents),
            banded0 AS (
                SELECT doc_id, b.range AS band,
                       mh[b.range * 4 + 1 : b.range * 4 + 4] AS bsig, s
                FROM sigs, range(0, 4) b
            ),
            banded AS (
                SELECT * FROM banded0
                QUALIFY COUNT(*) OVER (PARTITION BY band, bsig) <= {MAX_BAND_FREQ}
            ),
            cand AS (
                SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
                FROM banded x JOIN banded y
                  ON x.band = y.band AND x.bsig = y.bsig AND x.doc_id < y.doc_id
            ),
            pairs AS (
                SELECT id_a, id_b
                FROM cand JOIN sigs a ON id_a = a.doc_id JOIN sigs b ON id_b = b.doc_id
                WHERE len(list_intersect(a.s, b.s)) * 1.0
                      / len(list_distinct(a.s || b.s)) >= 0.2
            ),
            e AS (SELECT id_a AS s, id_b AS d FROM pairs
                  UNION ALL SELECT id_b, id_a FROM pairs),
            reach AS (
                SELECT s, d FROM e
                UNION
                SELECT r.s, e2.d FROM reach r JOIN e e2 ON r.d = e2.s
            )"""


def _lsh_pairs_core_sql(sh: str, mh: str) -> str:
    """The q16 MinHash-LSH verified-pairs pipeline as reusable SQL
    (no final ORDER BY) — q16 orders it directly; q71 wraps it as a
    CTE for the per-source-pair overlap matrix."""
    return f"""
            WITH sigs AS (SELECT doc_id, {mh} AS mh, {sh} AS s FROM documents),
            banded0 AS (
                SELECT doc_id, b.range AS band,
                       mh[b.range * 4 + 1 : b.range * 4 + 4] AS bsig, s
                FROM sigs, range(0, 4) b
            ),
            -- hot-bucket skew guard, mirroring minhash_lsh_pairs(max_band_freq)
            banded AS (
                SELECT * FROM banded0
                QUALIFY COUNT(*) OVER (PARTITION BY band, bsig) <= {MAX_BAND_FREQ}
            ),
            cand AS (
                SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
                FROM banded x JOIN banded y
                  ON x.band = y.band AND x.bsig = y.bsig AND x.doc_id < y.doc_id
            ),
            sh2 AS (SELECT doc_id, s FROM sigs)
            SELECT id_a, id_b,
                   round(len(list_intersect(a.s, b.s)) * 1.0
                         / len(list_distinct(a.s || b.s)), 6) AS jaccard
            FROM cand JOIN sh2 a ON id_a = a.doc_id JOIN sh2 b ON id_b = b.doc_id
            WHERE len(list_intersect(a.s, b.s)) * 1.0 / len(list_distinct(a.s || b.s)) >= 0.2
    """


def _pipeline_oracles() -> dict[str, str]:
    sh = TX.shingles_sql("text", 3)
    mh = TX.minhash_sql("text", 16, 3)
    cos = (
        "round(list_sum(list_transform(range(1, len(qv)+1), i -> qv[i]*cv[i]))"
        " / (sqrt(list_sum(list_transform(range(1, len(qv)+1), i -> qv[i]*qv[i])))"
        " * sqrt(list_sum(list_transform(range(1, len(cv)+1), i -> cv[i]*cv[i])))), 6)"
    )
    cos_raw = (
        "list_sum(list_transform(range(1, len(qv)+1), i -> qv[i]*cv[i]))"
        " / (sqrt(list_sum(list_transform(range(1, len(qv)+1), i -> qv[i]*qv[i])))"
        " * sqrt(list_sum(list_transform(range(1, len(cv)+1), i -> cv[i]*cv[i]))))"
    )
    return {
        "q11_doc_stats": f"""
            SELECT doc_id,
                   {TX.token_count_sql()} AS n_tokens,
                   {TX.fingerprint_sql()} AS fingerprint,
                   round({TX.stopword_ratio_sql()}, 6) AS stopword_ratio,
                   round({TX.avg_token_len_sql()}, 6) AS avg_token_len,
                   round({TX.type_token_ratio_sql()}, 6) AS type_token_ratio,
                   {TX.predicted_lang_sql()} AS pred_lang
            FROM documents ORDER BY doc_id
        """,
        "q12_exact_dedup": """
            SELECT md5(text) AS digest, MIN(doc_id) AS doc_id, COUNT(*) AS dup_count
            FROM documents GROUP BY md5(text) ORDER BY digest
        """,
        "q13_fingerprint_dedup": f"""
            SELECT {TX.fingerprint_sql()} AS fp, MIN(doc_id) AS doc_id, COUNT(*) AS dup_count
            FROM documents GROUP BY 1 ORDER BY fp
        """,
        "q14_jaccard_pairs": f"""
            WITH sh AS (SELECT doc_id, {sh} AS s FROM documents),
            posts0 AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
            -- df-cut skew guard, mirroring jaccard_pairs(max_shingle_freq)
            posts AS (
                SELECT doc_id, shingle FROM posts0
                QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= {MAX_SHINGLE_FREQ}
            ),
            inter AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
                FROM posts a JOIN posts b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            ),
            sizes AS (SELECT doc_id, len(s) AS n FROM sh)
            SELECT id_a, id_b, round(i * 1.0 / (na.n + nb.n - i), 6) AS jaccard
            FROM inter
            JOIN sizes na ON id_a = na.doc_id
            JOIN sizes nb ON id_b = nb.doc_id
            WHERE i * 1.0 / (na.n + nb.n - i) >= 0.2
            ORDER BY id_a, id_b
        """,
        "q15_minhash_signatures": f"""
            WITH sigs AS (SELECT doc_id, {mh} AS mh FROM documents)
            SELECT doc_id, t.range AS hash_idx, mh[t.range + 1] AS h
            FROM sigs, range(0, 16) t ORDER BY doc_id, hash_idx
        """,
        "q16_minhash_lsh_pairs": _lsh_pairs_core_sql(sh, mh) + " ORDER BY id_a, id_b",
        "q17_simhash_buckets": None,  # filled below (needs dedup.simhash_sql)
        "q31_neardup_components": _cc_ctes(sh, mh) + """
            SELECT s AS doc_id, least(s, min(d)) AS component
            FROM reach GROUP BY s ORDER BY doc_id
        """,
        "q61_dedup_keep": _cc_ctes(sh, mh) + """,
            comp AS (
                SELECT s AS doc_id, least(s, min(d)) AS component
                FROM reach GROUP BY s
            )
            SELECT d.doc_id,
                   (c.component IS NULL OR c.component = d.doc_id) AS keep
            FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
            ORDER BY d.doc_id
        """,
        "q18_ann_brute_topk": f"""
            WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                       FROM embeddings WHERE vec_id < 10),
            c AS (SELECT vec_id AS nb_id, embedding::DOUBLE[] AS cv FROM embeddings),
            scored AS (
                SELECT query_id, nb_id, {cos_raw} AS cosine
                FROM c CROSS JOIN q WHERE query_id <> nb_id
            ),
            ranked AS (
                SELECT query_id, nb_id, cosine,
                       ROW_NUMBER() OVER (PARTITION BY query_id
                                          ORDER BY cosine DESC, nb_id) AS rank
                FROM scored
            )
            SELECT query_id, nb_id, rank, round(cosine, 6) AS cosine
            FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
        """,
        "q19_embedding_neardup": f"""
            WITH t AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_sum(list_transform(range(1, len(a.v)+1), i -> a.v[i]*b.v[i]))
                         / (sqrt(list_sum(list_transform(range(1, len(a.v)+1), i -> a.v[i]*a.v[i])))
                          * sqrt(list_sum(list_transform(range(1, len(b.v)+1), i -> b.v[i]*b.v[i])))), 6)
                   AS cosine
            FROM t a JOIN t b ON a.vec_id < b.vec_id
            WHERE list_sum(list_transform(range(1, len(a.v)+1), i -> a.v[i]*b.v[i]))
                  / (sqrt(list_sum(list_transform(range(1, len(a.v)+1), i -> a.v[i]*a.v[i])))
                   * sqrt(list_sum(list_transform(range(1, len(b.v)+1), i -> b.v[i]*b.v[i])))) >= 0.45
            ORDER BY id_a, id_b
        """,
        # Multimodal raw-codec oracles: ASCII text ⇒ UTF-8 byte i ==
        # unicode(substr(text, i, 1)); integer byte sums are exact in
        # float64 on both engines, so means match bit-for-bit and only
        # the (rounded) second moments carry float noise.
        "q27_image_stats": """
            WITH px AS (
                SELECT doc_id, len(text) AS n_bytes,
                       list_transform(range(1, 257),
                           i -> CASE WHEN i <= len(text)
                                     THEN unicode(substr(text, i, 1))
                                     ELSE 0 END) AS p
                FROM documents
            )
            SELECT doc_id, n_bytes,
                   round(list_avg(p), 4) AS mean_px,
                   round(sqrt(list_avg(list_transform(p, x -> (x - list_avg(p)) * (x - list_avg(p))))), 4) AS std_px
            FROM px ORDER BY doc_id
        """,
        "q28_frame_sample": """
            WITH f AS (
                SELECT doc_id, text,
                       unnest(list_filter(range(0, len(text) // 64),
                                          i -> i % 4 = 0)) AS frame_idx
                FROM documents
            )
            SELECT doc_id, frame_idx,
                   md5(substr(text, frame_idx * 64 + 1, 64)) AS frame_digest
            FROM f ORDER BY doc_id, frame_idx
        """,
        "q29_audio_stats": """
            WITH s AS (
                SELECT doc_id,
                       list_transform(range(1, len(text) // 2 + 1),
                           i -> unicode(substr(text, 2*i - 1, 1))
                                + 256 * unicode(substr(text, 2*i, 1))) AS v
                FROM documents
            ),
            c AS (SELECT doc_id, len(v) AS n_samples, list_avg(v) AS m, v FROM s)
            SELECT doc_id, n_samples,
                   round(sqrt(list_avg(list_transform(v, x -> (x - m) * (x - m)))), 4) AS rms,
                   len(list_filter(range(1, n_samples),
                                   i -> (v[i] - m) * (v[i + 1] - m) < 0)) AS zero_crossings
            FROM c ORDER BY doc_id
        """,
        "q20_sessionize": """
            WITH g AS (
                SELECT user_id, ts, event_id,
                       CASE WHEN (epoch_us(ts::TIMESTAMP) // 1000000)
                                 - LAG((epoch_us(ts::TIMESTAMP) // 1000000)) OVER w IS NULL
                              OR (epoch_us(ts::TIMESTAMP) // 1000000)
                                 - LAG((epoch_us(ts::TIMESTAMP) // 1000000)) OVER w > 1800
                            THEN 1 ELSE 0 END AS is_break
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id)
            ),
            s AS (
                SELECT user_id, ts,
                       -- CAST: DuckDB SUM(int) yields HUGEINT, which round-trips
                       -- through pandas/arrow as float64 and breaks value-hash
                       -- comparison against Spark's BIGINT.
                       CAST(SUM(is_break) OVER (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id
                                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
                FROM g
            )
            SELECT user_id, session_id, COUNT(*) AS n_events,
                   MIN(epoch_us(ts::TIMESTAMP) // 1000000) AS t_start_epoch,
                   MAX(epoch_us(ts::TIMESTAMP) // 1000000) AS t_end_epoch
            FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id
        """,
        "q21_tumbling_counts": """
            SELECT (epoch_us(date_trunc('hour', ts::TIMESTAMP)) // 1000000) AS w_start_epoch, event_type,
                   COUNT(*) AS c, SUM(value::DECIMAL(18,2))::VARCHAR AS v
            FROM events GROUP BY 1, 2 ORDER BY w_start_epoch, event_type
        """,
        "q22_running_value": """
            SELECT user_id, event_id,
                   SUM(value::DECIMAL(18,2)) OVER (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id
                                                   ROWS UNBOUNDED PRECEDING)::VARCHAR
                   AS running_value
            FROM events ORDER BY user_id, event_id
        """,
        "q35_token_topk": f"""
            WITH toks AS (SELECT unnest({TX.tokens_sql()}) AS token FROM documents)
            SELECT token, COUNT(*) AS n FROM toks WHERE token <> ''
            GROUP BY token ORDER BY n DESC, token LIMIT 50
        """,
        "q36_lang_bigrams": f"""
            WITH t AS (SELECT {TX.predicted_lang_sql()} AS lang,
                              {TX.tokens_sql()} AS toks FROM documents),
            bg AS (
                SELECT lang,
                       unnest(list_transform(range(1, len(toks)),
                                             i -> toks[i] || ' ' || toks[i + 1]))
                       AS bigram
                FROM t
            ),
            counts AS (SELECT lang, bigram, COUNT(*) AS n FROM bg GROUP BY lang, bigram)
            SELECT lang,
                   ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, bigram) AS rank,
                   bigram, n
            FROM counts
            QUALIFY rank <= 10
            ORDER BY lang, rank
        """,
        "q37_quality_filter": f"""
            SELECT doc_id,
                   {TX.token_count_sql()} AS n_tokens,
                   round({TX.stopword_ratio_sql()}, 6) AS stopword_ratio,
                   round({TX.type_token_ratio_sql()}, 6) AS type_token_ratio,
                   ({TX.token_count_sql()} >= 5
                    AND {TX.stopword_ratio_sql()} <= 0.6
                    AND {TX.type_token_ratio_sql()} >= 0.3) AS keep
            FROM documents ORDER BY doc_id
        """,
        "q38_value_quantiles": """
            SELECT event_type, COUNT(*) AS n,
                   round(quantile_cont(value, 0.5), 6) AS p50,
                   round(quantile_cont(value, 0.9), 6) AS p90,
                   round(quantile_cont(value, 0.99), 6) AS p99
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "q34_asof_join": """
            WITH r0 AS (SELECT user_id, ts::TIMESTAMP AS ts, value, event_id
                        FROM events WHERE event_type = 'purchase'),
            r AS (SELECT user_id, ts, value FROM r0
                  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                             ORDER BY event_id DESC) = 1),
            l AS (SELECT event_id, user_id, ts::TIMESTAMP AS ts
                  FROM events WHERE event_type = 'click')
            SELECT l.event_id, l.user_id,
                   (epoch_us(l.ts) // 1000000)::BIGINT AS ts_epoch,
                   round(r.value, 6) AS purchase_value,
                   (epoch_us(r.ts) // 1000000)::BIGINT AS purchase_ts_epoch
            FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
            ORDER BY event_id
        """,
        "q32_json_props": """
            SELECT event_type, COUNT(*) AS c,
                   CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
                   MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_min,
                   MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "q23_latest_event": """
            SELECT user_id, event_id, (epoch_us(ts::TIMESTAMP) // 1000000) AS ts_epoch, event_type,
                   round(value, 6) AS value
            FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                             ORDER BY ts::TIMESTAMP DESC, event_id DESC) AS rn
                FROM events
            ) WHERE rn = 1 ORDER BY user_id
        """,
    }


def pipeline_oracles() -> dict[str, str]:
    from spark_nnd_spark.operators import sampling as SA
    from spark_nnd_spark.operators import sketches as SKM
    from spark_nnd_spark.operators.dedup import SIMHASH_BANDS, simhash_sql

    oracles = _pipeline_oracles()
    sh = TX.shingles_sql("text", 3)
    mh = TX.minhash_sql("text", 16, 3)
    oracles["q17_simhash_buckets"] = f"""
        SELECT {simhash_sql()} AS simhash, MIN(doc_id) AS doc_id,
               COUNT(*) AS bucket_size
        FROM documents GROUP BY 1 ORDER BY simhash
    """
    oracles["q39_tfidf_topk"] = f"""
        WITH toks AS (
            SELECT doc_id, unnest({TX.tokens_sql()}) AS token FROM documents
        ),
        tf AS (
            SELECT doc_id, token, COUNT(*) AS tf FROM toks
            WHERE token != '' GROUP BY 1, 2
        ),
        dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
            SELECT doc_id, token, tf, df, tf * ln(n_docs / df) AS score
            FROM tf JOIN dfreq USING (token) CROSS JOIN n
        ),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                         ORDER BY score DESC, token) AS rank
            FROM scored
        )
        SELECT doc_id, rank, token, tf, df, round(score, 6) AS tfidf
        FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank
    """
    oracles["q40_stratified_sample"] = f"""
        SELECT doc_id, lang, source FROM documents
        WHERE {SA.sample_key_sql('doc_id')}
              < {SA.stratified_threshold_sql(Q40_RATES, 'lang')}
        ORDER BY doc_id
    """
    oracles["q41_rollup_counts"] = """
        SELECT COALESCE(event_type, 'ALL') AS event_type,
               COALESCE(hod, -1) AS hod,
               CAST(GROUPING(event_type) AS INT) AS g_type,
               CAST(GROUPING(hod) AS INT) AS g_hod,
               COUNT(*) AS c,
               SUM(value::DECIMAL(18,2))::VARCHAR AS v
        FROM (SELECT event_type, hour(ts::TIMESTAMP) AS hod, value FROM events)
        GROUP BY ROLLUP(event_type, hod)
        ORDER BY event_type, hod
    """
    oracles["q42_simhash_neardup"] = f"""
        WITH sims AS (SELECT doc_id AS id, {simhash_sql()} AS sh FROM documents),
        bands AS (
            SELECT id, sh, j, (sh // CAST(pow(2, 8 * j) AS BIGINT)) % 256 AS band_val
            FROM sims, (SELECT unnest(range(0, {SIMHASH_BANDS})) AS j)
        ),
        kept AS (
            SELECT * FROM (
                SELECT *, COUNT(*) OVER (PARTITION BY j, band_val) AS bf FROM bands
            ) WHERE bf <= 50
        ),
        cand AS (
            SELECT DISTINCT x.id AS id_a, y.id AS id_b, x.sh AS sh_a, y.sh AS sh_b
            FROM kept x JOIN kept y
              ON x.j = y.j AND x.band_val = y.band_val AND x.id < y.id
        )
        SELECT id_a, id_b, CAST(bit_count(xor(sh_a, sh_b)) AS INT) AS hamming
        FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 3
        ORDER BY id_a, id_b
    """
    oracles["q43_nearby_events"] = """
        SELECT a.event_id, a.user_id,
               (epoch_us(a.ts::TIMESTAMP) // 1000000) AS ts_epoch,
               COUNT(b.event_id) AS n_nearby
        FROM events a LEFT JOIN events b
          ON a.user_id = b.user_id AND b.event_id <> a.event_id
         AND (epoch_us(b.ts::TIMESTAMP) // 1000000)
             BETWEEN (epoch_us(a.ts::TIMESTAMP) // 1000000) - 300
                 AND (epoch_us(a.ts::TIMESTAMP) // 1000000) + 300
        GROUP BY 1, 2, 3 ORDER BY a.event_id
    """
    oracles["q44_label_centroids"] = """
        SELECT label, i, round(avg(CAST(embedding[i + 1] AS DOUBLE)), 6) AS centroid,
               COUNT(*) AS n
        FROM embeddings,
             (SELECT unnest(range(0, (SELECT len(embedding) FROM embeddings LIMIT 1))) AS i)
        GROUP BY label, i ORDER BY label, i
    """
    oracles["q48_event_gaps"] = """
        WITH gaps AS (
            SELECT event_type,
                   (epoch_us(ts::TIMESTAMP) // 1000000)
                   - LAG(epoch_us(ts::TIMESTAMP) // 1000000)
                     OVER (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id) AS gap
            FROM events
        )
        SELECT event_type, COUNT(*) AS n,
               round(quantile_cont(gap, 0.5), 6) AS gap_p50,
               round(quantile_cont(gap, 0.9), 6) AS gap_p90,
               MAX(gap) AS gap_max
        FROM gaps WHERE gap IS NOT NULL
        GROUP BY event_type ORDER BY event_type
    """
    counts = ", ".join(
        f"COUNT(CASE WHEN event_type = '{t}' THEN 1 END) AS {t}" for t in EVENT_TYPES
    )
    oracles["q49_pivot_counts"] = f"""
        SELECT user_id, {counts}
        FROM events GROUP BY user_id ORDER BY user_id
    """
    oracles["q50_repetition"] = f"""
        SELECT doc_id,
               greatest({TX.token_count_sql()} - 2, 0) AS n_shingle_slots,
               len({TX.shingles_sql('text', 3)}) AS n_distinct_shingles,
               round(CASE WHEN greatest({TX.token_count_sql()} - 2, 0) > 0
                          THEN 1 - len({TX.shingles_sql('text', 3)})
                               / greatest({TX.token_count_sql()} - 2, 0)
                          ELSE 0.0 END, 6) AS dup_fraction,
               (CASE WHEN greatest({TX.token_count_sql()} - 2, 0) > 0
                     THEN 1 - len({TX.shingles_sql('text', 3)})
                          / greatest({TX.token_count_sql()} - 2, 0)
                     ELSE 0.0 END) > 0.2 AS repetitive
        FROM documents ORDER BY doc_id
    """
    oracles["q51_decontaminate"] = f"""
        WITH bench AS (
            SELECT DISTINCT unnest({TX.shingles_sql('text', 5)}) AS shingle
            FROM documents WHERE doc_id < {Q51_BENCH_MAX_ID}
        ),
        posts AS (
            SELECT doc_id, unnest({TX.shingles_sql('text', 5)}) AS shingle
            FROM documents WHERE doc_id >= {Q51_BENCH_MAX_ID}
        ),
        hits AS (
            SELECT doc_id, COUNT(*) AS n_hits
            FROM posts JOIN bench USING (shingle) GROUP BY doc_id
        )
        SELECT d.doc_id, COALESCE(h.n_hits, 0) AS n_hits,
               COALESCE(h.n_hits, 0) > 0 AS contaminated
        FROM documents d LEFT JOIN hits h USING (doc_id)
        WHERE d.doc_id >= {Q51_BENCH_MAX_ID}
        ORDER BY d.doc_id
    """
    oracles["q58_funnel_stages"] = """
        WITH b AS (
            SELECT user_id, event_id, ts::TIMESTAMP AS ts, event_type FROM events
        ),
        c0 AS (
            SELECT *, MIN(CASE WHEN event_type = 'view' THEN ts END)
                      OVER w AS cum_view
            FROM b
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING)
        ),
        c1 AS (
            SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > cum_view
                               THEN ts END) OVER w AS cum_click
            FROM c0
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING)
        ),
        c2 AS (
            SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > cum_click
                               THEN ts END) OVER w AS cum_purchase
            FROM c1
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING)
        ),
        agg AS (
            SELECT user_id,
                   (epoch_us(MIN(cum_view)) // 1000000)::BIGINT AS t_view_epoch,
                   (epoch_us(MIN(cum_click)) // 1000000)::BIGINT AS t_click_epoch,
                   (epoch_us(MIN(cum_purchase)) // 1000000)::BIGINT AS t_purchase_epoch
            FROM c2 GROUP BY user_id
        )
        SELECT user_id,
               (CASE WHEN t_purchase_epoch IS NOT NULL THEN 3
                     WHEN t_click_epoch IS NOT NULL THEN 2
                     WHEN t_view_epoch IS NOT NULL THEN 1
                     ELSE 0 END)::BIGINT AS stage,
               t_view_epoch, t_click_epoch, t_purchase_epoch
        FROM agg ORDER BY user_id
    """
    oracles["q60_unigram_logprob"] = f"""
        WITH toks AS (
            SELECT doc_id, unnest({TX.tokens_sql()}) AS token FROM documents
        ),
        t2 AS (SELECT doc_id, token FROM toks WHERE token <> ''),
        vocab AS (SELECT token, COUNT(*) AS cnt FROM t2 GROUP BY token),
        tot AS (SELECT SUM(cnt)::DOUBLE AS total FROM vocab),
        scored AS (
            SELECT doc_id, ln(cnt / total) AS lp
            FROM t2 JOIN vocab USING (token) CROSS JOIN tot
        )
        SELECT doc_id, COUNT(*) AS n_tokens,
               round(SUM(lp) / COUNT(*), 6) AS avg_logprob
        FROM scored GROUP BY doc_id ORDER BY doc_id
    """
    oracles["q64_minhash_calibration"] = f"""
        WITH sigs AS (SELECT doc_id, {mh} AS mh, {sh} AS s FROM documents),
        banded0 AS (
            SELECT doc_id, b.range AS band,
                   mh[b.range * 4 + 1 : b.range * 4 + 4] AS bsig
            FROM sigs, range(0, 4) b
        ),
        banded AS (
            SELECT * FROM banded0
            QUALIFY COUNT(*) OVER (PARTITION BY band, bsig) <= {MAX_BAND_FREQ}
        ),
        cand AS (
            SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
            FROM banded x JOIN banded y
              ON x.band = y.band AND x.bsig = y.bsig AND x.doc_id < y.doc_id
        )
        SELECT id_a, id_b,
               round(len(list_filter(range(1, 17), i -> a.mh[i] = b.mh[i])) / 16.0, 6)
                   AS est_jaccard,
               round(len(list_intersect(a.s, b.s)) * 1.0
                     / len(list_distinct(a.s || b.s)), 6) AS jaccard
        FROM cand JOIN sigs a ON id_a = a.doc_id JOIN sigs b ON id_b = b.doc_id
        ORDER BY id_a, id_b
    """
    oracles["q65_chunk_documents"] = f"""
        WITH t AS (
            SELECT doc_id, {TX.tokens_sql()} AS toks FROM documents
        ),
        c AS (
            SELECT doc_id, toks,
                   UNNEST(range(0, greatest(
                       CAST(ceil((len(toks) - {CHUNK_TOKENS}) / {CHUNK_STRIDE}.0) AS BIGINT) + 1,
                       1))) AS chunk_idx
            FROM t WHERE len(toks) > 0
        )
        SELECT doc_id, chunk_idx,
               len(toks[chunk_idx * {CHUNK_STRIDE} + 1 : chunk_idx * {CHUNK_STRIDE} + {CHUNK_TOKENS}])::BIGINT AS n_tokens,
               array_to_string(toks[chunk_idx * {CHUNK_STRIDE} + 1 : chunk_idx * {CHUNK_STRIDE} + {CHUNK_TOKENS}], ' ') AS chunk_text
        FROM c ORDER BY doc_id, chunk_idx
    """
    oracles["q66_pack_sequences"] = f"""
        SELECT source, doc_id,
               len({TX.tokens_sql()})::BIGINT AS n_tokens,
               ((SUM(len({TX.tokens_sql()})) OVER w - len({TX.tokens_sql()}))
                    // {PACK_CONTEXT})::BIGINT AS pack_id,
               CAST(SUM(len({TX.tokens_sql()})) OVER w - len({TX.tokens_sql()}) AS BIGINT)
                   AS pack_offset
        FROM documents
        WINDOW w AS (PARTITION BY source ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
        ORDER BY source, doc_id
    """
    terms = ",".join(f"'{t}'" for t in BM25_QUERY)
    k1, b = BM25_K1, BM25_B
    oracles["q68_bm25"] = f"""
        WITH toks AS (
            SELECT doc_id, len({TX.tokens_sql()})::DOUBLE AS dl,
                   unnest({TX.tokens_sql()}) AS token
            FROM documents
        ),
        tf AS (
            SELECT doc_id, token, dl, COUNT(*) AS tf
            FROM toks WHERE token IN ({terms})
            GROUP BY doc_id, token, dl
        ),
        dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
        stats AS (SELECT COUNT(*)::DOUBLE AS n_docs,
                         AVG(len({TX.tokens_sql()})) AS avgdl
                  FROM documents),
        scored AS (
            SELECT doc_id,
                   SUM(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                       * (tf * ({k1} + 1)
                          / (tf + {k1} * (1 - {b} + {b} * dl / avgdl)))) AS score,
                   COUNT(*) AS n_terms
            FROM tf JOIN dfreq USING (token) CROSS JOIN stats
            GROUP BY doc_id
        )
        SELECT doc_id, n_terms, round(score, 6) AS score
        FROM scored ORDER BY score DESC, doc_id LIMIT {BM25_TOPN}
    """
    from spark_nnd_spark.functions.numeric import round_half_up_sql

    oracles["q69_token_budget"] = f"""
        WITH per AS (
            SELECT source, lang,
                   len(list_filter({TX.tokens_sql()}, t -> t <> '')) AS ntok
            FROM documents
        ),
        agg AS (
            SELECT source, lang, COUNT(*) AS docs,
                   CAST(SUM(ntok) AS BIGINT) AS tokens
            FROM per GROUP BY source, lang
        ),
        tot AS (SELECT SUM(tokens)::DOUBLE AS corpus_tokens FROM agg)
        SELECT source, lang, docs, tokens,
               {round_half_up_sql("tokens / corpus_tokens")} AS token_share
        FROM agg CROSS JOIN tot
        ORDER BY source, lang
    """
    oracles["q70_zipf_head"] = f"""
        WITH toks AS (SELECT unnest({TX.tokens_sql()}) AS token FROM documents),
        counts AS (
            SELECT token, COUNT(*) AS n FROM toks WHERE token <> ''
            GROUP BY token
        ),
        tot AS (SELECT SUM(n)::DOUBLE AS corpus_tokens FROM counts),
        top AS (
            SELECT token, n,
                   ROW_NUMBER() OVER (ORDER BY n DESC, token) AS rank
            FROM counts ORDER BY n DESC, token LIMIT {ZIPF_TOPN}
        )
        SELECT token, n, rank,
               {round_half_up_sql(
                   "SUM(n) OVER (ORDER BY n DESC, token ROWS UNBOUNDED PRECEDING)"
                   " / corpus_tokens"
               )} AS cum_share
        FROM top CROSS JOIN tot
        ORDER BY rank
    """
    oracles["q71_source_overlap"] = f"""
        WITH pairs AS ({_lsh_pairs_core_sql(sh, mh)})
        SELECT least(da.source, db.source) AS source_a,
               greatest(da.source, db.source) AS source_b,
               COUNT(*) AS n_pairs
        FROM pairs p
        JOIN documents da ON p.id_a = da.doc_id
        JOIN documents db ON p.id_b = db.doc_id
        GROUP BY 1, 2
        ORDER BY source_a, source_b
    """
    oracles["q72_char_entropy"] = f"""
        WITH c AS (
            SELECT doc_id, string_split(text, '') AS chars FROM documents
        ),
        d2 AS (
            SELECT doc_id, chars,
                   list_sort(list_distinct(chars)) AS alphabet,
                   len(chars)::DOUBLE AS total
            FROM c
        )
        SELECT doc_id,
               len(alphabet)::BIGINT AS n_distinct_chars,
               {round_half_up_sql(
                   "-list_sum(list_transform(alphabet, ch ->"
                   " (len(list_filter(chars, x -> x = ch)) / total)"
                   " * ln(len(list_filter(chars, x -> x = ch)) / total)))"
               )} AS entropy
        FROM d2 ORDER BY doc_id
    """
    oracles["q73_blocklist_scrub"] = f"""
        SELECT doc_id,
               len(regexp_extract_all(text, '{BLOCKLIST_PATTERN}'))::BIGINT
                   AS n_blocked,
               md5(regexp_replace(text, '{BLOCKLIST_PATTERN}', '[X]', 'g'))
                   AS redacted_md5
        FROM documents ORDER BY doc_id
    """
    oracles["q74_shingle_novelty"] = f"""
        WITH srcsh AS (
            SELECT DISTINCT source, shingle FROM (
                SELECT source, unnest({TX.shingles_sql()}) AS shingle
                FROM documents
            )
        ),
        nsrc AS (SELECT shingle, COUNT(*) AS nsrc FROM srcsh GROUP BY shingle)
        SELECT source,
               COUNT(*)::BIGINT AS n_shingles,
               CAST(SUM(CASE WHEN nsrc = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_unique,
               {round_half_up_sql(
                   "SUM(CASE WHEN nsrc = 1 THEN 1 ELSE 0 END)"
                   " / COUNT(*)::DOUBLE"
               )} AS novelty
        FROM srcsh JOIN nsrc USING (shingle)
        GROUP BY source ORDER BY source
    """
    oracles["q75_filter_cascade"] = f"""
        WITH b AS (
            SELECT ({TX.token_count_sql()} >= {CASCADE_MIN_TOKENS}) AS b1,
                   ({TX.stopword_ratio_sql()} <= 0.6) AS b2,
                   ({TX.type_token_ratio_sql()} >= 0.3) AS b3,
                   ({TX.predicted_lang_sql()} = 'en') AS b4
            FROM documents
        ),
        s AS (
            SELECT COUNT(*)::BIGINT AS n0,
                   CAST(SUM(CASE WHEN b1 THEN 1 ELSE 0 END) AS BIGINT) AS p1,
                   CAST(SUM(CASE WHEN b1 AND b2 THEN 1 ELSE 0 END) AS BIGINT) AS p2,
                   CAST(SUM(CASE WHEN b1 AND b2 AND b3 THEN 1 ELSE 0 END) AS BIGINT) AS p3,
                   CAST(SUM(CASE WHEN b1 AND b2 AND b3 AND b4 THEN 1 ELSE 0 END) AS BIGINT) AS p4
            FROM b
        )
        SELECT 1::BIGINT AS stage, 'min_tokens' AS gate,
               n0 AS n_in, p1 AS n_pass, n0 - p1 AS n_fail FROM s
        UNION ALL SELECT 2, 'stopword_ratio', p1, p2, p1 - p2 FROM s
        UNION ALL SELECT 3, 'type_token_ratio', p2, p3, p2 - p3 FROM s
        UNION ALL SELECT 4, 'lang_en', p3, p4, p3 - p4 FROM s
        ORDER BY stage
    """
    oracles["q76_quantized_topk"] = """
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        s AS (
            SELECT vec_id, v,
                   greatest(list_max(list_transform(v, x -> abs(x))) / 127.0,
                            1e-12) AS sc
            FROM e
        ),
        z AS (
            SELECT vec_id,
                   list_transform(v, x -> CAST(floor(x / sc + 0.5) AS BIGINT)) AS qv
            FROM s
        ),
        n AS (
            SELECT vec_id, qv,
                   CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS n2
            FROM z
        ),
        scored AS (
            SELECT q.vec_id AS query_id, c.vec_id AS nb_id,
                   CAST(list_sum(list_transform(range(1, len(c.qv) + 1),
                                                i -> c.qv[i] * q.qv[i]))
                        AS BIGINT)
                       / sqrt(greatest(c.n2 * q.n2, 1)::DOUBLE) AS qcosine
            FROM n c CROSS JOIN (SELECT * FROM n WHERE vec_id < 10) q
            WHERE q.vec_id <> c.vec_id
        ),
        ranked AS (
            SELECT query_id, nb_id, qcosine,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY qcosine DESC, nb_id) AS rank
            FROM scored
        )
        SELECT query_id, nb_id, rank, round(qcosine, 6) AS qcosine
        FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
    """
    from spark_nnd_spark.operators.sampling import weighted_key_sql

    oracles["q77_weighted_sample"] = f"""
        SELECT source, doc_id, n_chars FROM (
            SELECT source, doc_id, n_chars,
                   ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY {weighted_key_sql("doc_id", "n_chars")} ASC,
                                doc_id ASC
                   ) AS r
            FROM documents
        ) WHERE r <= {WEIGHTED_SAMPLE_K}
        ORDER BY source, doc_id
    """
    oracles["q78_contamination_pairs"] = f"""
        WITH bench AS (
            SELECT doc_id AS bench_id,
                   unnest({TX.shingles_sql('text', 5)}) AS shingle
            FROM documents WHERE doc_id < {Q51_BENCH_MAX_ID}
        ),
        posts AS (
            SELECT doc_id, unnest({TX.shingles_sql('text', 5)}) AS shingle
            FROM documents WHERE doc_id >= {Q51_BENCH_MAX_ID}
        )
        SELECT doc_id, bench_id, COUNT(*) AS n_shared
        FROM posts JOIN bench USING (shingle)
        GROUP BY doc_id, bench_id
        ORDER BY doc_id, bench_id
    """
    oracles["q79_pq_adc_topk"] = _pq_adc_oracle_sql()
    terms_rrf = ",".join(f"'{t}'" for t in BM25_QUERY)
    cos_rrf = (
        "list_sum(list_transform(range(1, len(qv)+1), i -> qv[i]*cv[i]))"
        " / (sqrt(list_sum(list_transform(range(1, len(qv)+1), i -> qv[i]*qv[i])))"
        " * sqrt(list_sum(list_transform(range(1, len(cv)+1), i -> cv[i]*cv[i]))))"
    )
    oracles["q80_hybrid_rrf"] = f"""
        WITH toks AS (
            SELECT doc_id, len({TX.tokens_sql()})::DOUBLE AS dl,
                   unnest({TX.tokens_sql()}) AS token
            FROM documents
        ),
        tf AS (
            SELECT doc_id, token, dl, COUNT(*) AS tf
            FROM toks WHERE token IN ({terms_rrf})
            GROUP BY doc_id, token, dl
        ),
        dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
        stats AS (SELECT COUNT(*)::DOUBLE AS n_docs,
                         AVG(len({TX.tokens_sql()})) AS avgdl
                  FROM documents),
        t_top AS (
            SELECT doc_id,
                   SUM(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                       * (tf * ({BM25_K1} + 1)
                          / (tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl / avgdl)))) AS score
            FROM tf JOIN dfreq USING (token) CROSS JOIN stats
            GROUP BY doc_id
            ORDER BY score DESC, doc_id LIMIT {RRF_CAND}
        ),
        t_rank AS (
            SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank_t
            FROM t_top
        ),
        qvec AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
        v_top AS (
            SELECT vec_id AS doc_id, {cos_rrf} AS cosine
            FROM (SELECT vec_id, embedding::DOUBLE[] AS cv
                  FROM embeddings WHERE vec_id <> 0) CROSS JOIN qvec
            ORDER BY cosine DESC, doc_id LIMIT {RRF_CAND}
        ),
        v_rank AS (
            SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id) AS rank_v
            FROM v_top
        ),
        fused AS (
            SELECT doc_id,
                   CAST(COALESCE(rank_t, 0) AS BIGINT) AS rank_t,
                   CAST(COALESCE(rank_v, 0) AS BIGINT) AS rank_v,
                   {round_half_up_sql(
                       "COALESCE(1.0 / (" + str(RRF_K) + " + rank_t), 0.0)"
                       " + COALESCE(1.0 / (" + str(RRF_K) + " + rank_v), 0.0)"
                   )} AS rrf
            FROM t_rank FULL OUTER JOIN v_rank USING (doc_id)
        )
        SELECT doc_id, rank_t, rank_v, rrf,
               CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS BIGINT) AS rank
        FROM fused
        QUALIFY rank <= {RRF_TOPN}
        ORDER BY rank
    """
    oracles["q81_retention_cohorts"] = """
        WITH ev AS (
            SELECT user_id,
                   ((epoch_us(ts::TIMESTAMP) // 1000000) // 86400) AS bucket
            FROM events
        ),
        f AS (SELECT user_id, MIN(bucket) AS cohort FROM ev GROUP BY 1)
        SELECT cohort AS cohort_day, bucket - cohort AS day_offset,
               COUNT(DISTINCT ev.user_id) AS n_users
        FROM ev JOIN f USING (user_id)
        GROUP BY 1, 2 ORDER BY cohort_day, day_offset
    """
    oracles["q82_cluster_sizes"] = _cc_ctes(sh, mh) + """,
        comp AS (
            SELECT s AS doc_id, least(s, min(d)) AS component
            FROM reach GROUP BY s
        ),
        sizes AS (SELECT component, COUNT(*) AS cluster_size FROM comp GROUP BY 1)
        SELECT cluster_size, COUNT(*) AS n_clusters
        FROM sizes GROUP BY 1 ORDER BY cluster_size
    """
    oracles["q83_incremental_dedup"] = f"""
        WITH pairs AS ({_lsh_pairs_core_sql(sh, mh)}),
        flags AS (SELECT doc_id, source = 'src0' AS is_batch FROM documents),
        corp_dig AS (SELECT DISTINCT md5(text) AS digest FROM documents
                     WHERE source <> 'src0'),
        ex AS (
            SELECT DISTINCT d.doc_id FROM documents d
            JOIN corp_dig c ON md5(d.text) = c.digest
            WHERE d.source = 'src0'
        ),
        near AS (
            SELECT p.id_a AS doc_id FROM pairs p
            JOIN flags a ON p.id_a = a.doc_id JOIN flags b ON p.id_b = b.doc_id
            WHERE a.is_batch AND NOT b.is_batch
            UNION
            SELECT p.id_b FROM pairs p
            JOIN flags a ON p.id_a = a.doc_id JOIN flags b ON p.id_b = b.doc_id
            WHERE b.is_batch AND NOT a.is_batch
        )
        SELECT d.doc_id,
               CASE WHEN e.doc_id IS NOT NULL THEN 'exact'
                    WHEN n.doc_id IS NOT NULL THEN 'near'
                    ELSE 'novel' END AS verdict
        FROM documents d
        LEFT JOIN ex e ON d.doc_id = e.doc_id
        LEFT JOIN near n ON d.doc_id = n.doc_id
        WHERE d.source = 'src0'
        ORDER BY d.doc_id
    """
    oracles["q84_event_anomaly"] = f"""
        WITH s AS (
            SELECT event_type, AVG(value) AS mu, STDDEV_SAMP(value) AS sigma
            FROM events GROUP BY 1
        )
        SELECT e.event_id, e.event_type, round(e.value, 6) AS value,
               {round_half_up_sql("(e.value - s.mu) / s.sigma")} AS z
        FROM events e JOIN s USING (event_type)
        WHERE abs((e.value - s.mu) / s.sigma) > 3.0
        ORDER BY e.event_id
    """
    oracles["q85_type_affinity"] = f"""
        WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        tot AS (SELECT event_type, COUNT(*) AS n_t FROM ut GROUP BY 1),
        nu AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM events),
        pairs AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   COUNT(*) AS n_both
            FROM ut a JOIN ut b
              ON a.user_id = b.user_id AND a.event_type < b.event_type
            GROUP BY 1, 2
        )
        SELECT type_a, type_b, n_both,
               {round_half_up_sql(
                   "(n_both::DOUBLE * n_users::DOUBLE)"
                   " / (ta.n_t::DOUBLE * tb.n_t::DOUBLE)"
               )} AS lift
        FROM pairs
        JOIN tot ta ON type_a = ta.event_type
        JOIN tot tb ON type_b = tb.event_type
        CROSS JOIN nu
        ORDER BY type_a, type_b
    """
    oracles["q86_lang_confusion"] = f"""
        SELECT lang, {TX.predicted_lang_sql()} AS pred_lang,
               COUNT(*) AS n_docs
        FROM documents GROUP BY 1, 2 ORDER BY lang, pred_lang
    """
    oracles["q87_bigram_lm"] = f"""
        WITH t AS (SELECT doc_id, {TX.tokens_sql()} AS toks FROM documents),
        db AS (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(toks)),
                                         i -> toks[i] || ' ' || toks[i + 1]))
                   AS bg
            FROM t
        ),
        counts AS (SELECT bg, COUNT(*) AS c2 FROM db GROUP BY 1),
        lefts AS (SELECT split_part(bg, ' ', 1) AS w1, SUM(c2)::DOUBLE AS c1
                  FROM counts GROUP BY 1),
        vv AS (SELECT COUNT(*) AS v FROM lefts)
        SELECT doc_id, COUNT(*) AS n_bigrams,
               round(AVG(ln((c2 + 0.5) / (c1 + 0.5 * v))), 6) AS avg_logprob
        FROM db
        JOIN counts USING (bg)
        JOIN lefts ON split_part(bg, ' ', 1) = lefts.w1
        CROSS JOIN vv
        GROUP BY doc_id ORDER BY doc_id
    """
    oracles["q88_containment_pairs"] = f"""
        WITH sh0 AS (SELECT doc_id, {sh} AS s FROM documents),
        posts0 AS (SELECT doc_id, unnest(s) AS shingle FROM sh0),
        posts AS (
            SELECT doc_id, shingle FROM posts0
            QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= {MAX_SHINGLE_FREQ}
        ),
        inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
            FROM posts a JOIN posts b
              ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        sizes AS (SELECT doc_id, len(s) AS n FROM sh0),
        j AS (
            SELECT id_a, id_b, i, na.n AS n_a, nb.n AS n_b
            FROM inter
            JOIN sizes na ON id_a = na.doc_id
            JOIN sizes nb ON id_b = nb.doc_id
        )
        SELECT contained, container, round(containment, 6) AS containment
        FROM (
            SELECT id_a AS contained, id_b AS container,
                   i * 1.0 / n_a AS containment FROM j
            WHERE i * 1.0 / n_a >= 0.7
            UNION ALL
            SELECT id_b, id_a, i * 1.0 / n_b FROM j
            WHERE i * 1.0 / n_b >= 0.7
        )
        ORDER BY contained, container
    """
    oracles["q89_length_deciles"] = f"""
        WITH base AS (
            SELECT source, doc_id, {TX.token_count_sql()} AS n_tokens
            FROM documents
        ),
        tiled AS (
            SELECT source, n_tokens,
                   CAST(NTILE(10) OVER (PARTITION BY source
                                        ORDER BY n_tokens, doc_id) AS BIGINT)
                   AS decile
            FROM base
        )
        SELECT source, decile, COUNT(*) AS n_docs,
               MIN(n_tokens) AS min_tokens, MAX(n_tokens) AS max_tokens
        FROM tiled GROUP BY 1, 2 ORDER BY source, decile
    """
    oracles["q90_event_transitions"] = f"""
        WITH seq AS (
            SELECT event_type AS prev_type,
                   LEAD(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS next_type
            FROM events
        ),
        c AS (
            SELECT prev_type, next_type, COUNT(*) AS n
            FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
        )
        SELECT prev_type, next_type, n,
               {round_half_up_sql("n * 1.0 / SUM(n) OVER (PARTITION BY prev_type)")}
               AS prob
        FROM c ORDER BY prev_type, next_type
    """
    oracles["q91_winnow_pairs"] = f"""
        WITH h AS (
            SELECT doc_id,
                   {TX.ordered_shingle_hashes_sql('text', WINNOW_N)} AS hs
            FROM documents
        ),
        fp0 AS (
            SELECT doc_id,
                   unnest({TX.winnow_select_sql('hs', WINNOW_W)}) AS fp
            FROM h
        ),
        fp AS (
            SELECT * FROM fp0
            QUALIFY COUNT(*) OVER (PARTITION BY fp) <= {MAX_SHINGLE_FREQ}
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
        FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING COUNT(*) >= {WINNOW_MIN_SHARED}
        ORDER BY id_a, id_b
    """
    oracles["q92_decay_engagement"] = f"""
        WITH ref AS (
            SELECT MAX(epoch_us(ts::TIMESTAMP) // 1000000) AS ref_s FROM events
        )
        SELECT user_id, COUNT(*) AS n_events,
               {round_half_up_sql(
                   "SUM(value * pow(0.5, ((ref_s - epoch_us(ts::TIMESTAMP) // 1000000)"
                   f" // {86400 * DECAY_HALFLIFE_DAYS})::DOUBLE))"
               )} AS decay_score
        FROM events, ref
        GROUP BY user_id ORDER BY user_id
    """
    oracles["q93_token_pmi"] = f"""
        WITH toks AS (
            SELECT doc_id, unnest(list_distinct({TX.tokens_sql()})) AS token
            FROM documents
        ),
        dfreq AS (SELECT token, COUNT(*) AS dfreq FROM toks GROUP BY 1),
        vocab AS (
            SELECT token, dfreq FROM dfreq
            ORDER BY dfreq DESC, token LIMIT {PMI_VOCAB}
        ),
        vp AS (SELECT t.doc_id, t.token FROM toks t JOIN vocab USING (token)),
        pairs AS (
            SELECT a.token AS tok_a, b.token AS tok_b, COUNT(*) AS n_ab
            FROM vp a JOIN vp b ON a.doc_id = b.doc_id AND a.token < b.token
            GROUP BY 1, 2 HAVING COUNT(*) >= {PMI_MIN_PAIRS}
        ),
        nd AS (SELECT COUNT(*)::DOUBLE AS n_docs FROM documents)
        SELECT tok_a, tok_b, n_ab,
               {round_half_up_sql("ln(n_ab * n_docs / (va.dfreq * vb.dfreq))")}
               AS pmi
        FROM pairs
        JOIN vocab va ON tok_a = va.token
        JOIN vocab vb ON tok_b = vb.token, nd
        ORDER BY tok_a, tok_b
    """
    oracles["q94_group_sample"] = f"""
        SELECT source, sample_rank, doc_id FROM (
            SELECT source, doc_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY {SA.sample_key_sql('doc_id')}, doc_id
                   ) AS sample_rank
            FROM documents
        ) WHERE sample_rank <= {GROUP_SAMPLE_K}
        ORDER BY source, sample_rank
    """
    oracles["q95_user_lifecycle"] = f"""
        WITH per AS (
            SELECT user_id, COUNT(*) AS n_events,
                   COUNT(DISTINCT (epoch_us(ts::TIMESTAMP) // 1000000) // 86400)
                   AS active_days
            FROM events GROUP BY 1
        )
        SELECT CASE WHEN n_events = 1 THEN 'one_shot'
                    WHEN active_days >= {LIFECYCLE_CORE_DAYS} THEN 'core'
                    WHEN active_days >= {LIFECYCLE_REGULAR_DAYS} THEN 'regular'
                    ELSE 'casual' END AS stage,
               COUNT(*) AS n_users,
               {round_half_up_sql("AVG(n_events * 1.0)")} AS avg_events,
               {round_half_up_sql("AVG(active_days * 1.0)")} AS avg_active_days
        FROM per GROUP BY 1 ORDER BY stage
    """
    # q96: unroll the same fixed damped iterations the Spark operator
    # runs (identical double arithmetic: 1.0/n and 0.15/n are IEEE
    # divisions in both engines, 0.85 the same double literal).
    pr_iters = ""
    prev = "r0"
    for k in range(1, PR_ITERATIONS + 1):
        pr_iters += f""",
        i{k} AS (
            SELECT e.dst AS id, SUM(r.rank / r.deg) AS inflow
            FROM e JOIN {prev} r ON e.src = r.id GROUP BY 1
        ),
        r{k} AS (
            SELECT d.src AS id, d.deg,
                   0.15::DOUBLE / nn.n
                   + {PR_DAMPING}::DOUBLE * coalesce(i.inflow, 0.0::DOUBLE)
                   AS rank
            FROM deg d LEFT JOIN i{k} i ON d.src = i.id, nn
        )"""
        prev = f"r{k}"
    oracles["q96_pagerank"] = f"""
        WITH pairs AS ({_lsh_pairs_core_sql(sh, mh)}),
        e AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
        deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY 1),
        nn AS (SELECT COUNT(*) AS n FROM deg),
        r0 AS (SELECT src AS id, deg, 1.0::DOUBLE / nn.n AS rank FROM deg, nn)
        {pr_iters}
        SELECT id AS doc_id, deg, {round_half_up_sql("rank")} AS rank
        FROM {prev} ORDER BY doc_id
    """
    oracles["q97_cross_modal"] = f"""
        WITH j AS (
            SELECT d.lang, e.label,
                   sqrt(list_sum(list_transform(e.embedding::DOUBLE[],
                                                x -> x * x))) AS norm,
                   {TX.token_count_sql('d.text')} AS ntok
            FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        )
        SELECT lang, label, COUNT(*) AS n_docs,
               {round_half_up_sql("AVG(norm)")} AS avg_norm,
               {round_half_up_sql("AVG(ntok * 1.0)")} AS avg_tokens
        FROM j GROUP BY 1, 2 ORDER BY lang, label
    """
    oracles["q98_cluster_reps"] = _cc_ctes(sh, mh) + """,
        comp AS (
            SELECT s AS doc_id, least(s, min(d)) AS component
            FROM reach GROUP BY s
        ),
        m AS (
            SELECT c.component, c.doc_id, d.n_chars
            FROM comp c JOIN documents d USING (doc_id)
        )
        SELECT component, doc_id AS rep_doc_id, n_members, n_chars AS rep_chars
        FROM (
            SELECT component, doc_id, n_chars,
                   ROW_NUMBER() OVER (PARTITION BY component
                                      ORDER BY n_chars DESC, doc_id) AS rn,
                   COUNT(*) OVER (PARTITION BY component) AS n_members
            FROM m
        ) WHERE rn = 1 ORDER BY component
    """
    oracles["q99_oov_rate"] = f"""
        WITH toks AS (
            SELECT lang, unnest({TX.tokens_sql()}) AS token FROM documents
        ),
        vocab AS (
            SELECT token FROM (
                SELECT token, COUNT(*) AS cnt FROM toks GROUP BY 1
            ) ORDER BY cnt DESC, token LIMIT {OOV_VOCAB}
        )
        SELECT lang, COUNT(*) AS n_tokens,
               SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_oov,
               {round_half_up_sql(
                   "SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) * 1.0 / COUNT(*)"
               )} AS oov_rate
        FROM toks t LEFT JOIN vocab v ON t.token = v.token
        GROUP BY lang ORDER BY lang
    """
    # q100: replay the aHash bit arithmetic from the payload bytes
    # (ASCII corpus ⇒ bytes == codepoints, the q27 trick). Cell (i//8,
    # i%8) of the 8x8 grid mean-pools pixels {base+1, base+2, base+17,
    # base+18} (1-based) with base = (i//8)*32 + (i%8)*2; all means
    # divide by powers of two, so the threshold compare is exact. The
    # 64-bit pack runs in HUGEINT and wraps to the signed BIGINT numpy
    # produces via view(int64).
    cell = (
        "(p[(i // 8) * 32 + (i % 8) * 2 + 1]"
        " + p[(i // 8) * 32 + (i % 8) * 2 + 2]"
        " + p[(i // 8) * 32 + (i % 8) * 2 + 17]"
        " + p[(i // 8) * 32 + (i % 8) * 2 + 18]) / 4.0"
    )
    oracles["q100_phash_buckets"] = f"""
        WITH px AS (
            SELECT doc_id,
                   list_transform(range(1, 257),
                       i -> CASE WHEN i <= len(text)
                                 THEN unicode(substr(text, i, 1))
                                 ELSE 0 END) AS p
            FROM documents
        ),
        grid AS (
            SELECT doc_id,
                   list_transform(range(0, 64), i -> {cell}) AS g
            FROM px
        ),
        packed AS (
            SELECT doc_id,
                   list_sum(list_transform(range(0, 64),
                       i -> CASE WHEN g[i + 1] > list_avg(g)
                                 THEN 1::HUGEINT << (63 - i)
                                 ELSE 0::HUGEINT END)) AS hug
            FROM grid
        ),
        h AS (
            SELECT doc_id,
                   (CASE WHEN hug >= 9223372036854775808::HUGEINT
                         THEN hug - 18446744073709551616::HUGEINT
                         ELSE hug END)::BIGINT AS phash
            FROM packed
        )
        SELECT phash, MIN(doc_id) AS doc_id, COUNT(*) AS bucket_size
        FROM h GROUP BY 1 ORDER BY phash
    """
    oracles["q101_source_drift"] = f"""
        WITH toks AS (
            SELECT source, unnest({TX.tokens_sql()}) AS token FROM documents
        ),
        g AS (SELECT token, COUNT(*) AS g_cnt FROM toks GROUP BY 1),
        vocab AS (
            SELECT token, g_cnt FROM g
            ORDER BY g_cnt DESC, token LIMIT {DRIFT_VOCAB}
        ),
        gt AS (SELECT COUNT(*) AS g_tot FROM toks),
        st AS (SELECT source, COUNT(*) AS s_tot FROM toks GROUP BY 1),
        sc AS (
            SELECT source, token, COUNT(*) AS s_cnt
            FROM toks JOIN vocab USING (token) GROUP BY 1, 2
        ),
        grid AS (
            SELECT st.source, st.s_tot, v.token, v.g_cnt,
                   coalesce(sc.s_cnt, 0) AS s_cnt, gt.g_tot
            FROM st CROSS JOIN vocab v CROSS JOIN gt
            LEFT JOIN sc ON sc.source = st.source AND sc.token = v.token
        ),
        per AS (
            SELECT source, s_tot, g_tot,
                   SUM(abs(s_cnt * 1.0 / s_tot - g_cnt * 1.0 / g_tot))
                   AS vocab_l1,
                   SUM(s_cnt)::BIGINT AS s_in_vocab,
                   SUM(g_cnt)::BIGINT AS g_in_vocab
            FROM grid GROUP BY 1, 2, 3
        )
        SELECT source, s_tot AS n_tokens,
               {round_half_up_sql(
                   "0.5 * (vocab_l1"
                   " + abs((s_tot - s_in_vocab) * 1.0 / s_tot"
                   "       - (g_tot - g_in_vocab) * 1.0 / g_tot))"
               )} AS tv_distance
        FROM per ORDER BY source
    """
    oracles["q102_behavior_entropy"] = f"""
        WITH c AS (
            SELECT user_id, event_type, COUNT(*) AS n
            FROM events GROUP BY 1, 2
        ),
        w AS (
            SELECT user_id, n,
                   SUM(n) OVER (PARTITION BY user_id) AS tot
            FROM c
        )
        SELECT user_id, MAX(tot)::BIGINT AS n_events,
               COUNT(*) AS n_types,
               {round_half_up_sql(
                   "-SUM((n * 1.0 / tot) * ln(n * 1.0 / tot))"
               )} AS entropy
        FROM w GROUP BY user_id ORDER BY user_id
    """
    # q103 serves EXACTLY q83's verdicts from the persisted index, so
    # the oracle is q83's SQL verbatim — the index is an execution
    # strategy, not a semantic change (index==inline also asserted in
    # tests/test_operators.py).
    oracles["q103_indexed_dedup"] = oracles["q83_incremental_dedup"]
    # q105 serves exactly q16's pairs from the persisted index — same
    # reasoning as q103: execution strategy, not a semantic change.
    oracles["q105_indexed_lsh_pairs"] = oracles["q16_minhash_lsh_pairs"]
    oracles["q106_indexed_jaccard"] = oracles["q14_jaccard_pairs"]
    oracles["q107_indexed_containment"] = oracles["q88_containment_pairs"]
    oracles["q108_indexed_bm25"] = oracles["q68_bm25"]
    oracles["q109_kmv_distinct_tokens"] = f"""
        WITH toks AS (
            SELECT source, {SKM.kmv_mix_sql(TX.token_hash_sql('t'))} AS h
            FROM (SELECT source, unnest({TX.tokens_sql()}) AS t FROM documents)
            WHERE t <> ''
        ),
        dt AS (SELECT DISTINCT source, h FROM toks),
        r AS (
            SELECT source, h,
                   ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn
            FROM dt
        ),
        kept AS (
            SELECT source, COUNT(*) AS n_kept,
                   MAX(CASE WHEN rn = {KMV_K} THEN h END) AS kth_hash
            FROM r WHERE rn <= {KMV_K} GROUP BY source
        ),
        ex AS (SELECT source, COUNT(*) AS n_distinct FROM dt GROUP BY source)
        SELECT source, n_distinct, n_kept, kth_hash,
               {round_half_up_sql(
                   f"CASE WHEN n_kept < {KMV_K} THEN n_kept::DOUBLE"
                   f" ELSE ({KMV_K} - 1)::DOUBLE * {TX.P} / kth_hash END"
               )} AS kmv_estimate
        FROM kept JOIN ex USING (source)
        ORDER BY source
    """
    # q104: all-pairs hamming filter over the replayed aHash — the
    # banded Spark plan is pigeonhole-exact at max_hamming 3 with 4
    # bands, so the oracle may brute-force what the engine bands.
    oracles["q104_phash_pairs"] = f"""
        WITH px AS (
            SELECT doc_id,
                   list_transform(range(1, 257),
                       i -> CASE WHEN i <= len(text)
                                 THEN unicode(substr(text, i, 1))
                                 ELSE 0 END) AS p
            FROM documents
        ),
        grid AS (
            SELECT doc_id,
                   list_transform(range(0, 64), i -> {cell}) AS g
            FROM px
        ),
        packed AS (
            SELECT doc_id,
                   list_sum(list_transform(range(0, 64),
                       i -> CASE WHEN g[i + 1] > list_avg(g)
                                 THEN 1::HUGEINT << (63 - i)
                                 ELSE 0::HUGEINT END)) AS hug
            FROM grid
        ),
        h AS (
            SELECT doc_id,
                   (CASE WHEN hug >= 9223372036854775808::HUGEINT
                         THEN hug - 18446744073709551616::HUGEINT
                         ELSE hug END)::BIGINT AS phash
            FROM packed
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
        FROM h a JOIN h b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.phash, b.phash)) <= 3
        ORDER BY id_a, id_b
    """
    # q168: the index-served one-sided variant — src0 probes against
    # the indexed remainder; the banded Spark probe is pigeonhole-exact
    # at hamming 3 with 4 bands, so the oracle brute-forces the
    # src0 × rest cross filter the engine bands.
    oracles["q168_indexed_phash"] = f"""
        WITH px AS (
            SELECT doc_id, source,
                   list_transform(range(1, 257),
                       i -> CASE WHEN i <= len(text)
                                 THEN unicode(substr(text, i, 1))
                                 ELSE 0 END) AS p
            FROM documents
        ),
        grid AS (
            SELECT doc_id, source,
                   list_transform(range(0, 64), i -> {cell}) AS g
            FROM px
        ),
        packed AS (
            SELECT doc_id, source,
                   list_sum(list_transform(range(0, 64),
                       i -> CASE WHEN g[i + 1] > list_avg(g)
                                 THEN 1::HUGEINT << (63 - i)
                                 ELSE 0::HUGEINT END)) AS hug
            FROM grid
        ),
        h AS (
            SELECT doc_id, source,
                   (CASE WHEN hug >= 9223372036854775808::HUGEINT
                         THEN hug - 18446744073709551616::HUGEINT
                         ELSE hug END)::BIGINT AS phash
            FROM packed
        )
        SELECT a.doc_id AS batch_id, b.doc_id AS index_id,
               CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
        FROM h a JOIN h b
          ON a.source = 'src0' AND b.source <> 'src0'
        WHERE bit_count(xor(a.phash, b.phash)) <= 3
        ORDER BY batch_id, index_id
    """
    oracles["q110_scd2_history"] = f"""
        WITH {EV.scd2_intervals_sql("events")}
        SELECT user_id, version, status,
               epoch_us(valid_from::TIMESTAMP) // 1000000 AS valid_from_epoch,
               epoch_us(valid_to::TIMESTAMP) // 1000000 AS valid_to_epoch,
               n_events, is_current
        FROM scd2 ORDER BY user_id, version
    """
    oracles["q111_model_scores"] = f"""
        SELECT doc_id,
               round({TX.linear_score_sql("text")}, 6) AS model_score,
               {TX.linear_score_sql("text")} >= 0.5 AS keep
        FROM documents ORDER BY doc_id
    """
    oracles["q112_temperature_mix"] = f"""
        WITH {SA.temperature_mix_sql("documents", 0.5, MIX_BUDGET_FRAC)}
        SELECT doc_id, source FROM mixed ORDER BY doc_id
    """
    oracles["q113_shard_assign"] = f"""
        WITH {SA.assign_shards_sql(
            "(SELECT doc_id FROM documents)", N_SHARDS, "doc_id", SHARD_SEED
        )}
        SELECT doc_id, shard, pos FROM sharded ORDER BY shard, pos
    """
    p = MRL_PREFIX_DIMS
    cos_pre = (
        f"list_sum(list_transform(range(1, {p + 1}), i -> qv[i]*cv[i]))"
        f" / (sqrt(list_sum(list_transform(range(1, {p + 1}), i -> qv[i]*qv[i])))"
        f" * sqrt(list_sum(list_transform(range(1, {p + 1}), i -> cv[i]*cv[i]))))"
    )
    cos_full = (
        "list_sum(list_transform(range(1, len(qv)+1), i -> qv[i]*cv[i]))"
        " / (sqrt(list_sum(list_transform(range(1, len(qv)+1), i -> qv[i]*qv[i])))"
        " * sqrt(list_sum(list_transform(range(1, len(cv)+1), i -> cv[i]*cv[i]))))"
    )
    oracles["q114_mrl_two_stage"] = f"""
        WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                   FROM embeddings WHERE vec_id < 10),
        c AS (SELECT vec_id AS nb_id, embedding::DOUBLE[] AS cv FROM embeddings),
        coarse AS (
            SELECT query_id, nb_id, {cos_pre} AS pre_cosine
            FROM c CROSS JOIN q WHERE query_id <> nb_id
        ),
        cand AS (
            SELECT query_id, nb_id FROM (
                SELECT query_id, nb_id,
                       ROW_NUMBER() OVER (PARTITION BY query_id
                                          ORDER BY pre_cosine DESC, nb_id) AS crank
                FROM coarse
            ) WHERE crank <= {MRL_COARSE_K}
        ),
        rer AS (
            SELECT query_id, nb_id, {cos_full} AS cosine
            FROM cand JOIN c USING (nb_id) JOIN q USING (query_id)
        ),
        ranked AS (
            SELECT query_id, nb_id, cosine,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cosine DESC, nb_id) AS rank
            FROM rer
        )
        SELECT query_id, nb_id, rank, round(cosine, 6) AS cosine
        FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
    """
    # q115: the bloom is a pre-filter only (no false negatives, exact
    # join removes false positives) so the oracle is the PLAIN semi join.
    oracles["q115_bloom_semi_join"] = """
        SELECT l_returnflag, l_linestatus,
               COUNT(*)::BIGINT AS n_items,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        WHERE l_orderkey IN (
            SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
        )
        GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus
    """
    # q116: the two-phase cut is exact, so the oracle is the plain window
    oracles["q116_two_phase_topk"] = f"""
        SELECT source, n_tokens, doc_id, rank FROM (
            SELECT source, n_tokens, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY source
                                      ORDER BY n_tokens DESC, doc_id)::BIGINT AS rank
            FROM (SELECT source, {TX.token_count_sql()} AS n_tokens, doc_id
                  FROM documents)
        ) WHERE rank <= 3 ORDER BY source, rank
    """
    oracles["q117_percentile_trim"] = f"""
        SELECT doc_id, source, n_tokens, round(pr, 6) AS pr FROM (
            SELECT doc_id, source, n_tokens,
                   PERCENT_RANK() OVER (PARTITION BY source
                                        ORDER BY n_tokens) AS pr
            FROM (SELECT doc_id, source, {TX.token_count_sql()} AS n_tokens
                  FROM documents)
        ) WHERE pr >= 0.05 AND pr <= 0.95 ORDER BY doc_id
    """
    # q119: each event belongs to the 2 hour-aligned windows whose
    # 2-hour span covers it: starts trunc(ts) and trunc(ts) - 1h.
    oracles["q119_hopping_counts"] = """
        WITH hop AS (
            SELECT date_trunc('hour', ts::TIMESTAMP)
                       - (i.range * INTERVAL 1 HOUR) AS w_start,
                   event_type, value
            FROM events, range(0, 2) i
        )
        SELECT epoch_us(w_start::TIMESTAMP) // 1000000 AS w_start_epoch,
               event_type, COUNT(*)::BIGINT AS c,
               SUM(value::DECIMAL(18,2))::VARCHAR AS v
        FROM hop GROUP BY 1, 2 ORDER BY w_start_epoch, event_type
    """
    # q120: unroll the fixed LPA iterations (the q96 convention)
    lpa_steps = []
    for i in range(1, LPA_ITERATIONS + 1):
        lpa_steps.append(f"""
        , v{i} AS (
            SELECT e.dst, l{i - 1}.label, COUNT(*) AS n
            FROM e JOIN l{i - 1} ON e.src = l{i - 1}.id GROUP BY 1, 2
        ),
        l{i} AS (
            SELECT dst AS id, label FROM (
                SELECT dst, label,
                       ROW_NUMBER() OVER (PARTITION BY dst
                                          ORDER BY n DESC, label) AS rn
                FROM v{i}
            ) WHERE rn = 1
        )""")
    oracles["q120_label_propagation"] = f"""
        WITH pairs AS ({_lsh_pairs_core_sql(sh, mh)}),
        e AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
        l0 AS (SELECT DISTINCT src AS id, src AS label FROM e)
        {"".join(lpa_steps)}
        SELECT id AS doc_id, label FROM l{LPA_ITERATIONS} ORDER BY doc_id
    """
    oracles["q121_triangle_counts"] = f"""
        WITH pairs AS ({_lsh_pairs_core_sql(sh, mh)}),
        e AS (SELECT DISTINCT least(id_a, id_b) AS lo,
                              greatest(id_a, id_b) AS hi FROM pairs),
        tri AS (
            SELECT x.lo AS a, x.hi AS b, y.hi AS c
            FROM e x JOIN e y ON x.lo = y.lo AND x.hi < y.hi
            JOIN e z ON z.lo = x.hi AND z.hi = y.hi
        ),
        member AS (
            SELECT unnest([a, b, c]) AS doc_id FROM tri
        )
        SELECT doc_id, COUNT(*)::BIGINT AS n_triangles
        FROM member GROUP BY doc_id ORDER BY doc_id
    """
    salt_case = (
        "CASE r.range "
        + " ".join(f"WHEN {i} THEN {s}" for i, s in enumerate(SKM.CMS_SALTS))
        + " END"
    )
    cms_col = (
        f"(((hh + {salt_case}) * {SKM.KMV_MIX}) % {TX.P}) % {SKM.CMS_WIDTH}"
    )
    oracles["q122_cms_heavy_hitters"] = f"""
        WITH toks AS (
            SELECT unnest({TX.tokens_sql()}) AS token FROM documents
        ),
        hashed AS (SELECT token, {TX.token_hash_sql("token")} AS hh FROM toks),
        cells AS (
            SELECT r.range AS row, {cms_col} AS col
            FROM hashed, range(0, {SKM.CMS_DEPTH}) r
        ),
        sketch AS (
            SELECT row, col, COUNT(*)::BIGINT AS n FROM cells GROUP BY 1, 2
        ),
        top AS (
            SELECT token, COUNT(*)::BIGINT AS exact_n, MIN(hh) AS hh
            FROM hashed GROUP BY token
            ORDER BY exact_n DESC, token LIMIT {CMS_TOPK}
        )
        SELECT t.token, t.exact_n, MIN(s.n) AS cms_n
        FROM top t, range(0, {SKM.CMS_DEPTH}) r
        JOIN sketch s ON s.row = r.range AND s.col = {cms_col.replace("hh", "t.hh")}
        GROUP BY t.token, t.exact_n ORDER BY t.token
    """
    # q123 serves q114's cascade from the stored sidecar — same rows,
    # same SQL replay.
    oracles["q123_indexed_mrl"] = oracles["q114_mrl_two_stage"]
    # q124 reads the engine's own partitioned copy; the oracle reads
    # the ORIGINAL table — matching hashes prove the write is faithful.
    oracles["q124_partitioned_roundtrip"] = """
        SELECT epoch_us(date_trunc('day', ts::TIMESTAMP)) // 1000000 AS day_epoch,
               COUNT(*)::BIGINT AS c,
               SUM(value::DECIMAL(18,2))::VARCHAR AS v
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1 ORDER BY day_epoch
    """
    # q125: UNION ALL mirrors Spark's unpivot row-for-row (a DuckDB
    # UNPIVOT would also work; the explicit form keeps names exact)
    oracles["q125_unpivot_measures"] = """
        WITH long AS (
            SELECT l_returnflag, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
            UNION ALL
            SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
            UNION ALL
            SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
            UNION ALL
            SELECT l_returnflag, 'l_tax', l_tax FROM lineitem
        )
        SELECT l_returnflag, measure, COUNT(*)::BIGINT AS c,
               SUM(value::DECIMAL(18,2))::VARCHAR AS total
        FROM long GROUP BY 1, 2 ORDER BY l_returnflag, measure
    """
    # q126: replay the histogram sketch cell-for-cell (portable double
    # binning, operators/sketches.hist_bin_sql) and read the same
    # interpolated quantiles off it; every numeric literal is CAST to
    # DOUBLE because DuckDB parses 0.9 as DECIMAL and exact decimal
    # arithmetic would diverge from Spark's IEEE doubles.
    from spark_nnd_spark.operators.sketches import hist_bin_sql

    hist_probe_rows = ", ".join(
        f"('{lab}', {p})" for lab, p in HIST_PROBS.items()
    )
    hist_est_cols = ", ".join(
        f"ROUND(MAX(CASE WHEN label = '{lab}' THEN est END), 6) AS {lab}"
        for lab in HIST_PROBS
    )
    oracles["q126_hist_quantiles"] = f"""
        WITH vals AS (
            SELECT source, CAST({TX.token_count_sql()} AS DOUBLE) AS v
            FROM documents
        ),
        hist AS (
            SELECT source, {hist_bin_sql('v', HIST_LO, HIST_WIDTH, HIST_BINS)} AS bin,
                   COUNT(*) AS cnt
            FROM vals GROUP BY 1, 2
        ),
        cum AS (
            SELECT source, bin, cnt,
                   SUM(cnt) OVER (PARTITION BY source ORDER BY bin) AS cum
            FROM hist
        ),
        tot AS (SELECT source, SUM(cnt)::BIGINT AS n FROM hist GROUP BY 1),
        sel AS (
            SELECT c.source, pr.label,
                   CAST({HIST_LO} AS DOUBLE) + CAST({HIST_WIDTH} AS DOUBLE) * (
                       CAST(c.bin AS DOUBLE)
                       + (CAST(pr.p AS DOUBLE) * CAST(t.n AS DOUBLE)
                          - CAST(c.cum - c.cnt AS DOUBLE)) / CAST(c.cnt AS DOUBLE)
                   ) AS est
            FROM cum c JOIN tot t USING (source)
            CROSS JOIN (VALUES {hist_probe_rows}) pr(label, p)
            WHERE CAST(c.cum - c.cnt AS DOUBLE)
                      < CAST(pr.p AS DOUBLE) * CAST(t.n AS DOUBLE)
              AND CAST(pr.p AS DOUBLE) * CAST(t.n AS DOUBLE)
                      <= CAST(c.cum AS DOUBLE)
        ),
        est AS (SELECT source, {hist_est_cols} FROM sel GROUP BY source),
        ex AS (
            SELECT source,
                   ROUND(quantile_cont(v, 0.5), 6) AS p50_exact,
                   ROUND(quantile_cont(v, 0.9), 6) AS p90_exact
            FROM vals GROUP BY 1
        )
        SELECT e.source, t.n, e.p50, e.p90, e.p99, ex.p50_exact, ex.p90_exact
        FROM est e JOIN tot t USING (source) JOIN ex USING (source)
        ORDER BY e.source
    """
    # q128: the deliberate cross-check — Spark computes the repetition
    # stats with a narrow sorted-run-length fold; the oracle recounts
    # them relationally (unnest → GROUP BY gram → MAX / SUM FILTER).
    # LEFT JOINs + CASE keep short docs (< n tokens) at 0.0 exactly as
    # the fold's empty-array path does; each fraction is one INT/INT
    # double division so both engines emit identical bits.
    oracles["q128_repetition_metrics"] = f"""
        WITH b2 AS (
            SELECT doc_id, unnest({TX.ngrams_sql(n=2)}) AS g FROM documents
        ),
        c2 AS (SELECT doc_id, g, COUNT(*) AS c FROM b2 GROUP BY 1, 2),
        s2 AS (SELECT doc_id, MAX(c) AS best, SUM(c) AS tot FROM c2 GROUP BY 1),
        b3 AS (
            SELECT doc_id, unnest({TX.ngrams_sql(n=3)}) AS g FROM documents
        ),
        c3 AS (SELECT doc_id, g, COUNT(*) AS c FROM b3 GROUP BY 1, 2),
        s3 AS (
            SELECT doc_id,
                   COALESCE(SUM(c) FILTER (WHERE c >= 2), 0) AS dup,
                   SUM(c) AS tot
            FROM c3 GROUP BY 1
        ),
        fr AS (
            SELECT d.doc_id,
                   CASE WHEN s2.tot > 0
                        THEN s2.best::DOUBLE / s2.tot::DOUBLE
                        ELSE 0.0 END AS top_bigram_frac,
                   CASE WHEN s3.tot > 0
                        THEN s3.dup::DOUBLE / s3.tot::DOUBLE
                        ELSE 0.0 END AS dup_trigram_frac
            FROM documents d
            LEFT JOIN s2 USING (doc_id) LEFT JOIN s3 USING (doc_id)
        )
        SELECT doc_id, top_bigram_frac, dup_trigram_frac,
               (top_bigram_frac <= CAST({REP_TOP2_MAX} AS DOUBLE)
                AND dup_trigram_frac <= CAST({REP_DUP3_MAX} AS DOUBLE)) AS keep
        FROM fr ORDER BY doc_id
    """
    # q129: replay the full binary cascade — identical bit packing
    # (32 positive bits per BIGINT word), xor+bit_count hamming,
    # deterministic (hamming, nb_id) shortlist, then the q18 cosine
    # arithmetic verbatim on the survivors. Windows split across CTEs
    # (DuckDB rejects nested window calls).
    bq_cos = (
        "list_sum(list_transform(range(1, len(qv)+1), i -> qv[i]*cv[i]))"
        " / (sqrt(list_sum(list_transform(range(1, len(qv)+1), i -> qv[i]*qv[i])))"
        " * sqrt(list_sum(list_transform(range(1, len(cv)+1), i -> cv[i]*cv[i]))))"
    )
    oracles["q129_binary_topk"] = f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        bits AS (
            SELECT vec_id, v,
                   list_transform(range(0, (len(v) + 31) // 32), w ->
                       CAST(list_sum(list_transform(range(0, 32), j ->
                           CASE WHEN w * 32 + j < len(v)
                                     AND v[w * 32 + j + 1] > 0
                                THEN (1::BIGINT << j) ELSE 0::BIGINT END))
                            AS BIGINT)) AS b
            FROM e
        ),
        ham AS (
            SELECT q.vec_id AS query_id, c.vec_id AS nb_id,
                   CAST(list_sum(list_transform(range(1, len(q.b) + 1),
                            i -> bit_count(xor(q.b[i], c.b[i])))) AS BIGINT)
                       AS hamming
            FROM bits c CROSS JOIN (SELECT * FROM bits WHERE vec_id < 10) q
            WHERE q.vec_id <> c.vec_id
        ),
        short AS (
            SELECT query_id, nb_id, hamming,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY hamming, nb_id) AS hrank
            FROM ham
        ),
        rer AS (
            SELECT s.query_id, s.nb_id, s.hamming, q.v AS qv, c.v AS cv
            FROM short s
            JOIN e q ON q.vec_id = s.query_id
            JOIN e c ON c.vec_id = s.nb_id
            WHERE s.hrank <= {BQ_SHORTLIST}
        ),
        ranked AS (
            SELECT query_id, nb_id, hamming, {bq_cos} AS cosine,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY {bq_cos} DESC, nb_id) AS rank
            FROM rer
        )
        SELECT query_id, nb_id, rank, hamming, round(cosine, 6) AS cosine
        FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
    """
    # q130: same trees, same literal order; integer features make the
    # splits exact and the fixed-order leaf sum is bit-identical.
    tf = TX._tree_feature_sqls()
    oracles["q130_tree_ensemble_scores"] = f"""
        SELECT doc_id,
               {tf['n_tokens']} AS n_tokens,
               {tf['n_distinct']} AS n_distinct,
               {tf['stop_hits']} AS stop_hits,
               {tf['max_tok_len']} AS max_tok_len,
               {TX.tree_score_sql()} AS margin,
               ({TX.tree_score_sql()} > CAST(0.0 AS DOUBLE)) AS keep
        FROM documents ORDER BY doc_id
    """
    # q131: ground truth the hard way — the full incremental-dedup SQL
    # over (batch ∪ corpus-minus-retracted), UNCAPPED (tombstoned
    # probes run max_band_freq=None). A hash match proves the
    # tombstone anti-join equals physical deletion.
    sh131, mh131 = TX.shingles_sql(), TX.minhash_sql()
    oracles["q131_retracted_probe"] = f"""
        WITH docs AS (
            SELECT * FROM documents
            WHERE source = 'src0'
               OR NOT (doc_id % {RETRACT_MOD} = {RETRACT_REM})
        ),
        sigs AS (SELECT doc_id, {mh131} AS mh, {sh131} AS s FROM docs),
        banded AS (
            SELECT doc_id, b.range AS band,
                   mh[b.range * 4 + 1 : b.range * 4 + 4] AS bsig, s
            FROM sigs, range(0, 4) b
        ),
        cand AS (
            SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
            FROM banded x JOIN banded y
              ON x.band = y.band AND x.bsig = y.bsig AND x.doc_id < y.doc_id
        ),
        pairs AS (
            SELECT id_a, id_b FROM cand
            JOIN sigs a ON id_a = a.doc_id JOIN sigs b ON id_b = b.doc_id
            WHERE len(list_intersect(a.s, b.s)) * 1.0
                      / len(list_distinct(a.s || b.s)) >= 0.2
        ),
        flags AS (SELECT doc_id, source = 'src0' AS is_batch FROM docs),
        corp_dig AS (SELECT DISTINCT md5(text) AS digest FROM docs
                     WHERE source <> 'src0'),
        ex AS (
            SELECT DISTINCT d.doc_id FROM docs d
            JOIN corp_dig c ON md5(d.text) = c.digest
            WHERE d.source = 'src0'
        ),
        near AS (
            SELECT p.id_a AS doc_id FROM pairs p
            JOIN flags a ON p.id_a = a.doc_id JOIN flags b ON p.id_b = b.doc_id
            WHERE a.is_batch AND NOT b.is_batch
            UNION
            SELECT p.id_b FROM pairs p
            JOIN flags a ON p.id_a = a.doc_id JOIN flags b ON p.id_b = b.doc_id
            WHERE b.is_batch AND NOT a.is_batch
        )
        SELECT d.doc_id,
               CASE WHEN e.doc_id IS NOT NULL THEN 'exact'
                    WHEN n.doc_id IS NOT NULL THEN 'near'
                    ELSE 'novel' END AS verdict
        FROM docs d
        LEFT JOIN ex e ON d.doc_id = e.doc_id
        LEFT JOIN near n ON d.doc_id = n.doc_id
        WHERE d.source = 'src0'
        ORDER BY d.doc_id
    """
    # q132: replay centroid -> per-vector cosine -> per-label z. The
    # 64-term sums land in different orders on the two engines (hash
    # agg vs scan order) but round(6) absorbs the last-ulp noise — the
    # q44/q84 precedent. sigma-0 labels z-score 0 on both sides.
    oracles["q132_embedding_outliers"] = f"""
        WITH dims AS (
            SELECT unnest(range(0,
                (SELECT len(embedding) FROM embeddings LIMIT 1))) AS i
        ),
        c AS (
            SELECT label, i, avg(CAST(embedding[i + 1] AS DOUBLE)) AS centroid
            FROM embeddings, dims GROUP BY label, i
        ),
        per AS (
            SELECT e.vec_id, e.label,
                   SUM(CAST(e.embedding[c.i + 1] AS DOUBLE) * c.centroid) AS dot,
                   SUM(CAST(e.embedding[c.i + 1] AS DOUBLE)
                       * CAST(e.embedding[c.i + 1] AS DOUBLE)) AS xx,
                   SUM(c.centroid * c.centroid) AS cc
            FROM embeddings e JOIN c ON e.label = c.label
            GROUP BY e.vec_id, e.label
        ),
        scored AS (
            SELECT vec_id, label, dot / sqrt(xx * cc) AS cosine FROM per
        ),
        stats AS (
            SELECT label, AVG(cosine) AS mu, STDDEV_SAMP(cosine) AS sigma
            FROM scored GROUP BY label
        ),
        final AS (
            SELECT s.vec_id, s.label, s.cosine,
                   CASE WHEN t.sigma > 0
                        THEN (s.cosine - t.mu) / t.sigma
                        ELSE 0.0 END AS zraw
            FROM scored s JOIN stats t USING (label)
        )
        SELECT vec_id, label, round(cosine, 6) AS cosine,
               {round_half_up_sql('zraw')} AS z,
               (abs(zraw) > CAST({OUTLIER_Z} AS DOUBLE)) AS outlier
        FROM final ORDER BY vec_id
    """
    # q133: the repetition gate is recounted relationally (the q128
    # strategy cross-check); every other gate reuses its SQL twin.
    oracles["q133_source_filter_funnel"] = f"""
        WITH b2 AS (
            SELECT doc_id, unnest({TX.ngrams_sql(n=2)}) AS g FROM documents
        ),
        c2 AS (SELECT doc_id, g, COUNT(*) AS c FROM b2 GROUP BY 1, 2),
        s2 AS (SELECT doc_id, MAX(c) AS best, SUM(c) AS tot FROM c2 GROUP BY 1),
        b3 AS (
            SELECT doc_id, unnest({TX.ngrams_sql(n=3)}) AS g FROM documents
        ),
        c3 AS (SELECT doc_id, g, COUNT(*) AS c FROM b3 GROUP BY 1, 2),
        s3 AS (
            SELECT doc_id,
                   COALESCE(SUM(c) FILTER (WHERE c >= 2), 0) AS dup,
                   SUM(c) AS tot
            FROM c3 GROUP BY 1
        ),
        rep AS (
            SELECT d.doc_id,
                   (CASE WHEN s2.tot > 0
                         THEN s2.best::DOUBLE / s2.tot::DOUBLE ELSE 0.0 END
                        <= CAST({REP_TOP2_MAX} AS DOUBLE)
                    AND CASE WHEN s3.tot > 0
                         THEN s3.dup::DOUBLE / s3.tot::DOUBLE ELSE 0.0 END
                        <= CAST({REP_DUP3_MAX} AS DOUBLE)) AS rep_keep
            FROM documents d
            LEFT JOIN s2 USING (doc_id) LEFT JOIN s3 USING (doc_id)
        ),
        gates AS (
            SELECT d.source,
                   ({TX.token_count_sql()} >= {CASCADE_MIN_TOKENS}) AS g1,
                   ({TX.stopword_ratio_sql()} <= 0.6) AS sw,
                   ({TX.predicted_lang_sql()} = 'en') AS lang,
                   r.rep_keep,
                   ({TX.tree_score_sql()} > CAST(0.0 AS DOUBLE)) AS model
            FROM documents d JOIN rep r USING (doc_id)
        )
        SELECT source, COUNT(*)::BIGINT AS n0,
               SUM(CASE WHEN g1 THEN 1 ELSE 0 END)::BIGINT AS p_min_tokens,
               SUM(CASE WHEN g1 AND sw THEN 1 ELSE 0 END)::BIGINT AS p_stopword,
               SUM(CASE WHEN g1 AND sw AND lang THEN 1 ELSE 0 END)::BIGINT
                   AS p_lang,
               SUM(CASE WHEN g1 AND sw AND lang AND rep_keep THEN 1 ELSE 0 END)::BIGINT
                   AS p_repetition,
               SUM(CASE WHEN g1 AND sw AND lang AND rep_keep AND model
                        THEN 1 ELSE 0 END)::BIGINT AS p_model
        FROM gates GROUP BY source ORDER BY source
    """
    # q134 serves EXACTLY q129's rows from the persisted bits sidecar
    # (index==inline asserted in tests) — execution strategy, not a
    # semantic change, so it shares the oracle (the q103 convention).
    oracles["q134_indexed_binary"] = oracles["q129_binary_topk"]
    # q135: replay the span segmentation with string_split +
    # integer-division grouping (list_slice is 1-based inclusive like
    # F.slice(start, length) re-expressed), recount doc-frequency, and
    # re-aggregate the per-source retention summary. Docs with < 5
    # tokens produce zero spans and drop out of the inner join on both
    # sides (posexplode of an empty array emits no row).
    sw = SPAN_WORDS
    oracles["q135_span_scrub"] = f"""
        WITH spans AS (
            SELECT doc_id, unnest(list_transform(
                range(0, len(string_split(text, ' ')) // {sw}),
                i -> array_to_string(list_slice(
                    string_split(text, ' '),
                    i * {sw} + 1, i * {sw} + {sw}), ' ')
            )) AS span
            FROM documents
        ),
        dfreq AS (
            SELECT span, COUNT(DISTINCT doc_id) AS span_docfreq
            FROM spans GROUP BY span
        ),
        per_doc AS (
            SELECT s.doc_id, COUNT(*)::BIGINT AS doc_spans,
                   SUM(CASE WHEN f.span_docfreq >= {SPAN_MIN_DF}
                            THEN 1 ELSE 0 END)::BIGINT AS doc_scrubbed
            FROM spans s JOIN dfreq f USING (span) GROUP BY s.doc_id
        )
        SELECT d.source, COUNT(*)::BIGINT AS n_docs,
               SUM(p.doc_spans)::BIGINT AS total_spans,
               SUM(p.doc_scrubbed)::BIGINT AS scrubbed_spans,
               round(CAST(1.0 AS DOUBLE)
                     - SUM(p.doc_scrubbed)::DOUBLE / SUM(p.doc_spans)::DOUBLE,
                     6) AS kept_ratio
        FROM per_doc p JOIN documents d USING (doc_id)
        GROUP BY d.source ORDER BY d.source
    """
    # q136: replay the token-block contract (distinct tokens per
    # distinct name, df-cut, shared-token candidates) and verify with
    # DuckDB's built-in levenshtein — same edit-distance definition as
    # Spark's. dist cast to INT to match F.levenshtein's IntegerType.
    oracles["q136_fuzzy_match"] = f"""
        WITH names AS (
            SELECT p_name AS name, COUNT(*)::BIGINT AS n_rows
            FROM part GROUP BY p_name
        ),
        toks AS (
            SELECT name, unnest(list_distinct(string_split(name, ' ')))
                AS token
            FROM names
        ),
        tokdf AS (
            SELECT token, COUNT(DISTINCT name) AS tf FROM toks GROUP BY token
        ),
        kept AS (
            SELECT t.token, t.name FROM toks t JOIN tokdf USING (token)
            WHERE tokdf.tf <= {FUZZY_MAX_TOKEN_FREQ}
        ),
        cand AS (
            SELECT DISTINCT x.name AS name_a, y.name AS name_b
            FROM kept x JOIN kept y USING (token) WHERE x.name < y.name
        ),
        ver AS (
            SELECT name_a, name_b,
                   CAST(levenshtein(name_a, name_b) AS INT) AS dist
            FROM cand
        )
        SELECT v.name_a, v.name_b, v.dist, a.n_rows AS n_a, b.n_rows AS n_b
        FROM ver v
        JOIN names a ON v.name_a = a.name
        JOIN names b ON v.name_b = b.name
        WHERE v.dist <= {FUZZY_MAX_DIST}
        ORDER BY v.name_a, v.name_b
    """
    # q137: replay the rank-sum AUC with the SAME deterministic
    # tiebreak — row_number over (rounded score, doc_id), NOT midranks
    # — so everything before the final division is integer-exact.
    # NULLS FIRST pins DuckDB's window ordering to Spark's
    # nulls-first-ASC default.
    oracles["q137_model_auc"] = f"""
        WITH scored AS (
            SELECT doc_id, source,
                   round({TX.linear_score_sql("text")}, 6) AS score,
                   ({TX.token_count_sql()} >= 5
                    AND {TX.stopword_ratio_sql()} <= 0.6
                    AND {TX.type_token_ratio_sql()} >= 0.3) AS label
            FROM documents
        ),
        ranked AS (
            SELECT source, label,
                   ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY score NULLS FIRST, doc_id) AS rn
            FROM scored
        ),
        agg AS (
            SELECT source,
                   SUM(CASE WHEN label THEN 1 ELSE 0 END)::BIGINT AS n_pos,
                   SUM(CASE WHEN NOT label THEN 1 ELSE 0 END)::BIGINT
                       AS n_neg,
                   SUM(CASE WHEN label THEN rn ELSE 0 END)::BIGINT
                       AS pos_rank_sum
            FROM ranked GROUP BY source
        )
        SELECT source, n_pos, n_neg,
               COALESCE(round(CASE WHEN n_pos > 0 AND n_neg > 0 THEN
                   (CAST(pos_rank_sum AS DOUBLE)
                    - CAST(n_pos AS DOUBLE)
                      * (CAST(n_pos AS DOUBLE) + CAST(1.0 AS DOUBLE))
                      / CAST(2.0 AS DOUBLE))
                   / (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))
               END, 6), CAST(-1.0 AS DOUBLE)) AS auc
        FROM agg ORDER BY source
    """
    # q139: replay the reliability bins — floor(score*10) on the SAME
    # 6-decimal-rounded score double, so the bin id is deterministic
    # cross-engine; count/mean cells are integer-or-round(6) exact.
    oracles["q139_calibration_bins"] = f"""
        WITH scored AS (
            SELECT round({TX.linear_score_sql("text")}, 6) AS s,
                   ({TX.token_count_sql()} >= 5
                    AND {TX.stopword_ratio_sql()} <= 0.6
                    AND {TX.type_token_ratio_sql()} >= 0.3) AS label
            FROM documents
        ),
        binned AS (
            SELECT least(CAST(floor(s * {CALIB_BINS}) AS INT),
                         {CALIB_BINS - 1}) AS bin,
                   s, CASE WHEN label THEN 1 ELSE 0 END AS y
            FROM scored
        )
        SELECT bin, COUNT(*)::BIGINT AS n,
               round(AVG(s), 6) AS mean_score,
               round(AVG(CAST(y AS DOUBLE)), 6) AS pos_rate
        FROM binned GROUP BY bin ORDER BY bin
    """
    # q140: replay the DSIR weights — both smoothed unigram
    # distributions from one token tally, ln-ratio sum per doc,
    # round(6) absorbs the per-doc sum-order ulp noise (q60's
    # discipline); the top-k cut ranks by the ROUNDED weight with the
    # doc_id tiebreak, so the selection replays exactly.
    oracles["q140_dsir_weights"] = f"""
        WITH toks AS (
            SELECT doc_id, (source = '{DSIR_TARGET_SOURCE}') AS is_tgt,
                   unnest({TX.tokens_sql()}) AS token
            FROM documents
        ),
        tok2 AS (SELECT * FROM toks WHERE token != ''),
        vocab AS (
            SELECT token, COUNT(*)::BIGINT AS raw_cnt,
                   SUM(CASE WHEN is_tgt THEN 1 ELSE 0 END)::BIGINT AS tgt_cnt
            FROM tok2 GROUP BY token
        ),
        totals AS (
            SELECT SUM(raw_cnt)::BIGINT AS raw_total,
                   SUM(tgt_cnt)::BIGINT AS tgt_total,
                   COUNT(*)::BIGINT AS v_size
            FROM vocab
        ),
        scored AS (
            SELECT t.doc_id, COUNT(*)::BIGINT AS n_tokens,
                   round(SUM(
                       ln((v.tgt_cnt + CAST(1.0 AS DOUBLE))
                          / (s.tgt_total + CAST(1.0 AS DOUBLE) * s.v_size))
                       - ln((v.raw_cnt + CAST(1.0 AS DOUBLE))
                            / (s.raw_total + CAST(1.0 AS DOUBLE) * s.v_size))
                   ), 6) AS log_weight
            FROM tok2 t JOIN vocab v USING (token) CROSS JOIN totals s
            GROUP BY t.doc_id
        ),
        ranked AS (
            SELECT doc_id, n_tokens, log_weight,
                   ROW_NUMBER() OVER (ORDER BY log_weight DESC, doc_id)
                       AS rank
            FROM scored
        )
        SELECT doc_id, n_tokens, log_weight, CAST(rank AS INT) AS rank
        FROM ranked WHERE rank <= {DSIR_TOP_K} ORDER BY rank
    """
    # q141: q31's transitive-closure kernel gives the component; the
    # bucket replays the md5(seed:component) mod-100 arithmetic (the
    # assign_shards '0x'||hex::UBIGINT convention).
    csql = "COALESCE(c.component, d.doc_id)"
    bsql = (
        f"(('0x' || substr(md5(concat('split', ':', "
        f"CAST({csql} AS VARCHAR))), 1, 8))::UBIGINT % 100)::INT"
    )
    oracles["q141_leakage_safe_split"] = _cc_ctes(sh, mh) + f""",
        comp AS (
            SELECT s AS doc_id, least(s, min(d)) AS component
            FROM reach GROUP BY s
        ),
        assigned AS (
            SELECT d.doc_id, {csql} AS component, {bsql} AS bucket
            FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
        )
        SELECT doc_id, component, bucket,
               CASE WHEN bucket < 80 THEN 'train'
                    WHEN bucket < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM assigned ORDER BY doc_id
    """
    # q142: two assign_shards replays (fresh seed per epoch) + the
    # GBDT gate; epoch literals pin the union branches.
    ep1 = SA.assign_shards_sql(
        "(SELECT doc_id FROM documents)", CURR_SHARDS, "doc_id", "ep1"
    )
    ep2 = SA.assign_shards_sql(
        f"(SELECT doc_id FROM documents WHERE {TX.tree_score_sql()} "
        f"> CAST(0.0 AS DOUBLE))",
        CURR_SHARDS,
        "doc_id",
        "ep2",
    )
    oracles["q142_curriculum_order"] = f"""
        WITH e1 AS (
            WITH {ep1}
            SELECT 1 AS epoch, doc_id, shard, pos FROM sharded
        ),
        e2 AS (
            WITH {ep2}
            SELECT 2 AS epoch, doc_id, shard, pos FROM sharded
        )
        SELECT epoch, doc_id, shard, pos FROM e1
        UNION ALL
        SELECT epoch, doc_id, shard, pos FROM e2
        ORDER BY epoch, shard, pos
    """
    # q145: replay the k-min sets per source, the pairwise union-rank
    # estimator, and the exact distinct-set Jaccard calibration.
    oracles["q145_kmv_source_jaccard"] = f"""
        WITH toks AS (
            SELECT source, {SKM.kmv_mix_sql(TX.token_hash_sql('t'))} AS h
            FROM (SELECT source, unnest({TX.tokens_sql()}) AS t FROM documents)
            WHERE t <> ''
        ),
        dt AS (SELECT DISTINCT source, h FROM toks),
        mins AS (
            SELECT source, h FROM (
                SELECT source, h,
                       ROW_NUMBER() OVER (PARTITION BY source ORDER BY h)
                           AS rn
                FROM dt
            ) WHERE rn <= {KMV_PAIR_K}
        ),
        pairs AS (
            SELECT a.source AS grp_a, b.source AS grp_b
            FROM (SELECT DISTINCT source FROM mins) a
            JOIN (SELECT DISTINCT source FROM mins) b ON a.source < b.source
        ),
        u AS (
            SELECT grp_a, grp_b, h,
                   MAX(a_flag) AS in_a, MAX(b_flag) AS in_b
            FROM (
                SELECT p.grp_a, p.grp_b, m.h, TRUE AS a_flag, FALSE AS b_flag
                FROM pairs p JOIN mins m ON m.source = p.grp_a
                UNION ALL
                SELECT p.grp_a, p.grp_b, m.h, FALSE, TRUE
                FROM pairs p JOIN mins m ON m.source = p.grp_b
            ) GROUP BY grp_a, grp_b, h
        ),
        kept AS (
            SELECT * FROM (
                SELECT grp_a, grp_b, h, in_a, in_b,
                       ROW_NUMBER() OVER (PARTITION BY grp_a, grp_b
                                          ORDER BY h) AS rn
                FROM u
            ) WHERE rn <= {KMV_PAIR_K}
        ),
        est AS (
            SELECT grp_a, grp_b, COUNT(*)::BIGINT AS n_union_kept,
                   SUM(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END)::BIGINT
                       AS n_both,
                   round(SUM(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END)
                         ::DOUBLE / COUNT(*)::DOUBLE, 6) AS jaccard_est
            FROM kept GROUP BY grp_a, grp_b
        ),
        sizes AS (SELECT source, COUNT(*) AS n FROM dt GROUP BY source),
        inter AS (
            SELECT a.source AS grp_a, b.source AS grp_b,
                   COUNT(*) AS n_inter
            FROM dt a JOIN dt b ON a.h = b.h AND a.source < b.source
            GROUP BY 1, 2
        ),
        exact AS (
            SELECT p.grp_a, p.grp_b,
                   round(COALESCE(i.n_inter, 0)::DOUBLE
                         / (sa.n + sb.n - COALESCE(i.n_inter, 0))::DOUBLE,
                         6) AS jaccard_exact
            FROM pairs p
            JOIN sizes sa ON sa.source = p.grp_a
            JOIN sizes sb ON sb.source = p.grp_b
            LEFT JOIN inter i ON i.grp_a = p.grp_a AND i.grp_b = p.grp_b
        )
        SELECT e.grp_a AS source_a, e.grp_b AS source_b,
               e.n_union_kept, e.n_both, e.jaccard_est, x.jaccard_exact
        FROM est e JOIN exact x ON e.grp_a = x.grp_a AND e.grp_b = x.grp_b
        ORDER BY source_a, source_b
    """
    # q146: q68's BM25 arithmetic verbatim (per query), then the
    # late-interaction replay — 16-bit sign-vector cosine is
    # (16 - 2*bit_count(xor)) / 16, integer-exact (the q129 xor/
    # bit_count convention); distinct hash sets mirror the Spark
    # distinct-on-hash dedup.
    li_vals = ", ".join(
        f"({qid}, '{t}')" for qid, text in LI_QUERIES for t in text.split(" ")
    )
    li_terms = ", ".join(
        f"'{t}'" for t in sorted({t for _, x in LI_QUERIES for t in x.split(" ")})
    )
    k1, b = BM25_K1, BM25_B
    oracles["q146_late_interaction"] = f"""
        WITH qterms(query_id, token) AS (VALUES {li_vals}),
        toks AS (
            SELECT doc_id, len({TX.tokens_sql()})::DOUBLE AS dl,
                   unnest({TX.tokens_sql()}) AS token
            FROM documents
        ),
        tf AS (
            SELECT doc_id, token, dl, COUNT(*) AS tf
            FROM toks WHERE token IN ({li_terms})
            GROUP BY doc_id, token, dl
        ),
        dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
        stats AS (SELECT COUNT(*)::DOUBLE AS n_docs,
                         AVG(len({TX.tokens_sql()})) AS avgdl
                  FROM documents),
        bm AS (
            SELECT q.query_id, t.doc_id,
                   round(SUM(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                       * (t.tf * ({k1} + 1)
                          / (t.tf + {k1} * (1 - {b} + {b} * t.dl / avgdl)))), 6)
                       AS bm25
            FROM tf t JOIN qterms q USING (token)
            JOIN dfreq USING (token) CROSS JOIN stats
            GROUP BY 1, 2
        ),
        short AS (
            SELECT query_id, doc_id FROM (
                SELECT query_id, doc_id,
                       ROW_NUMBER() OVER (PARTITION BY query_id
                                          ORDER BY bm25 DESC, doc_id) AS rn
                FROM bm
            ) WHERE rn <= {LI_SHORTLIST}
        ),
        qt AS (
            SELECT DISTINCT query_id,
                   ({TX.token_hash_sql('token')} & {LI_MASK}) AS qh
            FROM qterms
        ),
        dtok AS (
            SELECT DISTINCT doc_id, t
            FROM (SELECT doc_id, unnest({TX.tokens_sql()}) AS t
                  FROM documents)
            WHERE t <> ''
        ),
        dt AS (
            SELECT DISTINCT s.query_id, s.doc_id,
                   ({TX.token_hash_sql('t')} & {LI_MASK}) AS dh
            FROM short s JOIN dtok USING (doc_id)
        ),
        ms AS (
            SELECT d.query_id, d.doc_id, q.qh,
                   MAX(({LI_DIM} - 2 * bit_count(xor(q.qh, d.dh)))
                       / CAST({LI_DIM} AS DOUBLE)) AS mx
            FROM dt d JOIN qt q USING (query_id)
            GROUP BY 1, 2, 3
        ),
        li AS (
            SELECT query_id, doc_id, round(AVG(mx), 6) AS li_score
            FROM ms GROUP BY 1, 2
        ),
        r AS (
            SELECT query_id, doc_id, li_score,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY li_score DESC, doc_id) AS rank
            FROM li
        )
        SELECT query_id, doc_id, CAST(rank AS INT) AS rank, li_score
        FROM r WHERE rank <= {LI_K} ORDER BY query_id, rank
    """
    # q147: every cell recounted relationally; the language mode uses
    # the same (count desc, lang asc) tiebreak.
    oracles["q147_data_card"] = f"""
        WITH base AS (
            SELECT source, {TX.token_count_sql()} AS nt, md5(text) AS digest,
                   CASE WHEN {TX.token_count_sql()} >= 5
                         AND {TX.stopword_ratio_sql()} <= 0.6
                         AND {TX.type_token_ratio_sql()} >= 0.3
                        THEN 1 ELSE 0 END AS gate,
                   {TX.predicted_lang_sql()} AS lang
            FROM documents
        ),
        agg AS (
            SELECT source, COUNT(*)::BIGINT AS n_docs,
                   SUM(nt)::BIGINT AS n_tokens,
                   round(AVG(nt::DOUBLE), 6) AS mean_tokens,
                   round(CAST(1.0 AS DOUBLE)
                         - COUNT(DISTINCT digest)::DOUBLE
                           / COUNT(*)::DOUBLE, 6) AS dup_ratio,
                   round(AVG(gate::DOUBLE), 6) AS quality_pass_rate
            FROM base GROUP BY source
        ),
        lc AS (
            SELECT source, lang, COUNT(*) AS n FROM base GROUP BY 1, 2
        ),
        top AS (
            SELECT source, lang AS top_lang, n FROM (
                SELECT source, lang, n,
                       ROW_NUMBER() OVER (PARTITION BY source
                                          ORDER BY n DESC, lang) AS rn
                FROM lc
            ) WHERE rn = 1
        )
        SELECT a.source, a.n_docs, a.n_tokens, a.mean_tokens, a.dup_ratio,
               a.quality_pass_rate, t.top_lang,
               round(t.n::DOUBLE / a.n_docs::DOUBLE, 6) AS top_lang_share
        FROM agg a JOIN top t USING (source)
        ORDER BY a.source
    """
    # q149: the waterfill solve replayed with identical integer
    # arithmetic — floor division (//), the same (avail asc, source asc)
    # sort, the same prefix-saturation test, fill level and one-token
    # remainder distribution. All BIGINT until the final rate.
    bn149, bd149 = MIX_BUDGET
    cn149, cd149 = MIX_CAP
    oracles["q149_budget_mixture"] = f"""
        WITH per AS (
            SELECT source,
                   CAST(SUM(len(list_filter({TX.tokens_sql()}, t -> t <> '')))
                        AS BIGINT) AS tokens
            FROM documents GROUP BY source
        ),
        staged AS (
            SELECT source, tokens,
                   CAST((SUM(tokens) OVER () * {bn149}) // {bd149} AS BIGINT)
                       AS budget
            FROM per
        ),
        avail AS (
            SELECT source, tokens, budget,
                   tokens > (budget * {cn149}) // {cd149} AS capped,
                   least(tokens,
                         CAST((budget * {cn149}) // {cd149} AS BIGINT))
                       AS avail_tokens
            FROM staged
        ),
        ranked AS (
            SELECT *,
                   ROW_NUMBER() OVER (ORDER BY avail_tokens, source) AS rk,
                   COUNT(*) OVER () AS n,
                   COALESCE(CAST(SUM(avail_tokens) OVER (
                       ORDER BY avail_tokens, source
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS BIGINT), 0) AS cum
            FROM avail
        ),
        sat AS (
            SELECT *,
                   avail_tokens * (n - rk + 1) + cum <= budget AS saturated
            FROM ranked
        ),
        solved AS (
            SELECT *,
                   CAST(SUM(CASE WHEN saturated THEN avail_tokens ELSE 0 END)
                        OVER () AS BIGINT) AS sat_sum,
                   CAST(SUM(CASE WHEN saturated THEN 1 ELSE 0 END) OVER ()
                        AS BIGINT) AS n_sat
            FROM sat
        ),
        alloc AS (
            SELECT *,
                   CASE WHEN n - n_sat > 0
                        THEN (budget - sat_sum) // (n - n_sat)
                        ELSE 0 END AS lvl,
                   CASE WHEN n - n_sat > 0
                        THEN (budget - sat_sum)
                             - ((budget - sat_sum) // (n - n_sat)) * (n - n_sat)
                        ELSE 0 END AS rem
            FROM solved
        )
        SELECT source, tokens, avail_tokens, capped, saturated,
               CAST(CASE WHEN saturated THEN avail_tokens
                    ELSE lvl + (CASE WHEN rk - n_sat <= rem THEN 1 ELSE 0 END)
               END AS BIGINT) AS alloc_tokens,
               CASE WHEN tokens > 0 THEN
                    round(CAST(CASE WHEN saturated THEN avail_tokens
                               ELSE lvl + (CASE WHEN rk - n_sat <= rem
                                           THEN 1 ELSE 0 END)
                          END AS DOUBLE) / tokens::DOUBLE, 6)
                    ELSE 0.0 END AS rate
        FROM alloc ORDER BY source
    """

    # q150: the q147 card CTE chain rendered twice (previous = corpus
    # minus the drift decile, current = full), unpivoted via UNION ALL,
    # joined per (source, metric); the 6dp-rounded relative delta makes
    # the 2% flag boundary engine-exact.
    def _card_ctes(sfx: str, where: str) -> str:
        return f"""
        base{sfx} AS (
            SELECT source, {TX.token_count_sql()} AS nt, md5(text) AS digest,
                   CASE WHEN {TX.token_count_sql()} >= 5
                         AND {TX.stopword_ratio_sql()} <= 0.6
                         AND {TX.type_token_ratio_sql()} >= 0.3
                        THEN 1 ELSE 0 END AS gate,
                   {TX.predicted_lang_sql()} AS lang
            FROM documents {where}
        ),
        agg{sfx} AS (
            SELECT source, COUNT(*)::BIGINT AS n_docs,
                   SUM(nt)::BIGINT AS n_tokens,
                   round(AVG(nt::DOUBLE), 6) AS mean_tokens,
                   round(CAST(1.0 AS DOUBLE)
                         - COUNT(DISTINCT digest)::DOUBLE
                           / COUNT(*)::DOUBLE, 6) AS dup_ratio,
                   round(AVG(gate::DOUBLE), 6) AS quality_pass_rate
            FROM base{sfx} GROUP BY source
        ),
        lc{sfx} AS (
            SELECT source, lang, COUNT(*) AS n FROM base{sfx} GROUP BY 1, 2
        ),
        top{sfx} AS (
            SELECT source, n FROM (
                SELECT source, n,
                       ROW_NUMBER() OVER (PARTITION BY source
                                          ORDER BY n DESC, lang) AS rn
                FROM lc{sfx}
            ) WHERE rn = 1
        ),
        card{sfx} AS (
            SELECT a.source, a.n_docs, a.n_tokens, a.mean_tokens,
                   a.dup_ratio, a.quality_pass_rate,
                   round(t.n::DOUBLE / a.n_docs::DOUBLE, 6) AS top_lang_share
            FROM agg{sfx} a JOIN top{sfx} t USING (source)
        )"""

    def _unpivot(sfx: str, val: str) -> str:
        return " UNION ALL ".join(
            f"SELECT source, '{m}' AS metric, {m}::DOUBLE AS {val} FROM card{sfx}"
            for m in CARD_METRICS
        )

    oracles["q150_card_drift"] = f"""
        WITH {_card_ctes('_p', f'WHERE (doc_id // {DRIFT_DIV}) % {DRIFT_MOD} <> {DRIFT_REM}')},
        {_card_ctes('_c', '')},
        up AS ({_unpivot('_p', 'old_value')}),
        uc AS ({_unpivot('_c', 'new_value')}),
        jc AS (
            -- FULL outer (ADVICE r9): brand-new / disappeared sources
            -- coalesce the missing side to 0.0 => maximal drift
            SELECT source, metric,
                   COALESCE(old_value, 0.0) AS old_value,
                   COALESCE(new_value, 0.0) AS new_value
            FROM up FULL OUTER JOIN uc USING (source, metric)
        ),
        j AS (
            SELECT source, metric, old_value, new_value,
                   round((new_value - old_value)
                         / greatest(abs(old_value), 1e-12), 6) AS rel_delta
            FROM jc
        )
        SELECT source, metric, old_value, new_value, rel_delta,
               abs(rel_delta) >= CAST({DRIFT_EPS} AS DOUBLE) AS flagged
        FROM j ORDER BY source, metric
    """
    # q153: the q16 pairs pipeline ONCE as a CTE (the q71 wrapping
    # convention), exploded over the qualifying taus, left-joined back
    # to the full grid so empty thresholds still emit a zero row.
    tau_list = ", ".join(f"CAST({t} AS DOUBLE)" for t in DEDUP_SWEEP_TAUS)
    oracles["q153_dedup_sweep"] = f"""
        WITH pairs AS ({_lsh_pairs_core_sql(sh, mh)}),
        t AS (SELECT unnest([{tau_list}]) AS tau),
        qual AS (
            SELECT t.tau, p.id_a, p.id_b
            FROM pairs p CROSS JOIN t WHERE p.jaccard >= t.tau
        ),
        stats AS (
            SELECT tau, COUNT(*) AS n_pairs,
                   COUNT(DISTINCT id_b) AS n_dropped
            FROM qual GROUP BY tau
        ),
        nd AS (SELECT COUNT(*) AS n_docs FROM documents)
        SELECT t.tau,
               COALESCE(s.n_pairs, 0)::BIGINT AS n_pairs,
               COALESCE(s.n_dropped, 0)::BIGINT AS n_dropped,
               round(COALESCE(s.n_dropped, 0) * 1.0 / n_docs, 6) AS drop_rate
        FROM t LEFT JOIN stats s USING (tau) CROSS JOIN nd
        ORDER BY t.tau
    """
    # q154: the q66 per-source cumsum replayed, doc grid × lengths via
    # CROSS JOIN unnest, integer floor division throughout.
    len_list = ", ".join(str(x) for x in PACK_LENS)
    oracles["q154_packing_curve"] = f"""
        WITH per AS (
            SELECT source, {TX.token_count_sql()}::BIGINT AS n,
                   CAST(SUM({TX.token_count_sql()}) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS cum
            FROM documents
        ),
        lens AS (SELECT unnest([{len_list}])::BIGINT AS context_len),
        dg AS (
            SELECT l.context_len,
                   (p.n > 0 AND (p.cum - p.n) // l.context_len
                             <> (p.cum - 1) // l.context_len) AS straddled
            FROM per p CROSS JOIN lens l
        ),
        ds AS (
            SELECT context_len,
                   CAST(SUM(CASE WHEN straddled THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_straddled,
                   COUNT(*) AS n_docs
            FROM dg GROUP BY context_len
        ),
        src AS (SELECT source, CAST(SUM(n) AS BIGINT) AS total
                FROM per GROUP BY source),
        sg AS (
            SELECT l.context_len, (s.total - 1) // l.context_len + 1 AS packs,
                   s.total
            FROM src s CROSS JOIN lens l
        ),
        ss AS (
            SELECT context_len,
                   CAST(SUM(packs) AS BIGINT) AS n_packs,
                   CAST(SUM(packs * context_len - total) AS BIGINT)
                       AS padded_tokens
            FROM sg GROUP BY context_len
        )
        SELECT d.context_len, s.n_packs, d.n_straddled, s.padded_tokens,
               round(d.n_straddled * 1.0 / d.n_docs, 6) AS straddle_rate,
               round(s.padded_tokens * 1.0 / (s.n_packs * d.context_len), 6)
                   AS waste_rate
        FROM ds d JOIN ss s USING (context_len)
        ORDER BY d.context_len
    """
    # q155: every gate replayed from its own query's oracle arithmetic
    # (q130 tree sum, q128 relational recount, q72 entropy fold, q16
    # pairs), composed per doc; reasons use the same fixed order.
    oracles["q155_curation_board"] = f"""
        WITH b2 AS (SELECT doc_id, unnest({TX.ngrams_sql(n=2)}) AS g FROM documents),
        c2 AS (SELECT doc_id, g, COUNT(*) AS c FROM b2 GROUP BY 1, 2),
        s2 AS (SELECT doc_id, MAX(c) AS best, SUM(c) AS tot FROM c2 GROUP BY 1),
        b3 AS (SELECT doc_id, unnest({TX.ngrams_sql(n=3)}) AS g FROM documents),
        c3 AS (SELECT doc_id, g, COUNT(*) AS c FROM b3 GROUP BY 1, 2),
        s3 AS (SELECT doc_id,
                      COALESCE(SUM(c) FILTER (WHERE c >= 2), 0) AS dup,
                      SUM(c) AS tot
               FROM c3 GROUP BY 1),
        ech AS (SELECT doc_id, string_split(text, '') AS chars FROM documents),
        ed AS (SELECT doc_id, chars,
                      list_sort(list_distinct(chars)) AS alphabet,
                      len(chars)::DOUBLE AS total
               FROM ech),
        ent AS (SELECT doc_id,
                       {round_half_up_sql(
                           "-list_sum(list_transform(alphabet, ch ->"
                           " (len(list_filter(chars, x -> x = ch)) / total)"
                           " * ln(len(list_filter(chars, x -> x = ch)) / total)))"
                       )} AS entropy
                FROM ed),
        pairs AS ({_lsh_pairs_core_sql(sh, mh)}),
        drops AS (SELECT DISTINCT id_b AS doc_id FROM pairs
                  WHERE jaccard >= CAST({BOARD_NEARDUP_TAU} AS DOUBLE)),
        g AS (
            SELECT d.doc_id,
                   round({TX.tree_score_sql()}, 6) AS margin,
                   {TX.tree_score_sql()} > CAST(0.0 AS DOUBLE) AS quality_keep,
                   (CASE WHEN s2.tot > 0
                         THEN s2.best::DOUBLE / s2.tot::DOUBLE ELSE 0.0 END
                       <= CAST({REP_TOP2_MAX} AS DOUBLE)
                    AND CASE WHEN s3.tot > 0
                             THEN s3.dup::DOUBLE / s3.tot::DOUBLE ELSE 0.0 END
                       <= CAST({REP_DUP3_MAX} AS DOUBLE)) AS rep_keep,
                   e.entropy,
                   e.entropy >= CAST({ENTROPY_MIN} AS DOUBLE) AS entropy_keep,
                   dr.doc_id IS NULL AS dedup_keep
            FROM documents d
            LEFT JOIN s2 USING (doc_id) LEFT JOIN s3 USING (doc_id)
            JOIN ent e USING (doc_id)
            LEFT JOIN drops dr USING (doc_id)
        )
        SELECT doc_id, margin, entropy, quality_keep, rep_keep,
               entropy_keep, dedup_keep,
               (quality_keep AND rep_keep AND entropy_keep AND dedup_keep)
                   AS keep,
               COALESCE(array_to_string(list_filter([
                   CASE WHEN NOT dedup_keep THEN 'neardup' ELSE NULL END,
                   CASE WHEN NOT entropy_keep THEN 'entropy' ELSE NULL END,
                   CASE WHEN NOT quality_keep THEN 'quality' ELSE NULL END,
                   CASE WHEN NOT rep_keep THEN 'repetition' ELSE NULL END
               ], x -> x IS NOT NULL), ','), '') AS reasons
        FROM g ORDER BY doc_id
    """
    # q151: identical planting arithmetic, then RE2 replays of the
    # Java-regex counts and the ordered redaction chain (explicit 'g'
    # flag — DuckDB replaces only the first match by default).
    oracles["q151_pii_audit"] = f"""
        WITH a AS (
            SELECT doc_id,
                   text
                   || CASE WHEN doc_id % {PII_EMAIL_MOD} = 0
                           THEN ' contact user' || doc_id::VARCHAR
                                || '@example.com' ELSE '' END
                   || CASE WHEN doc_id % {PII_IP_MOD} = 0
                           THEN ' host 10.0.' || (doc_id % 256)::VARCHAR
                                || '.1' ELSE '' END
                   || CASE WHEN doc_id % {PII_PHONE_MOD} = 0
                           THEN ' call 415-555-'
                                || lpad((doc_id % 10000)::VARCHAR, 4, '0')
                           ELSE '' END
                   AS aug
            FROM documents
        )
        SELECT doc_id,
               {TX.pii_count_sql('email', 'aug')} AS n_email,
               {TX.pii_count_sql('ip', 'aug')} AS n_ip,
               {TX.pii_count_sql('phone', 'aug')} AS n_phone,
               md5({TX.pii_redact_sql('aug')}) AS redacted_md5
        FROM a ORDER BY doc_id
    """
    # q152: the double unnest replay of the pair census; DuckDB's
    # 1-based inclusive slice w[i:i+1] is Spark's substring(w, i, 2).
    oracles["q152_bpe_pairs"] = f"""
        WITH toks AS (
            SELECT unnest({TX.tokens_sql()}) AS tok FROM documents
        ),
        p AS (
            SELECT unnest({TX.char_pairs_sql('tok')}) AS pair
            FROM toks WHERE length(tok) >= 2
        ),
        cnt AS (SELECT pair, COUNT(*) AS n FROM p GROUP BY pair),
        r AS (
            SELECT pair, n,
                   ROW_NUMBER() OVER (ORDER BY n DESC, pair) AS rank
            FROM cnt
        )
        SELECT pair, n, rank FROM r WHERE rank <= {BPE_TOPK} ORDER BY rank
    """
    # q156: identical planting arithmetic, then the same positional-gram
    # inverted index + diagonal-island merge (row_number per (pair,
    # diagonal), islands split on pos gaps — separate CTEs, DuckDB
    # rejects nested window calls). SUM over INTEGER is HUGEINT in
    # DuckDB — CAST the aggregates to BIGINT to match Spark's longs.
    oracles["q156_exact_spans"] = f"""
        WITH aug AS (
            SELECT doc_id,
                   text || CASE WHEN doc_id % {SPAN_PLANT_MOD} = {SPAN_PLANT_REM}
                        THEN ' pb' || (doc_id // {SPAN_PLANT_BLOCK})::VARCHAR
                             || ' {SPAN_PASSAGE_MID} pe'
                             || (doc_id // {SPAN_PLANT_BLOCK})::VARCHAR
                        ELSE '' END AS text
            FROM documents
        ),
        h AS (
            SELECT doc_id,
                   {TX.ordered_shingle_hashes_sql('text', SPAN_GRAM_LEN)} AS hs
            FROM aug
        ),
        g AS (
            SELECT doc_id, u.pos AS pos, u.gh AS gh
            FROM (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(hs) + 1),
                              i -> struct_pack(pos := i, gh := hs[i]))) AS u
                FROM h
            )
        ),
        m AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   a.pos AS pos_a, b.pos AS pos_b
            FROM g a JOIN g b ON a.gh = b.gh AND a.doc_id < b.doc_id
        ),
        r AS (
            SELECT id_a, id_b, pos_a, pos_b,
                   pos_a - ROW_NUMBER() OVER (
                       PARTITION BY id_a, id_b, pos_a - pos_b
                       ORDER BY pos_a) AS island
            FROM m
        ),
        s AS (
            SELECT id_a, id_b,
                   MAX(pos_a) - MIN(pos_a) + {SPAN_GRAM_LEN} AS span_tokens
            FROM r GROUP BY id_a, id_b, pos_a - pos_b, island
            HAVING MAX(pos_a) - MIN(pos_a) + {SPAN_GRAM_LEN}
                   >= {SPAN_MIN_TOKENS}
        )
        SELECT id_a, id_b, COUNT(*)::BIGINT AS n_spans,
               MAX(span_tokens)::BIGINT AS max_span_tokens,
               CAST(SUM(span_tokens) AS BIGINT) AS matched_tokens
        FROM s GROUP BY id_a, id_b ORDER BY id_a, id_b
    """
    # q167: same island CTEs, but kept at interval granularity on the
    # id_b side; interval union in two window CTEs (no nested window
    # calls), then token-slice reconstruction via a 1-based indexed
    # list_filter against the doc's flattened cut positions — the
    # DuckDB twin of Spark's narrow array-filter rewrite.
    oracles["q167_span_removal"] = f"""
        WITH aug AS (
            SELECT doc_id,
                   text || CASE WHEN doc_id % {SPAN_PLANT_MOD} = {SPAN_PLANT_REM}
                        THEN ' pb' || (doc_id // {SPAN_PLANT_BLOCK})::VARCHAR
                             || ' {SPAN_PASSAGE_MID} pe'
                             || (doc_id // {SPAN_PLANT_BLOCK})::VARCHAR
                        ELSE '' END AS text
            FROM documents
        ),
        h AS (
            SELECT doc_id,
                   {TX.ordered_shingle_hashes_sql('text', SPAN_GRAM_LEN)} AS hs
            FROM aug
        ),
        g AS (
            SELECT doc_id, u.pos AS pos, u.gh AS gh
            FROM (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(hs) + 1),
                              i -> struct_pack(pos := i, gh := hs[i]))) AS u
                FROM h
            )
        ),
        m AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   a.pos AS pos_a, b.pos AS pos_b
            FROM g a JOIN g b ON a.gh = b.gh AND a.doc_id < b.doc_id
        ),
        r AS (
            SELECT id_a, id_b, pos_a, pos_b,
                   pos_a - ROW_NUMBER() OVER (
                       PARTITION BY id_a, id_b, pos_a - pos_b
                       ORDER BY pos_a) AS island
            FROM m
        ),
        s AS (
            SELECT id_b, MIN(pos_b) AS start_b,
                   MAX(pos_b) + {SPAN_GRAM_LEN} - 1 AS end_b
            FROM r GROUP BY id_a, id_b, pos_a - pos_b, island
            HAVING MAX(pos_a) - MIN(pos_a) + {SPAN_GRAM_LEN}
                   >= {SPAN_MIN_TOKENS}
        ),
        iv0 AS (SELECT DISTINCT id_b AS doc_id, start_b, end_b FROM s),
        ivb AS (
            SELECT doc_id, start_b, end_b,
                   CASE WHEN start_b > COALESCE(MAX(end_b) OVER (
                            PARTITION BY doc_id ORDER BY start_b, end_b
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), -1)
                        THEN 1 ELSE 0 END AS brk
            FROM iv0
        ),
        ivg AS (
            SELECT doc_id, start_b, end_b,
                   SUM(brk) OVER (PARTITION BY doc_id
                                  ORDER BY start_b, end_b) AS grp
            FROM ivb
        ),
        ivu AS (
            SELECT doc_id, MIN(start_b) AS s, MAX(end_b) AS e
            FROM ivg GROUP BY doc_id, grp
        ),
        cut AS (
            SELECT doc_id, COUNT(*)::BIGINT AS n_spans_cut,
                   CAST(SUM(e - s + 1) AS BIGINT) AS tokens_cut,
                   flatten(list(range(s, e + 1))) AS cut_pos
            FROM ivu GROUP BY doc_id
        )
        SELECT a.doc_id,
               -- array_to_string of an EMPTY list is NULL in DuckDB
               -- (the q155 gotcha); a fully-cut doc must emit '' like
               -- Spark's array_join does.
               COALESCE(array_to_string(
                   list_filter(string_split(a.text, ' '),
                               (x, i) -> NOT list_contains(
                                   COALESCE(c.cut_pos, []), i)),
                   ' '), '') AS cleaned_text,
               COALESCE(c.n_spans_cut, 0) AS n_spans_cut,
               COALESCE(c.tokens_cut, 0) AS tokens_cut
        FROM aug a LEFT JOIN cut c ON a.doc_id = c.doc_id
        ORDER BY a.doc_id
    """
    # q157: the oracle unrolls the same fixed merge rounds (the q96
    # PageRank convention). The fold keeps acc/element types equal
    # (VARCHAR[] of singleton lists) because DuckDB's list_reduce
    # requires it; CAST SUM -> BIGINT (HUGEINT otherwise).
    def _bpe_round(prev: str, k: int) -> str:
        return f"""
        c{k} AS (
            SELECT u.l AS l, u.r AS r, CAST(SUM(c) AS BIGINT) AS n
            FROM (
                SELECT c, unnest(list_transform(range(1, len(syms)),
                       i -> struct_pack(l := syms[i], r := syms[i+1]))) AS u
                FROM {prev}
            ) GROUP BY 1, 2
        ),
        b{k} AS (SELECT l, r, n FROM c{k} ORDER BY n DESC, l, r LIMIT 1),
        s{k} AS (
            SELECT c, list_reduce(
                list_prepend([]::VARCHAR[], list_transform(syms, x -> [x])),
                (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = b{k}.l
                                  AND x[1] = b{k}.r
                            THEN list_append(acc[1 : len(acc)-1],
                                             b{k}.l || b{k}.r)
                            ELSE list_concat(acc, x) END) AS syms
            FROM {prev}, b{k}
        )"""

    oracles["q157_bpe_merge_rounds"] = f"""
        WITH w AS (
            SELECT tok, COUNT(*)::BIGINT AS c
            FROM (SELECT unnest({TX.tokens_sql()}) AS tok FROM documents)
            GROUP BY tok
        ),
        s0 AS (SELECT c, string_split(tok, '') AS syms FROM w),
        {','.join(_bpe_round(f's{k-1}', k) for k in range(1, BPE_MERGE_ROUNDS + 1))}
        SELECT * FROM (
            {' UNION ALL '.join(
                f"SELECT {k} AS rank, l || '+' || r AS pair, n FROM b{k}"
                for k in range(1, BPE_MERGE_ROUNDS + 1)
            )}
        ) ORDER BY rank
    """
    # q158: the retriever lists are the retrievers' OWN oracles embedded
    # as subqueries (DuckDB allows WITH inside a derived table), so the
    # eval replays whatever they rank; metrics per query rounded to 6dp
    # before the macro-average, same as the Spark side.
    _dcg = f"SUM((pow(2.0, rel) - 1.0) / log2(rank + 1.0))"
    oracles["q158_retrieval_eval"] = f"""
        WITH bm AS (
            SELECT 'bm25' AS retriever, 0 AS query_id, doc_id,
                   ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
            FROM ({oracles['q68_bm25']})
        ),
        hy AS (
            SELECT 'hybrid_rrf' AS retriever, 0 AS query_id, doc_id,
                   CAST(rank AS INT) AS rank
            FROM ({oracles['q80_hybrid_rrf']})
        ),
        li AS (
            SELECT 'late_interaction' AS retriever, query_id, doc_id, rank
            FROM ({oracles['q146_late_interaction']})
        ),
        lists AS (
            SELECT * FROM bm WHERE rank <= {EVAL_K}
            UNION ALL SELECT * FROM hy WHERE rank <= {EVAL_K}
            UNION ALL SELECT * FROM li WHERE rank <= {EVAL_K}
        ),
        graded AS (
            SELECT retriever, query_id, rank,
                   {_rel_grade_sql('doc_id')} AS rel
            FROM lists
        ),
        ideal0 AS (
            SELECT {_rel_grade_sql('doc_id')} AS rel, doc_id FROM documents
            ORDER BY rel DESC, doc_id LIMIT {EVAL_K}
        ),
        ideal1 AS (
            SELECT rel, ROW_NUMBER() OVER (ORDER BY rel DESC, doc_id) AS rank
            FROM ideal0
        ),
        ideal AS (SELECT {_dcg} AS idcg FROM ideal1),
        nrel AS (
            SELECT COUNT(*) FILTER (WHERE {_rel_grade_sql('doc_id')} > 0)
                   AS n_rel
            FROM documents
        ),
        per_q AS (
            SELECT retriever, query_id,
                   round({_dcg} / ANY_VALUE(ideal.idcg), 6) AS ndcg,
                   round(COUNT(*) FILTER (WHERE rel > 0)
                         / ANY_VALUE(nrel.n_rel)::DOUBLE, 6) AS recall
            FROM graded, ideal, nrel
            GROUP BY retriever, query_id
        )
        SELECT retriever, COUNT(*)::BIGINT AS n_queries,
               round(AVG(ndcg), 6) AS ndcg_at_k,
               round(AVG(recall), 6) AS recall_at_k
        FROM per_q GROUP BY retriever ORDER BY retriever
    """
    # q159: index-served twin of q155 — execution strategy, not a
    # semantic change (index==inline asserted in tests), same oracle.
    oracles["q159_indexed_board"] = oracles["q155_curation_board"]
    # q160: the same literal-seeded gradient epoch, every CASE/literal
    # CAST to DOUBLE (DuckDB parses 0.1 as DECIMAL) and every sigmoid /
    # gradient mean rounded to 6dp exactly where the Spark side rounds.
    _lrd = lambda v: f"CAST({v} AS DOUBLE)"  # noqa: E731
    _z0 = (
        f"((({_lrd(LR_W0['bias'])} + {_lrd(LR_W0['ntok'])} * x_ntok)"
        f" + {_lrd(LR_W0['stop'])} * x_stop)"
        f" + {_lrd(LR_W0['ttr'])} * x_ttr)"
    )
    _z1 = "(((w_bias + w_ntok * x_ntok) + w_stop * x_stop) + w_ttr * x_ttr)"
    _sig = lambda z: f"round(CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE) + exp(-{z})), 6)"  # noqa: E731
    oracles["q160_lr_train_step"] = f"""
        WITH feats AS (
            SELECT doc_id,
                   {TX.token_count_sql()}::DOUBLE / {_lrd(100.0)} AS x_ntok,
                   {TX.stopword_ratio_sql()} AS x_stop,
                   {TX.type_token_ratio_sql()} AS x_ttr,
                   CASE WHEN {TX.token_count_sql()} >= 5
                         AND {TX.stopword_ratio_sql()} <= 0.6
                         AND {TX.type_token_ratio_sql()} >= 0.3
                        THEN {_lrd(1.0)} ELSE {_lrd(0.0)} END AS y
            FROM documents
        ),
        r AS (
            SELECT doc_id, x_ntok, x_stop, x_ttr, y - {_sig(_z0)} AS e
            FROM feats
        ),
        g AS (
            SELECT round(AVG(e), 6) AS g_bias,
                   round(AVG(e * x_ntok), 6) AS g_ntok,
                   round(AVG(e * x_stop), 6) AS g_stop,
                   round(AVG(e * x_ttr), 6) AS g_ttr
            FROM r
        ),
        u AS (
            SELECT g_bias, g_ntok, g_stop, g_ttr,
                   {_lrd(LR_W0['bias'])} + {_lrd(LR_RATE)} * g_bias AS w_bias,
                   {_lrd(LR_W0['ntok'])} + {_lrd(LR_RATE)} * g_ntok AS w_ntok,
                   {_lrd(LR_W0['stop'])} + {_lrd(LR_RATE)} * g_stop AS w_stop,
                   {_lrd(LR_W0['ttr'])} + {_lrd(LR_RATE)} * g_ttr AS w_ttr
            FROM g
        ),
        weights AS (
            {" UNION ALL ".join(
                f"SELECT 'weight' AS kind, {i}::BIGINT AS k, '{n}' AS name, "
                f"round(g_{n}, 6) AS grad, round(w_{n}, 6) AS value FROM u"
                for i, n in enumerate(('bias', 'ntok', 'stop', 'ttr'))
            )}
        ),
        sample AS (
            SELECT * FROM feats ORDER BY doc_id LIMIT {LR_SCORE_SAMPLE}
        ),
        scores AS (
            SELECT 'score' AS kind, doc_id AS k, 'p' AS name,
                   {_lrd(0.0)} AS grad, {_sig(_z1)} AS value
            FROM sample, u
        )
        SELECT * FROM (SELECT * FROM weights UNION ALL SELECT * FROM scores)
        ORDER BY kind, k
    """
    # q169: the oracle unrolls the LR_EPOCHS GD epochs as chained CTEs
    # (the q157/q96 convention) on top of q141's split CTEs; losses
    # replay via integer micro-nats (the q165 trick) on the clamped
    # 6dp sigmoid, the held-out AUC via q137's integer rank-sum.
    _zw = (
        "(((w.w_bias + w.w_ntok * x_ntok) + w.w_stop * x_stop)"
        " + w.w_ttr * x_ttr)"
    )
    _pc = (
        f"least(greatest(p, {_lrd(0.000001)}), {_lrd(0.999999)})"
    )
    _nats = (
        f"CAST(FLOOR((-(y * ln({_pc}) + ({_lrd(1.0)} - y) * ln({_lrd(1.0)}"
        f" - {_pc}))) * {_lrd(1000000.0)} + {_lrd(0.5)}) AS BIGINT)"
    )

    def _gm(contrib: str) -> str:
        # integer micro-unit gradient mean — mirrors the Spark _gmean
        return (
            f"round((CAST(SUM(CAST(FLOOR({contrib} * {_lrd(1000000.0)}"
            f" + {_lrd(0.5)}) AS BIGINT)) AS DOUBLE)"
            f" / CAST(COUNT(*) AS DOUBLE)) / {_lrd(1000000.0)}, 6)"
        )

    def _lr_epoch_sql(e: int) -> str:
        return f"""
        p{e} AS (
            SELECT tr.*, {_sig(_zw)} AS p FROM tr, w{e - 1} w
        ),
        a{e} AS (
            SELECT CAST(SUM({_nats}) AS BIGINT) AS nats, COUNT(*) AS n,
                   {_gm("(y - p)")} AS g_bias,
                   {_gm("((y - p) * x_ntok)")} AS g_ntok,
                   {_gm("((y - p) * x_stop)")} AS g_stop,
                   {_gm("((y - p) * x_ttr)")} AS g_ttr
            FROM p{e}
        ),
        w{e} AS (
            SELECT w.w_bias + {_lrd(LR_RATE)} * a.g_bias AS w_bias,
                   w.w_ntok + {_lrd(LR_RATE)} * a.g_ntok AS w_ntok,
                   w.w_stop + {_lrd(LR_RATE)} * a.g_stop AS w_stop,
                   w.w_ttr + {_lrd(LR_RATE)} * a.g_ttr AS w_ttr
            FROM w{e - 1} w, a{e} a
        )"""

    _lr_rows = " UNION ALL ".join(
        f"SELECT 'loss' AS kind, CAST({e} AS BIGINT) AS epoch,"
        f" 'train' AS name,"
        f" round((CAST(nats AS DOUBLE) / CAST(n AS DOUBLE))"
        f" / {_lrd(1000000.0)}, 6) AS value FROM a{e}"
        for e in range(1, LR_EPOCHS + 1)
    ) + " UNION ALL " + " UNION ALL ".join(
        f"SELECT 'weight' AS kind, CAST({e} AS BIGINT) AS epoch,"
        f" '{n}' AS name, round(w_{n}, 7) AS value FROM w{e}"
        for e in range(1, LR_EPOCHS + 1)
        for n in ("bias", "ntok", "stop", "ttr")
    )
    # shared split+train CTE chain (q169 reads the curve off it; q170
    # reads the final weights w{LR_EPOCHS} to serve the model gate)
    _lr_train_ctes = f""",
        comp AS (
            SELECT s AS doc_id, least(s, min(d)) AS component
            FROM reach GROUP BY s
        ),
        feats AS (
            SELECT d.doc_id, d.source,
                   CASE WHEN {bsql} < 80 THEN 'train'
                        WHEN {bsql} < 90 THEN 'val'
                        ELSE 'test' END AS split,
                   {TX.token_count_sql()}::DOUBLE / {_lrd(100.0)} AS x_ntok,
                   {TX.stopword_ratio_sql()} AS x_stop,
                   {TX.type_token_ratio_sql()} AS x_ttr,
                   CASE WHEN {TX.token_count_sql()} >= 5
                         AND {TX.stopword_ratio_sql()} <= 0.6
                         AND {TX.type_token_ratio_sql()} >= 0.3
                        THEN {_lrd(1.0)} ELSE {_lrd(0.0)} END AS y
            FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
        ),
        tr AS (SELECT * FROM feats WHERE split = 'train'),
        w0 AS (
            SELECT {_lrd(LR_W0['bias'])} AS w_bias,
                   {_lrd(LR_W0['ntok'])} AS w_ntok,
                   {_lrd(LR_W0['stop'])} AS w_stop,
                   {_lrd(LR_W0['ttr'])} AS w_ttr
        ),{",".join(_lr_epoch_sql(e) for e in range(1, LR_EPOCHS + 1))}"""
    oracles["q169_lr_train_curve"] = _cc_ctes(sh, mh) + _lr_train_ctes + f""",
        sc AS (
            SELECT f.doc_id, f.source, {_sig(_zw)} AS score,
                   y = {_lrd(1.0)} AS label
            FROM feats f, w{LR_EPOCHS} w WHERE f.split = 'test'
        ),
        rk AS (
            SELECT source, label,
                   ROW_NUMBER() OVER (PARTITION BY source
                                      ORDER BY score, doc_id) AS rn
            FROM sc
        ),
        ag AS (
            SELECT source,
                   COUNT(*) FILTER (WHERE label) AS n_pos,
                   COUNT(*) FILTER (WHERE NOT label) AS n_neg,
                   CAST(SUM(CASE WHEN label THEN rn ELSE 0 END) AS BIGINT)
                       AS prs
            FROM rk GROUP BY source
        ),
        aucr AS (
            SELECT 'auc' AS kind,
                   CAST({LR_EPOCHS} AS BIGINT) AS epoch,
                   source AS name,
                   COALESCE(round(CASE WHEN n_pos > 0 AND n_neg > 0 THEN
                       (CAST(prs AS DOUBLE)
                        - CAST(n_pos AS DOUBLE)
                          * (CAST(n_pos AS DOUBLE) + {_lrd(1.0)})
                          / {_lrd(2.0)})
                       / (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))
                       END, 6), {_lrd(-1.0)}) AS value
            FROM ag
        )
        SELECT * FROM ({_lr_rows} UNION ALL
                       SELECT kind, epoch, name, value FROM aucr)
        ORDER BY kind, epoch, name
    """
    # q170: q155's board CTEs on top of the shared training chain; the
    # drop set comes from the verified-pair SQL under a distinct CTE
    # name (vpairs) because _cc_ctes already owns `pairs` — index
    # pairs == inline pairs, the q159-certified identity.
    oracles["q170_model_board"] = _cc_ctes(sh, mh) + _lr_train_ctes + f""",
        b2 AS (SELECT doc_id, unnest({TX.ngrams_sql(n=2)}) AS g FROM documents),
        c2 AS (SELECT doc_id, g, COUNT(*) AS c FROM b2 GROUP BY 1, 2),
        s2 AS (SELECT doc_id, MAX(c) AS best, SUM(c) AS tot FROM c2 GROUP BY 1),
        b3 AS (SELECT doc_id, unnest({TX.ngrams_sql(n=3)}) AS g FROM documents),
        c3 AS (SELECT doc_id, g, COUNT(*) AS c FROM b3 GROUP BY 1, 2),
        s3 AS (SELECT doc_id,
                      COALESCE(SUM(c) FILTER (WHERE c >= 2), 0) AS dup,
                      SUM(c) AS tot
               FROM c3 GROUP BY 1),
        ech AS (SELECT doc_id, string_split(text, '') AS chars FROM documents),
        ed AS (SELECT doc_id, chars,
                      list_sort(list_distinct(chars)) AS alphabet,
                      len(chars)::DOUBLE AS total
               FROM ech),
        ent AS (SELECT doc_id,
                       {round_half_up_sql(
                           "-list_sum(list_transform(alphabet, ch ->"
                           " (len(list_filter(chars, x -> x = ch)) / total)"
                           " * ln(len(list_filter(chars, x -> x = ch)) / total)))"
                       )} AS entropy
                FROM ed),
        vpairs AS ({_lsh_pairs_core_sql(sh, mh)}),
        drops AS (SELECT DISTINCT id_b AS doc_id FROM vpairs
                  WHERE jaccard >= CAST({BOARD_NEARDUP_TAU} AS DOUBLE)),
        ms AS (
            SELECT f.doc_id, {_sig(_zw)} AS model_score
            FROM feats f, w{LR_EPOCHS} w
        ),
        g AS (
            SELECT d.doc_id,
                   round({TX.tree_score_sql()}, 6) AS margin,
                   {TX.tree_score_sql()} > CAST(0.0 AS DOUBLE) AS quality_keep,
                   (CASE WHEN s2.tot > 0
                         THEN s2.best::DOUBLE / s2.tot::DOUBLE ELSE 0.0 END
                       <= CAST({REP_TOP2_MAX} AS DOUBLE)
                    AND CASE WHEN s3.tot > 0
                             THEN s3.dup::DOUBLE / s3.tot::DOUBLE ELSE 0.0 END
                       <= CAST({REP_DUP3_MAX} AS DOUBLE)) AS rep_keep,
                   e.entropy,
                   e.entropy >= CAST({ENTROPY_MIN} AS DOUBLE) AS entropy_keep,
                   dr.doc_id IS NULL AS dedup_keep,
                   m.model_score,
                   m.model_score >= CAST({MODEL_KEEP_TAU} AS DOUBLE)
                       AS model_keep
            FROM documents d
            LEFT JOIN s2 USING (doc_id) LEFT JOIN s3 USING (doc_id)
            JOIN ent e USING (doc_id)
            LEFT JOIN drops dr USING (doc_id)
            JOIN ms m USING (doc_id)
        )
        SELECT doc_id, margin, entropy, quality_keep, rep_keep,
               entropy_keep, dedup_keep, model_score, model_keep,
               (quality_keep AND rep_keep AND entropy_keep AND dedup_keep
                AND model_keep) AS keep,
               COALESCE(array_to_string(list_filter([
                   CASE WHEN NOT dedup_keep THEN 'neardup' ELSE NULL END,
                   CASE WHEN NOT entropy_keep THEN 'entropy' ELSE NULL END,
                   CASE WHEN NOT quality_keep THEN 'quality' ELSE NULL END,
                   CASE WHEN NOT rep_keep THEN 'repetition' ELSE NULL END,
                   CASE WHEN NOT model_keep THEN 'model' ELSE NULL END
               ], x -> x IS NOT NULL), ','), '') AS reasons
        FROM g ORDER BY doc_id
    """
    # q171: the reference-LM CTE chain replays the operator 1:1 —
    # ref counts + vocab size from one token aggregate, add-one
    # smoothed ln, per-doc mean rounded 6dp BEFORE the per-language
    # ntile (rounded-value + doc_id tiebreak => deterministic tiles,
    # the q140 ordering discipline). CASTs keep DuckDB's DECIMAL
    # literals out of the double arithmetic.
    oracles["q171_ref_lm_buckets"] = f"""
        WITH toks AS (
            SELECT doc_id, lang, source = 'src1' AS is_ref, t AS token
            FROM (SELECT doc_id, lang, source,
                         unnest({TX.tokens_sql()}) AS t
                  FROM documents)
            WHERE t <> ''
        ),
        vocab AS (
            SELECT token,
                   CAST(COUNT(*) FILTER (WHERE is_ref) AS BIGINT) AS ref_cnt
            FROM toks GROUP BY token
        ),
        tot AS (
            SELECT CAST(SUM(ref_cnt) AS BIGINT) AS ref_total,
                   COUNT(*) AS v_size
            FROM vocab
        ),
        scored AS (
            SELECT doc_id, lang, COUNT(*) AS n_tokens,
                   round(SUM(ln((ref_cnt + CAST(1.0 AS DOUBLE))
                               / (ref_total
                                  + CAST(1.0 AS DOUBLE) * v_size)))
                         / COUNT(*), 6) AS logprob
            FROM toks JOIN vocab USING (token), tot
            GROUP BY doc_id, lang
        )
        SELECT doc_id, lang, n_tokens, logprob,
               CAST(ntile(3) OVER (PARTITION BY lang
                                   ORDER BY logprob DESC, doc_id) AS INT)
                   AS bucket
        FROM scored ORDER BY doc_id
    """
    # q161: index-served twin of q153 (execution strategy, not a
    # semantic change; index==inline pairs asserted in tests).
    oracles["q161_indexed_sweep"] = oracles["q153_dedup_sweep"]
    # q162: inline replay of the one-sided span probe — batch side =
    # planted src0 docs, corpus side = planted non-src0 docs, same
    # island-merge CTEs as q156.
    _span_plant_sql = f"""
        SELECT doc_id, source,
               text || CASE WHEN doc_id % {SPAN_PROBE_MOD} = 0
                    THEN ' pb' || (doc_id // {SPAN_PLANT_BLOCK})::VARCHAR
                         || ' {SPAN_PASSAGE_MID} pe'
                         || (doc_id // {SPAN_PLANT_BLOCK})::VARCHAR
                    ELSE '' END AS text
        FROM documents"""
    oracles["q162_indexed_spans"] = f"""
        WITH aug AS ({_span_plant_sql}),
        h AS (
            SELECT doc_id, source,
                   {TX.ordered_shingle_hashes_sql('text', SPAN_GRAM_LEN)} AS hs
            FROM aug
        ),
        g AS (
            SELECT doc_id, source, u.pos AS pos, u.gh AS gh
            FROM (
                SELECT doc_id, source,
                       unnest(list_transform(range(1, len(hs) + 1),
                              i -> struct_pack(pos := i, gh := hs[i]))) AS u
                FROM h
            )
        ),
        m AS (
            SELECT q.doc_id AS batch_id, c.doc_id AS index_id,
                   q.pos AS pos_q, c.pos AS pos_c
            FROM g q JOIN g c ON q.gh = c.gh
            WHERE q.source = 'src0' AND c.source <> 'src0'
        ),
        r AS (
            SELECT batch_id, index_id, pos_q, pos_c,
                   pos_q - ROW_NUMBER() OVER (
                       PARTITION BY batch_id, index_id, pos_q - pos_c
                       ORDER BY pos_q) AS island
            FROM m
        ),
        s AS (
            SELECT batch_id, index_id,
                   MAX(pos_q) - MIN(pos_q) + {SPAN_GRAM_LEN} AS span_tokens
            FROM r GROUP BY batch_id, index_id, pos_q - pos_c, island
            HAVING MAX(pos_q) - MIN(pos_q) + {SPAN_GRAM_LEN}
                   >= {SPAN_MIN_TOKENS}
        )
        SELECT batch_id, index_id, COUNT(*)::BIGINT AS n_spans,
               MAX(span_tokens)::BIGINT AS max_span_tokens,
               CAST(SUM(span_tokens) AS BIGINT) AS matched_tokens
        FROM s GROUP BY batch_id, index_id ORDER BY batch_id, index_id
    """
    # q172: q162's one-sided island CTEs at interval granularity on
    # the batch side, then q167's interval-union + indexed-list_filter
    # reconstruction over the src0 slice.
    oracles["q172_indexed_scrub"] = f"""
        WITH aug AS ({_span_plant_sql}),
        h AS (
            SELECT doc_id, source,
                   {TX.ordered_shingle_hashes_sql('text', SPAN_GRAM_LEN)} AS hs
            FROM aug
        ),
        g AS (
            SELECT doc_id, source, u.pos AS pos, u.gh AS gh
            FROM (
                SELECT doc_id, source,
                       unnest(list_transform(range(1, len(hs) + 1),
                              i -> struct_pack(pos := i, gh := hs[i]))) AS u
                FROM h
            )
        ),
        m AS (
            SELECT q.doc_id AS batch_id, c.doc_id AS index_id,
                   q.pos AS pos_q, c.pos AS pos_c
            FROM g q JOIN g c ON q.gh = c.gh
            WHERE q.source = 'src0' AND c.source <> 'src0'
        ),
        r AS (
            SELECT batch_id, index_id, pos_q, pos_c,
                   pos_q - ROW_NUMBER() OVER (
                       PARTITION BY batch_id, index_id, pos_q - pos_c
                       ORDER BY pos_q) AS island
            FROM m
        ),
        s AS (
            SELECT batch_id, MIN(pos_q) AS start_b,
                   MAX(pos_q) + {SPAN_GRAM_LEN} - 1 AS end_b
            FROM r GROUP BY batch_id, index_id, pos_q - pos_c, island
            HAVING MAX(pos_q) - MIN(pos_q) + {SPAN_GRAM_LEN}
                   >= {SPAN_MIN_TOKENS}
        ),
        iv0 AS (SELECT DISTINCT batch_id AS doc_id, start_b, end_b FROM s),
        ivb AS (
            SELECT doc_id, start_b, end_b,
                   CASE WHEN start_b > COALESCE(MAX(end_b) OVER (
                            PARTITION BY doc_id ORDER BY start_b, end_b
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), -1)
                        THEN 1 ELSE 0 END AS brk
            FROM iv0
        ),
        ivg AS (
            SELECT doc_id, start_b, end_b,
                   SUM(brk) OVER (PARTITION BY doc_id
                                  ORDER BY start_b, end_b) AS grp
            FROM ivb
        ),
        ivu AS (
            SELECT doc_id, MIN(start_b) AS st, MAX(end_b) AS e
            FROM ivg GROUP BY doc_id, grp
        ),
        cut AS (
            SELECT doc_id, COUNT(*)::BIGINT AS n_spans_cut,
                   CAST(SUM(e - st + 1) AS BIGINT) AS tokens_cut,
                   flatten(list(range(st, e + 1))) AS cut_pos
            FROM ivu GROUP BY doc_id
        )
        SELECT a.doc_id,
               COALESCE(array_to_string(
                   list_filter(string_split(a.text, ' '),
                               (x, i) -> NOT list_contains(
                                   COALESCE(c.cut_pos, []), i)),
                   ' '), '') AS cleaned_text,
               COALESCE(c.n_spans_cut, 0) AS n_spans_cut,
               COALESCE(c.tokens_cut, 0) AS tokens_cut
        FROM aug a LEFT JOIN cut c ON a.doc_id = c.doc_id
        WHERE a.source = 'src0'
        ORDER BY a.doc_id
    """
    # q163: the q157 merge chain carrying the word through each round,
    # then the encode join replayed relationally.
    def _bpe_round_tok(prev: str, k: int) -> str:
        return f"""
        ec{k} AS (
            SELECT u.l AS l, u.r AS r, CAST(SUM(c) AS BIGINT) AS n
            FROM (
                SELECT c, unnest(list_transform(range(1, len(syms)),
                       i -> struct_pack(l := syms[i], r := syms[i+1]))) AS u
                FROM {prev}
            ) GROUP BY 1, 2
        ),
        eb{k} AS (SELECT l, r FROM ec{k} ORDER BY n DESC, l, r LIMIT 1),
        es{k} AS (
            SELECT tok, c, list_reduce(
                list_prepend([]::VARCHAR[], list_transform(syms, x -> [x])),
                (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = eb{k}.l
                                  AND x[1] = eb{k}.r
                            THEN list_append(acc[1 : len(acc)-1],
                                             eb{k}.l || eb{k}.r)
                            ELSE list_concat(acc, x) END) AS syms
            FROM {prev}, eb{k}
        )"""

    oracles["q163_bpe_encode_stats"] = f"""
        WITH w AS (
            SELECT tok, COUNT(*)::BIGINT AS c
            FROM (SELECT unnest({TX.tokens_sql()}) AS tok FROM documents)
            GROUP BY tok
        ),
        es0 AS (SELECT tok, c, string_split(tok, '') AS syms FROM w),
        {','.join(_bpe_round_tok(f'es{k-1}', k) for k in range(1, BPE_MERGE_ROUNDS + 1))},
        enc AS (
            SELECT tok, length(tok)::BIGINT AS n_sym_before,
                   len(syms)::BIGINT AS n_sym_after
            FROM es{BPE_MERGE_ROUNDS}
        ),
        toks AS (
            SELECT source, unnest({TX.tokens_sql()}) AS tok FROM documents
        )
        SELECT source, COUNT(*)::BIGINT AS n_tokens,
               CAST(SUM(n_sym_before) AS BIGINT) AS syms_before,
               CAST(SUM(n_sym_after) AS BIGINT) AS syms_after,
               round(CAST(SUM(n_sym_before) AS DOUBLE)
                     / CAST(SUM(n_sym_after) AS DOUBLE), 6) AS compression
        FROM toks JOIN enc USING (tok)
        GROUP BY source ORDER BY source
    """
    # q164: the q16 pairs CTE at the board tau, sources attached by
    # two joins against the (doc_id, source) projection.
    oracles["q164_dup_flow"] = f"""
        WITH pairs AS ({_lsh_pairs_core_sql(sh, mh)}),
        hi AS (
            SELECT id_a, id_b FROM pairs
            WHERE jaccard >= CAST({BOARD_NEARDUP_TAU} AS DOUBLE)
        ),
        src AS (SELECT doc_id, source FROM documents)
        SELECT a.source AS source_kept, b.source AS source_dropped,
               COUNT(*)::BIGINT AS n_pairs,
               COUNT(DISTINCT h.id_b)::BIGINT AS n_docs_dropped
        FROM hi h JOIN src a ON h.id_a = a.doc_id
                  JOIN src b ON h.id_b = b.doc_id
        GROUP BY 1, 2 ORDER BY 1, 2
    """
    # q165: the same add-one bigram LM, per-bigram ln rounded to 6dp
    # before the per-doc sum (order-insensitive at compare precision).
    oracles["q165_lm_perplexity"] = f"""
        WITH db AS (
            SELECT doc_id, u.w1 AS w1, u.w2 AS w2
            FROM (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(t)),
                              i -> struct_pack(w1 := t[i], w2 := t[i+1]))) AS u
                FROM (SELECT doc_id, {TX.tokens_sql()} AS t FROM documents)
            )
        ),
        bc AS (SELECT w1, w2, COUNT(*)::BIGINT AS c12 FROM db GROUP BY 1, 2),
        un AS (SELECT w1, COUNT(*)::BIGINT AS c1 FROM db GROUP BY 1),
        vv AS (SELECT COUNT(DISTINCT w2)::BIGINT AS v FROM db),
        sc AS (
            SELECT doc_id, COUNT(*)::BIGINT AS n_bigrams,
                   CAST(SUM(CAST(floor(
                       ln((c12 + 1)::DOUBLE / (c1::DOUBLE + v::DOUBLE))
                       * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS slp_int
            FROM db JOIN bc USING (w1, w2) JOIN un USING (w1) CROSS JOIN vv
            GROUP BY doc_id
        )
        SELECT doc_id, n_bigrams,
               {round_half_up_sql(
                   "exp(-(slp_int::DOUBLE / (n_bigrams::DOUBLE * 1000000.0)))"
               )} AS ppl
        FROM sc ORDER BY doc_id
    """
    # q166: each tier's own oracle embedded as a derived table (the
    # q158 convention), one aggregate row per tier. q148's oracle lives
    # in queries/knn.py — imported lazily (knn does not import pipeline,
    # so no cycle).
    from spark_nnd_spark.queries.knn import (  # noqa: PLC0415
        _embedding_decontam_oracle,
    )

    oracles["q166_decontam_report"] = f"""
        SELECT * FROM (
            SELECT 'embedding' AS tier, COUNT(*)::BIGINT AS n_flagged,
                   COUNT(DISTINCT first_eval_id)::BIGINT AS n_refs,
                   COALESCE(CAST(SUM(n_eval_hits) AS BIGINT), 0) AS evidence
            FROM ({_embedding_decontam_oracle()}) WHERE contaminated
            UNION ALL
            SELECT 'span', COUNT(DISTINCT batch_id)::BIGINT,
                   COUNT(DISTINCT index_id)::BIGINT,
                   COALESCE(CAST(SUM(matched_tokens) AS BIGINT), 0)
            FROM ({oracles['q162_indexed_spans']})
            UNION ALL
            SELECT 'shingle', COUNT(DISTINCT doc_id)::BIGINT,
                   COUNT(DISTINCT bench_id)::BIGINT,
                   COALESCE(CAST(SUM(n_shared) AS BIGINT), 0)
            FROM ({oracles['q78_contamination_pairs']})
        ) ORDER BY tier
    """
    # q173: the next-fit fold replayed as a recursive CTE — recursion
    # steps through each (source, block) shard's rows simultaneously
    # (depth = block size), carrying the same (bin, fill) state the
    # Spark in-array fold threads.
    oracles["q173_pack_manifest"] = f"""
        WITH RECURSIVE base AS (
            SELECT source, doc_id,
                   CAST({TX.token_count_sql()} AS BIGINT) AS n_tokens,
                   ROW_NUMBER() OVER (PARTITION BY source
                                      ORDER BY doc_id) AS rn
            FROM documents
        ),
        blk AS (
            SELECT source, doc_id, n_tokens,
                   (rn - 1) // {PACKW_BLOCK_DOCS} AS block,
                   ROW_NUMBER() OVER (
                       PARTITION BY source, (rn - 1) // {PACKW_BLOCK_DOCS}
                       ORDER BY doc_id) AS brn
            FROM base
        ),
        fold AS (
            SELECT source, block, brn, doc_id, n_tokens,
                   CAST(0 AS BIGINT) AS bin, n_tokens AS fill
            FROM blk WHERE brn = 1
            UNION ALL
            SELECT b.source, b.block, b.brn, b.doc_id, b.n_tokens,
                   CASE WHEN f.fill + b.n_tokens <= {PACK_CONTEXT}
                        THEN f.bin ELSE f.bin + 1 END,
                   CASE WHEN f.fill + b.n_tokens <= {PACK_CONTEXT}
                        THEN f.fill + b.n_tokens ELSE b.n_tokens END
            FROM fold f JOIN blk b
              ON b.source = f.source AND b.block = f.block
             AND b.brn = f.brn + 1
        )
        SELECT source, block, bin, doc_id, n_tokens, fill AS fill_after,
               CASE WHEN n_tokens > {PACK_CONTEXT} THEN 1 ELSE 0 END
                   AS oversize
        FROM fold ORDER BY doc_id
    """
    # q174: the q31/q82 CC closure, then sizes + the weight division
    # (exact-integer inputs ⇒ the double quotient is bit-identical)
    oracles["q174_dedup_weights"] = _cc_ctes(sh, mh) + f""",
        comp AS (
            SELECT s AS doc_id, least(s, min(d)) AS component
            FROM reach GROUP BY s
        ),
        sizes AS (
            SELECT component, COUNT(*)::BIGINT AS cluster_size
            FROM comp GROUP BY component
        ),
        lab AS (
            SELECT c.doc_id, c.component, z.cluster_size
            FROM comp c JOIN sizes z USING (component)
        )
        SELECT d.doc_id,
               COALESCE(l.component, d.doc_id) AS component,
               COALESCE(l.cluster_size, 1)::BIGINT AS cluster_size,
               CAST({TX.token_count_sql()} AS BIGINT) AS n_tokens,
               round(CAST(1 AS DOUBLE) / COALESCE(l.cluster_size, 1), 6)
                   AS weight,
               round(CAST({TX.token_count_sql()} AS BIGINT)
                     / CAST(COALESCE(l.cluster_size, 1) AS DOUBLE), 6)
                   AS effective_tokens
        FROM documents d LEFT JOIN lab l ON d.doc_id = l.doc_id
        ORDER BY d.doc_id
    """
    oracles["q175_boilerplate_ngrams"] = f"""
        WITH posts AS (
            SELECT source, unnest({TX.shingles_sql('text', BOILER_N)}) AS shingle
            FROM documents
        ),
        dfreq AS (
            SELECT source, shingle, COUNT(*)::BIGINT AS df
            FROM posts GROUP BY source, shingle
        ),
        nd AS (
            SELECT source, COUNT(*)::BIGINT AS n_docs
            FROM documents GROUP BY source
        ),
        ranked AS (
            SELECT source, shingle, df,
                   ROW_NUMBER() OVER (PARTITION BY source
                                      ORDER BY df DESC, shingle) AS rank
            FROM dfreq
        )
        SELECT r.source, r.rank::BIGINT AS rank, r.shingle, r.df, n.n_docs,
               round(r.df / CAST(n.n_docs AS DOUBLE), 6) AS coverage
        FROM ranked r JOIN nd n USING (source)
        WHERE r.rank <= {BOILER_TOPK}
        ORDER BY r.source, r.rank
    """
    # q181: the q155 board replayed as a derived table (the q158/q166
    # embed convention), then the per-gate fail / fail-only counts.
    _gates = {
        "dedup": "dedup_keep",
        "entropy": "entropy_keep",
        "quality": "quality_keep",
        "repetition": "rep_keep",
    }
    _gate_rows = []
    for _g, _c in _gates.items():
        _others = " AND ".join(v for v in _gates.values() if v != _c)
        _gate_rows.append(f"""
            SELECT '{_g}' AS gate,
                   SUM(CASE WHEN NOT {_c} THEN 1 ELSE 0 END)::BIGINT AS n_fail,
                   SUM(CASE WHEN NOT {_c} AND {_others}
                       THEN 1 ELSE 0 END)::BIGINT AS n_fail_only,
                   COUNT(*)::BIGINT AS n_docs,
                   round(SUM(CASE WHEN NOT {_c} THEN 1 ELSE 0 END)
                         / CAST(COUNT(*) AS DOUBLE), 6) AS fail_frac
            FROM brd""")
    oracles["q181_gate_ablation"] = f"""
        WITH brd AS (SELECT * FROM ({oracles['q155_curation_board']}))
        {' UNION ALL '.join(_gate_rows)}
        ORDER BY gate
    """
    # q182: the q173 manifest CTEs + the ordered text concatenation
    oracles["q182_pack_export"] = f"""
        WITH m AS (SELECT * FROM ({oracles['q173_pack_manifest']}))
        SELECT m.source, m.block, m.bin,
               COUNT(*)::BIGINT AS n_docs,
               CAST(SUM(m.n_tokens) AS BIGINT) AS fill,
               CAST(greatest({PACK_CONTEXT} - SUM(m.n_tokens), 0) AS BIGINT)
                   AS padding,
               string_agg(d.text, ' ' ORDER BY m.doc_id) AS packed_text
        FROM m JOIN documents d ON m.doc_id = d.doc_id
        GROUP BY m.source, m.block, m.bin
        ORDER BY m.source, m.block, m.bin
    """
    # q183: micro-nat log coordinates make every OLS sum an exact
    # integer; slope/intercept are closed-form doubles over exact ints
    oracles["q183_zipf_fit"] = f"""
        WITH counts AS (
            SELECT token, COUNT(*)::BIGINT AS n
            FROM (SELECT unnest({TX.tokens_sql()}) AS token FROM documents)
            GROUP BY token ORDER BY n DESC, token LIMIT {ZIPF_TOP}
        ),
        pts AS (
            SELECT CAST(floor(ln(CAST(rank AS DOUBLE)) * 1000000.0 + 0.5)
                        AS BIGINT) AS x,
                   CAST(floor(ln(CAST(n AS DOUBLE)) * 1000000.0 + 0.5)
                        AS BIGINT) AS y
            FROM (SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, token)
                         AS rank
                  FROM counts)
        ),
        agg AS (
            SELECT COUNT(*)::BIGINT AS k, SUM(x)::BIGINT AS sx,
                   SUM(y)::BIGINT AS sy, SUM(x*y)::BIGINT AS sxy,
                   SUM(x*x)::BIGINT AS sxx
            FROM pts
        )
        SELECT k AS n_top,
               round(CAST(k*sxy - sx*sy AS DOUBLE)
                     / CAST(k*sxx - sx*sx AS DOUBLE), 6) AS slope,
               round((CAST(sy AS DOUBLE)
                      - (CAST(k*sxy - sx*sy AS DOUBLE)
                         / CAST(k*sxx - sx*sx AS DOUBLE))
                      * CAST(sx AS DOUBLE)) / k / 1000000.0, 6)
                   AS intercept
        FROM agg
    """
    # q184: same micro-nat OLS kernel over the prefix-growth points
    oracles["q184_heaps_fit"] = f"""
        WITH nd AS (SELECT COUNT(*)::BIGINT AS n_docs FROM documents),
        firsts AS (
            SELECT token, MIN(doc_id) AS fd
            FROM (SELECT doc_id, unnest({TX.tokens_sql()}) AS token
                  FROM documents)
            GROUP BY token
        ),
        percnt AS (
            SELECT doc_id, CAST({TX.token_count_sql()} AS BIGINT) AS n
            FROM documents
        ),
        grid AS (SELECT unnest(range(1, {HEAPS_GRID} + 1)) AS k),
        vk AS (
            SELECT g.k, COUNT(*)::BIGINT AS vocab
            FROM firsts f, grid g, nd
            WHERE f.fd < (nd.n_docs * g.k) // {HEAPS_GRID}
            GROUP BY g.k
        ),
        tk AS (
            SELECT g.k, CAST(SUM(p.n) AS BIGINT) AS toks
            FROM percnt p, grid g, nd
            WHERE p.doc_id < (nd.n_docs * g.k) // {HEAPS_GRID}
            GROUP BY g.k
        ),
        pts AS (
            SELECT CAST(floor(ln(CAST(toks AS DOUBLE)) * 1000000.0 + 0.5)
                        AS BIGINT) AS x,
                   CAST(floor(ln(CAST(vocab AS DOUBLE)) * 1000000.0 + 0.5)
                        AS BIGINT) AS y
            FROM vk JOIN tk USING (k)
        ),
        agg AS (
            SELECT COUNT(*)::BIGINT AS kk, SUM(x)::BIGINT AS sx,
                   SUM(y)::BIGINT AS sy, SUM(x*y)::BIGINT AS sxy,
                   SUM(x*x)::BIGINT AS sxx
            FROM pts
        )
        SELECT kk AS n_points,
               round(CAST(kk*sxy - sx*sy AS DOUBLE)
                     / CAST(kk*sxx - sx*sx AS DOUBLE), 6) AS beta,
               round((CAST(sy AS DOUBLE)
                      - (CAST(kk*sxy - sx*sy AS DOUBLE)
                         / CAST(kk*sxx - sx*sx AS DOUBLE))
                      * CAST(sx AS DOUBLE)) / kk / 1000000.0, 6)
                   AS intercept
        FROM agg
    """
    # q186: same tokenize, DuckDB's 1-based inclusive list slice ==
    # Spark's slice(tk, start+1, size); starts are stride multiples so
    # chunk_idx = start // stride exactly
    oracles["q186_chunk_export"] = f"""
        WITH toks AS (
            SELECT doc_id, {TX.tokens_sql()} AS tk FROM documents
            WHERE text <> ''
        ),
        g AS (
            SELECT doc_id, tk, len(tk) AS n,
                   unnest(range(0, len(tk), {RAG_CHUNK_STRIDE})) AS start
            FROM toks WHERE len(tk) > 0
        )
        SELECT doc_id,
               CAST(start // {RAG_CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
               CAST(start AS BIGINT) AS start,
               CAST(least({RAG_CHUNK_SIZE}, n - start) AS BIGINT) AS n_tokens,
               array_to_string(tk[start + 1 : start + {RAG_CHUNK_SIZE}], ' ')
                   AS chunk_text
        FROM g ORDER BY doc_id, chunk_idx
    """
    # q187: the q146 ranked list as CTE, graded, best positive per
    # query paired with every non-relevant ranked doc
    oracles["q187_retrieval_negatives"] = f"""
        WITH li AS (SELECT * FROM ({oracles['q146_late_interaction']})),
        g AS (SELECT *, {_rel_grade_sql('doc_id')} AS rel FROM li),
        pos AS (
            SELECT query_id, doc_id AS pos_doc_id, rank AS pos_rank,
                   li_score AS pos_score,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY rank) AS pr
            FROM g WHERE rel > 0
        ),
        neg AS (
            SELECT query_id, doc_id AS neg_doc_id, rank AS neg_rank,
                   li_score AS neg_score
            FROM g WHERE rel = 0
        )
        SELECT p.query_id, p.pos_doc_id, n.neg_doc_id, p.pos_rank,
               n.neg_rank,
               round(p.pos_score - n.neg_score, 6) AS margin
        FROM pos p JOIN neg n USING (query_id)
        WHERE p.pr = 1
        ORDER BY query_id, neg_rank
    """
    # q188: identical double pipeline (p = n/tot, shared LN2 literal),
    # per-token contribution floored to integer pico-nats before the
    # order-free per-pair sum
    oracles["q188_source_divergence"] = f"""
        WITH cnt AS (
            SELECT source, unnest({TX.tokens_sql()}) AS token FROM documents
        ),
        cc AS (
            SELECT source, token, COUNT(*)::BIGINT AS n
            FROM cnt GROUP BY source, token
        ),
        tt AS (SELECT source, SUM(n)::BIGINT AS tot FROM cc GROUP BY source),
        p AS (
            SELECT cc.source, token,
                   CAST(n AS DOUBLE) / CAST(tot AS DOUBLE) AS p
            FROM cc JOIN tt ON cc.source = tt.source
        ),
        b AS (
            SELECT a.source AS source_a, x.source AS source_b,
                   a.p AS pa, x.p AS pb
            FROM p a JOIN p x ON a.token = x.token AND a.source < x.source
        ),
        q AS (
            SELECT source_a, source_b,
                   CAST(floor((0.5 * pa * ln(pa / ((pa + pb) / 2))
                               + 0.5 * pb * ln(pb / ((pa + pb) / 2)))
                              * {JS_Q} + 0.5) AS BIGINT) AS qc,
                   CAST(floor(pa * {JS_Q} + 0.5) AS BIGINT) AS qpa,
                   CAST(floor(pb * {JS_Q} + 0.5) AS BIGINT) AS qpb
            FROM b
        ),
        agg AS (
            SELECT source_a, source_b, COUNT(*)::BIGINT AS n_shared,
                   SUM(qc)::BIGINT AS sqc, SUM(qpa)::BIGINT AS sqpa,
                   SUM(qpb)::BIGINT AS sqpb
            FROM q GROUP BY source_a, source_b
        )
        SELECT source_a, source_b, n_shared,
               round(CAST(sqc AS DOUBLE) / {float(JS_Q)!r}
                     + 0.5 * {LN2!r}
                       * (1.0 - CAST(sqpa AS DOUBLE) / {float(JS_Q)!r})
                     + 0.5 * {LN2!r}
                       * (1.0 - CAST(sqpb AS DOUBLE) / {float(JS_Q)!r}),
                     6) AS js_nats
        FROM agg ORDER BY source_a, source_b
    """
    # q189: same histogram-threshold selection; score equality joins
    # are intra-engine on the identical round(6) grid
    oracles["q189_quality_select"] = f"""
        WITH scored AS (
            SELECT doc_id, source,
                   round({TX.linear_score_sql()}, 6) AS score
            FROM documents
        ),
        hist AS (
            SELECT source, score, COUNT(*)::BIGINT AS cnt
            FROM scored GROUP BY source, score
        ),
        cum AS (
            SELECT source, score, cnt,
                   SUM(cnt) OVER (PARTITION BY source
                                  ORDER BY score DESC) AS cum
            FROM hist
        ),
        quota AS (
            SELECT source, (SUM(cnt) * {SELECT_PCT}) // 100 AS k
            FROM hist GROUP BY source
        ),
        verdict AS (
            SELECT c.source, c.score,
                   (cum <= k) AS funll, (cum - cnt < k) AS touch,
                   k - (cum - cnt) AS room
            FROM cum c JOIN quota q ON c.source = q.source
        ),
        j AS (
            SELECT s.doc_id, s.source, s.score, v.funll, v.room,
                   ROW_NUMBER() OVER (PARTITION BY s.source, s.score
                                      ORDER BY s.doc_id) AS tie_rank
            FROM scored s
            JOIN verdict v ON s.source = v.source AND s.score = v.score
            WHERE v.touch
        )
        SELECT doc_id, source, score FROM j
        WHERE funll OR tie_rank <= room
        ORDER BY source, doc_id
    """
    # q190: composes the q155 and q167 oracles verbatim — the export
    # is green only if both upstream artifacts are
    oracles["q190_corpus_export"] = f"""
        WITH rew AS (SELECT * FROM ({oracles['q167_span_removal']})),
        brd AS (
            SELECT doc_id FROM ({oracles['q155_curation_board']})
            WHERE keep
        )
        SELECT r.doc_id, d.source, r.cleaned_text AS text_out,
               CAST(CASE WHEN r.cleaned_text = '' THEN 0
                         ELSE len(string_split(r.cleaned_text, ' '))
                    END AS BIGINT) AS n_tokens_out,
               r.n_spans_cut, r.tokens_cut
        FROM rew r
        JOIN brd USING (doc_id)
        JOIN documents d USING (doc_id)
        ORDER BY doc_id
    """
    # q191: the q186 chunk CTE feeding q68's BM25 formula with
    # chunk-grained stats; round(6) before the cut, id tiebreaks
    oracles["q191_chunk_bm25"] = f"""
        WITH ch AS (SELECT * FROM ({oracles['q186_chunk_export']})),
        toks AS (
            SELECT doc_id, chunk_idx, n_tokens::DOUBLE AS dl,
                   unnest({TX.tokens_sql('chunk_text')}) AS token
            FROM ch
        ),
        tf AS (
            SELECT doc_id, chunk_idx, dl, token, COUNT(*) AS tf
            FROM toks WHERE token IN ({terms})
            GROUP BY doc_id, chunk_idx, dl, token
        ),
        dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
        stats AS (SELECT COUNT(*)::DOUBLE AS n_chunks,
                         AVG(n_tokens::DOUBLE) AS avgdl
                  FROM ch),
        scored AS (
            SELECT doc_id, chunk_idx,
                   round(SUM(ln((n_chunks - df + 0.5) / (df + 0.5) + 1.0)
                       * (tf * ({k1} + 1)
                          / (tf + {k1} * (1 - {b} + {b} * dl / avgdl)))),
                       6) AS score,
                   COUNT(*) AS n_terms
            FROM tf JOIN dfreq USING (token) CROSS JOIN stats
            GROUP BY doc_id, chunk_idx
        )
        SELECT doc_id, chunk_idx, n_terms, score
        FROM scored ORDER BY score DESC, doc_id, chunk_idx
        LIMIT {BM25_TOPN}
    """
    # q192: the shared LR training chain, the 6dp sigmoid over the
    # held-out slice, then the q139 binning kernel
    oracles["q192_model_calibration"] = _cc_ctes(sh, mh) + _lr_train_ctes + f""",
        sc AS (
            SELECT {_sig(_zw)} AS s, CAST(y AS INT) AS yl
            FROM feats f, w{LR_EPOCHS} w WHERE f.split = 'test'
        ),
        binned AS (
            SELECT least(CAST(floor(s * {CALIB_BINS}) AS INT),
                         {CALIB_BINS - 1}) AS bin, s, yl
            FROM sc
        )
        SELECT bin, COUNT(*)::BIGINT AS n,
               round(AVG(s), 6) AS mean_score,
               round(AVG(CAST(yl AS DOUBLE)), 6) AS pos_rate
        FROM binned GROUP BY bin ORDER BY bin
    """
    # q193: the same CASE ladder (no float log2), exact integer waste
    oracles["q193_length_buckets"] = f"""
        WITH base AS (
            SELECT least({TX.token_count_sql()}, {BUCKET_MAX})::BIGINT AS nn
            FROM documents
        ),
        bk AS (
            SELECT nn, (CASE WHEN nn <= 8 THEN 8 WHEN nn <= 16 THEN 16 WHEN nn <= 32 THEN 32 WHEN nn <= 64 THEN 64 WHEN nn <= 128 THEN 128 WHEN nn <= 256 THEN 256 ELSE 512 END)::BIGINT AS bucket FROM base
        ),
        gm AS (SELECT MAX(nn) AS gmax FROM bk),
        per AS (
            SELECT bucket, COUNT(*)::BIGINT AS n_docs,
                   SUM(nn)::BIGINT AS tokens
            FROM bk GROUP BY bucket
        )
        SELECT bucket, n_docs, tokens,
               (bucket * n_docs - tokens)::BIGINT AS pad_slots,
               round(CAST(bucket * n_docs - tokens AS DOUBLE)
                     / CAST(bucket * n_docs AS DOUBLE), 6) AS pad_frac,
               round(CAST(gmax * n_docs - tokens AS DOUBLE)
                     / CAST(gmax * n_docs AS DOUBLE), 6)
                   AS pad_frac_unbucketed
        FROM per CROSS JOIN gm ORDER BY bucket
    """
    # q194: index-served == inline — shares q188's oracle verbatim
    # (the q159/q161/q179 identity convention)
    oracles["q194_indexed_divergence"] = oracles["q188_source_divergence"]
    # q195: served == inline — shares q165's oracle verbatim
    oracles["q195_indexed_perplexity"] = oracles["q165_lm_perplexity"]
    # q196: served == inline — shares q140's oracle verbatim
    oracles["q196_indexed_dsir"] = oracles["q140_dsir_weights"]
    # q197: served == inline — shares q171's oracle verbatim
    oracles["q197_indexed_ref_lm"] = oracles["q171_ref_lm_buckets"]
    # q198: served == inline — shares q191's oracle verbatim
    oracles["q198_indexed_chunk_bm25"] = oracles["q191_chunk_bm25"]
    oracles["q203_domain_quality"] = _domain_quality_oracle()
    oracles["q204_domain_blocklist"] = _domain_blocklist_oracle()
    oracles["q205_indexed_winnow"] = _indexed_winnow_oracle()
    oracles["q206_gapfill_locf"] = _gapfill_locf_oracle()
    oracles["q210_gapfill_grain"] = _gapfill_locf_oracle(
        GAPFILL_GRAIN, user_mod=GAPFILL_USER_MOD
    )
    oracles["q207_ohlc_bars"] = _ohlc_bars_oracle()
    # q212: served == inline — shares q207's oracle verbatim
    oracles["q212_rollup_ohlc"] = oracles["q207_ohlc_bars"]
    oracles["q213_rollup_daily"] = _rollup_daily_oracle()
    # q214: served == inline — shares q206's oracle verbatim
    oracles["q214_rollup_gapfill"] = oracles["q206_gapfill_locf"]
    oracles["q215_rollup_refresh"] = _rollup_refresh_oracle()
    # index-served twin: the persisted-fps corpus sweep must equal the
    # inline q91 computation exactly (same (n, w), same stored-df cut)
    oracles["q209_indexed_winnow_pairs"] = oracles["q91_winnow_pairs"]
    return oracles


def _pq_adc_oracle_sql() -> str:
    """q79 oracle: replay PQ encode + ADC from codebook literals (the
    q33/q67 convention — seeded data-independent inputs make the
    approximate tier deterministic enough to hash-check). Arithmetic
    mirrors the Spark expressions exactly: squared diffs as products
    (not pow), left-to-right list_sum, struct-ordered argmin with
    code-index tiebreak, rank ties broken by nb_id."""
    from spark_nnd_spark.operators.similarity import pq_codebooks

    cb = pq_codebooks(PQ_DIM, PQ_M, PQ_CODES, PQ_SEED)
    sub = PQ_DIM // PQ_M
    cb_lit = (
        "["
        + ", ".join(
            "["
            + ", ".join(
                "[" + ", ".join(repr(float(x)) for x in code) + "]" for code in space
            )
            + "]"
            for space in cb
        )
        + "]"
    )

    def sqdist(vec: str) -> str:
        return (
            f"list_sum(list_transform(range(1, {sub + 1}), d -> "
            f"({vec}[j * {sub} + d] - cb[j + 1][k + 1][d])"
            f" * ({vec}[j * {sub} + d] - cb[j + 1][k + 1][d])))"
        )

    return f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        cbt AS (SELECT {cb_lit} AS cb),
        enc AS (
            SELECT vec_id,
                   list_transform(range(0, {PQ_M}), j ->
                       (list_min(list_transform(range(0, {PQ_CODES}), k ->
                           {{'d': {sqdist('v')}, 'c': k}}))).c
                   ) AS codes
            FROM e CROSS JOIN cbt
        ),
        lut AS (
            SELECT vec_id AS query_id,
                   list_transform(range(0, {PQ_M}), j ->
                       list_transform(range(0, {PQ_CODES}), k -> {sqdist('v')})
                   ) AS lut
            FROM e CROSS JOIN cbt WHERE vec_id < 10
        ),
        scored AS (
            SELECT query_id, c.vec_id AS nb_id,
                   list_sum(list_transform(range(0, {PQ_M}), j ->
                       lut[j + 1][codes[j + 1] + 1])) AS pq_dist
            FROM enc c CROSS JOIN lut WHERE query_id <> c.vec_id
        ),
        ranked AS (
            SELECT query_id, nb_id, pq_dist,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY pq_dist ASC, nb_id) AS rank
            FROM scored
        )
        SELECT query_id, nb_id, rank, round(pq_dist, 6) AS pq_dist
        FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
    """


PIPELINE_ORACLES = pipeline_oracles()
