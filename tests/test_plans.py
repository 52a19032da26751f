"""Plan-quality regression tests: the physical plans the engine's scale
posture depends on, asserted so a refactor can't silently regress them
(filters must reach the parquet scan, aggregation must be map-side
partial, operators must not introduce extra wide exchanges)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE

QUERIES = entrymod.queries()


def _plan(spark, name: str) -> str:
    return (
        QUERIES[name](spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def _plan_df(df) -> str:
    """Plan of an explicitly-constructed pipeline — used where the
    query itself serves a session-cached artifact (the serve path's
    lineage is cut at the localCheckpoint, so the contract must be
    asserted on the underlying pipeline builder instead)."""
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_and_projection_reach_parquet_scan(spark):
    plan = _plan(spark, "q1_filter_project")
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)]" in plan
    # column pruning: the scan must read only the referenced columns
    assert "ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double>" in plan


def test_dedup_aggregation_is_partial_then_final(spark):
    plan = _plan(spark, "q12_exact_dedup")
    assert "partial_count" in plan and "partial_min" in plan  # map-side combine
    assert plan.count("Exchange hashpartitioning") == 1  # one agg shuffle


def test_asof_join_is_single_wide_exchange(spark):
    """asof_join's contract: ONE hash exchange on the key (the union+
    window plan), never a per-key quadratic range join."""
    plan = _plan(spark, "q34_asof_join")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # both scans push their event_type filter down
    assert plan.count("EqualTo(event_type,") == 2


def test_ann_brute_broadcasts_query_side(spark):
    """The corpus must stream (never shuffle); the small query side is
    the broadcast build. Asserted on the shared-tier pipeline (q18's
    serve path reads the session checkpoint)."""
    from spark_nnd_spark.queries import knn as knq

    plan = _plan_df(knq._ann_tier_plan(spark, SF_SMOKE, "brute"))
    assert "BroadcastNestedLoopJoin BuildRight, Cross" in plan
    # corpus side reaches the scan without any exchange before the join
    assert "PushedFilters: [IsNotNull(vec_id), LessThan(vec_id,10)]" in plan


def test_token_topk_aggregates_map_side(spark):
    plan = _plan(spark, "q35_token_topk")
    assert "partial_count" in plan  # shuffle carries O(vocab), not O(tokens)


def test_exact_knn_has_no_row_level_pair_materialization(spark):
    """build_graph_exact's kernel contract: pairs are scored inside the
    Arrow cogroup kernel, not materialized as joined rows. Asserted on
    the underlying build (q24 serves the session-shared exact graph)."""
    from spark_nnd_spark.nnd.exact import build_graph_exact
    from spark_nnd_spark.queries import knn as knq

    plan = _plan_df(
        knq._explode_graph(
            build_graph_exact(
                knq._points(spark, SF_SMOKE), k=knq.K, validate=False
            )
        )
    )
    assert "FlatMapCoGroupsInPandas" in plan
    assert "SortMergeJoin" not in plan.split("FlatMapCoGroupsInPandas")[0]
    assert "Window" not in plan.split("FlatMapCoGroupsInPandas")[0]


def test_pricing_summary_pushes_filter_and_prunes_columns(spark):
    plan = _plan(spark, "q45_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate," in plan
    # 7 referenced columns only, out of 11 in the table
    assert "l_orderkey" not in plan.split("ReadSchema")[1].splitlines()[0]
    assert "partial_sum" in plan  # DECIMAL sums combine map-side


def test_range_join_is_hash_equi_join(spark):
    """range_join's contract: the interval predicate must ride a hash
    equi-join on (keys, bucket), never a nested-loop theta join."""
    plan = _plan(spark, "q43_nearby_events")
    assert "CartesianProduct" not in plan
    # the only BroadcastNestedLoopJoin-free shape: every join keyed
    assert "BroadcastNestedLoopJoin" not in plan


def test_stratified_sample_is_scan_plus_filter_only(spark):
    """Sampling must add zero exchanges: one scan, one filter."""
    plan = _plan(spark, "q40_stratified_sample")
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" in plan  # only the final ORDER BY


def test_simhash_pairs_have_no_cartesian(spark):
    plan = _plan(spark, "q42_simhash_neardup")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_funnel_is_single_user_exchange(spark):
    """The whole depth-3 funnel must cost exactly one hash exchange
    (windows + final aggregate all share the user_id partitioning)."""
    plan = _plan(spark, "q58_funnel_stages")
    assert plan.count("Exchange hashpartitioning") == 1


def test_kmeans_step_single_aggregate_exchange(spark):
    """q59: assignment is narrow (literal centroids); the only hash
    exchange is the (cluster, dim) partial→final average."""
    plan = _plan(spark, "q59_kmeans_step")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_avg" in plan or "partial_average" in plan


def test_semi_anti_plans_as_existence_joins(spark):
    plan = _plan(spark, "q54_semi_anti")
    assert "LeftSemi" in plan and "LeftAnti" in plan
    # probe side reads only the join key
    assert "ReadSchema: struct<o_custkey:bigint>" in plan


def test_cube_expands_before_exchange(spark):
    """CUBE must plan as Expand → partial aggregate → one exchange,
    not one scan per grouping set."""
    plan = _plan(spark, "q53_cube_counts")
    assert "Expand" in plan
    assert plan.count("Scan parquet") == 1


def test_chunking_is_narrow_until_sort(spark):
    """q65: tokenize→explode→slice must not shuffle (the only exchange
    is the final presentation sort's range partitioning)."""
    plan = _plan(spark, "q65_chunk_documents")
    assert plan.count("Exchange hashpartitioning") == 0


def test_packing_is_single_source_exchange(spark):
    plan = _plan(spark, "q66_pack_sequences")
    assert plan.count("Exchange hashpartitioning") == 1


def test_shingle_postings_skips_repartition_on_wide_input(spark):
    """The tiny-input fan-out repartition must NOT fire when parquet
    splits already provide parallelism: at scale it would be a full
    shuffle of raw document text before the explode."""
    from pyspark.sql import functions as F

    from spark_nnd_spark.operators.dedup import shingle_postings

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    par = spark.sparkContext.defaultParallelism

    wide = docs.repartition(par)
    plan_wide = (
        shingle_postings(wide, max_shingle_freq=None)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # exactly the caller's repartition — shingle_postings adds none
    assert plan_wide.count("Exchange RoundRobinPartitioning") == 1

    narrow = docs.coalesce(1)
    plan_narrow = (
        shingle_postings(narrow, max_shingle_freq=None)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # single-split input: the fan-out guard must kick in
    assert "RoundRobinPartitioning" in plan_narrow


def test_token_budget_scans_corpus_once(spark):
    """q69: the shuffle must carry (source, lang) partial aggregates —
    one hash exchange — and the corpus-total window must NOT trigger a
    second corpus scan."""
    plan = _plan(spark, "q69_token_budget")
    assert "partial_sum" in plan and "partial_count" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Scan parquet") == 1  # total derives from the agg


def test_zipf_head_windows_after_limit(spark):
    """q70: vocab counts are materialized once (both the top-N and the
    corpus total read the checkpoint, no second corpus scan) and the
    cumulative-share window runs AFTER the top-N limit."""
    plan = _plan(spark, "q70_zipf_head")
    assert "Scan parquet" not in plan  # reads the materialized counts
    assert plan.count("Scan ExistingRDD") == 2  # top-N side + total side
    assert "TakeOrderedAndProject" in plan
    assert "Window" in plan


def test_lang_bigrams_barrier_is_not_a_shuffle(spark):
    """q36: the anti-fusion barrier in front of the bigram explode must
    be a checkpoint (data stays put), never a repartition — a shuffle-
    as-barrier would move the whole projected (lang, bigram-array)
    stream, roughly the tokenized corpus, at scale. Exchanges may carry
    only the post-explode (lang, bigram) count stream."""
    plan = _plan(spark, "q36_lang_bigrams")
    assert "Scan parquet" not in plan  # reads the checkpointed projection
    assert "RoundRobinPartitioning" not in plan
    # the explode feeds the first (deepest) exchange directly: in the
    # top-down plan string the Generate node sits BELOW every Exchange,
    # so only exploded-and-partially-aggregated rows ever shuffle
    assert plan.rindex("Exchange") < plan.index("Generate")


def test_events_family_single_exchange_shapes(spark):
    """The recovered events family must keep its one-wide-exchange
    shapes: sessionize (user exchange), tumbling counts (window agg
    exchange), sliding avg (type+frame window exchange) — each one
    hash exchange over one corpus scan."""
    for name in ("q20_sessionize", "q21_tumbling_counts", "q47_sliding_avg"):
        plan = _plan(spark, name)
        assert plan.count("Exchange hashpartitioning") == 1, name
        assert plan.count("Scan parquet") == 1, name


def test_source_overlap_no_cartesian(spark):
    """q71: the source matrix must ride the banded equi-join pipeline —
    no cartesian/broadcast-nested-loop anywhere, map-side partials on
    the final (source_a, source_b) aggregate."""
    plan = _plan(spark, "q71_source_overlap")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_count" in plan


def test_char_entropy_and_scrub_are_pure_map_stages(spark):
    """q72/q73: per-document quality signals must stay narrow — one
    parquet scan, no hash exchange at all (the only exchange is the
    presentation sort's range partitioning)."""
    for name in ("q72_char_entropy", "q73_blocklist_scrub"):
        plan = _plan(spark, name)
        assert plan.count("Scan parquet") == 1, name
        assert "Exchange hashpartitioning" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_shingle_novelty_shuffles_distinct_pairs_only(spark):
    """q74: one corpus scan, no join at all — the per-shingle aggregate
    carries each shingle's (bounded) source list next to its source
    count, so novelty needs no second pass over the pairs. Exchanges
    carry distinct (source, shingle) pairs or smaller, all with
    map-side partials."""
    plan = _plan(spark, "q74_shingle_novelty")
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan
    assert "partial_count" in plan


def test_filter_cascade_scans_corpus_once(spark):
    """q75: all four gate booleans collapse in ONE aggregate over ONE
    corpus scan, materialized before the per-stage fan-out — the four
    stage projections read the checkpointed counter row, so the plan
    contains no parquet scan at all and four ExistingRDD reads."""
    plan = _plan(spark, "q75_filter_cascade")
    assert "Scan parquet" not in plan
    assert plan.count("Scan ExistingRDD") == 4


def test_quantized_topk_broadcasts_query_side(spark):
    """q76: identical scale posture to q18 — the quantized corpus
    streams (no exchange before the join), the tiny quantized query
    side is the broadcast build."""
    plan = _plan(spark, "q76_quantized_topk")
    assert "BroadcastNestedLoopJoin BuildRight, Cross" in plan
    assert "PushedFilters: [IsNotNull(vec_id), LessThan(vec_id,10)]" in plan


def test_weighted_sample_is_single_stratum_exchange(spark):
    """q77: the race key is a narrow per-row expression; the only hash
    exchange is the per-source top-k window."""
    plan = _plan(spark, "q77_weighted_sample")
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Scan parquet") == 1


def test_contamination_pairs_broadcasts_bench_postings(spark):
    """q78: the eval-side postings must be the broadcast build; the
    corpus streams into the join with no exchange before it, and the
    pair aggregate combines map-side. Asserted on the shared pipeline
    (q78's serve path reads the session checkpoint)."""
    from spark_nnd_spark.queries import pipeline as plq

    plan = _plan_df(plq._contam_pairs_plan(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "partial_count" in plan
    # the only hash exchange carries (doc_id, bench_id) hit partials —
    # the corpus text itself never shuffles
    assert plan.count("Exchange hashpartitioning") == 1


def test_aqe_splits_skewed_join(spark):
    """Scale posture: a hot key must trigger AQE's skew-join split (the
    runtime answer to data skew at 100 TB — oversized partitions are
    subdivided instead of straggling). Thresholds are lowered so the
    local fixture crosses them; broadcast is disabled to force the
    shuffled join AQE optimizes."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        hot = spark.range(300_000).select(
            F.lit(0).alias("k"), F.col("id").alias("v")
        )
        cold = spark.range(2_000).select(
            (F.col("id") % 100 + 1).alias("k"), F.col("id").alias("v")
        )
        left = hot.union(cold)
        right = spark.range(101).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = left.join(right, "k")
        # execute THIS DataFrame's own QueryExecution (count() would
        # build a different one and leave j's plan un-finalized)
        assert len(j.collect()) == 302_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_hybrid_rrf_cuts_before_windows(spark):
    """q80: each retriever's corpus-wide ordering must end at a top-N
    limit (TakeOrderedAndProject), so every window downstream sees
    <= RRF_CAND rows — no single-partition pass over the corpus.
    Asserted on the fused pipeline (q80 serves the session
    checkpoint); the BM25 arm's cut sits on the shared scored table,
    still a TakeOrdered."""
    from spark_nnd_spark.queries import pipeline as plq

    plan = _plan_df(plq._rrf_fused_plan(spark, SF_SMOKE))
    assert plan.count("TakeOrderedAndProject") >= 2


def test_event_anomaly_broadcasts_stats(spark):
    """q84: the O(types) stats side must broadcast — the event stream
    itself never hash-shuffles (only the stats aggregate does)."""
    plan = _plan(spark, "q84_event_anomaly")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # exactly the stats aggregate's exchange; the probe side is scan→join
    assert plan.count("Exchange hashpartitioning") == 1


def test_retention_cohorts_two_aggregate_exchanges(spark):
    """q81: one user_id exchange (first-bucket aggregate + join back
    reuse the same partitioning) and one (cohort, offset) aggregate —
    partial map-side. No cartesian, no round-robin."""
    plan = _plan(spark, "q81_retention_cohorts")
    assert "CartesianProduct" not in plan
    assert "RoundRobinPartitioning" not in plan
    assert "partial_min" in plan  # first-bucket agg combines map-side


def test_type_affinity_broadcasts_all_dims(spark):
    """q85: totals and the user-count scalar are O(types)/O(1) and must
    broadcast; the only wide work is the distinct + self-join on
    user_id."""
    plan = _plan(spark, "q85_type_affinity")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert "BroadcastNestedLoopJoin" in plan  # the scalar crossJoin


def test_bigram_lm_derives_from_checkpoints(spark):
    """q87: the bigram stream and its count table are materialized
    once; context totals and V derive from the counts, so the final
    plan reads checkpoints — no parquet rescan, no cartesian."""
    plan = _plan(spark, "q87_bigram_lm")
    assert "Scan parquet" not in plan
    assert "CartesianProduct" not in plan


def test_containment_pairs_shuffle_hash_no_cartesian(spark):
    """q88: the posting self-join must be the hinted shuffle-hash join
    on shingle (parallel fan-out), never a cartesian or a broadcast
    build over the whole posting stream."""
    plan = _plan(spark, "q88_containment_pairs")
    assert "CartesianProduct" not in plan
    assert "ShuffledHashJoin" in plan


def test_winnow_pairs_shuffle_hash_no_cartesian(spark):
    """q91: the fingerprint self-join must be the hinted shuffle-hash
    equi-join, never a cartesian; the winnow selection itself is array
    arithmetic, so the plan must not add an exchange before the posting
    explode."""
    plan = _plan(spark, "q91_winnow_pairs")
    assert "CartesianProduct" not in plan
    assert "ShuffledHashJoin" in plan


def test_event_transitions_single_stream_exchange(spark):
    """q90: one hashpartitioning exchange on user_id for the LEAD
    window; the normalizing window runs on the O(types²) aggregate, so
    the event stream is exchanged exactly once."""
    plan = _plan(spark, "q90_event_transitions")
    assert plan.count("Exchange hashpartitioning(user_id") == 1


def test_decay_engagement_broadcasts_reference_ts(spark):
    """q92: the max-timestamp reference is a one-row broadcast; the
    event stream's only exchange is the per-user aggregate."""
    plan = _plan(spark, "q92_decay_engagement")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert plan.count("Exchange hashpartitioning(user_id") == 1


def test_token_pmi_broadcasts_vocab(spark):
    """q93: the vocabulary and df sides are broadcast (bounded V), so
    the only wide work is the doc_id-keyed pair join over vocab-filtered
    postings — never a cartesian."""
    plan = _plan(spark, "q93_token_pmi")
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan


def test_cross_modal_partial_agg_no_cartesian(spark):
    """q97: the documents↔embeddings equi-join must be a real join (no
    cartesian) and the (lang,label) rollup must combine map-side."""
    plan = _plan(spark, "q97_cross_modal")
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan or "partial_avg" in plan


def test_oov_rate_broadcasts_vocab(spark):
    """q99: the top-N vocabulary joins the token stream as a broadcast
    (bounded V) — the stream's only hash exchanges are its own
    aggregates, never a shuffle keyed on the vocab join."""
    plan = _plan(spark, "q99_oov_rate")
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_source_drift_single_token_materialization(spark):
    """q101: the exploded token stream is checkpointed once and feeds
    the global counts, per-source totals, and vocab-restricted counts —
    the final plan must not rescan the documents parquet."""
    plan = _plan(spark, "q101_source_drift")
    assert "Scan parquet" not in plan
    assert "BroadcastExchange" in plan


def test_indexed_dedup_probes_stored_index_not_corpus_text(spark):
    """q103's contract: the corpus side is served by the persisted index
    — digest and shingle scans read the index parquet (the band probe
    is consumed inside the eager candidate checkpoint upstream of the
    final plan), and EVERY documents scan carries the batch predicate
    (source = 'src0'), so corpus text is never re-read."""
    plan = _plan(spark, "q103_indexed_dedup")
    # corpus digests and shingles come from the index, not documents
    assert "/digests" in plan and "/shingles" in plan
    # every documents scan is batch-side: the src0 filter reaches it
    doc_scans = [
        seg[:400]
        for seg in plan.split("FileScan parquet")[1:]
        if "documents" in seg[:400]
    ]
    assert doc_scans, "expected batch-side documents scans"
    for head in doc_scans:
        assert "(source" in head and "src0" in head, (
            "a documents scan without the batch predicate would mean "
            "the probe is re-reading corpus text:\n" + head
        )


def test_indexed_pairs_never_scan_document_text(spark):
    """q105's contract is absolute: pairs come entirely from the stored
    index, so the final plan may not contain ANY documents scan — only
    index parquet (shingle sidecar; the band self-join is consumed
    inside the eager candidate checkpoint) and checkpointed RDDs."""
    plan = _plan(spark, "q105_indexed_lsh_pairs")
    assert "documents" not in plan
    assert "/shingles" in plan


def test_indexed_jaccard_never_scans_document_text(spark):
    """q106: postings come from the stored shingle sidecar (consumed
    inside the eager postings checkpoint), so the final plan contains
    NO file scan at all — only checkpointed-RDD scans — and in
    particular never touches the documents table."""
    plan = _plan(spark, "q106_indexed_jaccard")
    assert "documents" not in plan
    assert "FileScan" not in plan
    assert "Scan ExistingRDD" in plan


def test_indexed_containment_never_scans_document_text(spark):
    """q107: same contract as q106 — sidecar postings only, no file
    scan in the final plan."""
    plan = _plan(spark, "q107_indexed_containment")
    assert "documents" not in plan
    assert "FileScan" not in plan


def test_scd2_single_user_exchange(spark):
    """q110: both windows and the run-collapse aggregate cluster on
    user_id, so the whole SCD2 build is ONE hashpartitioning exchange
    (HashPartitioning(user_id) satisfies the (user_id, version) group
    clustering — subset rule)."""
    plan = _plan(spark, "q110_scd2_history")
    assert plan.count("Exchange hashpartitioning(user_id") == 1
    assert plan.count("Exchange hashpartitioning") == 1


def test_model_scores_narrow_no_shuffle_no_udf(spark):
    """q111: the hashed-linear-model score is a pure array-lambda fold —
    no exchange other than the output sort, and no Python evaluation
    anywhere (the weight table is arithmetic, not data)."""
    plan = _plan(spark, "q111_model_scores")
    assert "Exchange hashpartitioning" not in plan
    assert "EvalPython" not in plan  # neither batch nor arrow UDF nodes


def test_temperature_mix_corpus_never_shuffles(spark):
    """q112: the only hash exchange feeds the O(sources) count
    aggregate; the rate table comes back as a broadcast, so the corpus
    itself flows scan→filter with no wide movement."""
    plan = _plan(spark, "q112_temperature_mix")
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning(source") == 1


def test_shard_assign_single_shard_exchange(spark):
    """q113: one hash exchange on the derived shard id (the per-shard
    position window); no global sort before the final presentation
    order-by."""
    plan = _plan(spark, "q113_shard_assign")
    assert plan.count("Exchange hashpartitioning(shard") == 1
    assert plan.count("Exchange hashpartitioning") == 1


def test_mrl_two_stage_no_cartesian_bounded_rerank(spark):
    """q114: coarse scoring is the broadcast-queries nested-loop (like
    q18, never a real cartesian shuffle), the candidate re-fetch and
    query re-attach are broadcast joins, and the only hash exchanges
    are the two per-query windows."""
    from spark_nnd_spark.queries import knn as knq

    plan = _plan_df(knq._ann_tier_plan(spark, SF_SMOKE, "mrl"))
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning(query_id") == 2
    assert plan.count("Exchange hashpartitioning") == 2
    assert "BroadcastExchange" in plan


def test_bloom_semi_join_filters_before_exchange(spark):
    """q115: the big side carries the bloom might_contain filter (the
    xxhash64+shiftright word probe) as a plain Filter over the scan —
    BELOW the semi join's exchange — so shuffle volume is matches +
    false positives, not the whole table."""
    plan = _plan(spark, "q115_bloom_semi_join")
    assert "LeftSemi" in plan
    # the word-probe filter must live in the join's INPUT subtree (the
    # plan renders children below the join node), i.e. evaluated
    # pre-shuffle in the scan stage, not post-join
    big_branch = plan.split("LeftSemi", 1)[1]
    assert "xxhash64" in big_branch and "shiftright" in big_branch


def test_two_phase_topk_native_partial_cut(spark):
    """q116: Catalyst's WindowGroupLimit must appear in Partial mode
    below the source exchange — the native map-side top-K cut that
    bounds the window shuffle at groups*k rows per task."""
    plan = _plan(spark, "q116_two_phase_topk")
    assert plan.count("WindowGroupLimit") == 2  # Partial below, Final above
    assert "row_number(), 3, Partial" in plan
    assert plan.count("Exchange hashpartitioning(source") == 1


def test_percentile_trim_single_source_exchange(spark):
    """q117: the percent_rank window is the only hash exchange."""
    plan = _plan(spark, "q117_percentile_trim")
    assert plan.count("Exchange hashpartitioning(source") == 1
    assert plan.count("Exchange hashpartitioning") == 1


def test_returned_revenue_broadcasts_dims_takeordered(spark):
    """q118: customer/nation broadcast, the returnflag filter reaches
    the lineitem scan, and the top-20 is a TakeOrdered, never a global
    sort."""
    plan = _plan(spark, "q118_returned_revenue")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "EqualTo(l_returnflag,R)" in plan  # pushed to the scan


def test_hopping_counts_expands_before_partial_agg(spark):
    """q119: the overlap expansion (Expand) runs map-side below the
    single partial→final aggregate exchange."""
    plan = _plan(spark, "q119_hopping_counts")
    assert "Expand" in plan
    assert "partial_count" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_indexed_mrl_coarse_reads_prefix_sidecar_only(spark):
    """q123: the coarse branch (everything feeding the first window)
    must scan the index's prefix sidecar, not the embeddings table —
    the full-vector scan appears only in the bounded rerank branch."""
    plan = _plan(spark, "q123_indexed_mrl")
    assert "/prefix" in plan and "/full" in plan
    coarse = plan.split("/full", 1)[1]  # children render below: coarse side
    assert "/prefix" in coarse


def test_partitioned_roundtrip_prunes_to_one_partition(spark):
    """q124: the event_type filter must prune at the PARTITION level of
    the engine-written dataset (hive layout), not as a row filter over
    a full scan."""
    plan = _plan(spark, "q124_partitioned_roundtrip")
    assert "PartitionFilters: [isnotnull(event_type" in plan
    assert "(event_type" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    assert "partial_count" in plan  # map-side combined aggregate


def test_unpivot_is_narrow_expand_single_agg_exchange(spark):
    """q125: the wide→long reshape is a map-side Expand (no shuffle of
    its own); the only hash exchange is the partial+final aggregate."""
    plan = _plan(spark, "q125_unpivot_measures")
    assert "Expand" in plan
    assert "partial_count" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_hist_quantiles_bounded_shuffle_partial_fold(spark):
    """q126: the histogram cells fold map-side (partial_count below the
    (grp, bin) exchange — the sketch merge IS the partial aggregate);
    the cumsum/total windows and the label pivot share ONE grp
    exchange; the exact-percentile calibration also folds partials
    map-side and broadcasts into the join. Exactly three hash
    exchanges, all O(sources·bins)-or-smaller except the calibration's
    O(values) — the one sort-based tier the sketch exists to replace."""
    plan = _plan(spark, "q126_hist_quantiles")
    assert "partial_count" in plan
    assert "partial_percentile" in plan
    assert plan.count("Exchange hashpartitioning") == 3
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_ivfpq_prunes_code_partitions_dynamically(spark):
    """q127: the persisted code scan must be pruned to the probed
    cells' hive partitions via DYNAMIC partition pruning (the probe
    set exists only at runtime), both ranking windows must carry the
    native WindowGroupLimit partial cut, and nothing is cartesian —
    the two multiplicative I/O cuts (cells × codes-not-vectors) plus
    bounded shuffles, the composed billion-vector plan."""
    plan = _plan(spark, "q127_ivfpq_topk")
    assert "dynamicpruningexpression(cell" in plan
    assert plan.count("WindowGroupLimit") >= 4  # partial+final, 2 windows
    assert "CartesianProduct" not in plan
    assert "/codes" in plan and "/full" in plan


def test_repetition_metrics_narrow_no_shuffle_no_udf(spark):
    """q128: both repetition stats are sorted-run-length folds inside
    one projection — the q72/q111 plan shape: no hash exchange at all
    (only the presentation sort's range exchange) and no Python
    evaluation nodes."""
    plan = _plan(spark, "q128_repetition_metrics")
    assert "Exchange hashpartitioning" not in plan
    assert "EvalPython" not in plan


def test_binary_topk_no_corpus_shuffle(spark):
    """q129: both cascade stages keep the corpus streaming — the sign
    bits meet the broadcast query bits, the shortlist broadcasts back
    against the full vectors, and the only hash exchanges are the two
    O(queries·shortlist) query_id windows (each carrying the native
    WindowGroupLimit partial cut). The hamming kernel is integer
    XOR+popcount inside codegen, no Python nodes."""
    from spark_nnd_spark.queries import knn as knq

    plan = _plan_df(knq._ann_tier_plan(spark, SF_SMOKE, "binary"))
    assert plan.count("Exchange hashpartitioning") == 2
    assert plan.count("Exchange hashpartitioning(query_id") == 2
    assert "bit_count" in plan
    assert plan.count("WindowGroupLimit") >= 2
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_tree_ensemble_narrow_no_shuffle_no_udf(spark):
    """q130: the whole ensemble is nested CASE WHEN over integer
    features in one projection — the q72/q111/q128 plan shape."""
    plan = _plan(spark, "q130_tree_ensemble_scores")
    assert "Exchange hashpartitioning" not in plan
    assert "EvalPython" not in plan


def test_embedding_outliers_single_pass(spark):
    """q132: the scored stream is materialized once (the q126
    multi-consumer barrier) — downstream only the O(labels) stats
    exchange and its broadcast back remain; without the barrier the
    posexplode→join→agg pipeline executed twice (5 exchanges)."""
    plan = _plan(spark, "q132_embedding_outliers")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_source_filter_funnel_one_exchange(spark):
    """q133: five cumulative gates (incl. the repetition folds and the
    GBDT margin) are pure expressions in one scan; the only exchange
    is the map-side-combined groupBy(source)."""
    plan = _plan(spark, "q133_source_filter_funnel")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange hashpartitioning(source" in plan
    assert "EvalPython" not in plan


def test_indexed_binary_reads_bits_not_vectors(spark):
    """q134: the coarse scan must read the stored sign words, never an
    embedding column — the materialized-narrow-representation claim
    (the q123 MRL convention)."""
    plan = _plan(spark, "q134_indexed_binary")
    assert "/bits" in plan and "/full" in plan
    bits_scan = [
        ln for ln in plan.splitlines() if "parquet" in ln and "/bits" in ln
    ]
    assert bits_scan and all("embedding" not in ln for ln in bits_scan)
    assert "CartesianProduct" not in plan


def test_span_scrub_shuffles_spans_once_per_stage(spark):
    """q135: the only wide ops are the span-key groupBy/join (the
    corpus-frequency floor), the per-doc fold, and the O(sources)
    summary — no cartesian stage, no Python nodes; the doc->source
    attach broadcasts."""
    plan = _plan(spark, "q135_span_scrub")
    assert "Exchange hashpartitioning(span" in plan
    assert "Exchange hashpartitioning(source" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan


def test_fuzzy_match_blocks_on_token_verifies_in_codegen(spark):
    """q136: candidates come from a token equi-join (the block), never
    a cross join; the Levenshtein verify is the JVM built-in inside
    codegen, and the row-count attach broadcasts the distinct-name
    table."""
    plan = _plan(spark, "q136_fuzzy_match")
    assert "Exchange hashpartitioning(token" in plan
    assert "levenshtein" in plan
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan


def test_model_auc_one_window_pass_per_group(spark):
    """q137: the rank-sum identity keeps AUC at two source-key hash
    exchanges total (window rank + final fold) — never a
    positive x negative pair join."""
    plan = _plan(spark, "q137_model_auc")
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Exchange hashpartitioning(source" in plan
    assert "Join" not in plan  # no pairwise AUC join of any kind
    assert "EvalPython" not in plan


def test_semantic_dedup_pairs_never_cross_cells(spark):
    """q138: the quadratic stage is an equi-join on the cell id (the
    IVF blocking bound) — cross-cell pairs are structurally impossible
    and nothing in the plan is cartesian; the verdict attach is the
    nb_id join back."""
    plan = _plan(spark, "q138_semantic_dedup")
    assert ("BroadcastHashJoin [cell" in plan) or ("SortMergeJoin [cell" in plan) or (
        "ShuffledHashJoin [cell" in plan
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_embedding_decontam_eval_broadcast_cell_join(spark):
    """q148: the eval side broadcasts (O(benchmarks) rows) and the
    comparison is an equi-join on the cell id — the train corpus never
    shuffles and cross-cell pairs are structurally impossible."""
    plan = _plan(spark, "q148_embedding_decontam")
    assert "BroadcastHashJoin [cell" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # no hash exchange of the corpus for the comparison itself: the
    # only hashpartitioning exchanges are the per-train-id aggregate
    # and the verdict join back, both keyed on the id
    assert "Exchange hashpartitioning(cell" not in plan


def test_calibration_bins_single_tiny_exchange(spark):
    """q139: one narrow scan, one O(n_bins)-group exchange with
    map-side partials — the whole audit is one aggregation."""
    plan = _plan(spark, "q139_calibration_bins")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange hashpartitioning(bin" in plan
    assert "partial_count" in plan or "partial_avg" in plan
    assert "EvalPython" not in plan


def test_dsir_weights_distributed_topk_cut(spark):
    """q140: the global selection is TakeOrderedAndProject
    (per-partition top-k + k·partitions merge), never a global rank
    window that would sort the corpus in one partition; the rank
    window runs over the k survivors only. (The dual-distribution
    tally sits behind the vocab checkpoint — its count+count_if
    single-shuffle shape is asserted by the operator unit test.)"""
    plan = _plan(spark, "q140_dsir_weights")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_leakage_safe_split_no_wide_ops_past_components(spark):
    """q141: past the (checkpointed) component table, the assignment
    is one narrow md5 expression plus a doc_id-key join — no
    cartesian stage, no Python nodes."""
    plan = _plan(spark, "q141_leakage_safe_split")
    assert "md5" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan


def test_curriculum_order_one_shard_exchange_per_epoch(spark):
    """q142: each epoch costs exactly one shard-key exchange (the q113
    kernel — seeded hash, never a global data sort; the trailing sort
    is the presentation ORDER BY); the quality gate is a codegen
    expression, not a Python node."""
    plan = _plan(spark, "q142_curriculum_order")
    assert plan.count("Exchange hashpartitioning(shard") == 2
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_hard_negatives_corpus_streams_query_broadcasts(spark):
    """q143: the corpus must stream through a broadcast of the small
    query side (the q18 exact-tier shape) with the label-mismatch
    predicate in the join, and the per-query cut must carry the native
    WindowGroupLimit partial."""
    plan = _plan(spark, "q143_hard_negatives")
    assert "BroadcastNestedLoopJoin BuildRight, Cross" in plan
    assert "WindowGroupLimit" in plan
    assert "Exchange hashpartitioning(query_id" in plan
    assert "EvalPython" not in plan


def test_balanced_cells_one_cell_exchange(spark):
    """q144: past the (narrow, Arrow-batched) cell assignment the only
    wide op is the per-cell exactly-k window — one cell-key exchange
    with the native WindowGroupLimit partial cut."""
    plan = _plan(spark, "q144_balanced_cells")
    assert "Exchange hashpartitioning(cell" in plan
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_kmv_source_jaccard_algebra_over_sketches(spark):
    """q145: the pairwise stage must run over O(sources·k) sketch rows
    with the group list as the broadcast cross side — no
    CartesianProduct, no row-wise Python (the sketch kernel is the
    Arrow-batched MapInPandas, which is allowed)."""
    plan = _plan(spark, "q145_kmv_source_jaccard")
    assert "BroadcastNestedLoopJoin BuildRight, Cross" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_late_interaction_quadratic_stage_bounded_by_shortlist(spark):
    """q146: the corpus-wide stage is the posting-filtered BM25 tally;
    both ranking cuts carry the native WindowGroupLimit partial, the
    token×token interaction happens only behind the (checkpointed)
    O(queries·shortlist) cut with the query side broadcast, and
    nothing is cartesian or row-wise Python."""
    from spark_nnd_spark.queries import pipeline as plq

    plan = _plan_df(plq._li_ranked_plan(spark, SF_SMOKE))
    assert plan.count("WindowGroupLimit") >= 2
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "bit_count" in plan  # the integer sign-vector cosine


def test_data_card_single_scan_source_aggregates(spark):
    """q147: both aggregates read the one materialized base pass (no
    second corpus scan); all wide ops are source-keyed; nothing is
    cartesian or Python."""
    from spark_nnd_spark.queries import pipeline as plq
    from spark_nnd_spark.sources import load_table

    plan = _plan_df(plq._source_card(load_table(spark, SF_SMOKE, "documents")))
    assert "Scan parquet" not in plan  # reads the checkpointed base
    assert "Exchange hashpartitioning(source" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_budget_mixture_one_corpus_exchange(spark):
    """q149: the corpus pays ONE map-side-combined source aggregate;
    the waterfill solve windows over O(sources) rows with no further
    corpus-sized work."""
    plan = _plan(spark, "q149_budget_mixture")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange hashpartitioning(source" in plan
    assert "Join" not in plan
    assert "EvalPython" not in plan


def test_pii_audit_zero_shuffle(spark):
    """q151: detect + redact are codegen regexp projections in the
    scan — no exchange of any kind before the final ORDER BY."""
    plan = _plan(spark, "q151_pii_audit")
    assert "Exchange hashpartitioning" not in plan
    assert "Join" not in plan
    assert "EvalPython" not in plan


def test_bpe_pairs_one_agg_and_takeordered(spark):
    """q152: one map-side-combined pair census, global cut via
    TakeOrderedAndProject (the q140 discipline — never a global rank
    window over the full census)."""
    plan = _plan(spark, "q152_bpe_pairs")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange hashpartitioning(pair" in plan
    assert "TakeOrderedAndProject" in plan
    assert "partial_count" in plan
    assert "EvalPython" not in plan


def test_dedup_sweep_reuses_one_pairs_pass(spark):
    """q153: the sweep explodes each verified pair over its qualifying
    taus — the only post-pairs exchanges are keyed on tau (O(taus)
    groups), and the grid fill-in joins broadcast; the LSH pipeline is
    never re-run per threshold."""
    plan = _plan(spark, "q153_dedup_sweep")
    keys = {
        m.split("(")[1]
        for m in __import__("re").findall(
            r"Exchange hashpartitioning\(\w+", plan
        )
    }
    assert keys == {"tau"}, keys
    assert "CartesianProduct" not in plan


def test_packing_curve_one_source_window(spark):
    """q154: the corpus pays one source-partitioned window exchange
    (the q66 shape); everything downstream aggregates on the O(lengths)
    grid key and the final join is a broadcast of O(lengths) rows."""
    plan = _plan(spark, "q154_packing_curve")
    import re

    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    assert keys <= {"source", "context_len"}, keys
    assert "BroadcastHashJoin [context_len" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_curation_board_single_corpus_scan(spark):
    """q155: every text gate is a codegen expression in ONE corpus scan
    (no signal pays its own pass — the pairs pipeline is a checkpointed
    side input); the drop set joins broadcast; no cartesian. Since r13
    the composed board is session-cached (_board_for), so the contract
    is asserted on the UNCACHED pipeline; the published q155 plan must
    then be a pure checkpoint read (consumers reuse one
    materialization)."""
    from spark_nnd_spark.operators import dedup as DD
    from spark_nnd_spark.queries.pipeline import (
        MAX_BAND_FREQ,
        BOARD_NEARDUP_TAU,
        board_compose,
        board_gates,
    )
    from spark_nnd_spark.sources import load_table

    import pyspark.sql.functions as F

    d = load_table(spark, SF_SMOKE, "documents")
    drops = (
        DD.minhash_lsh_pairs(
            d, num_hashes=16, bands=4, n=3, threshold=0.2,
            max_band_freq=MAX_BAND_FREQ,
        )
        .filter(F.round("jaccard", 6) >= BOARD_NEARDUP_TAU)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
        .localCheckpoint(eager=True)  # side input, as in _board_for
    )
    plan = (
        board_compose(board_gates(d), drops)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") == 1
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    # the PUBLISHED query reads the session-cached materialization
    pub = _plan(spark, "q155_curation_board")
    assert "Scan parquet" not in pub
    assert "Scan ExistingRDD" in pub


def test_exact_spans_shuffle_hash_no_cartesian(spark):
    """q156: the positional-gram inverted index self-joins with a
    shuffle-hash equi-join on the gram hash (postings pre-materialized
    — Scan ExistingRDD), never all-pairs; the island windows partition
    by (pair, diagonal) so no global single-partition window exists."""
    from spark_nnd_spark.operators import dedup as DD
    from spark_nnd_spark.queries import pipeline as plq
    from spark_nnd_spark.sources import load_table

    d = load_table(spark, SF_SMOKE, "documents")
    plan = _plan_df(
        DD.exact_span_pairs(
            plq._span_planted(d),
            gram_len=plq.SPAN_GRAM_LEN,
            min_span_tokens=plq.SPAN_MIN_TOKENS,
        )
    )
    assert "ShuffledHashJoin [gh" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    assert "hashpartitioning(id_a" in plan  # island window is pair-keyed


def test_span_removal_narrow_rewrite(spark):
    """q167: the heavy stage is q156's shuffle-hash posting join; the
    rewrite side must stay O(cut intervals) — pair-keyed island window
    (never a global single-partition window), a per-doc interval-union
    window keyed on doc_id, and a narrow codegen array filter for the
    token slice (no Python, no cartesian, no explode of corpus tokens
    through an exchange)."""
    from spark_nnd_spark.operators import dedup as DD
    from spark_nnd_spark.queries import pipeline as plq
    from spark_nnd_spark.sources import load_table

    d = load_table(spark, SF_SMOKE, "documents")
    plan = _plan_df(
        DD.span_remove_rewrite(
            plq._span_planted(d),
            gram_len=plq.SPAN_GRAM_LEN,
            min_span_tokens=plq.SPAN_MIN_TOKENS,
        )
    )
    assert "ShuffledHashJoin [gh" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    assert "hashpartitioning(id_a" in plan  # island window is pair-keyed
    assert "hashpartitioning(doc_id" in plan  # interval union is doc-keyed
    # the corpus text reaches the rewrite via the LEFT join, and the
    # token filter is an array lambda in the projection, not an explode
    assert "ArrayFilter" in plan or "filter(split(" in plan


def test_indexed_phash_probe_broadcasts_batch(spark):
    """q168: the image-index probe must broadcast the BATCH band rows
    (pre-materialized — Scan ExistingRDD) so the stored bands table
    streams through the candidate join with ZERO shuffle (the span
    probe's measured-flat contract); verification is codegen
    XOR+popcount, no cartesian, no row-wise Python."""
    plan = _plan(spark, "q168_indexed_phash")
    assert "BroadcastHashJoin [band" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    # stored bands never hash-exchange on the candidate key
    assert "Exchange hashpartitioning(band" not in plan


def test_lr_train_curve_scalar_epochs(spark):
    """q169: the epochs are already-materialized driver scalars by plan
    time (the convergence-scalar class — each was ONE single-row
    aggregate), so the final plan is the curve rows (LocalTableScan)
    plus the held-out AUC pass over the CHECKPOINTED feature table
    (Scan ExistingRDD): no parquet re-scan, no Python, no cartesian,
    and the AUC window is source-keyed, never single-partition."""
    plan = _plan(spark, "q169_lr_train_curve")
    assert "Scan parquet" not in plan
    assert "hashpartitioning(source" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_model_board_single_corpus_scan(spark):
    """q170: the learned-model gate must ride the SAME corpus scan as
    the other text gates (q155's one-scan contract — serving the
    classifier adds zero passes); drop set broadcast; no cartesian."""
    plan = _plan(spark, "q170_model_board")
    # one scan of the CORPUS; the drop set's persisted-index tables
    # (q159's path) scan separately by design
    assert plan.count("documents.parquet") == 1
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_ref_lm_buckets_single_token_pass(spark):
    """q171: reference counts + vocab size come from ONE exploded-token
    aggregate (map-side combined, checkpointed — both totals and the
    scoring join read it); scoring is a token-keyed join + per-doc
    fold; the tiles are a lang-partitioned window, never a global
    single-partition sort; no Python anywhere."""
    plan = _plan(spark, "q171_ref_lm_buckets")
    assert "partial_count" in plan
    assert "hashpartitioning(lang" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_indexed_scrub_broadcasts_batch(spark):
    """q172: the scrub probe inherits q162's contract — the BATCH gram
    rows broadcast (Scan ExistingRDD) so stored postings never
    shuffle; island + interval windows are keyed (pair-diagonal /
    batch doc), never single-partition; the token slice is a narrow
    array filter, no Python."""
    plan = _plan(spark, "q172_indexed_scrub")
    assert "BroadcastHashJoin [gh" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    assert "hashpartitioning(batch_id" in plan
    assert "ArrayFilter" in plan or "filter(split(" in plan


def test_bpe_merge_rounds_materialized_iterations(spark):
    """q157: the driver loop materializes each round (eager
    localCheckpoint — the NND iteration discipline) and since r13 the
    merge table itself is the collected driver-side result
    (bpe_train_merges), so the final plan is a local 3-row table +
    sort: no parquet re-scan, no Python."""
    plan = _plan(spark, "q157_bpe_merge_rounds")
    assert "Scan parquet" not in plan
    assert "EvalPython" not in plan
    assert "Scan ExistingRDD" in plan or "LocalTableScan" in plan


def test_retrieval_eval_broadcast_stats_no_cartesian(spark):
    """q158: the corpus-level idcg/n_rel one-row stats attach via
    broadcast (BroadcastNestedLoopJoin on a 1-row side, the q68 stats
    convention), never a CartesianProduct; eval math is codegen."""
    plan = _plan(spark, "q158_retrieval_eval")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "EvalPython" not in plan


def test_indexed_board_broadcast_dropset(spark):
    """q159: exactly one corpus text scan pays all text gates (the
    q155 contract), and the index-served drop set attaches as a
    broadcast join — the corpus never re-shingles."""
    plan = _plan(spark, "q159_indexed_board")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_lr_train_step_mapside_gradient(spark):
    """q160: the gradient epoch is ONE map-side-combined corpus
    aggregate (partial_avg in the scan stage); the updated weights
    broadcast back to the k-doc score sample; no Python, no cartesian."""
    plan = _plan(spark, "q160_lr_train_step")
    assert "partial_avg" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan


def test_indexed_sweep_never_reads_corpus_text(spark):
    """q161: the sweep is served from the index — the corpus TEXT is
    never read (no scan's ReadSchema carries the text column; the one
    documents scan is the column-pruned n_docs count), the sweep's own
    aggregate is tau-keyed, and the remaining exchanges belong to the
    index-pairs verify join (signature/shingle tables, O(pairs) — not
    a corpus re-shingle)."""
    import re

    plan = _plan(spark, "q161_indexed_sweep")
    for schema in re.findall(r"ReadSchema: (\S+)", plan):
        assert "text:string" not in schema, schema
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)", plan))
    assert "tau" in keys, keys
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_indexed_spans_shuffle_hash_probe(spark):
    """q162: the span probe equi-joins batch grams against the STORED
    gram postings (shuffle-hash on gh — never all-pairs) and the
    island windows stay (pair, diagonal)-keyed; the BATCH side
    broadcasts so the stored postings never shuffle; the corpus text
    is not re-tokenized (batch grams are the only text-derived stream,
    pre-materialized)."""
    from spark_nnd_spark.queries import pipeline as plq

    plan = _plan_df(plq._indexed_spans_plan(spark, SF_SMOKE))
    assert "BroadcastHashJoin [gh" in plan  # batch broadcasts, index streams
    assert "hashpartitioning(batch_id" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_bpe_encode_broadcasts_vocab(spark):
    """q163: the encode pass joins the corpus token stream to the
    post-merge vocab via BROADCAST (the vocab is O(distinct words)),
    and the per-source stats combine map-side — the corpus never
    shuffles rows, only (source) partials."""
    plan = _plan(spark, "q163_bpe_encode_stats")
    assert "BroadcastHashJoin [tok" in plan
    assert "partial_sum" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_dup_flow_broadcasts_pairs_not_corpus(spark):
    """q164: the source attach must broadcast the O(dup-pairs) stream,
    NEVER the O(docs)-keyed (doc_id, source) corpus projection — an
    explicit corpus-side broadcast hint bypasses
    autoBroadcastJoinThreshold and OOMs at 100 TB (VERDICT r10's one
    scale-killer). Both attach joins build LEFT (pairs side), so the
    corpus FileScans stream map-side with zero shuffle: no corpus scan
    may sit under a BroadcastExchange."""
    import re

    plan = _plan(spark, "q164_dup_flow")
    attach = re.findall(
        r"BroadcastHashJoin \[(?:cast\()?id_[ab]#\d+L?\)?[^\n]*?, (BuildLeft|BuildRight)",
        plan,
    )
    # outer two joins are the source attaches: both must build LEFT
    # (the pairs side streams into the hashed relation; the corpus
    # projection is the probe side). A regression back to
    # F.broadcast(sa/sb) flips these to BuildRight.
    assert attach and attach.count("BuildLeft") >= 2, attach
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_lm_perplexity_no_python_no_cartesian(spark):
    """q165: bigram LM training is map-side-combined count aggregates;
    scoring is keyed equi-joins over the checkpointed bigram stream —
    all codegen arithmetic, no Python, no cartesian (the 1-row vocab
    size attaches via broadcast)."""
    plan = _plan(spark, "q165_lm_perplexity")
    assert "partial_count" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_decontam_report_aggregates_tiers(spark):
    """q166: the report composes three tier queries and aggregates
    O(flagged) rows each — no cartesian, and the only Python is q148's
    Arrow-batched centroid kernel (vectorized ArrowEvalPython; row-wise
    BatchEvalPython stays banned)."""
    plan = _plan(spark, "q166_decontam_report")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "Union" in plan


def test_pack_manifest_sharded_fold(spark):
    """q173: whole-doc packing never serializes — the numbering window
    partitions by source (no single-partition global window), the
    next-fit fold is an in-array aggregate over bounded (source,
    block) groups (ObjectHashAggregate carrying collect_list of
    3-integer manifest structs — the corpus TEXT never shuffles), and
    the fold itself is codegen, no Python."""
    plan = _plan(spark, "q173_pack_manifest")
    assert "hashpartitioning(source" in plan
    assert "collect_list" in plan
    assert "ObjectHashAggregate" in plan  # grouped, never a global agg
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_dedup_weights_corpus_never_shuffles(spark):
    """q174: the weight attach is an id-keyed join of O(clustered)
    labels onto the corpus — one documents scan for the token counts,
    pairs from the persisted index (checkpointed scans), components
    via the iterative kernel; no Python, no cartesian."""
    plan = _plan(spark, "q174_dedup_weights")
    assert plan.count("documents.parquet") == 1
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_boilerplate_grouped_topk(spark):
    """q175: one corpus scan explodes distinct shingles into a
    map-side-combined (source, shingle) count; the per-source cut is
    a rank window with WindowGroupLimit (map-side partial top-k); doc
    totals broadcast. Never a global single-partition sort."""
    plan = _plan(spark, "q175_boilerplate_ngrams")
    # the corpus TEXT is read once; the doc-total side re-scans only
    # the pruned single source column (column-pruning asserted)
    assert plan.count("ReadSchema: struct<text:string") == 1
    assert plan.count("ReadSchema: struct<source:string>") == 1
    assert "WindowGroupLimit" in plan
    assert "partial_count" in plan
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan


def test_preference_pairs_cell_keyed(spark):
    """q176: both rank windows share one cell-keyed exchange; the
    chosen/rejected self-join is (cell, rank)-keyed; scoring is the
    zero-shuffle array fold (no BatchEvalPython — the only Python is
    the IVF assignment's Arrow map)."""
    plan = _plan(spark, "q176_preference_pairs")
    assert "hashpartitioning(cell" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_pca_power_iterations_materialized(spark):
    """q177: the covariance matrix and each iteration's fold stats are
    eager localCheckpoints (the q157 driver-loop discipline), so the
    final plan only unions three precomputed one-row results with the
    O(d^2) trace aggregate — no corpus re-scan, no Python."""
    plan = _plan(spark, "q177_pca_power")
    assert "Scan parquet" not in plan  # everything reads checkpoints
    assert "EvalPython" not in plan
    assert "Union" in plan


def test_kmeans_curve_rounds_materialized(spark):
    """q178: each Lloyd round's assignment is an eager localCheckpoint
    (the iterative-loop discipline), so the final plan unions three
    precomputed per-round aggregates — no embeddings re-scan, no
    Python, and the assignment itself was a literal-centroid
    projection (zero ×k row replication)."""
    plan = _plan(spark, "q178_kmeans_curve")
    assert "Scan parquet" not in plan
    assert "EvalPython" not in plan
    assert "Union" in plan


def test_indexed_pca_reads_stats_not_corpus(spark):
    """q179: the spectrum probe must read the persisted O(d^2) moment
    tables, never the embeddings corpus — no embeddings.parquet scan
    anywhere in the plan (checkpoints + the tiny stats parquet only)."""
    plan = _plan(spark, "q179_indexed_pca")
    assert "embeddings.parquet" not in plan
    assert "EvalPython" not in plan


def test_abtt_scoring_is_narrow(spark):
    """q180: the transform pass is one narrow projection of the
    embeddings against literal (mean, direction) — no hash exchange
    between the scan and the presentation sort, no Python."""
    plan = _plan(spark, "q180_abtt_scores")
    assert "embeddings.parquet" in plan  # the scoring scan IS the corpus
    assert "Exchange hashpartitioning" not in plan
    assert "EvalPython" not in plan


def test_pack_export_one_text_exchange(spark):
    """q182: the corpus text crosses exactly one hash exchange (into
    its (source, block, bin) pack group); the manifest join is
    id-keyed; concatenation is a codegen array fold, no Python."""
    plan = _plan(spark, "q182_pack_export")
    assert "collect_list" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_gate_ablation_single_board_pass(spark):
    """q181: the board is checkpointed once (the q155 pipeline runs
    once, not per gate); the ablation is a union of four one-row
    selects over the same aggregate."""
    plan = _plan(spark, "q181_gate_ablation")
    assert "Scan parquet" not in plan  # reads the checkpointed aggregate
    assert "Union" in plan
    assert "EvalPython" not in plan


def test_zipf_fit_head_cut_is_take_ordered(spark):
    """q183: the vocabulary head cut must be TakeOrderedAndProject
    (map-side partial top-k), never a global rank window over the
    whole vocab; the count shuffle carries O(vocab) partials."""
    plan = _plan(spark, "q183_zipf_fit")
    assert "TakeOrderedAndProject" in plan
    assert "partial_count" in plan
    assert "EvalPython" not in plan


def test_heaps_fit_grid_on_aggregates(spark):
    """q184: the corpus pays the token explode once (first-doc +
    per-doc counts are map-side-combined aggregates); the ×GRID
    explode runs on those O(vocab)/O(docs) aggregates with the doc
    total broadcast, never on the token stream."""
    plan = _plan(spark, "q184_heaps_fit")
    assert "partial_min" in plan     # per-token first-doc combine
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan


def test_spectrum2_no_corpus_rescan(spark):
    """q185: both power loops and the deflation run over checkpointed
    O(d^2) matrices served from the stats sidecar — no embeddings
    scan, no Python anywhere."""
    plan = _plan(spark, "q185_spectrum2")
    assert "embeddings.parquet" not in plan
    assert "EvalPython" not in plan
    assert "Union" in plan


def test_chunk_export_is_narrow(spark):
    """q186: chunking is tokenize + generator + slice — zero hash
    exchanges (the only exchange is the presentation range sort), no
    Python, no join."""
    plan = _plan(spark, "q186_chunk_export")
    assert "Exchange hashpartitioning" not in plan
    assert "EvalPython" not in plan
    assert "Join" not in plan
    assert "Generate posexplode" in plan or "Generate" in plan


def test_retrieval_negatives_mines_ranked_rows_only(spark):
    """q187: the corpus text scan feeds only the retriever (one
    documents scan for tokens + one for stats is q146's contract); the
    mining join runs on O(queries*k) rows with no extra corpus scan
    and no cartesian product."""
    plan = _plan(spark, "q187_retrieval_negatives")
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_source_divergence_vocab_bounded(spark):
    """q188: one (source, token) map-side-combined aggregate over the
    corpus; the pair join is keyed on token (equi-join, never a
    cartesian over sources)."""
    plan = _plan(spark, "q188_source_divergence")
    assert "partial_count" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_quality_select_no_source_wide_sort(spark):
    """q189's reason to exist: NO rank window partitioned by source
    alone over document rows (that single-threads a source at 100 TB).
    The only row_number partitions by (source, score) — the boundary
    bucket — and the cumulative window runs over the histogram."""
    plan = _plan(spark, "q189_quality_select")
    import re

    for m in re.finditer(r"row_number\(\) windowspecdefinition\(([^)]*)\)", plan):
        spec = m.group(1)
        assert "score" in spec, f"doc-row rank window missing score key: {spec}"
    assert "partial_count" in plan  # histogram combines map-side


def test_corpus_export_no_corpus_side_broadcast(spark):
    """q190 (the q164 lesson, promoted to an assert): no explicit
    broadcast of a corpus-keyed projection — the only BroadcastExchange
    feeding a join may be the O(dup-docs) drop set inside the board;
    the id-keyed composition joins stay AQE-planned. Also: no
    cartesian, no Python."""
    plan = _plan(spark, "q190_corpus_export")
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_chunk_bm25_filters_before_shuffle(spark):
    """q191: the posting stream cuts to query terms before any
    exchange; df/stats ride broadcasts; the cut is a TakeOrdered, not
    a single-partition rank window."""
    plan = _plan(spark, "q191_chunk_bm25")
    assert "TakeOrderedAndProject" in plan
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_indexed_divergence_reads_stats_not_corpus(spark):
    """q194: the served divergence runs over the persisted counts —
    no documents scan, no Python."""
    plan = _plan(spark, "q194_indexed_divergence")
    assert "documents.parquet" not in plan
    assert "EvalPython" not in plan


def test_indexed_perplexity_trains_from_stats(spark):
    """q195: the trained LM tables come from the persisted bigram
    counts — the corpus appears only as the scored bigram stream (one
    checkpointed scan), never as a second training tally. Weak proxy:
    exactly one groupBy over (w1, w2) appears (the inline q165 has the
    training aggregate too; served drops it)."""
    plan_inline = _plan(spark, "q165_lm_perplexity")
    plan_served = _plan(spark, "q195_indexed_perplexity")
    assert "EvalPython" not in plan_served
    # the served plan reads the sidecar parquet
    assert "counts" in plan_served
    # inline re-counts bigrams; served must not
    assert plan_served.count("partial_count") < plan_inline.count("partial_count") or "bigram_stats" in plan_served


def test_indexed_chunk_bm25_prunes_postings(spark):
    """q198: the probe reads the persisted chunk postings with the
    token IN filter pushed to the scan — never the documents table —
    and ends in a TakeOrdered."""
    plan = _plan(spark, "q198_indexed_chunk_bm25")
    assert "documents.parquet" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "EvalPython" not in plan


def test_domain_quality_is_one_mapside_aggregate(spark):
    """q203's contract: one codegen text scan + ONE map-side-combined
    aggregate keyed by domain — no joins, one agg exchange (plus the
    presentation sort)."""
    plan = _plan(spark, "q203_domain_quality")
    assert "partial_count" in plan or "partial_sum" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_domain_blocklist_gates_arrive_by_broadcast(spark):
    """q204's contract: the corpus scans once; both gates (literal
    blocklist, O(domains) verdict table) join by broadcast — no
    corpus-keyed SortMergeJoin."""
    plan = _plan(spark, "q204_domain_blocklist")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_graph_recall_row_has_no_cartesian_beyond_scalar_cross(spark):
    """q200 composes the brute ground truth (query side broadcast) with
    two 1-row aggregates; the only nested-loop join allowed is the
    scalar hits x total cross."""
    plan = _plan(spark, "q200_graph_search_recall")
    assert "SortMergeJoin" not in plan


def test_indexed_winnow_batch_broadcasts_into_stored_postings(spark):
    """q205: the winnow probe broadcasts the BATCH fingerprint set into
    the fp-sorted stored postings scan — the postings never shuffle,
    nothing is all-pairs, no Python in the path."""
    plan = _plan(spark, "q205_indexed_winnow")
    assert "BroadcastHashJoin [fp" in plan  # batch broadcasts, index streams
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_gapfill_grid_is_narrow_explode_per_user(spark):
    """q206: the dense slot grid comes from a sequence-EXPLODE of the
    O(users) bounds rows (never a cross join against a slot table),
    and the LOCF window runs inside the user partitioning."""
    plan = _plan(spark, "q206_gapfill_locf")
    assert "Generate explode" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan


def test_ohlc_is_one_partial_aggregate_no_join(spark):
    """q207's contract: one map-side-combined (user, bucket) aggregate
    — min_by/max_by partials carry one (value, key) pair per group per
    partition; no join, no window, one agg exchange (plus the
    presentation sort)."""
    plan = _plan(spark, "q207_ohlc_bars")
    assert "partial_min_by" in plan or "partial_min" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
    assert "Window" not in plan


def test_prototype_prune_has_no_pairwise_stage(spark):
    """q208's contract: narrow Arrow-batched centroid assignment, then
    ONLY cell-keyed exchanges for the bounded in-cell ranking windows —
    no join at all (unlike SemDeDup's same-cell pair scan)."""
    plan = _plan(spark, "q208_prototype_prune")
    assert "Join" not in plan
    assert "CartesianProduct" not in plan
    assert "hashpartitioning(cell" in plan


def test_indexed_winnow_pairs_never_touch_text(spark):
    """q209: the corpus pair sweep reads ONLY the stored fp postings —
    no documents scan, no shingling, shuffle-hash equi-join on fp
    (never all-pairs), no Python."""
    plan = _plan(spark, "q209_indexed_winnow_pairs")
    assert "documents.parquet" not in plan
    assert "ShuffledHashJoin [fp" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_rollup_probes_never_scan_events(spark):
    """q212/q213 contract: continuous-aggregate probes read ONLY the
    persisted rollup — the raw events hypertable appears nowhere in
    the plan (the whole point of maintaining the 12th family)."""
    for q in ("q212_rollup_ohlc", "q213_rollup_daily", "q214_rollup_gapfill"):
        plan = _plan(spark, q)
        assert "events.parquet" not in plan
        assert "CartesianProduct" not in plan
        assert "EvalPython" not in plan


def test_gapfill_grain_same_contract_as_hourly(spark):
    """q210 (generic-grain gap-fill) keeps q206's plan contract: the
    dense grid is a narrow per-user sequence explode, never a cross
    join, and the epoch-modulo bucketing stays inside codegen."""
    plan = _plan(spark, "q210_gapfill_grain")
    assert "Generate explode" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan
