"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-
insensitive value-hash → CORRECTNESS_r{N}.json).

Query inventory (operator → SURVEY.md §2 mapping lives in each module):
- q1–q10: the reference's relational/dataflow primitives; q45–q47, q52:
  TPC-H-shaped pricing summary / shipping-priority top-k, a
  sliding-frame window, and an explicit salted hot-key join (spark_nnd_spark/queries/relational.py).
- q11–q23, q27–q29, q34–q44, q48–q51: training-data-pipeline extensions — text analysis,
  dedup family (exact / fingerprint / n-gram Jaccard / MinHash-LSH /
  SimHash), embedding similarity + near-dup, event sessionization and
  windows, multimodal binary-payload ops (image stats / frame sampling
  / audio stats over mapInPandas with deterministic fake decode),
  as-of join (union+window; DuckDB ASOF oracle), token top-k,
  per-language bigram profiles, quality-gate filter, exact per-type
  value percentiles, per-doc TF-IDF top terms, deterministic
  stratified sampling, ROLLUP multi-level aggregates, banded SimHash
  hamming near-dup pairs, bucketized interval self-join, per-label
  embedding centroids, inter-event gap percentiles, declared-values
  pivot, within-doc repetition scoring, benchmark decontamination
  (spark_nnd_spark/queries/pipeline.py).
- q24–q26, q30, q33: K-NN graph surface — exact graph (oracle-checked),
  NN-Descent (rows-only; recall-checked in tests), LSH/IVF ANN
  (rows-only), and q33: a hash-checked recall row per approximate
  method (spark_nnd_spark/queries/knn.py).
- q53–q57, q62–q63: CUBE, semi/anti joins, INTERSECT/EXCEPT,
  distribution windows, correlated-avg shape, 5-table TPC-H-Q5 join,
  FULL OUTER join (queries/relational.py); q58 ordered funnel,
  q60 unigram LM score, q61 dedup keep/drop verdict, q64 MinHash
  estimator calibration, q65 token chunking with overlap, q66
  per-source sequence packing, q68 BM25 retrieval scoring,
  q69 per-(source,lang) token-budget accounting, q70 Zipf vocabulary
  head profile, q71 cross-source near-dup overlap matrix,
  q72 char-entropy quality signal, q73 blocklist scrub/redaction,
  q74 per-source shingle novelty, q75 filter-cascade attrition audit,
  q76 int8-quantized cosine top-k, q77 deterministic weighted
  sampling (Efraimidis-Spirakis race), q78 span-level
  contamination pairs, q79 product-quantization ADC top-k,
  q80 hybrid BM25+vector retrieval with reciprocal-rank fusion,
  q81 day-grain cohort retention triangle, q82 near-dup cluster-size
  histogram, q83 incremental batch-vs-corpus dedup verdicts,
  q84 per-type z-score anomalies, q85 event-type co-occurrence lift,
  q86 language-ID confusion matrix, q87 bigram-LM quality score,
  q88 directed shingle-containment near-dups, q89 per-source
  token-length deciles, q90 event-type Markov transition matrix,
  q91 winnowing-fingerprint near-dup pairs (local passage copies),
  q92 recency-decay engagement scores, q93 top-vocab token PMI
  collocations, q94 exactly-k per-source deterministic sample,
  q95 user lifecycle-stage census, q96 PageRank centrality over the
  near-dup graph (fixed damped iterations, oracle-unrolled), q97
  cross-modal documents↔embeddings slice audit, q98 per-cluster
  representative selection (longest-doc policy over CC labels),
  q99 per-language out-of-vocabulary rate vs the global top-100
  vocabulary, q100 perceptual-hash (aHash) dedup buckets over image
  payloads, q101 per-source token-distribution drift (total-variation
  distance vs the corpus over top-vocab + OOV mass), q102 per-user
  behavioral entropy over event types (bot/monoculture signal),
  q103 incremental dedup verdicts served from a PERSISTED near-dup
  index (digests + LSH bands + bucket stats + shingle sidecar; probes
  never re-shingle the corpus), q104 perceptual-hash near-dup pairs at
  hamming ≤ 3 (banded pigeonhole-exact candidates over the aHash
  int64), q105 q16's verified LSH pairs served entirely from the
  persisted index (stored bands + bucket stats + shingle sidecar; no
  document text read), q106 q14's n-gram Jaccard pairs over the stored
  shingle sidecar (no tokenization at query time), q107 q88's directed
  containment pairs over the same sidecar, q108 q68's BM25 retrieval
  from a persisted token-sorted postings index (query terms prune the
  scan; no tokenization at query time), q109 per-source distinct-token
  cardinality via a KMV sketch (mergeable k-min partials, bounded
  shuffle; bit-replayable in SQL unlike HLL) next to the exact count,
  q110 SCD2 versioned status-interval history per user (gaps-and-
  islands + interval close, one user_id exchange), q111 hashed
  linear quality-model inference (fastText-style hashing trick as a
  zero-shuffle integer-exact array fold), q112 temperature-based
  source mixing (α=0.5 rates from one O(sources) aggregate, broadcast
  back; corpus never shuffles), q113 deterministic seeded-hash
  training-shard assignment (replayable global shuffle, no global
  sort), q114 Matryoshka two-stage retrieval (coarse prefix-dim top-20
  with an ids+score-only wide shuffle, exact full-dim rerank of the
  bounded candidate set — deterministic cascade, hash-checkable),
  q115 explicit Bloom pre-filtered semi join (distributed word-packed
  build, big side screened before the join exchange; exact join
  removes false positives so the oracle is the plain semi join),
  q116 skew-resistant two-phase per-group top-K (Catalyst's native
  WindowGroupLimit Partial cut below the exchange, plan-asserted;
  measured 1100× window-shuffle reduction in BENCH_PREJOIN.json),
  q117 per-source winsorization by percent_rank
  (middle-90% trim, one exchange), q118 TPC-H-Q10-shaped returned-item
  revenue top-20 (broadcast dims, TakeOrdered), q119 hopping
  event-time windows (map-side overlap expansion, one aggregate
  exchange), q120 deterministic label-propagation communities over the
  near-dup graph (mode-with-min-tiebreak, fixed iterations,
  oracle-unrolled), q121 per-node triangle participation (oriented
  wedge join, √(2E) out-degree cap), q122 count-min-sketch heavy
  hitters beside exact counts (O(DEPTH·WIDTH)-bounded mergeable
  sketch, portable hashing ⇒ every cell SQL-replayable), q123 q114's
  Matryoshka cascade served from a persisted prefix sidecar (coarse
  stage reads prefix/dims of the vector bytes; index==inline asserted)
  q124 write→read roundtrip through the engine's partitioned sorted
  sink (partition pruning plan-asserted; oracle reads the ORIGINAL
  table, so the hash match proves the write is faithful), q125 native
  unpivot wide→long reshape (map-side Expand, one aggregate exchange),
  q126 per-source token-count quantiles from a mergeable
  fixed-boundary histogram sketch (O(sources·bins) state, |est−exact|
  ≤ bin width, integer cells + double interpolation replayed
  bit-for-bit in SQL) beside exact-percentile calibration columns,
  q127 composed IVF-PQ retrieval from a persisted index (IVFADC +
  exact rerank: cell-partitioned PQ codes dynamically partition-pruned
  to the probed cells, 8-int ADC shortlist, bounded exact rerank;
  fixed centroids + seeded codebooks make the whole cascade
  hash-checkable against a full SQL replay), q128 Gopher-family
  repetition quality filter (top-bigram / duplicate-trigram occurrence
  fractions + keep verdict from ONE narrow sorted-run-length fold per
  n-gram order — zero shuffle, zero UDF; the oracle recounts
  relationally via unnest→GROUP BY, cross-validating the fold), q129
  binary-quantized retrieval (sign bits packed 32-per-BIGINT,
  XOR+popcount hamming shortlist at 1/64th the float64 scan, exact
  cosine rerank over the survivors; integer hamming cut ⇒ the whole
  cascade hash-checks against a full SQL replay — completing the
  compression ladder float64→int8→PQ→1-bit), q130 GBDT-style
  tree-ensemble quality classifier (depth-2 trees as nested CASE WHEN
  over integer-exact features; fixed-order leaf sum ⇒ bit-identical
  margin + keep verdict, zero shuffle/UDF — the learned-filter
  inference shape beside q111's linear model), q131 probe against an
  index with RETRACTED docs (tombstone log anti-joined at read;
  oracle recomputes ground truth over corpus-minus-retracted, so the
  hash match proves tombstoning == physical deletion; compaction
  folds the log in, compact==fresh-build tested), q132 embedding-space
  label audit (cosine to own-label centroid z-scored within label —
  the mislabel/noise curation signal; one materialized pass, O(labels)
  stats broadcast back, |z|>2 flags ~5%), q133 per-source attrition
  funnel through the FULL gate stack (min-tokens → stopword → lang →
  q128 repetition keep → q130 GBDT margin; one narrow scan, one
  map-side-combined source exchange, integer counts hash exactly —
  the FineWeb-style ablation table), q134 q129's binary cascade from
  a PERSISTED bits sidecar (coarse scan reads dim/8 bytes per vector
  of stored sign words, never the embedding column — plan-asserted;
  index==inline tested; full build/extend/retract/compact lifecycle),
  q135 C4-style corpus-level span scrub (5-token spans appearing in
  ≥2 distinct docs scrubbed corpus-wide; span groupBy + same-key join
  back, per-source retention summary; oracle replays the segmentation
  via string_split + integer-division grouping), q136 blocked fuzzy
  entity matching (distinct-name canonicalization BEFORE the
  quadratic stage, token blocks under a df-cut, codegen Levenshtein
  verify; oracle uses DuckDB's levenshtein under the same block
  contract), q137 per-source ROC-AUC of the learned quality scorer
  vs the rule gate (rank-sum identity — one window pass per group,
  integer-exact before the final division; deterministic id tiebreak
  replayed in SQL; single-class groups report the -1.0 sentinel),
  q139 reliability-diagram calibration bins beside q137's
  discrimination audit (floor(score·10) integer bin ids, O(bins)
  aggregate, cells replay exactly)
  q140 DSIR-style importance reweighting (target-vs-raw smoothed
  unigram log-ratio weights, both distributions from ONE token tally;
  top-k selection via TakeOrderedAndProject, never a global rank
  window), q141 leakage-safe train/val/test split (bucket hashed from
  the near-dup COMPONENT label — duplicate clusters cannot straddle
  splits), q142 two-phase annealed curriculum manifest (epoch 1 whole
  corpus, epoch 2 GBDT-gated re-shuffle under a fresh seed; one shard
  exchange per epoch), q145 KMV set algebra (pairwise source
  vocabulary Jaccard from O(sources·k) sketch rows — the profile-
  store pattern; exact Jaccard as calibration), q146 two-stage
  retrieval (multi-query BM25 shortlist + ColBERT-style
  late-interaction rerank over 16-bit sign-vector token embeddings —
  every token-pair cosine integer-exact), q147 per-source dataset
  card (volume, dup rate, gate pass rate, dominant language),
  q149 token-budget-constrained mixture solve (integer waterfilling:
  saturate small sources, common fill level, deterministic remainder
  — solves the rates q112 assumes), q150 data-card drift alerting
  (q147's card over two snapshots, unpivoted per (source, metric),
  6dp-rounded relative delta with a 2% flag), q151 PII detect/redact
  audit (deterministic doc_id-derived planting + the lookaround-free
  Java∩RE2 pattern class — counts AND the ordered redaction chain
  replay exactly), q152 first-BPE-merge pair census (adjacent
  char-pair counts inside tokens, one map-side-combined aggregate,
  TakeOrderedAndProject cut)
  (queries/pipeline.py + queries/relational.py); q59 deterministic
  k-means step, q67 IVF cell introspection, q138 SemDeDup-style
  semantic dedup (nearest-centroid cell blocking, same-cell pair
  scan, greedy-by-id keep rule replayed as NOT EXISTS in the oracle),
  q148 embedding-space decontamination (the q138 kernel composed
  eval × train: cell-blocked cosine ≥ τ ⇒ contaminated — the
  paraphrase-leakage guard shingle decontamination cannot provide;
  eval side broadcasts, corpus never shuffles),
  q143 hard-negative mining (top-k nearest with a DIFFERENT label —
  contrastive-training negatives), q144 cell-balanced subsampling
  (exactly-k per IVF cell via the md5 sampler — topic rebalancing)
  (queries/knn.py + operators/clustering.py, operators/similarity.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# Make the in-place checkout importable regardless of the driver's cwd.
# Users installing the package (`pip install .`, pyproject.toml) don't
# need this; the harness imports this file from an arbitrary cwd without
# installing, so the explicit root insertion stays.
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: NN-Descent 10-NN graph over the sf0.001
    embeddings, exploded to (id, nb_id, rank, sim) rows."""
    from spark_nnd_spark.queries.knn import q25_nnd_graph

    return q25_nnd_graph(spark, "/root/testdata/sf0.001")


# The driver's correctness harness checks only the first ~50 entries of
# this dict (insertion order), and the repo declares more queries than
# that — so the order is a priority schedule. It is GENERATED from the recorded
# CORRECTNESS_r*.json history, not hand-maintained: queries that have
# never received a driver row come first — together with queries that
# HAVE an oracle now but have never received a value-level (hash) check
# (their oracle landed after their last driver row, so the recorded rows
# are all `no_oracle`/error rows; rows-only-by-design queries are NOT
# promoted because they declare no oracle) — then stalest-last-check
# first, then fewest-total-checks first. At ~140 queries and ~50 slots a
# query re-enters the window roughly every 3 rounds; a newly declared
# query always lands at the very front on its first round.
def _priority_order(names: list[str], oracled: set[str] = frozenset()) -> list[str]:
    import glob
    import json
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    history: dict[str, list[int]] = {}
    hashed: set[str] = set()  # queries with ≥1 value-level driver check
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for q, row in rows.items():
            history.setdefault(q, []).append(rnd)
            if isinstance(row, dict) and row.get("hash_match") is not None:
                hashed.add(q)

    decl = {name: i for i, name in enumerate(names)}

    def key(name: str):
        rounds = history.get(name)
        if not rounds:
            return (0, 0, 0, decl[name])  # never driver-checked: front
        if name in oracled and name not in hashed:
            # Has an oracle but every recorded driver row predates it
            # (no_oracle / error rows only): treat as never checked.
            return (0, 0, 0, decl[name])
        return (1, max(rounds), len(rounds), decl[name])

    return sorted(names, key=key)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from spark_nnd_spark.queries.knn import KNN_QUERIES
    from spark_nnd_spark.queries.pipeline import PIPELINE_QUERIES
    from spark_nnd_spark.queries.relational import RELATIONAL_QUERIES

    merged = {**RELATIONAL_QUERIES, **PIPELINE_QUERIES, **KNN_QUERIES}
    order = _priority_order(list(merged), oracled=set(oracle_sql()))
    return {name: merged[name] for name in order}


def oracle_sql() -> dict[str, str]:
    from spark_nnd_spark.queries.knn import KNN_ORACLES
    from spark_nnd_spark.queries.pipeline import PIPELINE_ORACLES
    from spark_nnd_spark.queries.relational import RELATIONAL_ORACLES

    return {**RELATIONAL_ORACLES, **PIPELINE_ORACLES, **KNN_ORACLES}
