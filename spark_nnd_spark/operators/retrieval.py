"""Persisted text-retrieval index: BM25 served from stored postings.

Extension layer (the reference has none of this — SURVEY.md §2.3); the
batch-side philosophy matches the near-dup index (operators/dedup.py
build_neardup_index): tokenize the corpus ONCE at ingest, persist the
integer artifacts, and let every retrieval query run against stored
postings instead of re-tokenizing 100 TB of text per query.

Layout under ``path``:
- ``postings`` — (token, doc_id, tf, dl), repartitioned by token and
  sorted by token within partitions, so a query's ``token IN (...)``
  predicate prunes parquet row groups via min/max stats — the
  storage-layer analogue of an inverted index seek.
- ``doclens``  — (doc_id, dl), one row per indexed doc: the O(docs)
  scan that lets ``extend_text_index`` rebuild the corpus stats
  exactly after an append, without re-touching text or postings.
- ``stats``    — one row (n_docs, avgdl), the BM25 corpus constants,
  always DERIVED from doclens (single source of truth — a retried
  stats rebuild can never double-count).

``bm25_query_index`` reproduces the inline q68 scoring exactly
(asserted index==inline in tests): same tf/df/dl derivations, same
idf and saturation arithmetic, so the DuckDB oracle that replays the
inline pipeline also certifies the index-served path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_nnd_spark.functions import text as TX


def build_text_index(
    corpus: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Persist BM25 postings + corpus stats. Build cost: one tokenize
    pass and one (token, doc) aggregate — the same work ONE inline
    BM25 query pays for its own terms, here paid once for all terms."""
    _write_postings(corpus, path, text_col, id_col, mode="overwrite")
    _rebuild_stats(corpus.sparkSession, path)


def _write_postings(
    docs: DataFrame, path: str, text_col: str, id_col: str, mode: str
) -> None:
    toks = docs.select(
        F.col(id_col),
        TX.token_count_expr(text_col).cast("double").alias("dl"),
        F.explode(TX.tokens_expr(text_col)).alias("token"),
    )
    tf = toks.groupBy("token", id_col, "dl").agg(F.count("*").alias("tf"))
    (
        tf.repartition("token")
        .sortWithinPartitions("token")
        .write.mode(mode)
        .parquet(f"{path}/postings")
    )
    docs.select(
        F.col(id_col), TX.token_count_expr(text_col).cast("double").alias("dl")
    ).write.mode(mode).parquet(f"{path}/doclens")


def _rebuild_stats(spark: SparkSession, path: str) -> None:
    # stats from the WRITTEN doclens (re-read, not recomputed from
    # text): one O(docs) two-column scan, and a retry can never
    # double-count — the neardup band_stats convention.
    spark.read.parquet(f"{path}/doclens").agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/stats")


def extend_text_index(
    spark: SparkSession,
    path: str,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Admit a batch into an existing text index: append the new docs'
    postings and doc lengths, then rebuild the corpus stats — the
    write half of the continuous-ingest loop (the
    extend_neardup_index twin, operators/dedup.py). Without this a
    continuously-ingesting corpus rebuilds the whole postings table
    per batch — exactly the O(corpus) cost the index exists to
    amortize down to O(batch).

    Appends are plain parquet appends (new files only; each appended
    file is itself token-sorted, so row-group min/max pruning holds
    per file — query terms still skip unrelated row groups in both
    old and new files). ``stats`` is recomputed from the doclens
    table, never merged with the old stats row, so a retried
    extension cannot double-count the averages. Tokenization has no
    tunable parameters, so unlike the neardup/MRL indexes there is no
    meta to pin — probe and build use the same TX expressions by
    construction.
    """
    from spark_nnd_spark.operators import index_lifecycle as IL

    # Detach the batch from any lineage that reads this index's own
    # parquet files before the upsert's overwrite can invalidate them
    # mid-extend (matches extend_winnow_index).
    new_docs = new_docs.localCheckpoint(eager=True)
    # roster = doclens (one row per doc): the live-overlap check of
    # the full upsert reads O(docs) rows, never the postings
    IL.settle_upsert(
        spark, path, new_docs.select(id_col), _text_tables(spark, path),
        roster=_text_tables(spark, path)[1],
    )
    _write_postings(new_docs, path, text_col, id_col, mode="append")
    _rebuild_stats(spark, path)


def _text_tables(spark: SparkSession, path: str):
    """Physical tables for the shared lifecycle kernel — the id column
    is whatever the build stamped into doclens; postings rewrites pin
    the token-sorted layout reads depend on for row-group pruning."""
    id_col = [c for c in spark.read.parquet(f"{path}/doclens").columns if c != "dl"][0]
    return [
        ("postings", id_col, None, ("token", ["token"])),
        ("doclens", id_col, None),
    ]


def retract_from_text_index(spark: SparkSession, path: str, ids: DataFrame) -> None:
    """Tombstone-retract docs from the BM25 index — the delete half of
    the lifecycle (operators/index_lifecycle.py): O(retracted) append,
    probes anti-join the log AND recompute n_docs/avgdl live from the
    surviving doclens (BM25's idf/length normalization are corpus-level,
    so retraction must reach them too — the tombstone tax is one
    O(docs) two-column scan per probe until compaction)."""
    from spark_nnd_spark.operators import index_lifecycle as IL

    IL.append_tombstones(spark, path, ids)


def compact_text_index(spark: SparkSession, path: str) -> None:
    """Fold the tombstone log into postings/doclens (the postings
    rewrite preserves token-sorting) and rebuild the stored stats;
    probes then return to the stored-stats fast path."""
    from spark_nnd_spark.operators import index_lifecycle as IL

    if IL.compact(spark, path, _text_tables(spark, path)):
        _rebuild_stats(spark, path)


def bm25_query_index(
    spark: SparkSession,
    path: str,
    terms: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every doc containing a query term against a persisted text
    index — (doc_id, n_terms, score), unordered (callers rank/limit).

    The ``token IN (terms)`` filter reaches the postings scan, where
    the token-sorted layout prunes row groups: the probe reads
    O(postings of the query terms), never the corpus. df and the
    scoring re-aggregate both read one materialized cut of those
    postings (the q68 checkpoint convention)."""
    from spark_nnd_spark.operators import index_lifecycle as IL

    tomb = IL.read_tombstones(spark, path)
    posts = IL.anti_tombstones(
        spark.read.parquet(f"{path}/postings").filter(
            F.col("token").isin(list(terms))
        ),
        tomb,
        id_col,
    )
    # materialized once: feeds the df aggregate AND the scoring reagg
    tf = posts.localCheckpoint(eager=True)
    df_ = tf.groupBy("token").agg(F.count("*").alias("df"))
    if tomb is None:
        stats = spark.read.parquet(f"{path}/stats")
    else:
        # BM25's idf and length normalization depend on corpus-level
        # n_docs/avgdl, so retraction must adjust them too: compute
        # LIVE from the anti-joined doclens (an O(docs) two-column
        # scan — the tombstone tax until compact folds the log in).
        # Doc lengths are integer-valued doubles, so the sum is exact
        # in float64 and the average is deterministic — the stored
        # and live stats agree bit-for-bit for the same doc set.
        stats = IL.anti_tombstones(
            spark.read.parquet(f"{path}/doclens"), tomb, id_col
        ).agg(
            F.count("*").cast("double").alias("n_docs"),
            F.avg("dl").alias("avgdl"),
        )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    term_score = idf * (
        F.col("tf") * (k1 + 1)
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
    )
    return (
        tf.join(F.broadcast(df_), "token")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.sum(term_score).alias("score"), F.count("*").alias("n_terms"))
    )
