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
- ``stats``    — one row (n_docs, avgdl), the BM25 corpus constants.

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
    toks = corpus.select(
        F.col(id_col),
        TX.token_count_expr(text_col).cast("double").alias("dl"),
        F.explode(TX.tokens_expr(text_col)).alias("token"),
    )
    tf = toks.groupBy("token", id_col, "dl").agg(F.count("*").alias("tf"))
    (
        tf.repartition("token")
        .sortWithinPartitions("token")
        .write.mode("overwrite")
        .parquet(f"{path}/postings")
    )
    corpus.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg(TX.token_count_expr(text_col)).alias("avgdl"),
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/stats")


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
    posts = spark.read.parquet(f"{path}/postings").filter(
        F.col("token").isin(list(terms))
    )
    # materialized once: feeds the df aggregate AND the scoring reagg
    tf = posts.localCheckpoint(eager=True)
    df_ = tf.groupBy("token").agg(F.count("*").alias("df"))
    stats = spark.read.parquet(f"{path}/stats")
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
