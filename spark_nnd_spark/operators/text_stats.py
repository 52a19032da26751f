"""Mergeable per-source TOKEN statistics — the 9th persisted index
family, and the second ALGEBRAIC one (after the covariance sidecar):
the stored rows are exact integer counts (source, token, n), so
admitting a batch is ADDITION, retracting one is SUBTRACTION, and
extend == fresh-rebuild holds EXACTLY, not approximately. Token
unigram tables are the mergeable statistic of a text corpus the way
moment sums are of an embedding corpus — they serve the
distribution-shift matrix (q188/q194), and the same maintained counts
are what DSIR importance weights (q140), bigram-LM training (q165)
and reference-LM bucketing (q171) are built from, all without a
corpus rescan.

Durability: every merge publishes counts + applied-batch markers via
the shared atomic rename (operators/state_commit) — a replayed
at-least-once delivery cannot double-count (the r11-ADVICE contract,
tested for both algebraic families).

Scale (100 TB): the state is O(sources · vocab) integer rows —
corpus-size-independent; a batch merge costs one map-side-combined
batch aggregate plus an O(state) groupBy-sum; probes never touch the
corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_nnd_spark.functions import text as TX
from spark_nnd_spark.operators.state_commit import (
    commit_state,
    next_version,
    state_dir,
)

JS_Q = 1_000_000_000_000  # pico-nat quantization for JS terms
LN2 = 0.6931471805599453  # shared literal so both engines use one ln(2)


def _token_counts(
    df: DataFrame, text_col: str = "text", source_col: str = "source"
) -> DataFrame:
    """Exact (source, token, n) counts of a batch — one map-side
    combined aggregate, the family's only corpus-touching step."""
    return (
        df.select(
            F.col(source_col).alias("source"),
            F.explode(TX.tokens_expr(text_col)).alias("token"),
        )
        .groupBy("source", "token")
        .agg(F.count("*").alias("n"))
    )


def build_token_stats(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    source_col: str = "source",
) -> None:
    """Persist the mergeable token statistics of a corpus."""
    spark = df.sparkSession
    counts = _token_counts(df, text_col, source_col)
    commit_state(
        spark, path, next_version(spark, path),
        {"counts": counts,
         "applied": spark.createDataFrame([], "batch_id long")},
    )


def _merge_token_stats(
    spark, path: str, df: DataFrame, sign: int, batch_id,
    text_col: str, source_col: str,
) -> None:
    state = state_dir(spark, path)
    applied = spark.read.parquet(f"{state}/applied")
    if batch_id is not None and applied.filter(
        F.col("batch_id") == int(batch_id)
    ).take(1):
        return
    s = F.lit(sign).cast("long")
    counts = (
        spark.read.parquet(f"{state}/counts")
        .unionByName(
            _token_counts(df, text_col, source_col).select(
                "source", "token", (F.col("n") * s).alias("n")
            )
        )
        .groupBy("source", "token")
        .agg(F.sum("n").alias("n"))
        .filter(F.col("n") != 0)  # full retraction leaves no ghost rows
    )
    if batch_id is not None:
        applied = applied.unionByName(
            spark.createDataFrame([(int(batch_id),)], "batch_id long")
        )
    version = int(state.rsplit("v=", 1)[1]) + 1
    commit_state(spark, path, version, {"counts": counts, "applied": applied})


def extend_token_stats(
    spark, path: str, new_df: DataFrame,
    text_col: str = "text", source_col: str = "source",
    batch_id: int | None = None,
) -> None:
    """Admit a batch: ADD its counts. Exactly equals a fresh build over
    the union (integer sums — tested); ``batch_id`` gives at-most-once
    replay under at-least-once delivery (the cov-stats contract)."""
    _merge_token_stats(spark, path, new_df, 1, batch_id, text_col, source_col)


def retract_token_stats(
    spark, path: str, old_df: DataFrame,
    text_col: str = "text", source_col: str = "source",
    batch_id: int | None = None,
) -> None:
    """Retract documents: SUBTRACT their counts — stats after
    retract(B) equal a fresh build without B exactly (tested); no
    tombstones, no compaction."""
    _merge_token_stats(spark, path, old_df, -1, batch_id, text_col, source_col)


def token_counts_from_stats(spark, path: str) -> DataFrame:
    """The stored (source, token, n) table — zero corpus I/O."""
    return spark.read.parquet(f"{state_dir(spark, path)}/counts")


def js_divergence_pairs(counts: DataFrame) -> DataFrame:
    """Pairwise Jensen–Shannon divergence between per-source unigram
    distributions, from a (source, token, n) counts table — the q188
    kernel, shared by the inline query and the index-served probe so
    the two can never drift. Disjoint-support mass needs no anti-join:
    Σ over tokens only in A of ½·p·ln2 = ½·ln2·(1 − covered_A), so the
    shared-token equi-join plus per-pair covered-probability sums is
    the whole computation; per-token contributions quantize to integer
    pico-nats (the q165 trick) so the per-pair sum is order-free and
    replays exactly cross-engine."""
    tot = counts.groupBy("source").agg(F.sum("n").alias("tot"))
    p = counts.join(tot, "source").select(
        "source",
        "token",
        (F.col("n").cast("double") / F.col("tot").cast("double")).alias("p"),
    )
    a = p.select(
        F.col("source").alias("source_a"), "token", F.col("p").alias("pa")
    )
    b = p.select(
        F.col("source").alias("source_b"), "token", F.col("p").alias("pb")
    )
    both = a.join(b, "token").filter(F.col("source_a") < F.col("source_b"))
    m = (F.col("pa") + F.col("pb")) / 2
    contrib = 0.5 * F.col("pa") * F.log(F.col("pa") / m) + 0.5 * F.col(
        "pb"
    ) * F.log(F.col("pb") / m)
    agg = (
        both.select(
            "source_a",
            "source_b",
            F.floor(contrib * JS_Q + F.lit(0.5)).cast("long").alias("qc"),
            F.floor(F.col("pa") * JS_Q + F.lit(0.5)).cast("long").alias("qpa"),
            F.floor(F.col("pb") * JS_Q + F.lit(0.5)).cast("long").alias("qpb"),
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.count("*").cast("long").alias("n_shared"),
            F.sum("qc").alias("sqc"),
            F.sum("qpa").alias("sqpa"),
            F.sum("qpb").alias("sqpb"),
        )
    )
    qd = F.lit(float(JS_Q))
    return agg.select(
        "source_a",
        "source_b",
        "n_shared",
        F.round(
            F.col("sqc").cast("double") / qd
            + 0.5 * LN2 * (F.lit(1.0) - F.col("sqpa").cast("double") / qd)
            + 0.5 * LN2 * (F.lit(1.0) - F.col("sqpb").cast("double") / qd),
            6,
        ).alias("js_nats"),
    )


# ----------------------- bigram statistics (the LM-training tables)

def doc_bigrams(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    checkpoint: bool = True,
) -> DataFrame:
    """The (doc_id, w1, w2) bigram stream of a documents table —
    shared by the q165 inline trainer+scorer, this persisted family
    and the q195 index-served scorer (checkpointed because it feeds
    both the counts aggregate and the scoring join)."""
    toks = TX.tokens_expr(text_col)
    bigram = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    out = df.select(
        F.col(id_col).alias("doc_id"), F.explode(bigram).alias("bg")
    ).select("doc_id", "bg.w1", "bg.w2")
    return out.localCheckpoint(eager=True) if checkpoint else out


def bigram_counts(doc_bg: DataFrame) -> DataFrame:
    """Exact (w1, w2, n) counts of a bigram stream — one map-side
    combined aggregate; the trained add-one-smoothed LM IS this table
    (unigram totals and vocab size derive from it at probe time)."""
    return doc_bg.groupBy("w1", "w2").agg(F.count("*").alias("n"))


def build_bigram_stats(df: DataFrame, path: str, text_col: str = "text") -> None:
    """Persist the mergeable bigram LM tables — same algebraic family
    as the unigram stats (extend == addition, exact), so the corpus LM
    behind perplexity filtering (q165/q195) stays current by merging
    batch counts, never by re-tokenizing the corpus."""
    spark = df.sparkSession
    counts = bigram_counts(doc_bigrams(df, text_col, checkpoint=False))
    commit_state(
        spark, path, next_version(spark, path),
        {"counts": counts,
         "applied": spark.createDataFrame([], "batch_id long")},
    )


def _merge_bigram_stats(
    spark, path: str, df: DataFrame, sign: int, batch_id, text_col: str
) -> None:
    state = state_dir(spark, path)
    applied = spark.read.parquet(f"{state}/applied")
    if batch_id is not None and applied.filter(
        F.col("batch_id") == int(batch_id)
    ).take(1):
        return
    s = F.lit(sign).cast("long")
    counts = (
        spark.read.parquet(f"{state}/counts")
        .unionByName(
            bigram_counts(doc_bigrams(df, text_col, checkpoint=False)).select(
                "w1", "w2", (F.col("n") * s).alias("n")
            )
        )
        .groupBy("w1", "w2")
        .agg(F.sum("n").alias("n"))
        .filter(F.col("n") != 0)
    )
    if batch_id is not None:
        applied = applied.unionByName(
            spark.createDataFrame([(int(batch_id),)], "batch_id long")
        )
    version = int(state.rsplit("v=", 1)[1]) + 1
    commit_state(spark, path, version, {"counts": counts, "applied": applied})


def extend_bigram_stats(
    spark, path: str, new_df: DataFrame, text_col: str = "text",
    batch_id: int | None = None,
) -> None:
    _merge_bigram_stats(spark, path, new_df, 1, batch_id, text_col)


def retract_bigram_stats(
    spark, path: str, old_df: DataFrame, text_col: str = "text",
    batch_id: int | None = None,
) -> None:
    _merge_bigram_stats(spark, path, old_df, -1, batch_id, text_col)


def bigram_counts_from_stats(spark, path: str) -> DataFrame:
    """The stored (w1, w2, n) LM table — zero corpus I/O."""
    return spark.read.parquet(f"{state_dir(spark, path)}/counts")
