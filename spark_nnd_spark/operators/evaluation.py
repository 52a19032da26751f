"""Model-evaluation operators for training-data pipelines: grouped
ranking metrics over scored corpora. Extension layer (the reference's
NND.scala:66 surface has no scoring/eval stage); pairs with the hashed
linear scorer (functions/text.linear_score_expr, q111) and the tree
ensemble (q130) the way an ingest pipeline audits its quality filter.

Scale design (100 TB): AUC is computed by the rank-sum (Mann–Whitney)
identity, so each group costs ONE window pass — a single hash exchange
on the group key plus an in-partition sort — and the aggregate state
is three integers per group. No pairwise positive×negative join, which
is the naive-AUC trap (quadratic in group size). Ties are broken
deterministically by the id column (row_number, not midranks), which
keeps the statistic integer-exact and bit-replayable in DuckDB; for
heavily-tied discrete scores, bin the score first and this becomes the
standard binned AUC.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def grouped_auc(
    df: DataFrame,
    group_col: str,
    score_col: str,
    label_col: str,
    id_col: str,
) -> DataFrame:
    """Per-group ROC-AUC of ``score_col`` against boolean
    ``label_col`` via the rank-sum identity::

        AUC = (sum of positive ranks - n_pos*(n_pos+1)/2) / (n_pos*n_neg)

    with ranks assigned by ``row_number() over (partition by group
    order by score, id)`` — the deterministic-tiebreak variant. Groups
    with a single class get NULL. Everything before the final division
    is integer arithmetic, so the value replays bit-exactly in any
    engine.
    """
    rn = F.row_number().over(
        Window.partitionBy(group_col).orderBy(score_col, id_col)
    )
    ranked = df.select(
        F.col(group_col).alias("grp"),
        F.col(label_col).cast("boolean").alias("lbl"),
        rn.alias("rn"),
    )
    agg = ranked.groupBy("grp").agg(
        F.count_if(F.col("lbl")).alias("n_pos"),
        F.count_if(~F.col("lbl")).alias("n_neg"),
        F.sum(F.when(F.col("lbl"), F.col("rn")).otherwise(F.lit(0))).alias(
            "pos_rank_sum"
        ),
    )
    auc = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        (
            F.col("pos_rank_sum").cast("double")
            - F.col("n_pos").cast("double")
            * (F.col("n_pos").cast("double") + F.lit(1.0))
            / F.lit(2.0)
        )
        / (F.col("n_pos").cast("double") * F.col("n_neg").cast("double")),
    )
    return agg.select(
        F.col("grp").alias(group_col), "n_pos", "n_neg", auc.alias("auc")
    )


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram bins: equal-width score bins on [0, 1] with
    per-bin count, mean score, and empirical positive rate — the
    calibration audit beside ``grouped_auc``'s discrimination audit.
    One narrow map + one tiny groupBy (O(n_bins) groups); bin ids are
    integer arithmetic (floor(score*n)) so the cells replay exactly.
    """
    bin_id = F.least(
        F.floor(F.col(score_col) * n_bins).cast("int"), F.lit(n_bins - 1)
    )
    return (
        df.select(
            bin_id.alias("bin"),
            F.col(score_col).alias("s"),
            F.col(label_col).cast("int").alias("y"),
        )
        .groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("s"), 6).alias("mean_score"),
            F.round(F.avg(F.col("y").cast("double")), 6).alias("pos_rate"),
        )
    )
