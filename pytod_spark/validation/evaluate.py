"""Detector evaluation utilities (SURVEY §2 #43-46).

* ``roc_auc``        — ROC-AUC via the Mann-Whitney rank-sum identity
                       (parity: pytod/utils/data.py:110-127 get_roc,
                       rounded 4dp)
* ``precision_at_n`` — precision @ rank n where n = #positives
                       (parity: pytod/utils/utility.py:106-183
                       get_label_n / precision_n_scores)

Scale shape: no global ``Window.orderBy`` (a single-task sort of every
score). Both metrics reduce the score column to one row per *distinct*
score (a partial-aggregated shuffle), then use the bucketed two-pass
cumulative machinery (operators/ranking.py) for the ordered part — the
only windows run over per-bucket slices and <= n_buckets metadata
rows, so the plan holds at 10^12 scores.

ROC-AUC uses the tie-aware U statistic
U = sum_s pos_s * (neg_below_s + neg_s / 2), AUC = U / (P * N) —
identical to the rank-sum-of-row_numbers form whenever no positive
ties a negative (and the standard average-rank AUC when one does).

precision@n takes full distinct-score groups above the rank-n cutoff
and fills the remainder from the cutoff tie group pessimistically
(negatives first); with tie-free scores (the common case for distance
scores) this is exactly the top-n precision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.ranking import bucketed_cumsums


def _per_score(scored: DataFrame, score_col: str, label_col: str) -> DataFrame:
    y = F.col(label_col).cast("long")
    return scored.groupBy(F.col(score_col).alias("s")).agg(
        F.sum(y).alias("pos"), F.sum(F.lit(1) - y).alias("neg")
    )


def roc_auc(scored: DataFrame, score_col: str = "score", label_col: str = "y") -> DataFrame:
    """One-row DataFrame with ``roc`` (rounded to 4 decimals, matching
    the reference's np.round(..., 4))."""
    per = _per_score(scored, score_col, label_col)
    per = bucketed_cumsums(per, "s", {"neg": "neg_below"})
    agg = per.agg(
        F.sum(F.col("pos") * (F.col("neg_below") + F.col("neg") / 2.0)).alias("u"),
        F.sum("pos").alias("p"),
        F.sum("neg").alias("n"),
    )
    return agg.select(
        # p * n as double: a long*long product overflows past ~3e9 x
        # 3e9 rows (ANSI mode throws, non-ANSI wraps negative)
        F.round(
            F.col("u") / (F.col("p").cast("double") * F.col("n").cast("double")), 4
        ).alias("roc")
    )


def precision_at_n(scored: DataFrame, score_col: str = "score", label_col: str = "y") -> DataFrame:
    """One-row DataFrame with ``p_at_n``: of the top-n scores (n =
    #positives), the fraction truly positive."""
    per = _per_score(scored, score_col, label_col)
    per = bucketed_cumsums(
        per,
        "s",
        {"pos": "pos_above", "neg": "neg_above"},
        descending=True,
    )
    totals = per.agg(F.sum("pos").alias("p_total"))
    cnt_above = F.col("pos_above") + F.col("neg_above")
    # the distinct-score group holding rank n (n = total positives)
    boundary = (
        per.crossJoin(F.broadcast(totals))
        .where(
            (cnt_above < F.col("p_total"))
            & (cnt_above + F.col("pos") + F.col("neg") >= F.col("p_total"))
        )
    )
    need = F.col("p_total") - cnt_above
    from_boundary = F.greatest(F.lit(0), need - F.col("neg"))
    # aggregate-to-one-row so the zero-positive case (no boundary group
    # matches; p_at_n would be 0/0) yields a single NULL row rather
    # than an empty frame
    hits = boundary.agg(
        F.max(F.col("pos_above") + from_boundary).alias("hits")
    )
    return hits.crossJoin(F.broadcast(totals)).select(
        F.when(
            F.col("p_total") > 0,
            F.round(F.col("hits") / F.col("p_total"), 4),
        ).alias("p_at_n")
    )
