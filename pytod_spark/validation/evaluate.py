"""Detector evaluation utilities (SURVEY §2 #43-46).

* ``roc_auc``        — ROC-AUC via the Mann-Whitney rank-sum identity,
                       pure window + aggregate SQL (parity:
                       pytod/utils/data.py:110-127 get_roc, rounded 4dp)
* ``precision_at_n`` — precision @ rank n where n = #positives
                       (parity: pytod/utils/utility.py:106-183
                       get_label_n / precision_n_scores)

Both are single-pass window/agg plans — no sklearn, no driver math —
so they run at any scale and double as oracle-checkable queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def roc_auc(scored: DataFrame, score_col: str = "score", label_col: str = "y") -> DataFrame:
    """One-row DataFrame with ``roc`` (rounded to 4 decimals, matching
    the reference's np.round(..., 4))."""
    w = Window.orderBy(F.col(score_col).asc())
    ranked = scored.select(
        F.col(label_col).cast("long").alias("y"), F.row_number().over(w).alias("r")
    )
    agg = ranked.agg(
        F.sum(F.when(F.col("y") == 1, F.col("r")).otherwise(0)).alias("rank_sum"),
        F.sum("y").alias("p"),
        F.sum(F.lit(1) - F.col("y")).alias("n"),
    )
    return agg.select(
        F.round(
            (F.col("rank_sum") - F.col("p") * (F.col("p") + 1) / 2)
            / (F.col("p") * F.col("n")),
            4,
        ).alias("roc")
    )


def precision_at_n(scored: DataFrame, score_col: str = "score", label_col: str = "y") -> DataFrame:
    """One-row DataFrame with ``p_at_n``: of the top-n scores (n =
    #positives, ties broken by score desc), the fraction truly
    positive."""
    w = Window.orderBy(F.col(score_col).desc())
    ranked = scored.select(
        F.col(label_col).cast("long").alias("y"), F.row_number().over(w).alias("r")
    )
    n_pos = ranked.agg(F.sum("y").alias("np"))
    return (
        ranked.crossJoin(F.broadcast(n_pos))
        .where(F.col("r") <= F.col("np"))
        .agg(F.round(F.avg("y"), 4).alias("p_at_n"))
    )
