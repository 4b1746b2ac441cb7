"""Query catalogue, part 4: detector evaluation (ROC-AUC via the
tie-aware Mann-Whitney U, precision@n) — the engine's quality-
reporting surface (reference: pytod/utils/data.py:110-147,
utility.py:106-183).

The embeddings table's ``label`` is a 10-class cluster id, so the
binary evaluation target is one-vs-rest on class 1 (y = label == 1),
binarized identically in the Spark query and the oracle SQL.

Both oracles mirror the distributed plans' math exactly: one row per
*distinct* score, cumulative counts over that frame, then closed-form
metrics — so the comparison is insensitive to how either engine breaks
score ties between rows (the old row_number formulation was not).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .operators.block_knn import knn_scores_df
from .queries import load
from .validation.evaluate import precision_at_n, roc_auc


def _knn_scored(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    feats = e.select(
        F.col("vec_id").alias("row_id"),
        F.col("embedding").cast("array<double>").alias("features"),
    )
    scores = knn_scores_df(feats, n_neighbors=5, block_size=2048)
    return scores.join(
        e.select(
            F.col("vec_id").alias("row_id"),
            (F.col("label") == 1).cast("int").alias("y"),
        ),
        "row_id",
    )


def q_eval_knn_roc(spark, sf_dir):
    """ROC-AUC of KNN outlier scores vs the binarized labels."""
    return roc_auc(_knn_scored(spark, sf_dir))


_SQL_SCORED = """
WITH e AS (SELECT vec_id, CASE WHEN label = 1 THEN 1 ELSE 0 END AS y,
                  embedding::DOUBLE[] AS emb FROM embeddings),
d AS (SELECT a.vec_id AS ai, b.vec_id AS bi, list_distance(a.emb, b.emb) AS dist
      FROM e a CROSS JOIN e b),
r AS (SELECT ai, dist, row_number() OVER (PARTITION BY ai ORDER BY dist, bi) AS rn FROM d),
s AS (SELECT ai AS row_id, dist AS score FROM r WHERE rn = 6),
j AS (SELECT s.score, e.y FROM s JOIN e ON s.row_id = e.vec_id),
per AS (SELECT score AS sc, sum(y) AS pos, sum(1 - y) AS neg FROM j GROUP BY score)
"""


SQL_EVAL_KNN_ROC = (
    _SQL_SCORED
    + """,
c AS (SELECT pos, neg,
        coalesce(sum(neg) OVER (ORDER BY sc
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS neg_below
      FROM per)
SELECT round(sum(pos * (neg_below + neg / 2.0))
             / (sum(pos)::DOUBLE * sum(neg)), 4) AS roc
FROM c
"""
)


def q_eval_knn_prn(spark, sf_dir):
    """Precision @ rank n (n = #positives) of KNN scores."""
    return precision_at_n(_knn_scored(spark, sf_dir))


SQL_EVAL_KNN_PRN = (
    _SQL_SCORED
    + """,
c AS (SELECT pos, neg,
        coalesce(sum(pos) OVER (ORDER BY sc DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pos_above,
        coalesce(sum(neg) OVER (ORDER BY sc DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS neg_above
      FROM per),
t AS (SELECT sum(pos) AS p FROM per),
b AS (SELECT max(pos_above + greatest(0, (p - pos_above - neg_above) - neg)) AS hits
      FROM c, t
      WHERE pos_above + neg_above < p AND pos_above + neg_above + pos + neg >= p)
SELECT CASE WHEN t.p > 0
            THEN round((SELECT hits FROM b)::DOUBLE / t.p, 4) END AS p_at_n
FROM t
"""
)


EVAL_QUERIES = {"eval_knn_roc": q_eval_knn_roc, "eval_knn_prn": q_eval_knn_prn}
EVAL_ORACLES = {"eval_knn_roc": SQL_EVAL_KNN_ROC, "eval_knn_prn": SQL_EVAL_KNN_PRN}
