"""Query catalogue, part 4: detector evaluation against the planted
ground-truth labels in the embeddings table (ROC-AUC via rank-sum,
precision@n) — the engine's quality-reporting surface
(reference: pytod/utils/data.py:110-147, utility.py:106-183)."""

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
    scores = knn_scores_df(feats, n_neighbors=5, block_size=512)
    return scores.join(
        e.select(F.col("vec_id").alias("row_id"), F.col("label").alias("y")), "row_id"
    )


def q_eval_knn_roc(spark, sf_dir):
    """ROC-AUC of KNN outlier scores vs the planted labels."""
    return roc_auc(_knn_scored(spark, sf_dir))


SQL_EVAL_KNN_ROC = """
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings),
d AS (SELECT a.vec_id AS ai, b.vec_id AS bi, list_distance(a.emb, b.emb) AS dist
      FROM e a CROSS JOIN e b),
r AS (SELECT ai, dist, row_number() OVER (PARTITION BY ai ORDER BY dist, bi) AS rn FROM d),
s AS (SELECT ai AS row_id, dist AS score FROM r WHERE rn = 6),
j AS (SELECT s.score, e.label AS y FROM s JOIN e ON s.row_id = e.vec_id),
rk AS (SELECT y, row_number() OVER (ORDER BY score ASC) AS r FROM j)
SELECT round((sum(CASE WHEN y = 1 THEN r ELSE 0 END) - sum(y) * (sum(y) + 1) / 2.0)
             / (sum(y)::DOUBLE * sum(1 - y)), 4) AS roc
FROM rk
"""


def q_eval_knn_prn(spark, sf_dir):
    """Precision @ rank n (n = #planted outliers) of KNN scores."""
    return precision_at_n(_knn_scored(spark, sf_dir))


SQL_EVAL_KNN_PRN = """
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings),
d AS (SELECT a.vec_id AS ai, b.vec_id AS bi, list_distance(a.emb, b.emb) AS dist
      FROM e a CROSS JOIN e b),
r AS (SELECT ai, dist, row_number() OVER (PARTITION BY ai ORDER BY dist, bi) AS rn FROM d),
s AS (SELECT ai AS row_id, dist AS score FROM r WHERE rn = 6),
j AS (SELECT s.score, e.label AS y FROM s JOIN e ON s.row_id = e.vec_id),
rk AS (SELECT y, row_number() OVER (ORDER BY score DESC) AS r FROM j),
np AS (SELECT sum(y) AS np FROM rk)
SELECT round(avg(y), 4) AS p_at_n FROM rk CROSS JOIN np WHERE r <= np
"""


EVAL_QUERIES = {"eval_knn_roc": q_eval_knn_roc, "eval_knn_prn": q_eval_knn_prn}
EVAL_ORACLES = {"eval_knn_roc": SQL_EVAL_KNN_ROC, "eval_knn_prn": SQL_EVAL_KNN_PRN}
