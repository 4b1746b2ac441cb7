"""ECOD detector — pure Spark SQL (windows + aggregation), no UDF.

Parity: pytod/models/ecod.py:82-95, including the reference's
``y[argsort]`` ECDF construction (basic_operators.py:226-244), which
is a *permutation*, not a rank: the value landing on output matrix row
``i`` of feature ``j`` is ``(pos_of_rank_i + 1) / n`` where
``pos_of_rank_i`` is the 0-based matrix position of the row holding
the i-th smallest value. See oracle.operators.ecdf_multiple for the
full derivation; "matrix position" is defined as the rank of the row
id within its group.

Plan shape: one window to assign positions, posexplode of the feature
array, two windows per feature (asc for X, desc for -X; stable ties
via position), a join on (group, out_pos, feature), then a grouped
sum — all JVM-side, whole-stage-codegen friendly.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..oracle.detectors import ecod_scores as _np_ecod_scores
from .base import SparkDetector


class ECOD(SparkDetector):
    def __init__(self, contamination: float = 0.1, strategy: str = "distributed"):
        super().__init__(contamination, strategy)

    def _distributed_scores(self, df, id_col, features_col, group_cols, n_rows):
        gw = (
            Window.partitionBy(*group_cols)
            if group_cols
            else Window.partitionBy(F.lit(1))
        )
        base = (
            df.select(*group_cols, id_col, features_col)
            .withColumn("__pos", F.row_number().over(gw.orderBy(id_col)) - 1)
            .withColumn("__n", F.count(F.lit(1)).over(gw))
        )
        feat = base.select(
            *group_cols,
            id_col,
            "__pos",
            "__n",
            F.posexplode(F.col(features_col).cast("array<double>")).alias("j", "v"),
        )
        fw = Window.partitionBy(*(group_cols + ["j"]))
        # out_pos for ascending sort of X and of -X (== descending of X);
        # ties broken by position, matching the oracle's stable argsort.
        ranked = feat.select(
            *group_cols,
            "j",
            (F.row_number().over(fw.orderBy(F.col("v").asc(), F.col("__pos").asc())) - 1).alias("out_pos_l"),
            (F.row_number().over(fw.orderBy(F.col("v").desc(), F.col("__pos").asc())) - 1).alias("out_pos_r"),
            ((F.col("__pos") + 1).cast("double") / F.col("__n")).alias("u"),
        )
        left = ranked.select(
            *group_cols, "j", F.col("out_pos_l").alias("out_pos"), F.col("u").alias("u_l")
        )
        right = ranked.select(
            *group_cols, "j", F.col("out_pos_r").alias("out_pos"), F.col("u").alias("u_r")
        )
        o = left.join(right, on=group_cols + ["j", "out_pos"]).select(
            *group_cols,
            "out_pos",
            F.greatest(-F.log("u_l"), -F.log("u_r")).alias("o"),
        )
        scores = o.groupBy(*group_cols, "out_pos").agg(
            (F.sum("o") * F.lit(-1.0)).alias("score")
        )
        pos_map = base.select(*group_cols, id_col, F.col("__pos").alias("out_pos"))
        return scores.join(pos_map, on=group_cols + ["out_pos"]).select(
            *group_cols, id_col, "score"
        )

    def _kernel_fn(self):
        return _np_ecod_scores
