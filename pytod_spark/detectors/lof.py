"""LOF detector as relational joins over the kNN pair table.

Parity: pytod/models/lof.py:100-142. The reference's index-gathers
(torch.index_select at lof.py:116-117, :135) are equi-joins on the
neighbor id; the masked overwrite (:120-124) is ``greatest``; the
harmonic mean (:134-137, scipy.stats.hmean) is k / sum(1/x). Fully
expressible in DataFrame ops — shuffles on (group, id) keys only,
never materializing an n×n matrix.
"""

from __future__ import annotations

from functools import partial

from pyspark.sql import functions as F

from ..operators.block_knn import knn_join
from ..oracle.detectors import lof_scores as _np_lof_scores
from .base import SparkDetector


class LOF(SparkDetector):
    def __init__(
        self,
        contamination: float = 0.1,
        n_neighbors: int = 5,
        batch_size: int | None = None,
        strategy: str = "auto",
    ):
        super().__init__(contamination, strategy)
        self.n_neighbors = n_neighbors
        self.batch_size = batch_size or 4096

    def _distributed_scores(self, df, id_col, features_col, group_cols, n_rows):
        k = self.n_neighbors
        pairs = knn_join(
            df,
            k + 1,
            id_col=id_col,
            features_col=features_col,
            block_size=self.batch_size,
            group_cols=group_cols,
            n_rows=n_rows,
        )
        # kdist(b): b's k-th true-neighbor distance == rn k+1 incl. self
        # (lof.py:116-117 uses the post-self-drop last column)
        kdist = pairs.where(F.col("rn") == k + 1).select(
            *group_cols, F.col(id_col).alias("nbr_id"), F.col("dist").alias("kdist")
        )
        nbrs = pairs.where(F.col("rn") >= 2)  # drop self (lof.py:104)

        join_keys = group_cols + ["nbr_id"]
        reach = nbrs.join(kdist, on=join_keys).withColumn(
            "reach", F.greatest(F.col("dist"), F.col("kdist"))
        )
        ar = reach.groupBy(*group_cols, id_col).agg(F.avg("reach").alias("ar"))

        ar_b = ar.select(
            *group_cols, F.col(id_col).alias("nbr_id"), F.col("ar").alias("ar_nb")
        )
        ar_nn = (
            nbrs.join(ar_b, on=join_keys)
            .groupBy(*group_cols, id_col)
            .agg((F.count("ar_nb") / F.sum(1.0 / F.col("ar_nb"))).alias("ar_nn"))
        )
        return ar.join(ar_nn, on=group_cols + [id_col]).select(
            *group_cols, id_col, (F.col("ar") / F.col("ar_nn")).alias("score")
        )

    def _kernel_fn(self):
        return partial(_np_lof_scores, n_neighbors=self.n_neighbors)
