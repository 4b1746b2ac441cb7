"""KNN detector (score = k-th neighbor distance).

Parity: pytod/models/knn.py:100-108. Distributed plan = two-stage
block kNN join (operators/block_knn.py) -> the rn == k+1 pair is the
score (self occupies rn 1 at distance 0).
"""

from __future__ import annotations

from functools import partial

from ..operators.block_knn import knn_scores_df
from ..oracle.detectors import knn_scores as _np_knn_scores
from .base import SparkDetector


class KNN(SparkDetector):
    def __init__(
        self,
        contamination: float = 0.1,
        n_neighbors: int = 5,
        batch_size: int | None = None,
        strategy: str = "auto",
        precision: str = "high",
    ):
        super().__init__(contamination, strategy)
        self.n_neighbors = n_neighbors
        # reference batch_size (knn.py:65-70) == our tile block size
        self.batch_size = batch_size or 4096
        # 'low' = fp32 filter + exact recheck, the reference's provable
        # quantization (basic_operators.py:96-137)
        self.precision = precision

    def _distributed_scores(self, df, id_col, features_col, group_cols, n_rows):
        return knn_scores_df(
            df,
            n_neighbors=self.n_neighbors,
            id_col=id_col,
            features_col=features_col,
            block_size=self.batch_size,
            group_cols=group_cols,
            n_rows=n_rows,
            precision=self.precision,
        )

    def _kernel_fn(self):
        return partial(_np_knn_scores, n_neighbors=self.n_neighbors)
