"""PCA detector — distributed Gram aggregation + driver eigh + Arrow scoring.

Parity: pytod/models/pca.py:107-123, with the randomized
``torch.pca_lowrank`` replaced by a deterministic exact
eigendecomposition (the reference's own PCA is run-to-run
nondeterministic — reproducibility/results.txt:22,33,44 — so parity is
pinned to oracle.detectors.pca_eigvectors; see SURVEY.md §7 risk 1).

Scale shape: a single pass computes per-Arrow-batch partial
(count, sum, X^T X) via mapInPandas — O(d^2) bytes per partition
collected to the driver (d is small); eigh of the d×d covariance runs
on the driver; V and the explained-variance ratio broadcast back into
a vectorized scoring UDF. No shuffle at all.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..oracle.detectors import pca_scores as _np_pca_scores
from ..oracle.operators import cdist as _np_cdist
from .base import SparkDetector, grouped_kernel_scores


def _fit_pca_model(df, features_col: str, n_components: int):
    """One distributed pass -> (V, evr) exactly as the oracle derives them."""

    def partial_gram(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf[features_col].to_numpy()).astype(np.float64, copy=False)
            yield pd.DataFrame(
                {
                    "cnt": [X.shape[0]],
                    "s": [X.sum(axis=0).tolist()],
                    "g": [(X.T @ X).ravel().tolist()],
                }
            )

    parts = df.select(features_col).mapInPandas(
        partial_gram, schema="cnt long, s array<double>, g array<double>"
    ).collect()
    n = sum(r["cnt"] for r in parts)
    s = np.sum([np.array(r["s"]) for r in parts], axis=0)
    d = s.shape[0]
    G = np.sum([np.array(r["g"]).reshape(d, d) for r in parts], axis=0)

    mean = s / n
    cov = (G - n * np.outer(mean, mean)) / (n - 1)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:n_components]
    V = v[:, order]
    for j in range(V.shape[1]):
        m = np.argmax(np.abs(V[:, j]))
        if V[m, j] < 0:
            V[:, j] = -V[:, j]
    # var of the (uncentered) projection X@V from the same Gram:
    # var_j = (v_j' G v_j - n (mean . v_j)^2) / (n - 1)   [ddof=1, pca.py:114]
    proj_mean = mean @ V
    var_by_pc = (np.einsum("ij,jk,ki->i", V.T, G, V) - n * proj_mean**2) / (n - 1)
    evr = var_by_pc / var_by_pc.sum()
    return V, evr


class PCA(SparkDetector):
    def __init__(
        self, contamination: float = 0.1, n_components: int = 5, strategy: str = "auto"
    ):
        super().__init__(contamination, strategy)
        self.n_components = n_components

    def _distributed_scores(self, df, id_col, features_col, group_cols, n_rows):
        if group_cols:
            # a per-group PCA model is the kernel path by construction
            return grouped_kernel_scores(df, self._kernel_fn(), id_col, features_col, group_cols)
        V, evr = _fit_pca_model(df, features_col, self.n_components)
        VT = V.T.copy()

        @pandas_udf("double")
        def pca_score(feats: pd.Series) -> pd.Series:
            X = np.stack(feats.to_numpy()).astype(np.float64, copy=False)
            # score = sum_j cdist(X, V.T)[:, j] / evr_j   (pca.py:122-123)
            return pd.Series((_np_cdist(X, VT) / evr).sum(axis=1))

        return df.select(
            id_col, pca_score(F.col(features_col).cast("array<double>")).alias("score")
        )

    def _kernel_fn(self):
        return partial(_np_pca_scores, n_components=self.n_components)
