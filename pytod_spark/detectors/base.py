"""Detector base: sklearn-ish estimator surface over DataFrames.

The reference's estimator API (pytod/models/base.py:31-62: fit ->
decision_scores_, threshold_, labels_) becomes DataFrame-in /
DataFrame-out: ``fit_df`` returns the input keys plus
``score / threshold / label / mu / sigma`` columns. The reference is
fit-time-only (``decision_function`` is a stub in every model,
knn.py:117-135 etc.), so transductive scoring is the whole contract.

Three physical strategies per detector:

* ``strategy='distributed'`` — joins/windows/aggregations + tile
  kernels; survives groups that do not fit on one executor.
* ``strategy='kernel'`` — one Arrow kernel per group running the numpy
  oracle directly; the parity-scale path (a group == one pytod matrix)
  and the cross-check for the distributed plans.
* ``strategy='auto'`` (default) — the same budget dispatch as
  ``knn_join``'s broadcast fast path / ``ivf_fit``'s driver-local
  Lloyd: an ungrouped input whose feature matrix fits the broadcast
  budget (``operators.block_knn.BROADCAST_MAX_ELEMS`` fp64 elements,
  64 MB) takes the kernel path — at that size per-job scheduling
  overhead dwarfs the arithmetic, and the whole matrix is one Arrow
  batch. Anything larger, and every grouped input (per-group sizes
  are unknowable without an extra count job), runs the distributed
  plan. Both strategies are score-parity-tested against the numpy
  oracles (tests/test_detector_parity.py), so the dispatch never
  changes results, only the physical plan.
"""

from __future__ import annotations

from collections.abc import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.thresholds import add_threshold_labels


def grouped_kernel_scores(
    df: DataFrame,
    score_fn,
    id_col: str = "row_id",
    features_col: str = "features",
    group_cols: Iterable[str] = (),
) -> DataFrame:
    """Run a numpy ``score_fn(X) -> (n,) scores`` once per group via
    applyInPandas. Rows are sorted by id inside the kernel so that
    "matrix row i" == i-th id in ascending order (the engine's defined
    position mapping for order-sensitive semantics like ECOD's
    argsort quirk)."""
    group_cols = list(group_cols)

    def kern(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="stable")
        X = np.stack(pdf[features_col].to_numpy()).astype(np.float64, copy=False)
        out = pd.DataFrame({id_col: pdf[id_col].to_numpy(), "score": score_fn(X)})
        for i, c in enumerate(group_cols):
            out.insert(i, c, key[i])
        return out

    # group/id columns keep their INPUT types (mirrors the distributed
    # path; a string doc_id or int cluster_id must not be coerced)
    schema = ", ".join(
        [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in group_cols]
        + [
            f"`{id_col}` {df.schema[id_col].dataType.simpleString()}",
            "score double",
        ]
    )
    if group_cols:
        return df.groupBy(*group_cols).applyInPandas(kern, schema=schema)
    grouped = df.groupBy(F.lit(1).alias("__g"))

    def kern0(pdf):
        return kern((), pdf)

    return grouped.applyInPandas(kern0, schema=schema)


class SparkDetector:
    """Shared surface: ``score_df`` (raw scores) + ``fit_df`` (scores
    with threshold/labels, base.py:414-435 parity)."""

    def __init__(self, contamination: float = 0.1, strategy: str = "auto"):
        if not 0.0 < contamination <= 0.5:
            # parity: pytod/models/base.py:71-74 raises on bad contamination
            raise ValueError(f"contamination must be in (0, 0.5], got {contamination}")
        if strategy not in ("auto", "distributed", "kernel"):
            raise ValueError(
                f"strategy must be 'auto', 'distributed' or 'kernel', got {strategy!r}"
            )
        self.contamination = contamination
        self.strategy = strategy

    # subclasses: _distributed_scores(df, id_col, features_col, group_cols,
    # n_rows[, keep_cols]) and _kernel_fn() -> numpy score function
    def _distributed_scores(self, df, id_col, features_col, group_cols, n_rows,
                            keep_cols=()):
        raise NotImplementedError

    # detectors whose distributed plan is map-side at the row level can
    # carry extra columns through scoring for free (no post-join)
    _supports_keep_cols = False

    def _kernel_fn(self):
        raise NotImplementedError

    def _resolve_strategy(self, df, features_col, group_cols, n_rows) -> str:
        """Budget dispatch for ``strategy='auto'`` (module docstring):
        kernel for ungrouped inputs whose n x dim fits
        BROADCAST_MAX_ELEMS fp64 elements, distributed otherwise."""
        from ..operators.block_knn import fits_broadcast_budget

        if group_cols:
            return "distributed"
        # probe_jobs=False: an input whose row count the optimizer
        # cannot prove is not worth a full-lineage count just to pick
        # a strategy — default to distributed (callers that KNOW the
        # input is small pass n_rows or strategy='kernel' explicitly)
        if fits_broadcast_budget(
            df, features_col, n_rows=n_rows, probe_jobs=False
        ):
            return "kernel"
        return "distributed"

    def score_df(
        self,
        df: DataFrame,
        id_col: str = "row_id",
        features_col: str = "features",
        group_cols: Iterable[str] = (),
        n_rows: int | None = None,
        keep_cols: Iterable[str] = (),
    ) -> DataFrame:
        """Score rows; ``keep_cols`` are passed through to the output
        (free for map-side plans, an id-join otherwise)."""
        group_cols = list(group_cols)
        keep_cols = list(keep_cols)
        strategy = self.strategy
        if strategy == "auto":
            strategy = self._resolve_strategy(df, features_col, group_cols, n_rows)
        if strategy == "kernel":
            scores = grouped_kernel_scores(
                df, self._kernel_fn(), id_col, features_col, group_cols
            )
        elif self._supports_keep_cols:
            return self._distributed_scores(
                df, id_col, features_col, group_cols, n_rows, keep_cols=keep_cols
            )
        else:
            scores = self._distributed_scores(
                df, id_col, features_col, group_cols, n_rows
            )
        if keep_cols:
            scores = scores.join(
                df.select(*group_cols, id_col, *keep_cols),
                on=[*group_cols, id_col],
            )
        return scores

    def fit_df(
        self,
        df: DataFrame,
        id_col: str = "row_id",
        features_col: str = "features",
        group_cols: Iterable[str] = (),
        n_rows: int | None = None,
    ) -> DataFrame:
        scores = self.score_df(df, id_col, features_col, group_cols, n_rows)
        return add_threshold_labels(
            scores, self.contamination, score_col="score", group_cols=group_cols
        )

    def fit_predict(
        self,
        df: DataFrame,
        id_col: str = "row_id",
        features_col: str = "features",
        group_cols: Iterable[str] = (),
        n_rows: int | None = None,
    ) -> DataFrame:
        """Fit, then return the binary outlier label per row.

        Parity: ``pytod/models/base.py:115-137`` (fit -> labels_),
        DataFrame-in / DataFrame-out: (group_cols..., id_col, label),
        label 1 = outlier.
        """
        group_cols = list(group_cols)
        return self.fit_df(df, id_col, features_col, group_cols, n_rows).select(
            *group_cols, id_col, "label"
        )

    def fit_predict_score(
        self,
        df: DataFrame,
        y_col: str = "y",
        id_col: str = "row_id",
        features_col: str = "features",
        n_rows: int | None = None,
        scoring: str = "roc_auc_score",
    ) -> float:
        """Fit, score, and evaluate against ground truth ``y_col``.

        Parity: ``pytod/models/base.py:317-358`` — scoring is
        ``'roc_auc_score'`` or ``'prc_n_score'``; anything else raises
        NotImplementedError (base.py:349-351). The metric aggregates
        distributedly (validation/evaluate.py); only the one metric
        value reaches the driver.
        """
        from ..validation.evaluate import precision_at_n, roc_auc

        scored = self.score_df(df, id_col, features_col, keep_cols=[y_col])
        if scoring == "roc_auc_score":
            row = roc_auc(scored, score_col="score", label_col=y_col).first()
            return float(row["roc"])
        if scoring == "prc_n_score":
            row = precision_at_n(scored, score_col="score", label_col=y_col).first()
            return float(row["p_at_n"])
        raise NotImplementedError(f"scoring {scoring!r} is not implemented")

    def get_params(self) -> dict:
        """sklearn-style param introspection (base.py:438-468 parity)."""
        return {
            k: v for k, v in vars(self).items() if not k.startswith("_")
        }

    def set_params(self, **params) -> "SparkDetector":
        for k, v in params.items():
            if k not in self.get_params():
                raise ValueError(f"Invalid parameter {k} for {type(self).__name__}")
            setattr(self, k, v)
        return self

    def __repr__(self) -> str:
        args = ", ".join(f"{k}={v!r}" for k, v in sorted(self.get_params().items()))
        return f"{type(self).__name__}({args})"
