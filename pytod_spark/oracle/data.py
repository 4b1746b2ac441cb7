"""Deterministic synthetic fixture generator (FIXTURES.md F1/F3).

Mirrors the *recipe* of ``pytod/utils/data.py:11-84`` (which delegates
to pyod's generator, unavailable here): Gaussian inliers centered at
``offset``, uniform outliers on [-offset, offset], fixed contamination,
seedable, optional NaN/Inf injection (data.py:47-52). Bit-identity
with pyod is not required — parity is Spark-engine vs this oracle on
the same fixture.
"""

from __future__ import annotations

import numpy as np


def _one_split(rng, n, n_features, contamination, offset):
    n_outliers = int(n * contamination)
    n_inliers = n - n_outliers
    X_in = rng.standard_normal((n_inliers, n_features)) + offset
    X_out = rng.uniform(-offset, offset, size=(n_outliers, n_features))
    X = np.vstack([X_in, X_out])
    y = np.concatenate([np.zeros(n_inliers, dtype=int), np.ones(n_outliers, dtype=int)])
    return X, y


def generate_data(
    n_train: int = 1000,
    n_test: int = 500,
    n_features: int = 2,
    contamination: float = 0.1,
    train_only: bool = False,
    offset: int = 10,
    random_state: int | None = None,
    n_nan: int = 0,
    n_inf: int = 0,
):
    rng = np.random.default_rng(random_state)
    X_train, y_train = _one_split(rng, n_train, n_features, contamination, offset)
    if n_nan > 0:
        rows = rng.integers(0, n_train, n_nan)
        X_train[rows, 0] = np.nan
    if n_inf > 0:
        rows = rng.integers(0, n_train, n_inf)
        X_train[rows, -1] = np.inf
    if train_only:
        return X_train, y_train
    X_test, y_test = _one_split(rng, n_test, n_features, contamination, offset)
    return X_train, y_train, X_test, y_test
