"""Prediction post-processing over fitted score distributions.

The reference is fit-time-only (``decision_function`` is a stub in
every model — knn.py:117-135 etc.), so its prediction surface is pure
post-processing of scores against fitted state. These DataFrame ops
reproduce that surface:

* ``predict_labels``      — base.py:143-172 (score > threshold)
* ``predict_proba``       — base.py:174-239 ('linear' min-max,
                            'unify' erf((s-mu)/(sigma sqrt 2)))
* ``predict_confidence``  — base.py:241-282 (Bayesian posterior +
                            binomial CDF, flipped for inliers)
* ``predict_rank``        — base.py:284-314 (searchsorted on sorted
                            train scores)

Train-side state is a tiny aggregate (threshold/mu/sigma/min/max) or
the sorted train-score vector — broadcast into vectorized UDFs. erf
and the binomial CDF have no Spark SQL builtin, so those two run in
Arrow-batched pandas UDFs calling the same numpy oracle code the
parity tests use.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..oracle.detectors import _binom_cdf


def fitted_state(train_scores: DataFrame, contamination: float = 0.1,
                 score_col: str = "score") -> dict:
    """Collect the reference's fitted attributes (threshold_, _mu,
    _sigma, train min/max and n) in one aggregate pass."""
    row = train_scores.agg(
        F.percentile(score_col, F.lit(1 - contamination)).alias("threshold"),
        F.avg(score_col).alias("mu"),
        F.stddev_pop(score_col).alias("sigma"),
        F.min(score_col).alias("smin"),
        F.max(score_col).alias("smax"),
        F.count(score_col).alias("n"),
    ).collect()[0]
    return {k: row[k] for k in ("threshold", "mu", "sigma", "smin", "smax", "n")}


def predict_labels(test_scores: DataFrame, state: dict, score_col: str = "score") -> DataFrame:
    return test_scores.withColumn(
        "label", (F.col(score_col) > F.lit(state["threshold"])).cast("int")
    )


def predict_proba(
    test_scores: DataFrame, state: dict, method: str = "linear", score_col: str = "score"
) -> DataFrame:
    """Appends proba_0 / proba_1 (classes [inlier, outlier])."""
    s = F.col(score_col)
    if method == "linear":
        p1 = F.least(
            F.greatest((s - state["smin"]) / (state["smax"] - state["smin"]), F.lit(0.0)),
            F.lit(1.0),
        )
        out = test_scores.withColumn("proba_1", p1)
    elif method == "unify":
        mu, sigma = state["mu"], state["sigma"]

        @pandas_udf("double")
        def erf_clip(x: pd.Series) -> pd.Series:
            pre = (x.to_numpy() - mu) / (sigma * math.sqrt(2))
            return pd.Series(np.clip([math.erf(v) for v in pre], 0.0, 1.0))

        out = test_scores.withColumn("proba_1", erf_clip(s))
    else:
        raise ValueError(f"{method} is not a valid probability conversion method")
    return out.withColumn("proba_0", 1 - F.col("proba_1"))


def predict_confidence(
    test_scores: DataFrame,
    train_scores: DataFrame,
    state: dict,
    contamination: float = 0.1,
    score_col: str = "score",
) -> DataFrame:
    """Appends the prediction-stability confidence (base.py:241-282).

    The rank-count #{train <= s} is a broadcast searchsorted over the
    sorted train scores; the binomial CDF runs in the same Arrow batch.
    """
    train = np.sort(
        np.array([r[0] for r in train_scores.select(score_col).collect()], dtype=np.float64)
    )
    n = len(train)
    thr = state["threshold"]
    k_top = n - int(n * contamination)

    @pandas_udf("double")
    def conf_udf(s: pd.Series) -> pd.Series:
        x = s.to_numpy(dtype=np.float64)
        n_inst = np.searchsorted(train, x, side="right")
        posterior = (1.0 + n_inst) / (2.0 + n)
        conf = np.array([1.0 - _binom_cdf(k_top, n, p) for p in posterior])
        pred = x > thr
        conf[~pred] = 1.0 - conf[~pred]
        return pd.Series(conf)

    return test_scores.withColumn("confidence", conf_udf(F.col(score_col)))


def predict_rank(
    test_scores: DataFrame,
    train_scores: DataFrame,
    normalized: bool = False,
    score_col: str = "score",
) -> DataFrame:
    """Appends the outlyingness rank (searchsorted-left, base.py:284-314)."""
    train = np.sort(
        np.array([r[0] for r in train_scores.select(score_col).collect()], dtype=np.float64)
    )

    @pandas_udf("double")
    def rank_udf(s: pd.Series) -> pd.Series:
        return pd.Series(
            np.searchsorted(train, s.to_numpy(dtype=np.float64), side="left").astype(float)
        )

    out = test_scores.withColumn("rank", rank_udf(F.col(score_col)))
    if normalized:
        mx = out.agg(F.max("rank")).collect()[0][0]
        out = out.withColumn("rank", F.col("rank") / F.lit(mx))
    return out
