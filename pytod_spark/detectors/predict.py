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

Train-side state is a tiny aggregate (threshold/mu/sigma/min/max).
The reference's searchsorted-against-all-train-scores (confidence and
rank) is NOT collected to the driver: #{train <= s} is computed
distributively — aggregate train scores to one row per distinct value,
take a bucketed two-pass cumulative count (operators/ranking.py), and
join the counts back to the test rows. Exact (not sketched), and the
biggest frame any task touches is one bucket. erf and the binomial CDF
have no Spark SQL builtin, so those two run in Arrow-batched pandas
UDFs calling the same numpy oracle code the parity tests use.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..operators.ranking import bucketed_cumsums
from ..oracle.detectors import binom_cdf_vec



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


def _with_train_counts(
    test_scores: DataFrame,
    train_scores: DataFrame,
    score_col: str,
    out: str,
    side: str,
) -> DataFrame:
    """Append #{train < s} (side='left') or #{train <= s} ('right') to
    every test row — the distributed searchsorted."""
    tr = train_scores.groupBy(F.col(score_col).alias("__s")).agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    te = test_scores.select(F.col(score_col).alias("__s")).distinct()
    dom = (
        tr.join(te, "__s", "full_outer")
        .withColumn("__cnt", F.coalesce("__cnt", F.lit(0)))
    )
    dom = bucketed_cumsums(dom, "__s", {"__cnt": "__below"})
    n_inst = F.col("__below") + (F.col("__cnt") if side == "right" else F.lit(0))
    counts = dom.select("__s", n_inst.alias(out))
    return test_scores.join(
        counts, on=test_scores[score_col] == counts["__s"]
    ).drop("__s")


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
            # frompyfunc built inside the UDF (ufuncs don't pickle);
            # C-loop dispatch of math.erf, ~3x a Python listcomp
            erf = np.frompyfunc(math.erf, 1, 1)
            pre = (x.to_numpy(dtype=np.float64) - mu) / (sigma * math.sqrt(2))
            return pd.Series(np.clip(erf(pre).astype(np.float64), 0.0, 1.0))

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

    #{train <= s} (searchsorted side='right') comes from the
    distributed cumulative-count join; only the binomial CDF runs in
    an Arrow batch."""
    scored = _with_train_counts(
        test_scores, train_scores, score_col, "__n_inst", side="right"
    )
    n = int(state["n"])
    thr = state["threshold"]
    k_top = n - int(n * contamination)

    @pandas_udf("double")
    def conf_udf(s: pd.Series, n_inst: pd.Series) -> pd.Series:
        x = s.to_numpy(dtype=np.float64)
        posterior = (1.0 + n_inst.to_numpy(dtype=np.float64)) / (2.0 + n)
        # vectorized incomplete-beta CDF: O(1) per row — the summation
        # form is O(n) per row, impossible when n is the train size
        conf = 1.0 - binom_cdf_vec(k_top, n, posterior)
        pred = x > thr
        conf[~pred] = 1.0 - conf[~pred]
        return pd.Series(conf)

    return scored.withColumn(
        "confidence", conf_udf(F.col(score_col), F.col("__n_inst"))
    ).drop("__n_inst")


def predict_rank(
    test_scores: DataFrame,
    train_scores: DataFrame,
    normalized: bool = False,
    score_col: str = "score",
) -> DataFrame:
    """Appends the outlyingness rank (searchsorted-left, base.py:284-314)."""
    out = _with_train_counts(test_scores, train_scores, score_col, "__rk", side="left")
    out = out.withColumn("rank", F.col("__rk").cast("double")).drop("__rk")
    if normalized:
        mx = out.agg(F.max("rank").alias("__mx"))
        out = (
            out.crossJoin(F.broadcast(mx))
            .withColumn("rank", F.col("rank") / F.col("__mx"))
            .drop("__mx")
        )
    return out
