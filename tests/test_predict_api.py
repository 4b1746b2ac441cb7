"""Parity tests for the prediction post-processing surface
(base.py:143-314) against the numpy oracle."""

import numpy as np
import pytest

from pytod_spark.detectors import predict as P
from pytod_spark.oracle import detectors as O


@pytest.fixture(scope="module")
def score_dfs(spark):
    rng = np.random.default_rng(11)
    train = rng.normal(size=150) ** 2
    test = rng.normal(size=60) ** 2
    train_df = spark.createDataFrame(
        [(int(i), float(s)) for i, s in enumerate(train)], "id long, score double"
    )
    test_df = spark.createDataFrame(
        [(int(i), float(s)) for i, s in enumerate(test)], "id long, score double"
    )
    return train, test, train_df, test_df


def test_fitted_state_and_labels(spark, score_dfs):
    train, test, train_df, test_df = score_dfs
    thr, labels, mu, sigma = O.process_decision_scores(train, 0.1)
    state = P.fitted_state(train_df, 0.1)
    np.testing.assert_allclose(state["threshold"], thr, rtol=1e-12)
    np.testing.assert_allclose(state["mu"], mu, rtol=1e-12)
    np.testing.assert_allclose(state["sigma"], sigma, rtol=1e-12)

    out = {r["id"]: r["label"] for r in P.predict_labels(test_df, state).collect()}
    expected = (test > thr).astype(int)
    np.testing.assert_array_equal([out[i] for i in range(len(test))], expected)


@pytest.mark.parametrize("method", ["linear", "unify"])
def test_predict_proba_parity(spark, score_dfs, method):
    train, test, train_df, test_df = score_dfs
    state = P.fitted_state(train_df, 0.1)
    expected = O.predict_proba(train, test, method, mu=state["mu"], sigma=state["sigma"])
    got = {r["id"]: (r["proba_0"], r["proba_1"])
           for r in P.predict_proba(test_df, state, method).collect()}
    actual = np.array([got[i] for i in range(len(test))])
    np.testing.assert_allclose(actual, expected, rtol=1e-9, atol=1e-12)


def test_predict_confidence_parity(spark, score_dfs):
    train, test, train_df, test_df = score_dfs
    state = P.fitted_state(train_df, 0.1)
    thr = state["threshold"]
    expected = O.predict_confidence(train, test, thr, 0.1)
    got = {r["id"]: r["confidence"]
           for r in P.predict_confidence(test_df, train_df, state, 0.1).collect()}
    actual = np.array([got[i] for i in range(len(test))])
    np.testing.assert_allclose(actual, expected, rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("normalized", [False, True])
def test_predict_rank_parity(spark, score_dfs, normalized):
    train, test, train_df, test_df = score_dfs
    expected = O.predict_rank(train, test, normalized)
    got = {r["id"]: r["rank"]
           for r in P.predict_rank(test_df, train_df, normalized).collect()}
    actual = np.array([got[i] for i in range(len(test))])
    np.testing.assert_allclose(actual, expected, rtol=1e-12)
