"""Golden tests for the numpy oracle, mirroring the reference's own
operator tests (pytod/test/test_basic_operators.py, FIXTURES.md F2)."""

import numpy as np
import pytest

from pytod_spark.oracle import (
    bottomk,
    cdist,
    ecdf_multiple,
    get_batch_index,
    histt,
    intersec1d,
    intersecmulti,
    knn_full,
    standardizer,
    topk,
)
from pytod_spark.oracle.detectors import process_decision_scores


F2 = np.array([[1.0, 1.0], [2.0, 2.0], [3.0, 3.0]])


def test_cdist_zero_diagonal():
    # mirrors pytod/test/test_basic_operators.py:30-33
    D = cdist(F2)
    assert D.shape == (3, 3)
    np.testing.assert_allclose(np.diag(D), 0.0, atol=1e-12)


def test_topk_golden():
    # mirrors pytod/test/test_basic_operators.py:42-49
    D = cdist(F2)
    vals, inds = topk(D, 1)
    np.testing.assert_array_equal(inds, [[2], [0], [0]])
    np.testing.assert_allclose(np.round(vals, 4), [[2.8284], [1.4142], [2.8284]])


def test_bottomk_sorted_ascending():
    D = cdist(F2)
    vals, inds = bottomk(D, 2)
    np.testing.assert_allclose(vals[:, 0], 0.0, atol=1e-12)
    assert (np.diff(vals, axis=1) >= 0).all()
    np.testing.assert_array_equal(inds[:, 0], [0, 1, 2])


def test_knn_full_matches_cdist_bottomk():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(20, 3))
    v1, i1 = knn_full(A, A, 4)
    v2, i2 = bottomk(cdist(A, A), 4)
    np.testing.assert_allclose(v1, v2)
    np.testing.assert_array_equal(i1, i2)


def test_intersec1d():
    a = np.array([3, 1, 2, 2, 9])
    b = np.array([2, 9, 9, 7])
    np.testing.assert_array_equal(intersec1d(a, b), [2, 9])
    inter, counts = intersecmulti(np.array([[1, 2, 3]]), np.array([[3, 4, 1]]))
    np.testing.assert_array_equal(inter[0], [1, 3])
    assert counts == [2]


def test_ecdf_permutation_quirk():
    # reference returns y[argsort], NOT rank/n (basic_operators.py:242-244)
    x = np.array([[0.3], [0.1], [0.2]])
    # argsort = [1, 2, 0]; y = [1/3, 2/3, 1]; out[i] = (argsort[i]+1)/3
    expected = np.array([[2 / 3], [1.0], [1 / 3]])
    np.testing.assert_allclose(ecdf_multiple(x), expected)


def test_ecdf_sorted_input_is_standard_ecdf():
    x = np.sort(np.random.default_rng(1).normal(size=50))[:, None]
    np.testing.assert_allclose(ecdf_multiple(x)[:, 0], np.arange(1, 51) / 50)


def test_histt_density_and_edges():
    a = np.array([0.0, 0.1, 0.5, 0.9, 1.0])
    dens, edges = histt(a, bins=2, density=True)
    np.testing.assert_allclose(edges, [0.0, 0.5, 1.0])
    # bins: [0, 0.5) -> {0, .1}; [0.5, 1.0] -> {.5, .9, 1.0}
    np.testing.assert_allclose(dens, [2 / 0.5 / 5, 3 / 0.5 / 5])


def test_histt_max_in_last_bin():
    a = np.linspace(0, 1, 11)
    counts, _ = histt(a, bins=10, density=False)
    assert counts.sum() == 11
    assert counts[-1] == 2  # 0.9 and 1.0


def test_standardizer_ddof1():
    rng = np.random.default_rng(2)
    X = rng.normal(size=(30, 4))
    Xn, mu, sd = standardizer(X, return_mean_std=True)
    np.testing.assert_allclose(sd, X.std(axis=0, ddof=1))
    np.testing.assert_allclose(Xn.std(axis=0, ddof=1), 1.0)


def test_get_batch_index():
    assert get_batch_index(10, 20) == [(0, 10)]
    assert get_batch_index(10, 3) == [(0, 3), (3, 6), (6, 9), (9, 10)]
    assert get_batch_index(9, 3) == [(0, 3), (3, 6), (6, 9)]


def test_process_decision_scores_matches_numpy_percentile():
    scores = np.arange(100, dtype=float)
    thr, labels, mu, sigma = process_decision_scores(scores, contamination=0.1)
    assert thr == np.percentile(scores, 90)
    assert labels.sum() == (scores > thr).sum()
    assert mu == scores.mean() and sigma == scores.std()
