"""Numpy transliterations of the reference's six detectors.

These are the score contracts the Spark engine must match (within
float tolerance). Every step cites the reference lines it reproduces.
"""

from __future__ import annotations

import math

import numpy as np

from .operators import cdist, ecdf_multiple, histt, knn_full


def knn_scores(X: np.ndarray, n_neighbors: int = 5) -> np.ndarray:
    """KNN outlier score = distance to the k-th true neighbor.

    Parity: ``pytod/models/knn.py:100-108`` — ``knn_batch(X, X, k+1)``
    (self included, occupying the distance-0 slot) then the last
    column of the ascending-sorted neighbor distances.
    """
    knn_dist, _ = knn_full(X, X, n_neighbors + 1)
    return knn_dist[:, -1]


def lof_scores(X: np.ndarray, n_neighbors: int = 5) -> np.ndarray:
    """Local Outlier Factor, exactly as the reference computes it.

    Parity: ``pytod/models/lof.py:100-142``:
    kNN(k+1) -> drop the self column (:104); kdist(b) = b's k-th
    neighbor distance post-drop (:116-117); reach(a,b) =
    max(dist(a,b), kdist(b)) via masked overwrite (:120-124);
    ar = row mean of reach (:130); ar_nn = harmonic mean of the
    neighbors' ar (:134-137, scipy.stats.hmean == k / sum(1/x));
    score = ar / ar_nn (:140).
    """
    k = n_neighbors
    knn_dist, knn_inds = knn_full(X, X, k + 1)
    knn_dist, knn_inds = knn_dist[:, 1:], knn_inds[:, 1:]

    flat_inds = knn_inds.ravel()
    reach = knn_dist.ravel().copy()
    kth_of_neighbor = knn_dist[flat_inds, -1]
    smaller = reach < kth_of_neighbor
    reach[smaller] = kth_of_neighbor[smaller]

    ar = reach.reshape(-1, k).mean(axis=1)
    ar_of_neighbors = ar[flat_inds].reshape(-1, k)
    ar_nn = k / (1.0 / ar_of_neighbors).sum(axis=1)  # harmonic mean
    return ar / ar_nn


def hbos_scores(X: np.ndarray, n_bins: int = 10, alpha: float = 0.1) -> np.ndarray:
    """Histogram-based outlier score.

    Parity: ``pytod/models/hbos.py:100-130``: per feature,
    ``histt(X[:, i], n_bins, density=True)`` (:109-111); bin index via
    torch.bucketize == searchsorted(edges, x, side='left') clamped to
    [1, n_bins] (:118-122); per-feature score log2(density + alpha)
    gathered at bin_ind - 1 (:119-123); final = -sum over features
    (:129-130).
    """
    X = np.asarray(X, dtype=np.float64)
    n, d = X.shape
    out = np.zeros((n, d))
    for i in range(d):
        dens, edges = histt(X[:, i], bins=n_bins, density=True)
        bin_inds = np.searchsorted(edges, X[:, i], side="left")
        bin_inds[bin_inds == 0] = 1
        bin_inds[bin_inds == n_bins + 1] = n_bins
        out[:, i] = np.log2(dens + alpha)[bin_inds - 1]
    return -out.sum(axis=1)


def ecod_scores(X: np.ndarray) -> np.ndarray:
    """ECOD score with the reference's argsort-permutation quirk.

    Parity: ``pytod/models/ecod.py:82-95``: U_l = ecdf(X),
    U_r = ecdf(-X) (both via the y[argsort] construction, see
    :func:`pytod_spark.oracle.operators.ecdf_multiple`); -log both;
    O = elementwise max; score = sum(O, axis=1) * -1.
    """
    U_l = -np.log(ecdf_multiple(X))
    U_r = -np.log(ecdf_multiple(-np.asarray(X, dtype=np.float64)))
    return np.maximum(U_l, U_r).sum(axis=1) * -1.0


def pca_eigvectors(X: np.ndarray, n_components: int = 5) -> np.ndarray:
    """Deterministic stand-in for torch.pca_lowrank's V (pca.py:109).

    The reference's randomized SVD is run-to-run nondeterministic (its
    own results vary: reproducibility/results.txt:22,33,44), so exact
    parity is ill-posed; we pin an exact eigendecomposition of the
    sample covariance of centered X with a deterministic sign
    convention (largest-|.| component of each eigenvector positive).
    """
    X = np.asarray(X, dtype=np.float64)
    Xc = X - X.mean(axis=0)
    cov = (Xc.T @ Xc) / (X.shape[0] - 1)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:n_components]
    V = v[:, order]
    for j in range(V.shape[1]):
        m = np.argmax(np.abs(V[:, j]))
        if V[m, j] < 0:
            V[:, j] = -V[:, j]
    return V


def pca_scores(X: np.ndarray, n_components: int = 5) -> np.ndarray:
    """PCA outlier score (distance-to-eigenvector, 1/evr weighted).

    Parity: ``pytod/models/pca.py:107-123``: V from (deterministic)
    PCA; X_projected = X @ V on the *uncentered* X (:111); explained
    variance ratio from var(X_projected, ddof=1) (:114-116); score =
    sum_j cdist(X, V.T)[:, j] / evr_j (:122-123).
    """
    X = np.asarray(X, dtype=np.float64)
    V = pca_eigvectors(X, n_components)
    X_proj = X @ V
    vars_by_pc = X_proj.var(axis=0, ddof=1)
    evr = vars_by_pc / vars_by_pc.sum()
    return (cdist(X, V.T) / evr).sum(axis=1)


def abod_scores(X: np.ndarray, n_neighbors: int = 5) -> np.ndarray:
    """Fast ABOD score = -variance of weighted cosine to neighbor pairs.

    Parity: ``pytod/models/abod.py:119-169``: kNN(k+1), drop self
    (:128-132); all C(k,2) neighbor pairs per sample (:136-148, pair
    order irrelevant to variance); nn_i = X[b_i] - X[a] (:157-163);
    weighted cosine sum(n1*n2) / (||n1||^2 * ||n2||^2) (:16-31);
    score = -nan_to_num(var(cos, ddof=1)) (:168, torch.var unbiased).
    """
    X = np.asarray(X, dtype=np.float64)
    k = n_neighbors
    _, knn_inds = knn_full(X, X, k + 1)
    knn_inds = knn_inds[:, 1:]
    n = X.shape[0]
    pairs = [(i, j) for i in range(k) for j in range(i + 1, k)]
    n_combs = len(pairs)
    cos = np.empty((n, n_combs))
    for c, (i, j) in enumerate(pairs):
        nn1 = X[knn_inds[:, i]] - X
        nn2 = X[knn_inds[:, j]] - X
        num = np.einsum("ij,ij->i", nn1, nn2)
        den = (np.linalg.norm(nn1, axis=1) ** 2) * (np.linalg.norm(nn2, axis=1) ** 2)
        with np.errstate(divide="ignore", invalid="ignore"):
            cos[:, c] = num / den
    return -np.nan_to_num(cos.var(axis=1, ddof=1))


def process_decision_scores(scores: np.ndarray, contamination: float = 0.1):
    """threshold / labels / mu / sigma.

    Parity: ``pytod/models/base.py:414-435``: threshold =
    percentile(scores, 100*(1-contamination)) with numpy's default
    linear interpolation; labels = (scores > threshold); _mu = mean;
    _sigma = np.std (population, ddof=0).
    """
    scores = np.asarray(scores, dtype=np.float64)
    threshold = np.percentile(scores, 100 * (1 - contamination))
    labels = (scores > threshold).astype(int)
    return threshold, labels, scores.mean(), scores.std()


def predict_proba(train_scores, test_scores, method="linear", mu=None, sigma=None):
    """Probability conversion.

    Parity: ``pytod/models/base.py:174-239``: 'linear' = min-max scale
    by the train range clipped to [0,1]; 'unify' =
    erf((s - mu) / (sigma * sqrt(2))) clipped.
    """
    test_scores = np.asarray(test_scores, dtype=np.float64)
    if method == "linear":
        lo, hi = np.min(train_scores), np.max(train_scores)
        p1 = np.clip((test_scores - lo) / (hi - lo), 0, 1)
    elif method == "unify":
        pre = (test_scores - mu) / (sigma * math.sqrt(2))
        p1 = np.clip(np.vectorize(math.erf)(pre), 0, 1)
    else:
        raise ValueError(method)
    return np.stack([1 - p1, p1], axis=1)


def _binom_cdf(k: int, n: int, p: float) -> float:
    """Binomial CDF via log-gamma summation (scipy absent in sandbox)."""
    if k < 0:
        return 0.0
    if k >= n or p <= 0.0:
        return 1.0
    if p >= 1.0:
        return 0.0
    total = 0.0
    logp, log1mp = math.log(p), math.log1p(-p)
    lg_n1 = math.lgamma(n + 1)
    for i in range(0, int(k) + 1):
        total += math.exp(
            lg_n1 - math.lgamma(i + 1) - math.lgamma(n - i + 1) + i * logp + (n - i) * log1mp
        )
    return min(total, 1.0)


def predict_confidence(train_scores, test_scores, threshold, contamination=0.1):
    """Prediction-stability confidence.

    Parity: ``pytod/models/base.py:241-282``: Bayesian posterior
    (1 + #{train <= s}) / (2 + n), confidence =
    1 - BinomCDF(n - int(n*contamination), n, posterior); flipped to
    1 - confidence for predicted inliers.
    """
    train_scores = np.asarray(train_scores, dtype=np.float64)
    test_scores = np.asarray(test_scores, dtype=np.float64)
    n = len(train_scores)
    n_inst = np.array([(train_scores <= s).sum() for s in test_scores])
    posterior = (1.0 + n_inst) / (2.0 + n)
    conf = np.array([1.0 - _binom_cdf(n - int(n * contamination), n, p) for p in posterior])
    pred = (test_scores > threshold).astype(int)
    conf[pred == 0] = 1.0 - conf[pred == 0]
    return conf


def predict_rank(train_scores, test_scores, normalized=False):
    """Outlyingness rank via searchsorted on sorted train scores.

    Parity: ``pytod/models/base.py:284-314``.
    """
    ranks = np.searchsorted(np.sort(train_scores), test_scores)
    if normalized:
        ranks = ranks / ranks.max()
    return ranks


def _betacf(a: float, b: float, x: np.ndarray, max_iter: int = 300,
            eps: float = 3e-14) -> np.ndarray:
    """Vectorized Lentz continued fraction for the incomplete beta
    (standard Numerical-Recipes-style recurrence, public algorithm)."""
    tiny = 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = np.ones_like(x)
    d = 1.0 - qab * x / qap
    d = np.where(np.abs(d) < tiny, tiny, d)
    d = 1.0 / d
    h = d.copy()
    for m in range(1, max_iter + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        d = np.where(np.abs(d) < tiny, tiny, d)
        d = 1.0 / d
        c = 1.0 + aa / c
        c = np.where(np.abs(c) < tiny, tiny, c)
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        d = np.where(np.abs(d) < tiny, tiny, d)
        d = 1.0 / d
        c = 1.0 + aa / c
        c = np.where(np.abs(c) < tiny, tiny, c)
        delt = d * c
        h *= delt
        if np.all(np.abs(delt - 1.0) < eps):
            break
    return h


def _betainc_reg(a: float, b: float, x: np.ndarray) -> np.ndarray:
    """Regularized incomplete beta I_x(a, b), vectorized over x."""
    x = np.asarray(x, dtype=np.float64)
    out = np.empty_like(x)
    lo, hi = x <= 0.0, x >= 1.0
    out[lo], out[hi] = 0.0, 1.0
    mid = ~(lo | hi)
    if mid.any():
        xm = x[mid]
        lnbeta = math.lgamma(a) + math.lgamma(b) - math.lgamma(a + b)
        front = np.exp(a * np.log(xm) + b * np.log1p(-xm) - lnbeta)
        direct = xm < (a + 1.0) / (a + b + 2.0)
        res = np.empty_like(xm)
        if direct.any():
            res[direct] = front[direct] * _betacf(a, b, xm[direct]) / a
        inv = ~direct
        if inv.any():
            res[inv] = 1.0 - front[inv] * _betacf(b, a, 1.0 - xm[inv]) / b
        out[mid] = res
    return out


def binom_cdf_vec(k: int, n: int, p: np.ndarray) -> np.ndarray:
    """Vectorized binomial CDF P[X <= k], X ~ Binom(n, p), via the
    identity CDF = I_{1-p}(n-k, k+1). Matches the summation oracle
    ``_binom_cdf`` to ~1e-12 (asserted in tests) but does O(1) work
    per probability instead of O(k) — the only viable form when n is
    the training-set size (base.py:241-282 confidence at 10^12 rows).
    """
    p = np.asarray(p, dtype=np.float64)
    if k < 0:
        return np.zeros_like(p)
    if k >= n:
        return np.ones_like(p)
    res = _betainc_reg(float(n - k), float(k + 1), 1.0 - p)
    res = np.where(p <= 0.0, 1.0, res)
    res = np.where(p >= 1.0, 0.0, res)
    return np.clip(res, 0.0, 1.0)


def copod_scores(X: np.ndarray) -> np.ndarray:
    """COPOD score (Li et al., "COPOD: Copula-Based Outlier
    Detection", ICDM 2020) — the copula-tail stage BASELINE.json's
    north star names; the reference repo ships only the successor
    ECOD (no copod.py), so this is a value-add implemented from the
    published formulation, not a parity port.

    Per feature j: left/right tail probabilities from the empirical
    copula, with the deterministic tie convention "rank of (v, row
    position) / n" (reduces to the ECDF pair ecdf(X) / ecdf(-X) for
    continuous data); skewness-corrected tail picks the left tail
    when the third central moment is negative, else the right tail.
    Score_i = sum_j max(U_skew, (U_l + U_r) / 2) of the -log tail
    probabilities — unlike the reference's ECOD there is no trailing
    ``* -1``: higher score = more outlying.
    """
    X = np.asarray(X, dtype=np.float64)
    n, d = X.shape
    r_l = np.empty((n, d), dtype=np.float64)
    r_r = np.empty((n, d), dtype=np.float64)
    for j in range(d):
        order = np.argsort(X[:, j], kind="stable")
        r_l[order, j] = np.arange(1, n + 1)
        order = np.argsort(-X[:, j], kind="stable")
        r_r[order, j] = np.arange(1, n + 1)
    U_l = -np.log(r_l / n)
    U_r = -np.log(r_r / n)
    mu = X.mean(axis=0)
    m3 = ((X - mu) ** 3).mean(axis=0)
    U_skew = np.where(m3 < 0, U_l, U_r)
    return np.maximum(U_skew, (U_l + U_r) / 2.0).sum(axis=1)
