"""Score-parity tests: Spark detectors vs the numpy oracle on the F1
fixture (n=200, d=2, contamination=0.1, seed 42 — mirrors every
pytod/test/test_*.py setUp). Both physical strategies must agree with
the oracle within float tolerance (BASELINE.md: 'scores equal within
float tolerance')."""

import numpy as np
import pytest

from pytod_spark.detectors import ABOD, COPOD, ECOD, HBOS, KNN, LOF, PCA
from pytod_spark.oracle.detectors import (
    abod_scores,
    copod_scores,
    ecod_scores,
    hbos_scores,
    knn_scores,
    lof_scores,
    pca_scores,
    process_decision_scores,
)

CASES = [
    ("knn", KNN, dict(n_neighbors=5), lambda X: knn_scores(X, 5), 1e-9),
    ("lof", LOF, dict(n_neighbors=5), lambda X: lof_scores(X, 5), 1e-9),
    ("ecod", ECOD, dict(), ecod_scores, 1e-9),
    ("copod", COPOD, dict(), copod_scores, 1e-9),
    ("hbos", HBOS, dict(n_bins=10, alpha=0.1), lambda X: hbos_scores(X, 10, 0.1), 1e-9),
    ("pca", PCA, dict(n_components=2), lambda X: pca_scores(X, 2), 1e-6),
    ("abod", ABOD, dict(n_neighbors=5), lambda X: abod_scores(X, 5), 1e-6),
]


def _collect_scores(df, id_col="row_id"):
    return {r[id_col]: r["score"] for r in df.collect()}


@pytest.mark.parametrize("name,cls,params,oracle_fn,rtol", CASES, ids=[c[0] for c in CASES])
@pytest.mark.parametrize("strategy", ["kernel", "distributed"])
def test_score_parity(spark, f1_df, f1_fixture, name, cls, params, oracle_fn, rtol, strategy):
    X, _ = f1_fixture
    expected = oracle_fn(X)
    det = cls(contamination=0.1, strategy=strategy, **params)
    # small blocks force the multi-tile map/reduce path
    if hasattr(det, "batch_size"):
        det.batch_size = 64
    got = _collect_scores(det.score_df(f1_df))
    assert len(got) == len(expected)
    actual = np.array([got[i] for i in range(len(expected))])
    np.testing.assert_allclose(actual, expected, rtol=rtol, atol=1e-9)


def test_threshold_labels_parity(spark, f1_df, f1_fixture):
    X, _ = f1_fixture
    exp_scores = knn_scores(X, 5)
    thr, labels, mu, sigma = process_decision_scores(exp_scores, contamination=0.1)
    out = KNN(contamination=0.1, n_neighbors=5, strategy="kernel").fit_df(f1_df).collect()
    by_id = {r["row_id"]: r for r in out}
    got_labels = np.array([by_id[i]["label"] for i in range(len(exp_scores))])
    np.testing.assert_array_equal(got_labels, labels)
    r0 = by_id[0]
    np.testing.assert_allclose(r0["threshold"], thr, rtol=1e-9)
    np.testing.assert_allclose(r0["mu"], mu, rtol=1e-9)
    np.testing.assert_allclose(r0["sigma"], sigma, rtol=1e-9)


def test_grouped_detection(spark, f1_fixture):
    """Two lang groups -> independent per-group scores (drift unit per
    north_rule); each group must match the oracle run on that group."""
    X, _ = f1_fixture
    rows = []
    for g, lo in (("python", 0), ("java", 100)):
        for i in range(lo, lo + 100):
            rows.append((g, int(i), [float(v) for v in X[i]]))
    df = spark.createDataFrame(rows, "lang string, row_id bigint, features array<double>")
    out = ECOD(strategy="distributed").score_df(df, group_cols=["lang"]).collect()
    got = {(r["lang"], r["row_id"]): r["score"] for r in out}
    for g, lo in (("python", 0), ("java", 100)):
        expected = ecod_scores(X[lo : lo + 100])
        actual = np.array([got[(g, i)] for i in range(lo, lo + 100)])
        np.testing.assert_allclose(actual, expected, rtol=1e-9)


def test_contamination_bounds():
    # parity: pytod/test/test_base.py:133-152
    with pytest.raises(ValueError):
        KNN(contamination=0.0)
    with pytest.raises(ValueError):
        KNN(contamination=0.51)
    with pytest.raises(ValueError):
        KNN(strategy="bogus")


def test_auto_strategy_dispatch(spark, f1_df, f1_fixture):
    """strategy='auto' (the default) budget dispatch: small ungrouped
    input -> kernel; above-budget or grouped -> distributed. Scores on
    the auto path must still match the oracle (it IS one of the two
    parity-tested plans)."""
    X, _ = f1_fixture
    det = ECOD()  # default auto
    assert det.strategy == "auto"
    # 200 x 2 fits the 8M-element budget -> kernel
    assert det._resolve_strategy(f1_df, "features", [], None) == "kernel"
    # grouped -> distributed without a count job
    assert det._resolve_strategy(f1_df, "features", ["lang"], None) == "distributed"
    # caller-declared row count above the budget -> distributed
    assert det._resolve_strategy(f1_df, "features", [], 10**9) == "distributed"
    got = _collect_scores(det.score_df(f1_df))
    expected = ecod_scores(X)
    actual = np.array([got[i] for i in range(len(expected))])
    np.testing.assert_allclose(actual, expected, rtol=1e-9, atol=1e-9)


def test_get_set_params_repr():
    det = KNN(n_neighbors=7)
    assert det.get_params()["n_neighbors"] == 7
    det.set_params(n_neighbors=9)
    assert det.n_neighbors == 9
    with pytest.raises(ValueError):
        det.set_params(bogus=1)
    assert "KNN(" in repr(det)


def test_low_precision_knn_matches_exact(spark, f1_df, f1_fixture):
    """fp32 filter + exact recheck must reproduce the fp64 kNN scores
    (the reference's provable-quantization contract,
    basic_operators.py:96-137 / quantization.py:108-161)."""
    X, _ = f1_fixture
    expected = knn_scores(X, 5)
    det = KNN(n_neighbors=5, strategy="distributed", precision="low")
    det.batch_size = 64
    got = _collect_scores(det.score_df(f1_df))
    actual = np.array([got[i] for i in range(len(expected))])
    np.testing.assert_allclose(actual, expected, rtol=1e-12, atol=1e-12)


def test_farthest_scores_exact_and_lowprec(spark, f1_df, f1_fixture):
    """Tiled top-k FARTHEST distances (the reference's topk /
    topk_low_prec family, basic_operators.py:54-75 / :140-182): tiny
    blocks force the multi-tile merge; the fp32 filter-and-refine path
    must reproduce the fp64 result exactly."""
    from pytod_spark.operators.block_knn import farthest_scores_df
    from pytod_spark.oracle.operators import cdist, topk

    X, _ = f1_fixture
    k = 5
    vals, _ = topk(cdist(X, X), k)
    expected = vals[:, k - 1]
    exact = _collect_scores(farthest_scores_df(f1_df, k=k, block_size=64))
    actual = np.array([exact[i] for i in range(len(expected))])
    np.testing.assert_allclose(actual, expected, rtol=1e-12, atol=1e-12)
    low = _collect_scores(
        farthest_scores_df(f1_df, k=k, block_size=64, precision="low")
    )
    actual_low = np.array([low[i] for i in range(len(expected))])
    np.testing.assert_allclose(actual_low, expected, rtol=1e-12, atol=1e-12)


def test_small_group_scores_clamp_not_vanish(spark):
    """Groups smaller than n_neighbors+1 score against their farthest
    AVAILABLE neighbor instead of silently dropping out (round-4
    review): every input row must come back with a score."""
    from pytod_spark.operators.block_knn import farthest_scores_df, knn_scores_df

    rows = [(g * 10 + i, float(g), [float(i), float(g)])
            for g in range(3) for i in range(2 + g)]  # group sizes 2, 3, 4
    df = spark.createDataFrame(rows, "row_id long, grp double, features array<double>")
    scored = knn_scores_df(df, n_neighbors=5, group_cols=["grp"]).collect()
    assert len(scored) == len(rows), "no row may vanish for small groups"
    far = farthest_scores_df(df, k=5, group_cols=["grp"]).collect()
    assert len(far) == len(rows)


def test_grouped_knn_join_keeps_group_column_type(spark):
    """Cogroup output schema must carry the INPUT group-column type
    (an int cluster id must not come back as string)."""
    from pytod_spark.operators.block_knn import knn_join

    rows = [(i, i % 2, [float(i % 7), float(i % 5)]) for i in range(40)]
    df = spark.createDataFrame(rows, "row_id long, cluster_id int, features array<double>")
    out = knn_join(df, 3, group_cols=["cluster_id"], broadcast_elems=0, block_size=16)
    assert dict(out.dtypes)["cluster_id"] == "int"
    got = out.limit(5).collect()
    assert got and all(isinstance(r["cluster_id"], int) for r in got)


def test_abod_grouped_repeating_ids_no_fanout(spark):
    """Row ids restarting per group must not fan out / misattribute
    ABOD scores (the kernel output now carries group columns through
    instead of joining back on id alone)."""
    rng = np.random.default_rng(11)
    rows = []
    for g in ("python", "java"):
        X = rng.normal(loc=0.0 if g == "python" else 50.0, size=(30, 4))
        rows += [(g, int(i), [float(v) for v in X[i]]) for i in range(30)]
    df = spark.createDataFrame(rows, "lang string, row_id long, features array<double>")
    out = ABOD(n_neighbors=5, strategy="distributed").score_df(
        df, group_cols=["lang"]).collect()
    assert len(out) == 60, "one score per (group, id) — no fanout"
    from pytod_spark.oracle.detectors import abod_scores as np_abod
    for g in ("python", "java"):
        grp = sorted((r for r in out if r["lang"] == g), key=lambda r: r["row_id"])
        X = np.stack([r[2] for r in rows[:30]] if g == "python"
                     else [r[2] for r in rows[30:]])
        np.testing.assert_allclose(
            np.array([r["score"] for r in grp]), np_abod(X, n_neighbors=5),
            rtol=1e-7,
        )


def test_auto_strategy_never_counts_expensive_lineage(spark, f1_df):
    """The auto probe must not execute a large frame's upstream
    lineage just to pick a strategy: when the optimizer can't prove a
    row count AND the plan's leaves aren't provably small
    (_cheap_count_ok), resolution answers 'distributed' with ZERO
    jobs. Simulated by shrinking the cheap-count byte budget to 0 so
    even the small fixture counts as expensive."""
    from pytod_spark.operators import block_knn

    det = ECOD()
    tracker = spark.sparkContext.statusTracker()
    jobs_before = len(tracker.getJobIdsForGroup(None) or [])
    orig = block_knn._cheap_count_ok
    block_knn._cheap_count_ok = lambda df, max_bytes=0: False
    try:
        assert det._resolve_strategy(f1_df, "features", [], None) == "distributed"
    finally:
        block_knn._cheap_count_ok = orig
    jobs_after = len(tracker.getJobIdsForGroup(None) or [])
    assert jobs_after == jobs_before, "strategy probe ran a Spark job"


def test_knn_plans_agree_on_boundary_ties(spark):
    """Duplicate feature vectors tie exactly at the rank-k boundary;
    WHICH neighbor fills rank k must not depend on the physical plan
    the size gate picks. Both the broadcast fast path and the tile
    cogroup plan follow the (dist asc, nbr_id asc) contract, so their
    full (row_id, nbr_id, rn) outputs are identical."""
    from pytod_spark.operators.block_knn import knn_join

    # 10 copies of one vector + a few distinct ones: every duplicate's
    # k=3 neighborhood is a pure tie set
    rows = [(i, [1.0, 2.0]) for i in range(10)]
    rows += [(10 + i, [float(5 + i), 0.0]) for i in range(4)]
    df = spark.createDataFrame(rows, "row_id long, features array<double>")
    cols = ["row_id", "nbr_id", "rn"]
    bcast = sorted(map(tuple, knn_join(df, 3, block_size=16).select(*cols).collect()))
    tile = sorted(map(tuple, knn_join(
        df, 3, block_size=16, broadcast_elems=0
    ).select(*cols).collect()))
    assert bcast == tile
    # and the tie order is the documented one: self (dist 0) first,
    # then the smallest tied ids (knn_join keeps self-distance; the
    # detectors drop it via k+1)
    nbrs0 = [t[1] for t in bcast if t[0] == 0]
    assert nbrs0 == [0, 1, 2]
