"""Property-based tests (hypothesis) for the parity kernels and the
scale-critical graph operators.

The example-based parity tests (test_oracle_operators.py) pin the
reference's documented quirks on fixed fixtures; these generate
adversarial inputs — ties, duplicates, negative values, degenerate
shapes — and check the INVARIANTS each kernel promises:

* topk/bottomk agree with a full sort, and returned indices really
  index the returned values;
* the low-precision variants' exact-recheck guarantee (output values
  equal the exact kernel's even when fp16 collapses ranks);
* intersec1d == np.intersect1d;
* ecdf_multiple's reference quirk restated independently via ranks;
* histt == np.histogram over [min, max] wherever torch.histc and
  numpy agree (they diverge when a value sits a ULP from an interior
  edge: torch floors (x-lo)/width with no correction, numpy compares
  against the actual linspace edges — the parity contract is torch);
* get_batch_index tiles [0, n) exactly;
* connected_components == a pure-Python union-find on random graphs;
* capped_self_join_pairs preserves within-bucket connectivity at any
  cap, and cap=0 is exactly the all-pairs join.

Spark-backed properties run few examples (the kernels are distributed
jobs, not microseconds); the numpy properties run the default budget.
"""

import numpy as np
import pytest
from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

from pytod_spark.oracle.operators import (
    bottomk,
    bottomk_low_prec,
    cdist,
    ecdf_multiple,
    get_batch_index,
    histt,
    intersec1d,
    topk,
    topk_low_prec,
)

# ---------------------------------------------------------------- numpy

# modest magnitudes: fp16 overflows past 65504 and the low-prec
# kernels' ambiguity test is about RANK collapse, not inf saturation
finite = st.floats(
    min_value=-1e4, max_value=1e4, allow_nan=False, allow_infinity=False, width=32
)


@st.composite
def matrices(draw, min_rows=1, max_rows=8, min_cols=1, max_cols=10, ties=False):
    n = draw(st.integers(min_rows, max_rows))
    m = draw(st.integers(min_cols, max_cols))
    if ties:
        # small-integer entries force heavy duplicate values
        vals = draw(
            st.lists(st.integers(-3, 3), min_size=n * m, max_size=n * m)
        )
        return np.array(vals, dtype=np.float64).reshape(n, m)
    vals = draw(st.lists(finite, min_size=n * m, max_size=n * m))
    return np.array(vals, dtype=np.float64).reshape(n, m)


@given(A=matrices(min_cols=2, ties=False), data=st.data(), use_ties=st.booleans())
def test_topk_bottomk_match_full_sort(A, data, use_ties):
    if use_ties:
        A = np.floor(A)  # collapse to integers -> ties
    k = data.draw(st.integers(1, A.shape[1]))
    for fn, sign in ((topk, -1.0), (bottomk, 1.0)):
        vals, idx = fn(A, k)
        expect = np.sort(sign * A, axis=1)[:, :k] * sign
        np.testing.assert_array_equal(vals, expect)
        # indices really address the reported values
        np.testing.assert_array_equal(np.take_along_axis(A, idx, axis=1), vals)
        # indices are distinct per row (k different neighbors)
        for row in idx:
            assert len(set(row.tolist())) == k


@given(A=matrices(min_cols=2, ties=False), data=st.data(), use_ties=st.booleans())
def test_low_prec_recheck_equals_exact(A, data, use_ties):
    """The fp16/fp32 fast path + ambiguity recheck must return the same
    VALUE multiset as the exact kernel (indices may differ under ties;
    values are gathered from the original matrix by contract)."""
    if use_ties:
        A = np.floor(A)
    k = data.draw(st.integers(1, A.shape[1] - 1))  # low-prec takes k+1
    for low, exact, sign in (
        (topk_low_prec, topk, -1.0),
        (bottomk_low_prec, bottomk, 1.0),
    ):
        for mode in ("half", "float"):
            vals, idx = low(A, k, mode=mode, sort_value=True)
            evals, _ = exact(A, k)
            np.testing.assert_allclose(vals, evals, rtol=0, atol=0)
            np.testing.assert_array_equal(
                np.take_along_axis(A, idx, axis=1), vals
            )


@given(
    t1=st.lists(st.integers(-20, 20), min_size=0, max_size=30),
    t2=st.lists(st.integers(-20, 20), min_size=0, max_size=30),
)
def test_intersec1d_matches_numpy(t1, t2):
    got = intersec1d(np.array(t1, dtype=np.int64), np.array(t2, dtype=np.int64))
    np.testing.assert_array_equal(got, np.intersect1d(t1, t2))


@given(X=matrices(min_rows=2, ties=False))
def test_ecdf_multiple_reference_quirk(X):
    """Independent restatement of the reference's y[argsort] quirk: for
    unique-valued columns, the row holding rank r of feature j reads
    out (index of the r-th smallest row + 1)/n — checked via ranks
    computed with searchsorted, not argsort."""
    n = X.shape[0]
    out = ecdf_multiple(X)
    for j in range(X.shape[1]):
        col = X[:, j]
        if len(np.unique(col)) != n:
            # ties: the contract is only "stable argsort order"; the
            # multiset is always the full linspace
            np.testing.assert_allclose(
                np.sort(out[:, j]), np.linspace(1.0 / n, 1.0, n)
            )
            continue
        order = np.searchsorted(np.sort(col), col)  # rank of each row
        for i in range(n):
            assert out[order[i], j] == pytest.approx((i + 1) / n)


@given(
    a=st.lists(finite, min_size=2, max_size=40),
    bins=st.integers(1, 12),
)
def test_histt_matches_numpy_histogram(a, bins):
    arr = np.array(a, dtype=np.float64)
    if arr.min() == arr.max():
        return  # degenerate range: torch.histc semantics diverge; not used
    counts, edges = histt(arr, bins=bins, density=False)
    ecounts, eedges = np.histogram(arr, bins=bins, range=(arr.min(), arr.max()))
    # torch.histc (the parity contract) floors (x-lo)/width with no edge
    # correction; numpy re-checks x against the linspace edges. A value
    # within a ULP of an interior edge (e.g. -1e-38 with edges [-.5,0,.5])
    # can land one bin apart. Cross-check against numpy only where the two
    # upstream semantics agree; the divergent case is pinned below.
    lo, hi = arr.min(), arr.max()
    floor_idx = np.clip(
        np.floor((arr - lo) / ((hi - lo) / bins)).astype(np.int64), 0, bins - 1
    )
    np_idx = np.clip(np.searchsorted(eedges, arr, side="right") - 1, 0, bins - 1)
    assume(np.array_equal(floor_idx, np_idx))
    np.testing.assert_array_equal(counts, ecounts)
    np.testing.assert_allclose(edges, eedges)
    dcounts, _ = histt(arr, bins=bins, density=True)
    edens, _ = np.histogram(
        arr, bins=bins, range=(arr.min(), arr.max()), density=True
    )
    np.testing.assert_allclose(dcounts, edens)


def test_histt_edge_ulp_follows_torch_not_numpy():
    """hypothesis-found divergence (2026-08-20): -1.17e-38 with edges
    [-0.5, 0, 0.5]. (x - lo) / width rounds to exactly 1.0 in fp64, so
    torch.histc's floor formula bins it HIGH (bin 1); numpy's edge
    re-check (x < edges[1]) bins it LOW (bin 0). The parity contract is
    torch.histc (reference basic_operators.py:261-278) — pin that."""
    arr = np.array([0.5, -0.5, -1.1754943508222875e-38])
    counts, edges = histt(arr, bins=2, density=False)
    np.testing.assert_array_equal(counts, [1.0, 2.0])  # torch semantics
    np_counts, _ = np.histogram(arr, bins=2, range=(-0.5, 0.5))
    np.testing.assert_array_equal(np_counts, [2, 1])  # numpy disagrees


@given(n=st.integers(1, 5000), b=st.integers(1, 600))
def test_get_batch_index_tiles_exactly(n, b):
    tiles = get_batch_index(n, b)
    assert tiles[0][0] == 0 and tiles[-1][1] == n
    for (lo, hi), (lo2, _hi2) in zip(tiles, tiles[1:]):
        assert hi == lo2  # contiguous, no gap/overlap
    assert all(hi - lo <= b for lo, hi in tiles[:-1] or tiles)


@given(a=matrices(max_rows=6, max_cols=5), b=matrices(max_rows=6, max_cols=5))
def test_cdist_matches_bruteforce(a, b):
    if a.shape[1] != b.shape[1]:
        b = np.resize(b, (b.shape[0], a.shape[1]))
    got = cdist(a, b)
    brute = np.sqrt(((a[:, None, :] - b[None, :, :]) ** 2).sum(axis=2))
    # the gram trick loses precision when |x| >> pairwise distance
    np.testing.assert_allclose(got, brute, rtol=1e-6, atol=1e-4)


# ---------------------------------------------------------------- spark


def _union_find_components(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # cluster id = min node id in component, only for nodes with edges
    touched = sorted({x for e in edges for x in e})
    return {x: min(y for y in touched if find(y) == find(x)) for x in touched}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    n=st.integers(2, 24),
    edge_draws=st.lists(st.tuples(st.integers(0, 23), st.integers(0, 23)),
                        min_size=1, max_size=40),
)
def test_connected_components_matches_union_find(spark, n, edge_draws):
    from pytod_spark.operators.cache import release_all
    from pytod_spark.operators.dedup import connected_components

    edges = [(a % n, b % n) for a, b in edge_draws if a % n != b % n]
    if not edges:
        return
    df = spark.createDataFrame(edges, "doc_a bigint, doc_b bigint")
    got = {
        r["node"]: r["cluster_id"]
        for r in connected_components(df).collect()
    }
    release_all()
    assert got == _union_find_components(n, edges)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    # bucket sizes 1..9 across up to 4 buckets; cap forces the star
    # branch on some buckets and the exact branch on others
    sizes=st.lists(st.integers(1, 9), min_size=1, max_size=4),
    cap=st.integers(2, 5),
)
def test_capped_self_join_preserves_bucket_connectivity(spark, sizes, cap):
    from pytod_spark.operators.cache import release_all
    from pytod_spark.operators.skew import capped_self_join_pairs

    rows, nid = [], 0
    members = {}
    for b, sz in enumerate(sizes):
        members[b] = list(range(nid, nid + sz))
        rows += [(b, i) for i in members[b]]
        nid += sz
    banded = spark.createDataFrame(rows, "bucket int, doc_id bigint")

    capped = {
        (r["doc_a"], r["doc_b"])
        for r in capped_self_join_pairs(
            banded, ["bucket"], "doc_id", cap=cap
        ).distinct().collect()
    }
    release_all()

    exact = {
        (a, b)
        for mem in members.values()
        for i, a in enumerate(mem)
        for b in mem[i + 1 :]
    }
    # oriented, within-bucket, subset of the exact join
    assert all(a < b for a, b in capped)
    assert capped <= exact
    # cold buckets (size <= cap) emit their exact pair set
    for b, mem in members.items():
        if len(mem) <= cap:
            want = {(a, c) for i, a in enumerate(mem) for c in mem[i + 1 :]}
            assert want <= capped
    # hot buckets stay CONNECTED through the emitted pairs
    comp = _union_find_components(nid, list(capped)) if capped else {}
    for mem in members.values():
        if len(mem) >= 2:
            assert len({comp[x] for x in mem}) == 1


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(sizes=st.lists(st.integers(1, 7), min_size=1, max_size=3))
def test_capped_self_join_cap_zero_is_exact(spark, sizes):
    from pytod_spark.operators.skew import capped_self_join_pairs

    rows, nid, members = [], 0, {}
    for b, sz in enumerate(sizes):
        members[b] = list(range(nid, nid + sz))
        rows += [(b, i) for i in members[b]]
        nid += sz
    banded = spark.createDataFrame(rows, "bucket int, doc_id bigint")
    got = {
        (r["doc_a"], r["doc_b"])
        for r in capped_self_join_pairs(
            banded, ["bucket"], "doc_id", cap=0
        ).collect()
    }
    exact = {
        (a, b)
        for mem in members.values()
        for i, a in enumerate(mem)
        for b in mem[i + 1 :]
    }
    assert got == exact


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(-100, 100),
            st.one_of(st.none(), st.text("abc", max_size=3)),
        ),
        min_size=1,
        max_size=30,
    ),
    cuts=st.lists(st.integers(-100, 100), min_size=1, max_size=3, unique=True),
)
def test_constraint_violations_agree_with_summary(spark, rows, cuts):
    """The map-only violations pass and the partial-agg summary are
    two different plans over the same NULL-hostile predicates — for
    random frames and random threshold rules, per-rule violation
    counts must agree, and every failed_constraints list must be a
    sorted subset of the rule names."""
    from pytod_spark.validation.constraints import (
        RowConstraint,
        row_constraint_summary,
        row_constraint_violations,
    )

    df = spark.createDataFrame(rows, "n int, s string")
    cs = [RowConstraint(f"cut_{i}", f"n < {c}") for i, c in enumerate(cuts)]
    cs.append(RowConstraint("s_ok", "length(s) < 2"))  # NULL s -> violation
    names = sorted(c.name for c in cs)

    viol = row_constraint_violations(df, cs, keep_cols=[]).collect()
    for r in viol:
        failed = list(r["failed_constraints"])
        assert failed == sorted(failed) and failed
        assert set(failed) <= set(names)

    summ = {r["constraint"]: r for r in row_constraint_summary(df, cs).collect()}
    assert set(summ) == set(names)
    for c in cs:
        got = summ[c.name]["n_violations"]
        exp = sum(1 for r in viol if c.name in r["failed_constraints"])
        assert got == exp, c.name
        assert summ[c.name]["n_rows"] == len(rows)
    # python-side ground truth for the threshold rules
    for i, cut in enumerate(cuts):
        exp_py = sum(1 for n, _ in rows if not (n < cut))
        assert summ[f"cut_{i}"]["n_violations"] == exp_py
    exp_s = sum(1 for _, s in rows if s is None or not len(s) < 2)
    assert summ["s_ok"]["n_violations"] == exp_s


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    cut=st.integers(-10, 700),
    frac=st.floats(0.0, 1.0),
    null_marker=st.sampled_from(["src0", "src1", "src7", "none"]),
)
def test_constraint_semantics_agree_with_duckdb(spark, cut, frac, null_marker):
    """Cross-engine property: for random thresholds (and randomly
    NULLed-out columns), the Spark NULL-hostile constraint summary
    equals a DuckDB mirror computed as NOT coalesce(pred, false) —
    the exact contract the catalogue oracle relies on."""
    import duckdb

    from pytod_spark.validation.constraints import (
        RowConstraint,
        row_constraint_summary,
    )

    path = "/root/testdata/sf0.001/documents.parquet"
    d = spark.read.parquet(path)
    # plant NULLs in `source` for one marker value so NULL-hostility
    # is actually exercised, not just the happy path
    import pyspark.sql.functions as F

    d = d.withColumn(
        "source",
        F.when(F.col("source") == null_marker, F.lit(None)).otherwise(
            F.col("source")
        ),
    )
    preds = [
        ("len", f"n_chars <= {cut}"),
        ("src", "source LIKE 'src%'"),
    ]
    cs = [
        # clamp AFTER rounding: a drawn frac of 0.999…9 < 1 still
        # rounds to 1.0, which is outside the rate's [0, 1) domain
        RowConstraint(n, p, max_violation_rate=min(float(round(frac, 3)), 0.999))
        for n, p in preds
    ]
    got = {
        (r["lang"], r["constraint"]): (r["n_rows"], r["n_violations"])
        for r in row_constraint_summary(d, cs, ["lang"]).collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT doc_id, text, "
        f"CASE WHEN source = '{null_marker}' THEN NULL ELSE source END AS source, "
        f"lang, n_chars FROM '{path}'"
    )
    rows = con.execute(
        "SELECT lang, count(*), "
        f"CAST(sum(CASE WHEN NOT coalesce(n_chars <= {cut}, false) THEN 1 ELSE 0 END) AS BIGINT), "
        "CAST(sum(CASE WHEN NOT coalesce(source LIKE 'src%', false) THEN 1 ELSE 0 END) AS BIGINT) "
        "FROM documents GROUP BY lang"
    ).fetchall()
    want = {}
    for lang, n, v_len, v_src in rows:
        want[(lang, "len")] = (n, v_len)
        want[(lang, "src")] = (n, v_src)
    assert got == want
