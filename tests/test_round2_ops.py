"""Round-2 additions: bucketed ranking primitives, low-precision
operator family, banded SimHash/RP-LSH candidate generation, ANN
near-dup recall, distributed predict counts."""

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pytod_spark.operators.ranking import (
    bucketed_cumsums,
    bucketed_ranks,
    with_group_size,
)
from pytod_spark.operators.range_join import (
    neighbor_within_range,
    neighbor_within_range_low_prec,
    neighbor_within_range_low_prec_float,
)
from pytod_spark.operators import similarity as S
from pytod_spark.oracle.operators import (
    bottomk,
    bottomk_low_prec,
    get_bounded_error,
    topk,
    topk_low_prec,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = [
        "the quick brown fox jumps over the lazy dog tonight",
        "a completely different document about spark query engines",
        "rows columns shuffles joins aggregations windows and sorts",
        "pandas arrow batches flow through vectorized kernels fast",
    ]
    rows = []
    i = 0
    for txt in base:
        for _ in range(2):
            rows.append((i, txt, "en"))
            i += 1
    rows.append((i, base[0].replace("tonight", "today"), "en"))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


# ------------------------------------------------------ ranking primitives


def test_bucketed_ranks_match_argsort(spark):
    rng = np.random.default_rng(7)
    vals = rng.normal(size=500)
    vals[::7] = vals[0]  # inject ties
    df = spark.createDataFrame(
        [(int(i), float(v)) for i, v in enumerate(vals)], "pos long, v double"
    )
    out = bucketed_ranks(
        df, key="v", tie="pos", part_cols=[], out_asc="ra", out_desc="rd",
        n_buckets=8,
    ).toPandas().sort_values("pos")
    order_a = np.lexsort((np.arange(len(vals)), vals))
    exp_a = np.empty(len(vals), dtype=int)
    exp_a[order_a] = np.arange(len(vals))
    order_d = np.lexsort((np.arange(len(vals)), -vals))
    exp_d = np.empty(len(vals), dtype=int)
    exp_d[order_d] = np.arange(len(vals))
    assert list(out["ra"]) == list(exp_a)
    assert list(out["rd"]) == list(exp_d)


def test_bucketed_ranks_grouped(spark):
    rows = [(g, int(i), float((i * 37) % 11)) for g in ("a", "b") for i in range(40)]
    df = spark.createDataFrame(rows, "g string, pos long, v double")
    out = bucketed_ranks(
        df, key="v", tie="pos", part_cols=["g"], out_asc="ra", n_buckets=4
    ).toPandas()
    for g, sub in out.groupby("g"):
        sub = sub.sort_values("pos")
        order = np.lexsort((sub["pos"].to_numpy(), sub["v"].to_numpy()))
        exp = np.empty(len(sub), dtype=int)
        exp[order] = np.arange(len(sub))
        assert list(sub["ra"]) == list(exp)


def test_grouped_ranks_dispatch_paths_agree(spark):
    """grouped_ranks must return identical ranks from both physical
    plans: the small-input window fast path (default here: 80 rows)
    and the bucketed two-pass core (forced via n_rows above the
    budget). Ties included."""
    from pytod_spark.operators.ranking import SMALL_RANK_ROWS, grouped_ranks

    rows = [(g, int(i), float((i * 37) % 7)) for g in ("a", "b") for i in range(40)]
    df = spark.createDataFrame(rows, "g string, pos long, v double")
    small = grouped_ranks(df, key="v", tie="pos", part_cols=["g"], out_asc="r")
    large = grouped_ranks(
        df, key="v", tie="pos", part_cols=["g"], out_asc="r",
        n_rows=SMALL_RANK_ROWS + 1, n_buckets=4,
    )
    a = sorted(map(tuple, small.collect()))
    b = sorted(map(tuple, large.collect()))
    assert a == b


def test_bucketed_cumsums_strict(spark):
    rng = np.random.default_rng(3)
    keys = rng.permutation(300).astype(float)
    df = spark.createDataFrame(
        [(float(k), int(k) % 5) for k in keys], "s double, v long"
    )
    per = df.groupBy("s").agg(F.sum("v").alias("v"))
    out = bucketed_cumsums(per, "s", {"v": "below"}, n_buckets=8).toPandas()
    out = out.sort_values("s").reset_index(drop=True)
    exp = np.concatenate([[0], np.cumsum(out["v"].to_numpy())[:-1]])
    assert list(out["below"]) == list(exp)
    out2 = bucketed_cumsums(
        per, "s", {"v": "above"}, descending=True, n_buckets=8
    ).toPandas().sort_values("s", ascending=False).reset_index(drop=True)
    exp2 = np.concatenate([[0], np.cumsum(out2["v"].to_numpy())[:-1]])
    assert list(out2["above"]) == list(exp2)


def test_with_group_size(spark):
    df = spark.createDataFrame([("a", 1), ("a", 2), ("b", 3)], "g string, x int")
    out = with_group_size(df, ["g"]).toPandas()
    assert dict(zip(out["g"], out["__n"]))["a"] == 2
    out2 = with_group_size(df, []).toPandas()
    assert set(out2["__n"]) == {3}


# ------------------------------------------------- low-precision operators


def test_low_prec_topk_bottomk_match_exact():
    rng = np.random.default_rng(11)
    A = rng.normal(size=(60, 40)) * 5
    for k in (3, 5):
        for mode in ("half", "float"):
            v, i = topk_low_prec(A, k, mode=mode, sort_value=True)
            ve, ie = topk(A, k)
            np.testing.assert_allclose(v, ve)
            v, i = bottomk_low_prec(A, k, mode=mode, sort_value=True)
            ve, ie = bottomk(A, k)
            np.testing.assert_allclose(v, ve)


def test_get_bounded_error_reference_formula():
    # intermediate_layers.py:16-22 with fp64 eps
    e = get_bounded_error(3.0, 64)
    eps = np.finfo(np.float64).eps
    factor = (1 + eps) ** (np.log(64) + 2) - 1
    assert e == pytest.approx(2 * 4 * 64 * 9 * factor)
    assert get_bounded_error(3.0, 64, two_sided=False) == pytest.approx(e / 2)


def test_low_prec_range_join_matches_exact(spark):
    rng = np.random.default_rng(5)
    X = rng.normal(size=(120, 8))
    df = spark.createDataFrame(
        [(int(i), [float(v) for v in X[i]]) for i in range(len(X))],
        "row_id long, features array<double>",
    )
    theta = 1.8
    exact = (
        neighbor_within_range(df, theta, block_size=48)
        .select("row_id", "nbr_id")
        .toPandas()
    )
    for fn in (neighbor_within_range_low_prec, neighbor_within_range_low_prec_float):
        lp = fn(df, theta, block_size=48).select("row_id", "nbr_id").toPandas()
        a = set(map(tuple, exact.to_numpy()))
        b = set(map(tuple, lp.to_numpy()))
        assert a == b, f"{fn.__name__}: {len(a ^ b)} differing pairs"


# ------------------------------------------------------- candidate banding


def test_simhash_banded_equals_allpairs(spark, docs):
    from pytod_spark.operators.dedup import simhash_bits, simhash_pairs

    out = simhash_pairs(docs, max_hamming=2).toPandas()
    # brute-force reference on the collected signatures (same width)
    sh = simhash_bits(docs).toPandas()
    sigs = dict(zip(sh["doc_id"], sh["simhash"]))
    ids = sorted(sigs)
    exp = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if bin(sigs[a] ^ sigs[b]).count("1") <= 2
    }
    got = set(zip(out["doc_a"], out["doc_b"]))
    assert got == exp


def test_ann_neardup_recall_vs_brute(spark):
    rng = np.random.default_rng(9)
    base = rng.normal(size=(80, 16))
    # plant near-duplicates
    dup = base[:20] + rng.normal(scale=0.01, size=(20, 16))
    X = np.vstack([base, dup])
    df = spark.createDataFrame(
        [(int(i), [float(v) for v in X[i]]) for i in range(len(X))],
        "row_id long, features array<double>",
    )
    brute = S.cosine_pairs(df, threshold=0.95, block_size=64).toPandas()
    ann = S.ann_neardup_pairs(
        df, threshold=0.95, dim=16, n_planes=12, n_bands=3
    ).toPandas()
    bset = set(zip(brute["doc_a"], brute["doc_b"]))
    aset = set(zip(ann["doc_a"], ann["doc_b"]))
    assert aset <= bset  # refine guarantees no false positives
    recall = len(aset & bset) / max(1, len(bset))
    # banded sign-LSH at 0.95 cosine: 3 bands of 4 bits, per-band hit
    # prob (1 - acos(.95)/pi)^4 ~ 0.72 -> recall ~ 0.98
    assert recall >= 0.8, f"recall {recall:.2f}"


def test_rp_lsh_banded_candidates_superset_of_single(spark):
    rng = np.random.default_rng(4)
    X = rng.normal(size=(60, 8))
    df = spark.createDataFrame(
        [(int(i), [float(v) for v in X[i]]) for i in range(len(X))],
        "row_id long, features array<double>",
    )
    single = S.rp_lsh_candidate_pairs(df, dim=8, n_planes=12, n_bands=1).toPandas()
    banded = S.rp_lsh_candidate_pairs(df, dim=8, n_planes=12, n_bands=3).toPandas()
    sset = set(zip(single["doc_a"], single["doc_b"]))
    bset = set(zip(banded["doc_a"], banded["doc_b"]))
    assert sset <= bset


# ----------------------------------------------------- distributed predict


def test_distributed_train_counts_match_searchsorted(spark):
    rng = np.random.default_rng(2)
    train = rng.normal(size=400)
    train[::5] = train[1]  # ties
    test = np.concatenate([train[::3], rng.normal(size=50)])
    tr = spark.createDataFrame([(float(v),) for v in train], "score double")
    te = spark.createDataFrame([(float(v),) for v in test], "score double")
    from pytod_spark.detectors.predict import _with_train_counts

    sorted_train = np.sort(train)
    for side in ("left", "right"):
        out = _with_train_counts(te, tr, "score", "cnt", side=side).toPandas()
        got = dict(zip(out["score"], out["cnt"]))
        for v in test:
            assert got[v] == np.searchsorted(sorted_train, v, side=side), (side, v)


def test_stats_profile_sketch_close_to_exact(spark):
    """Since round 5 the row carries the bounded-error verdicts
    in-plan (sketch vs exact twin in one wide aggregate, DuckDB-oracle
    checkable): every verdict must be 1 and the exact metrics must
    match the exact profile row."""
    from pytod_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    ex = QUERIES["stats_profile"](spark, sf).toPandas().set_index("col_name")
    sk = QUERIES["stats_profile_sketch"](spark, sf).toPandas().set_index("col_name")
    for c in ex.index:
        assert sk.loc[c, "distinct_ok"] == 1
        assert sk.loc[c, "p50_ok"] == 1
        for m in ("min_v", "max_v", "mean_v", "std_v", "n_null"):
            assert sk.loc[c, m] == pytest.approx(ex.loc[c, m])


def test_binom_cdf_vec_matches_summation():
    from pytod_spark.oracle.detectors import _binom_cdf, binom_cdf_vec

    rng = np.random.default_rng(1)
    for n in (5, 50, 500):
        for kfrac in (0.0, 0.1, 0.5, 0.9, 1.0):
            k = int(n * kfrac)
            ps = np.clip(rng.uniform(0, 1, 20), 1e-9, 1 - 1e-9)
            v = binom_cdf_vec(k, n, ps)
            e = np.array([_binom_cdf(k, n, p) for p in ps])
            np.testing.assert_allclose(v, e, atol=1e-10)


def test_sources_resolution(spark, tmp_path):
    from pytod_spark.sources import load_table, write_table

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    p = str(tmp_path / "t.parquet")
    write_table(df, p)
    assert load_table(spark, p).count() == 2
    df.createOrReplaceTempView("src_view")
    assert load_table(spark, "table:src_view").count() == 2
    assert load_table(spark, "src_view").count() == 2


def test_sources_relative_dir_not_identifier(spark, tmp_path, monkeypatch):
    # a bare relative dir whose name is not a valid SQL identifier
    # (hyphen) must resolve as parquet, not die in the table parser
    from pytod_spark.sources import load_table, write_table

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    write_table(df, str(tmp_path / "corpus-v2"))
    monkeypatch.chdir(tmp_path)
    assert load_table(spark, "corpus-v2").count() == 2


def test_pyfiles_zip_cached_per_process_and_rebuilt():
    # default-target zips reuse ONE per-process temp path (no leak per
    # call) and the archive is rebuilt — importable package layout
    import zipfile

    from pytod_spark.deploy import build_pyfiles_zip

    a = build_pyfiles_zip()
    b = build_pyfiles_zip()
    assert a == b and os.path.exists(a)
    names = zipfile.ZipFile(a).namelist()
    assert "pytod_spark/__init__.py" in names
    assert any(n.startswith("pytod_spark/operators/") for n in names)


def test_multimodal_resize_and_frames(spark, docs):
    from pytod_spark.operators.multimodal import (
        attach_binary_payload,
        resize_images,
        sample_frames,
    )

    payload = attach_binary_payload(docs)
    rs = resize_images(payload, out_w=8, out_h=6).toPandas()
    assert set(rs["width"]) == {8} and set(rs["height"]) == {6}
    assert len(rs) == payload.count()
    for _, row in rs.iterrows():
        assert len(row["pixels"]) == 8 * 6 * row["channels"]
    fr = sample_frames(payload, n_frames=3).toPandas()
    assert (fr.groupby("doc_id").size() <= 3).all()
    assert fr["n_bytes"].between(1, 256).all()
    # determinism: same payload -> same frame hashes
    fr2 = sample_frames(payload, n_frames=3).toPandas()
    assert fr.sort_values(["doc_id", "frame_idx"]).reset_index(drop=True).equals(
        fr2.sort_values(["doc_id", "frame_idx"]).reset_index(drop=True)
    )


def test_connected_components_chain_clique_pair(spark):
    """Hash-to-min CC: a 4-chain (worst diameter), a triangle, an
    isolated pair — every node labeled with its component's min id."""
    from pytod_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),        # chain 1-2-3-4
         (10, 11), (11, 12), (10, 12),  # triangle
         (20, 21)],                     # pair
        "doc_a long, doc_b long",
    )
    got = {r["node"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_sources_table_wins_over_same_named_cwd_dir(spark, tmp_path, monkeypatch):
    # a registered view/table must shadow a same-named directory in the
    # driver's cwd (e.g. an earlier run's output), not the reverse —
    # silently reading stale local parquet over the catalog is wrong
    from pytod_spark.sources import load_table, write_table

    view_df = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    stale = spark.createDataFrame([(99,)], "id long")
    write_table(stale, str(tmp_path / "shadowed_tbl"))
    monkeypatch.chdir(tmp_path)
    view_df.createOrReplaceTempView("shadowed_tbl")
    try:
        assert load_table(spark, "shadowed_tbl").count() == 3
    finally:
        spark.catalog.dropTempView("shadowed_tbl")
    # with the view gone, the same bare name falls back to the cwd dir
    assert load_table(spark, "shadowed_tbl").count() == 1


def test_get_spark_gateway_path_respects_submitted_conf(spark, monkeypatch):
    """On the spark-submit (gateway) path, our shuffle-partition
    default must not override a --conf the operator submitted; an
    explicit argument still wins over everything."""
    from pytod_spark.session import get_spark

    # the test session's builder-set value lives in the SparkContext
    # conf, which is exactly how a spark-submit --conf appears
    assert spark.sparkContext.getConf().contains("spark.sql.shuffle.partitions")
    monkeypatch.setenv("PYSPARK_GATEWAY_PORT", "12345")
    monkeypatch.delenv("SPARK_GRAFT_CPUS", raising=False)
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        s2 = get_spark(app_name="pytod_spark-tests")
        assert s2 is spark
        # submitted (sc-conf-visible) key: default does NOT stomp it
        assert spark.conf.get("spark.sql.shuffle.partitions") == "17"
        # explicit argument: wins over the submitted conf
        get_spark(app_name="pytod_spark-tests", shuffle_partitions=24)
        assert spark.conf.get("spark.sql.shuffle.partitions") == "24"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)


def test_get_spark_existing_session_runtime_confs_preserved(spark, monkeypatch):
    """Runtime tuning applied with spark.conf.set never appears in the
    submit-time SparkConf — get_spark on an EXISTING session must not
    reset it to our defaults (it only seeds defaults on sessions it
    creates)."""
    from pytod_spark.session import DEFAULT_CONFS, get_spark

    # inject a default for a key the fixture's builder did NOT submit,
    # so the only thing standing between it and the user's runtime
    # value is the existing-session guard
    key = "spark.sql.cbo.enabled"
    assert not spark.sparkContext.getConf().contains(key)
    monkeypatch.setitem(DEFAULT_CONFS, key, "false")
    monkeypatch.setenv("PYSPARK_GATEWAY_PORT", "12345")
    before = spark.conf.get(key)
    try:
        spark.conf.set(key, "true")  # user runtime tuning
        s2 = get_spark(app_name="pytod_spark-tests")
        assert s2 is spark
        assert spark.conf.get(key) == "true"
    finally:
        spark.conf.set(key, before)


def test_get_spark_gateway_invalid_conf_value_surfaces(spark, monkeypatch):
    """A genuinely invalid conf value must raise, not be misdiagnosed
    as an unmodifiable static conf and warned away."""
    import pytest as _pytest

    from pytod_spark.session import get_spark

    monkeypatch.setenv("PYSPARK_GATEWAY_PORT", "12345")
    with _pytest.raises(Exception, match="(?i)partitions|invalid|number"):
        get_spark(
            app_name="pytod_spark-tests",
            extra_conf={"spark.sql.shuffle.partitions": "eight"},
        )


def test_sources_format_prefixes(spark, tmp_path):
    """jsonl:/json:/csv:/orc: refs load with and without an explicit
    schema; schema on a self-describing format raises."""
    import json as _json

    import pytest as _pytest

    from pytod_spark.sources import load_table

    rows = [{"doc_id": 1, "text": "hello world"}, {"doc_id": 2, "text": "x"}]
    jl = tmp_path / "docs.jsonl"
    jl.write_text("\n".join(_json.dumps(r) for r in rows))
    got = load_table(spark, f"jsonl:{jl}")
    assert got.count() == 2 and set(got.columns) == {"doc_id", "text"}
    # explicit schema: no inference pass, exact types
    got2 = load_table(spark, f"json:{jl}", schema="doc_id long, text string")
    assert dict(got2.dtypes) == {"doc_id": "bigint", "text": "string"}

    cv = tmp_path / "docs.csv"
    cv.write_text("doc_id,text\n1,hello\n2,bye\n")
    assert load_table(spark, f"csv:{cv}").count() == 2
    got3 = load_table(spark, f"csv:{cv}", schema="doc_id long, text string")
    assert dict(got3.dtypes)["doc_id"] == "bigint"

    oc = str(tmp_path / "docs.orc")
    spark.createDataFrame(rows).write.orc(oc)
    assert load_table(spark, f"orc:{oc}").count() == 2

    for bad in (f"orc:{oc}", str(tmp_path / "nope.parquet"), "table:src_view"):
        with _pytest.raises(ValueError, match="schema"):
            load_table(spark, bad, schema="doc_id long")


def test_sources_write_format_prefixes_round_trip(spark, tmp_path):
    from pytod_spark.sources import load_table, write_table

    # adversarial text: embedded newlines, quotes, and commas — the
    # content this engine actually carries (source code) — must
    # round-trip through every format byte-identically
    df = spark.createDataFrame(
        [(1, 'line1\nline2 "quoted", comma'), (2, "plain")],
        "doc_id long, text string",
    )
    want = {r["doc_id"]: r["text"] for r in df.collect()}
    jl = str(tmp_path / "out_jsonl")
    write_table(df, f"jsonl:{jl}")
    back = load_table(spark, f"jsonl:{jl}", schema="doc_id long, text string")
    assert {r["doc_id"]: r["text"] for r in back.collect()} == want
    cv = str(tmp_path / "out_csv")
    write_table(df, f"csv:{cv}")
    back2 = load_table(spark, f"csv:{cv}", schema="doc_id long, text string")
    assert {r["doc_id"]: r["text"] for r in back2.collect()} == want
    oc = str(tmp_path / "out_orc")
    write_table(df, f"orc:{oc}")
    assert {
        r["doc_id"]: r["text"]
        for r in load_table(spark, f"orc:{oc}").collect()
    } == want


def test_load_stream_prefixes_and_schema_gate(spark, tmp_path):
    """load_stream mirrors load_table for streaming reads; the
    mandatory-schema gate fires before any query starts."""
    import json as _json

    import pytest as _pytest

    from pytod_spark.sources import load_stream

    jl_dir = tmp_path / "stream_src"
    jl_dir.mkdir()
    (jl_dir / "part0.jsonl").write_text(
        "\n".join(_json.dumps({"doc_id": i, "text": f"t{i}"}) for i in range(4))
    )
    with _pytest.raises(ValueError, match="explicit schema"):
        load_stream(spark, f"jsonl:{jl_dir}")
    stream = load_stream(
        spark, f"jsonl:{jl_dir}", schema="doc_id long, text string"
    )
    assert stream.isStreaming
    out = str(tmp_path / "stream_out")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == 4


def test_load_stream_resolves_bare_catalog_identifier(spark, tmp_path):
    from pytod_spark.sources import load_stream

    spark.createDataFrame([(1, "a")], "id long, v string").write.mode(
        "overwrite"
    ).saveAsTable("stream_cat_tbl")
    try:
        st = load_stream(spark, "stream_cat_tbl")
        assert st.isStreaming
        import pytest as _pytest

        with _pytest.raises(ValueError, match="catalog table"):
            load_stream(spark, "stream_cat_tbl", schema="id long")
    finally:
        spark.sql("DROP TABLE IF EXISTS stream_cat_tbl")
