"""Tests for training-pipeline operators: dedup, similarity, text
features, multimodal plumbing — property/injection tests that the
DuckDB oracle gate can't express (planted duplicates, LSH recall,
stubbed decode)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pytod_spark.operators import dedup as D
from pytod_spark.operators import similarity as S
from pytod_spark.operators.multimodal import (
    attach_binary_payload,
    decode_image,
    extract_metadata,
    image_features,
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
        for copy in range(2):  # exact duplicate of every doc
            rows.append((i, txt, "en"))
            i += 1
    # near-duplicate: one word changed
    rows.append((i, base[0].replace("tonight", "today"), "en"))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_exact_duplicates(spark, docs):
    out = D.exact_duplicates(docs).collect()
    assert len(out) == 5  # 4 distinct + 1 near-dup
    assert sorted(r["n_copies"] for r in out) == [1, 2, 2, 2, 2]


def test_ngram_jaccard_finds_planted_neardup(spark, docs):
    pairs = D.ngram_jaccard_pairs(docs, threshold=0.5, group_cols=["lang"]).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (0, 1) in got  # exact copies -> jaccard 1.0
    assert (0, 8) in got or (1, 8) in got  # near-dup above 0.5
    j = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in pairs}
    assert j[(0, 1)] == 1.0


def test_minhash_lsh_recall_vs_exact(spark, docs):
    """LSH candidates must contain every true pair at this similarity
    level (16 perms, 4x4 bands — collision prob at j=1.0 is 1)."""
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in D.ngram_jaccard_pairs(docs, threshold=0.9).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in D.minhash_dedup_pairs(docs, threshold=0.9).collect()
    }
    assert exact, "fixture must contain exact dups"
    assert exact <= lsh | exact  # sanity
    assert exact == lsh  # at j>=0.9 recall must be total


def test_simhash_identical_docs_zero_hamming(spark, docs):
    sh = {r["doc_id"]: r["simhash"] for r in D.simhash16(docs).collect()}
    assert sh[0] == sh[1]  # identical text -> identical simhash
    pairs = D.simhash_pairs(docs, max_hamming=0, group_cols=["lang"]).collect()
    assert any(r["doc_a"] == 0 and r["doc_b"] == 1 for r in pairs)


def test_cosine_topk_matches_numpy(spark):
    rng = np.random.default_rng(7)
    X = rng.normal(size=(60, 8))
    df = spark.createDataFrame(
        [(int(i), [float(v) for v in X[i]]) for i in range(60)],
        "row_id long, features array<double>",
    )
    out = S.cosine_topk_join(df, k=3, block_size=25).collect()
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    C = Xn @ Xn.T
    np.fill_diagonal(C, -np.inf)
    for r in out:
        expected_nbrs = np.argsort(-C[r["row_id"]], kind="stable")[:3]
        if r["rn"] == 1:
            assert r["nbr_id"] == expected_nbrs[0]
        np.testing.assert_allclose(r["cos"], C[r["row_id"], r["nbr_id"]], rtol=1e-9)


def test_rp_lsh_buckets_group_identical_vectors(spark):
    rng = np.random.default_rng(3)
    X = rng.normal(size=(20, 16))
    X[10] = X[0]  # identical vector must share the bucket
    df = spark.createDataFrame(
        [(int(i), [float(v) for v in X[i]]) for i in range(20)],
        "row_id long, features array<double>",
    )
    b = {r["row_id"]: r["bucket"] for r in S.rp_lsh_buckets(df, dim=16).collect()}
    assert b[0] == b[10]
    cands = {
        (r["doc_a"], r["doc_b"])
        for r in S.rp_lsh_candidate_pairs(df, dim=16).collect()
    }
    assert (0, 10) in cands


def test_multimodal_metadata_and_stub(spark, docs):
    payload = attach_binary_payload(docs)
    meta = extract_metadata(payload).collect()
    assert len(meta) == 9
    by_id = {r["doc_id"]: r for r in meta}
    assert by_id[0]["payload_sha"] == by_id[1]["payload_sha"]  # same bytes
    assert all(16 <= r["width"] < 80 and 1 <= r["channels"] <= 3 for r in meta)
    # real decode is stubbed; fake decode is deterministic
    with pytest.raises(NotImplementedError):
        decode_image(b"xx")
    img1 = decode_image(b"payload", fake=True)
    img2 = decode_image(b"payload", fake=True)
    np.testing.assert_array_equal(img1, img2)
    feats = image_features(payload).collect()
    assert len(feats) == 9 and all(0 <= r["pix_mean"] <= 255 for r in feats)


def test_quality_and_entropy_bounds(spark, docs):
    from pytod_spark.functions import text as T

    out = docs.select(
        T.quality_score(F.col("text")).alias("q"),
        T.token_count(F.col("text")).alias("n"),
    ).collect()
    assert all(0.0 <= r["q"] <= 1.0 for r in out)
    assert all(r["n"] > 0 for r in out)


def test_bucketed_cumsum_matches_numpy(spark):
    """The bucketed two-pass cumulative sum (the machinery under
    token shards and shuffle_order) must equal a plain numpy cumsum
    over random weights, across several seeds and skewed key
    distributions."""
    import numpy as np

    from pytod_spark.operators.packing import bucketed_cumsum

    for seed in (0, 7, 99):
        rng = np.random.default_rng(seed)
        n = 3000
        # skewed, duplicate-free order keys; integer weights incl. 0
        keys = rng.permutation(np.arange(n)) ** 2
        w = rng.integers(0, 50, size=n)
        import pandas as pd

        pdf = pd.DataFrame({"k": keys, "w": w})
        df = spark.createDataFrame(pdf).repartition(8)
        got = {
            r["k"]: r["cum"]
            for r in bucketed_cumsum(df, "k", "w", out="cum").collect()
        }
        order = np.argsort(keys)
        expect = dict(zip(keys[order].tolist(), np.cumsum(w[order]).tolist()))
        assert got == expect, f"seed {seed}"


def test_unigram_logprob_oov_floor(spark):
    """With k=1 only the single most frequent token is in-dictionary;
    every other token must score exactly the OOV floor."""
    import math

    from pytod_spark.operators.vocab import unigram_logprob

    rows = [
        (0, "aa aa aa bb", "en"),   # aa tf=3 -> dictionary; bb OOV
        (1, "bb cc", "en"),         # fully OOV
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["doc_id"]: r for r in unigram_logprob(df, k=1, oov_logp=-12.0).collect()}
    # corpus tf: aa=3, bb=2, cc=1, total=6; dictionary = {aa: ln(3/6)}
    lp_aa = math.log(3 / 6)
    assert out[1]["mean_logprob"] == -12.0  # pure OOV doc
    assert abs(out[0]["mean_logprob"] - round((3 * lp_aa - 12.0) / 4, 6)) < 1e-9
    assert out[0]["n_tokens"] == 4 and out[1]["n_tokens"] == 2


def test_contamination_shingleless_doc_survives(spark):
    """A training doc with < n tokens has no shingles: explode_outer
    must keep it alive with n_shingles=0, overlap 0, not contaminated."""
    from pytod_spark.operators.decontaminate import contamination_report

    train = spark.createDataFrame(
        [(0, "one two"), (1, "alpha beta gamma delta")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(9, "alpha beta gamma epsilon")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in contamination_report(
        train, bench, threshold=0.4).collect()}
    assert out[0]["n_shingles"] == 0 and out[0]["overlap"] == 0.0
    assert out[0]["contaminated"] == 0
    assert out[1]["n_shingles"] == 2 and out[1]["n_shared"] == 1
    assert out[1]["contaminated"] == 1  # 0.5 >= 0.4


def test_chunker_short_doc_yields_one_chunk(spark):
    """Docs shorter than the overlap still yield exactly one chunk
    covering the whole text."""
    from pytod_spark.operators.packing import chunk_documents

    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    rows = chunk_documents(df, chunk_tokens=64, overlap=16).collect()
    assert len(rows) == 1
    assert rows[0]["chunk_id"] == 0
    assert rows[0]["n_chunk_tokens"] == 3
    assert rows[0]["chunk_text"] == "a b c"


def test_prepare_corpus_end_to_end(spark):
    """The full composition (dedup -> decontaminate -> quality ->
    sample -> shuffle -> chunk -> shard) is deterministic, drops the
    contaminated docs, and packs shards to within one chunk of the
    budget."""
    import collections

    from pytod_spark.pipeline import PrepareConfig, prepare_corpus

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.where(F.col("doc_id") % 7 == 0).select("doc_id", "text")
    train = docs.where(F.col("doc_id") % 7 != 0)
    cfg = PrepareConfig(chunk_tokens=32, chunk_overlap=8,
                        shard_budget_tokens=500, min_quality=0.0,
                        contamination_threshold=0.5)
    rows = prepare_corpus(train, bench, cfg).collect()
    assert rows, "pipeline produced no chunks"
    rows2 = prepare_corpus(train, bench, cfg).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))
    per = collections.Counter()
    for r in rows:
        per[r["shard_id"]] += r["n_chunk_tokens"]
    assert max(per.values()) <= 500 + 32  # budget + one chunk overshoot
    # shard ids are contiguous from 0
    assert sorted(per) == list(range(len(per)))


def test_prepare_corpus_redact_scrubs_pii(spark):
    """With redact=True no raw PII survives into chunk_text, and the
    rest of the pipeline (chunk counts per doc) is unchanged because
    the quality gate still judges the original text."""
    from pytod_spark.pipeline import PrepareConfig, prepare_corpus

    rows = [
        (0, "contact me at alice@example.com for the dataset " + "w " * 40),
        (1, "server lives on 10.0.3.7 behind the proxy " + "x " * 40),
        (2, "api key deadbeefdeadbeefdeadbeefdeadbeef here " + "y " * 40),
        (3, "perfectly clean document with no secrets " + "z " * 40),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cfg = PrepareConfig(chunk_tokens=16, chunk_overlap=4,
                        shard_budget_tokens=200, min_quality=0.0,
                        redact=True)
    out = prepare_corpus(docs, None, cfg).collect()
    assert out
    joined = " ".join(r["chunk_text"] for r in out)
    assert "alice@example.com" not in joined
    assert "10.0.3.7" not in joined
    assert "deadbeef" not in joined
    # chunk_text is tokenizer-normalised (lowercased), so the
    # placeholders show up lowercase
    assert "<email>" in joined and "<ip>" in joined and "<hex>" in joined
    # same chunk structure as the unredacted run (placeholders are one
    # token, same as the original email/ip/hex tokens they replace)
    plain = prepare_corpus(docs, None, PrepareConfig(
        chunk_tokens=16, chunk_overlap=4, shard_budget_tokens=200,
        min_quality=0.0)).collect()
    key = lambda rs: sorted((r["doc_id"], r["chunk_id"]) for r in rs)
    assert key(out) == key(plain)


def test_winnow_finds_duplicates_not_distinct_docs(spark):
    """The MOSS guarantee, lower-bounded: documents sharing a long
    run (here: exact copies and a copy with a changed tail) must pair;
    documents with no 36-char common substring must not."""
    from pytod_spark.operators.winnow import winnow_pairs

    base = ("the quick brown fox jumps over the lazy dog while the "
            "cat watches from the warm windowsill every single morning")
    other = ("completely different content here about spark shuffles "
             "partitions exchanges codegen and arrow batch kernels")
    rows = [
        (0, base), (1, base),                      # exact copy
        (2, base[:80] + " with a brand new suffix appended here"),
        (3, other),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"])
        for r in winnow_pairs(d, k=25, w=12, min_shared=3).collect()
    }
    assert (0, 1) in got          # exact duplicate
    assert (0, 2) in got and (1, 2) in got  # shared 80-char prefix
    assert not any(3 in p for p in got)     # unrelated doc stays out


def test_redact_pii(spark):
    """Each PII pattern redacts, order prevents digit re-matching, and
    the scrub is idempotent (placeholders match no pattern)."""
    from pytod_spark.functions.text import pii_count, redact_pii

    rows = [
        (0, "mail a.b+c%d@sub.example.org end"),
        (1, "ips 10.0.3.7 and 192.168.255.1 ok"),
        (2, "key deadbeefdeadbeefdeadbeefdeadbeef done"),
        (3, "all u7@ex.co 1.2.3.4 " + "a1" * 16),
        (4, "clean text with no pii at all"),
    ]
    df = spark.createDataFrame(rows, "i int, t string")
    out = {
        r["i"]: r
        for r in df.select(
            "i",
            redact_pii(F.col("t")).alias("red"),
            pii_count(F.col("t"), r"\b(?:\d{1,3}\.){3}\d{1,3}\b").alias("n_ip"),
        ).collect()
    }
    assert out[0]["red"] == "mail <EMAIL> end"
    assert out[1]["red"] == "ips <IP> and <IP> ok"
    assert out[1]["n_ip"] == 2
    assert out[2]["red"] == "key <HEX> done"
    assert out[3]["red"] == "all <EMAIL> <IP> <HEX>"
    assert out[4]["red"] == rows[4][1]
    # idempotent: redacting the redacted text is a no-op
    twice = df.select(redact_pii(redact_pii(F.col("t"))).alias("red")).collect()
    assert [r["red"] for r in twice] == [out[i]["red"] for i in range(5)]


def test_multimodal_null_payload_treated_as_empty(spark):
    """NULL payloads (encoding NULL text yields NULL binary) flow
    through the Arrow kernels as empty blobs, not bytes(None)."""
    import hashlib

    df = spark.createDataFrame(
        [(0, "hello"), (1, None)], "doc_id long, text string"
    )
    md = {r["doc_id"]: r for r in
          extract_metadata(attach_binary_payload(df)).collect()}
    assert md[1]["n_bytes"] == 0
    assert md[1]["payload_sha"] == hashlib.sha256(b"").hexdigest()
    feats = image_features(attach_binary_payload(df)).collect()
    assert {r["doc_id"] for r in feats} == {0, 1}


def test_datagen_small_strides_and_wide_seeds(spark):
    """anomaly_every=5 / orphan_every=5 / dup_every=2 must actually
    inject (residues reduce mod the stride), and seeds >= 2**29 must
    not overflow the uint64 mix."""
    from pytod_spark.datagen import generate_repo_table

    df = generate_repo_table(
        spark, 2000, seed=2**31 + 7, anomaly_every=5, orphan_every=5,
        dup_every=2, with_labels=True,
    ).persist()
    assert df.where(F.col("is_anomaly") == 1).count() > 0
    assert df.where(F.col("is_orphan") == 1).count() > 0
    dups = (df.groupBy("repo", "path", "commit").count()
            .where(F.col("count") > 1).count())
    assert dups > 0
    df.unpersist()


def test_repo_commits_dim_matches_fact_commits(spark):
    """The distributed dimension must cover every non-orphan fact
    commit (same formula, same lowercase hex format)."""
    from pytod_spark.datagen import generate_repo_table, repo_commits_dim

    fact = generate_repo_table(spark, 3000, seed=9, with_labels=True)
    dim = repo_commits_dim(spark, 3000, seed=9)
    legit = fact.where(F.col("is_orphan") == 0).select("repo", "commit").distinct()
    missing = legit.join(dim, ["repo", "commit"], "left_anti").count()
    assert missing == 0
