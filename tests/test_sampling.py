"""Deterministic hash sampling: rate accuracy, run-to-run stability,
salt independence, stratified rates."""

import pytest

from pytod_spark.operators.sampling import (
    _threshold_hex,
    hash_sample,
    stratified_sample,
)


def test_threshold_hex_rate_math():
    assert _threshold_hex(0.0) == "00000000"
    # fraction 1.0 keeps everything: "g" > any hex prefix
    assert _threshold_hex(1.0) == "g"
    assert "ffffffff" < "g"
    # P(8-nibble prefix < H) == n / 16^8 exactly
    assert int(_threshold_hex(0.25), 16) == 16**8 // 4


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, ["en", "zh", "es"][i % 3]) for i in range(6000)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_hash_sample_rate_and_determinism(spark, docs):
    s1 = {r["doc_id"] for r in hash_sample(docs, 0.1, "doc_id", "train").collect()}
    s2 = {r["doc_id"] for r in hash_sample(docs, 0.1, "doc_id", "train").collect()}
    assert s1 == s2  # pure predicate: identical on every run
    assert 0.07 < len(s1) / 6000 < 0.13
    # a larger fraction with the same salt is a superset (monotone
    # threshold — lets a pipeline grow a split without resampling)
    s3 = {r["doc_id"] for r in hash_sample(docs, 0.3, "doc_id", "train").collect()}
    assert s1 <= s3
    # different salt = independent split
    val = {r["doc_id"] for r in hash_sample(docs, 0.1, "doc_id", "val").collect()}
    overlap = len(s1 & val) / max(1, len(s1))
    assert overlap < 0.25  # ~0.1 expected for independent 10% samples


def test_stratified_sample_rates(spark, docs):
    frac = {"en": 0.05, "zh": 0.5}
    out = stratified_sample(docs, frac, "doc_id", "lang", salt="mix").collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], 0)
        by_lang[r["lang"]] += 1
    assert "es" not in by_lang  # default fraction 0
    assert 0.02 < by_lang["en"] / 2000 < 0.09
    assert 0.42 < by_lang["zh"] / 2000 < 0.58
