"""Deduplication operators for training-data pipelines.

Five families, all DataFrame-native:

* exact            — sha256 group-by (one shuffle on the hash)
* n-gram Jaccard   — shingle-set similarity self-join within groups
* MinHash + LSH    — shingle -> 60-bit hash -> k permutations -> band
                     buckets -> candidate join -> exact verify; the
                     scale path (candidates only, never all pairs)
* SimHash          — 16-bit token-hash sign aggregate + Hamming join
* embedding cosine — see operators/similarity.py

Hashes use functions.text.md5_hash60 so every step is reproducible in
the DuckDB oracle SQL. MinHash permutations are fixed-seed affine
maps h_i(x) = (a_i * (x mod P) + b_i) mod P with P = 1e9+7.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import md5_hash60, shingles, tokens

MINHASH_P = 1_000_000_007
# fixed-seed permutation coefficients (a_i odd-ish, b_i offset); shared
# verbatim with the oracle SQL
MINHASH_COEFFS = [(2 * i + 3, 7919 * (i + 1) % MINHASH_P) for i in range(16)]
N_BANDS = 4
ROWS_PER_BAND = 4  # 16 = N_BANDS * ROWS_PER_BAND


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact-dup groups by content sha256 (the per-row invariant hash,
    BASELINE input_hint)."""
    return (
        df.select(F.sha2(F.col(text_col), 256).alias("text_sha"), F.col(id_col))
        .groupBy("text_sha")
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min(id_col).alias("min_doc_id"))
    )


def shingle_df(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3,
    group_cols: Iterable[str] = (),
) -> DataFrame:
    return df.select(*group_cols, id_col, shingles(F.col(text_col), n).alias("sh"))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    group_cols: Iterable[str] = (),
) -> DataFrame:
    """All-pairs shingle Jaccard within groups (exact; quadratic per
    group — the verification-scale path; use MinHash+LSH at corpus
    scale)."""
    group_cols = list(group_cols)
    sh = shingle_df(df, id_col, text_col, n, group_cols)
    a = sh.select(*group_cols, F.col(id_col).alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(
        *[F.col(c).alias(f"__r_{c}") for c in group_cols],
        F.col(id_col).alias("doc_b"),
        F.col("sh").alias("sh_b"),
    )
    cond = [a[c] == b[f"__r_{c}"] for c in group_cols] + [a["doc_a"] < b["doc_b"]]
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        a.join(b, on=cond)
        .withColumn("jaccard", inter.cast("double") / union)
        .where(F.col("jaccard") >= threshold)
        .select(*group_cols, "doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Per-doc MinHash signature: one min-aggregate per permutation
    over the exploded shingle hashes (single shuffle on doc id,
    map-side partial min)."""
    sh = shingle_df(df, id_col, text_col, n).select(
        id_col, F.explode("sh").alias("shingle")
    )
    h = (md5_hash60(F.col("shingle")) % MINHASH_P).alias("h")
    hashed = sh.select(id_col, h)
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % MINHASH_P).alias(f"m{i}")
        for i, (a, b) in enumerate(MINHASH_COEFFS)
    ]
    return hashed.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    sigs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Band the signature (N_BANDS bands of ROWS_PER_BAND mins); docs
    colliding in any band are candidates. Self-join happens on the
    (band_id, band_key) bucket — never across buckets."""
    bands = []
    for b in range(N_BANDS):
        cols = [f"m{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)]
        bands.append(
            sigs.select(
                F.col(id_col),
                F.lit(b).alias("band_id"),
                F.concat_ws("_", *[F.col(c) for c in cols]).alias("band_key"),
            )
        )
    banded = bands[0]
    for extra in bands[1:]:
        banded = banded.unionAll(extra)
    a = banded.select("band_id", "band_key", F.col(id_col).alias("doc_a"))
    b = banded.select(
        F.col("band_id").alias("band_id_r"),
        F.col("band_key").alias("band_key_r"),
        F.col(id_col).alias("doc_b"),
    )
    return (
        a.join(
            b,
            on=[
                a["band_id"] == b["band_id_r"],
                a["band_key"] == b["band_key_r"],
                a["doc_a"] < b["doc_b"],
            ],
        )
        .select("doc_a", "doc_b")
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """LSH candidates refined by exact shingle Jaccard (filter-and-
    refine, the same two-phase shape as the reference's quantized
    recheck, intermediate_layers.py:106-164)."""
    cands = lsh_candidate_pairs(minhash_signatures(df, id_col, text_col, n), id_col)
    sh = shingle_df(df, id_col, text_col, n)
    sa = sh.select(F.col(id_col).alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = sh.select(F.col(id_col).alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", inter.cast("double") / union)
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash16(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """16-bit SimHash over tokens: bit_i = sign of sum over tokens of
    (+1 if token-hash bit i else -1); ties (sum == 0) resolve to 0."""
    tok = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
    h = md5_hash60(F.col("tok"))
    hashed = tok.select(id_col, h.alias("h"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s{i}")
        for i in range(16)
    ]
    sums = hashed.groupBy(id_col).agg(*bit_sums)
    sim = None
    for i in range(16):
        term = F.when(F.col(f"s{i}") > 0, F.lit(1 << i)).otherwise(0)
        sim = term if sim is None else sim + term
    return sums.select(id_col, sim.cast("long").alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 2,
    group_cols: Iterable[str] = (),
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance within groups."""
    group_cols = list(group_cols)
    sh = simhash16(df, id_col, text_col)
    if group_cols:
        sh = sh.join(df.select(id_col, *group_cols), id_col)
    a = sh.select(*group_cols, F.col(id_col).alias("doc_a"), F.col("simhash").alias("ha"))
    b = sh.select(
        *[F.col(c).alias(f"__r_{c}") for c in group_cols],
        F.col(id_col).alias("doc_b"),
        F.col("simhash").alias("hb"),
    )
    cond = [a[c] == b[f"__r_{c}"] for c in group_cols] + [a["doc_a"] < b["doc_b"]]
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        a.join(b, on=cond)
        .withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select(*group_cols, "doc_a", "doc_b", "hamming")
    )
