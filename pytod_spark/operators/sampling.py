"""Deterministic hash sampling for training-data pipelines.

Reproducible splits are a pipeline invariant: the same document must
land in the same split on every run, on any cluster size, with no RNG
state — so sampling is a pure predicate on a key hash, never
``df.sample`` (whose output depends on partitioning). The predicate
is `md5(key || salt)` compared lexicographically against a hex
threshold: md5 hex is uniformly distributed per nibble, a fixed-width
prefix compare is exact rate control at 16^-w granularity, and both
Spark (`F.md5`) and DuckDB (`md5`) produce the identical digest, so
the DuckDB oracle reproduces the sample bit-for-bit.

100-TB shape: a map-side filter — no shuffle, no RNG broadcast,
pushed into the scan where the source allows; stratified sampling
joins a broadcast per-stratum threshold table.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_W = 8  # prefix nibbles compared: rate granularity 16^-8 ~ 2.3e-10


def _threshold_hex(fraction: float) -> str:
    """w-nibble hex string H such that P(prefix < H) == the closest
    representable fraction. fraction >= 1 returns "g", which is
    lexicographically greater than every hex prefix (keeps all rows)
    in both engines — format(16^8) would be a 9-char string whose
    string compare is NOT the numeric compare."""
    n = max(0, round(float(fraction) * 16**_HEX_W))
    if n >= 16**_HEX_W:
        return "g"
    return format(n, f"0{_HEX_W}x")


def sample_predicate(key: Column, fraction: float, salt: str = "") -> Column:
    """Boolean column: deterministically keep ~``fraction`` of rows by
    ``md5(key || salt)`` prefix. Different salts give independent
    samples of the same keys (train/val/test splits)."""
    digest = F.md5(F.concat(key.cast("string"), F.lit(salt)))
    return F.substring(digest, 1, _HEX_W) < _threshold_hex(fraction)


def hash_sample(
    df: DataFrame, fraction: float, key_col: str, salt: str = ""
) -> DataFrame:
    """Uniform deterministic sample: a pure map-side filter."""
    return df.where(sample_predicate(F.col(key_col), fraction, salt))


def stratified_sample(
    df: DataFrame,
    fractions: Mapping[str, float],
    key_col: str,
    stratum_col: str,
    salt: str = "",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sample (e.g. per-language rates that
    up-weight low-resource languages): the per-stratum hex thresholds
    join in as a broadcast table, the filter stays map-side."""
    spark = df.sparkSession
    rows = [(k, _threshold_hex(v)) for k, v in fractions.items()]
    thr = F.broadcast(
        spark.createDataFrame(rows, f"`{stratum_col}` string, __thr string")
    )
    digest = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    default_thr = _threshold_hex(default_fraction)
    return (
        df.join(thr, on=stratum_col, how="left")
        .where(
            F.substring(digest, 1, _HEX_W)
            < F.coalesce(F.col("__thr"), F.lit(default_thr))
        )
        .drop("__thr")
    )


def shuffle_order(
    df: DataFrame,
    key_col: str = "doc_id",
    salt: str = "",
    out: str = "shuffle_rank",
    n_buckets: int = 64,
) -> DataFrame:
    """Deterministic global training-order shuffle: rank every row by
    the 60-bit md5 hash of (key || salt). The permutation is a pure
    function of the keys — reproducible on any cluster size, and a
    new salt is a fresh epoch-shuffle with zero RNG state.

    100-TB shape: a global rank is the one-reducer trap; this reuses
    the bucketed two-pass cumulative sum (operators/packing.py — the
    only full-data window is partitioned by hash-range bucket, per-
    bucket offsets join in by broadcast). Requires ``key_col`` unique
    (md5 ties would make within-tie order engine-dependent).
    """
    from ..functions.text import md5_hash60
    from .packing import bucketed_cumsum

    keyed = df.withColumn(
        "__skey", md5_hash60(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    ).withColumn("__one", F.lit(1))
    ranked = bucketed_cumsum(keyed, "__skey", "__one", out=out, n_buckets=n_buckets)
    return ranked.withColumn(out, F.col(out).cast("long")).drop("__skey", "__one")
