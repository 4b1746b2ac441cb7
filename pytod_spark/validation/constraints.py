"""Uniqueness and referential-integrity checks -> violation rows +
per-partition summaries (north_rule: uniqueness on (repo, path,
commit); RI repo -> commit).

Shapes chosen for skew survival: uniqueness is a partial-aggregating
groupBy on the key (map-side combine absorbs the giant-repo key
space); RI is a left-anti join that broadcasts automatically when the
parent fits (commit dimension per repo is small), else sort-merge
with AQE skew splitting."""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def uniqueness_violations(
    df: DataFrame,
    keys: Iterable[str],
    group_cols: Iterable[str] = (),
    hash_prefilter: bool = True,
) -> DataFrame:
    """Rows of duplicated business keys: key columns + n_copies (> 1).

    ``hash_prefilter=True`` (default) shuffles an 8-byte xxhash64 of
    the key instead of the full key tuple to find *candidate*
    duplicate hashes, then re-checks exactly on the (tiny) matching
    subset via a broadcast semi-join — same result set (hash
    collisions are eliminated by the exact re-check), ~10x less
    shuffle volume on wide string keys. This is the plan that
    matters at 10^12 rows, where the key tuple dominates the
    shuffle. Falls back to the single exact groupBy when disabled."""
    keys = list(keys)
    group_cols = [c for c in group_cols if c not in keys]
    exact = (
        lambda frame: frame.groupBy(*group_cols, *keys)
        .agg(F.count(F.lit(1)).alias("n_copies"))
        .where(F.col("n_copies") > 1)
    )
    if not hash_prefilter:
        return exact(df)
    h = F.xxhash64(*group_cols, *keys).alias("__kh")
    cand = (
        df.select(h)
        .groupBy("__kh")
        .count()
        .where(F.col("count") > 1)
        .select("__kh")
    )
    # no explicit broadcast hint: the candidate set scales with the
    # number of duplicated keys (a dup-heavy corpus at 10^12 rows makes
    # it billions of hashes), so a forced broadcast would OOM the
    # driver. AQE upgrades the semi-join to broadcast at runtime
    # whenever the candidate side is actually small.
    suspects = df.withColumn("__kh", F.xxhash64(*group_cols, *keys)).join(
        cand, on="__kh", how="left_semi"
    )
    return exact(suspects)


def uniqueness_summary(
    df: DataFrame, keys: Iterable[str], group_cols: Iterable[str] = ()
) -> DataFrame:
    keys = list(keys)
    group_cols = list(group_cols)
    per_key = df.groupBy(*group_cols, *keys).agg(F.count(F.lit(1)).alias("cnt"))
    aggs = [
        F.sum("cnt").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.sum((F.col("cnt") > 1).cast("long")).alias("n_dup_keys"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt") - 1).otherwise(0)).alias("n_extra_rows"),
    ]
    return per_key.groupBy(*group_cols).agg(*aggs) if group_cols else per_key.agg(*aggs)


def ri_violations(
    child: DataFrame, parent: DataFrame, keys: Iterable[str],
    child_cols: Iterable[str] = (),
) -> DataFrame:
    """Child rows whose key has no parent (left-anti join)."""
    keys = list(keys)
    out_cols = list(child_cols) or child.columns
    return child.join(parent.select(*keys).distinct(), on=keys, how="left_anti").select(
        *out_cols
    )


def ri_summary(
    child: DataFrame, parent: DataFrame, keys: Iterable[str],
    group_cols: Iterable[str] = (),
) -> DataFrame:
    keys = list(keys)
    group_cols = list(group_cols)
    flagged = child.join(
        parent.select(*keys).distinct().withColumn("__ok", F.lit(1)),
        on=keys,
        how="left",
    )
    aggs = [
        F.count(F.lit(1)).alias("n_child"),
        F.sum(F.col("__ok").isNull().cast("long")).alias("n_orphans"),
    ]
    return flagged.groupBy(*group_cols).agg(*aggs) if group_cols else flagged.agg(*aggs)
