"""Shared snapshot profile for the distribution-drift checks.

Both PSI (validation/psi.py) and two-sample KS (validation/ks.py) are
functions of the same sufficient statistic: the per-(group, distinct
value) row counts of each snapshot.  Computing that profile once and
feeding both checks from it means the row-scale input — at the
validation engine's scale, a scan that includes deriving numeric
features from the raw reference snapshot's content column — crosses
the wire exactly once, as one partial-aggregated hash shuffle whose
output is model-sized (numeric drift features repeat heavily, so the
per-value counts collapse map-side).  The engine persists the profile
and runs both checks from the cached frame (engine._job_dist_drift).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def snapshot_value_counts(
    df: DataFrame,
    is_ref: Column,
    value_col: str,
    group_cols: list[str],
) -> DataFrame:
    """One row per (group..., distinct value) with per-snapshot counts:
    ``__r`` = rows where ``is_ref`` holds (reference snapshot),
    ``__c`` = the rest (current snapshot)."""
    return df.groupBy(*group_cols, value_col).agg(
        F.sum(F.when(is_ref, 1).otherwise(0)).alias("__r"),
        F.sum(F.when(is_ref, 0).otherwise(1)).alias("__c"),
    )


def feature_stack_expr(feature_cols: list[str]) -> str:
    """``stack()`` expression pivoting wide feature columns into the
    long (feature, value) shape — a map-side Generate, no shuffle."""
    return "stack({}, {}) as (feature, value)".format(
        len(feature_cols),
        ", ".join(f"'{c}', cast({c} as double)" for c in feature_cols),
    )


def build_snapshot_profile(
    snapshot: DataFrame,
    partition_col: str = "lang",
    feature_cols: list[str] | None = None,
) -> DataFrame:
    """The persistable drift profile of ONE corpus snapshot: one row
    per (partition, feature, distinct value) with its row count
    (``__n``).

    This is the sufficient statistic both PSI and two-sample KS need,
    so a validation deployment computes it ONCE per reference snapshot
    (one feature-derivation scan + one partial-aggregated hash
    shuffle, output model-sized) and writes it next to the snapshot.
    Every subsequent validation run then passes it as
    ``ValidationSuite.run(reference_profile=...)`` instead of
    ``reference=...`` — at 10^12 rows, rescanning the frozen reference
    corpus per run is the difference between a bounded-cost check and
    doubling every run's I/O. Built by the CLI ``profile`` subcommand.
    """
    from .features import derive_features

    return stacked_value_counts(
        derive_features(snapshot), partition_col, feature_cols
    )


def stacked_value_counts(
    feats: DataFrame,
    partition_col: str,
    feature_cols: list[str] | None = None,
) -> DataFrame:
    """(partition, feature, value) -> ``__n`` counts over
    already-derived feature columns. The SINGLE definition of a
    counts profile: both the persisted reference profile
    (:func:`build_snapshot_profile`) and the engine's current-run
    counts are built here, so the two sides of the dist-drift check
    cannot desynchronize (the check's correctness contract is that
    the sides aggregate identically)."""
    from .features import FEATURE_COLS

    feature_cols = list(feature_cols or FEATURE_COLS)
    long = feats.selectExpr(partition_col, feature_stack_expr(feature_cols))
    return long.groupBy(partition_col, "feature", "value").agg(
        F.count(F.lit(1)).alias("__n")
    )


PROFILE_COLUMNS = ("feature", "value", "__n")


def combine_with_reference_profile(
    ref_profile: DataFrame,
    cur_counts: DataFrame,
    value_col: str,
    group_cols: list[str],
) -> DataFrame:
    """Zero-filled full-outer merge of a persisted reference profile
    with the current snapshot's counts — produces exactly the
    ``(__r, __c)`` frame :func:`snapshot_value_counts` builds when
    both snapshots are scanned inline, so PSI/KS results are
    identical either way. Join keys include the (deterministically
    derived, parquet-exact) double value; both profiles are
    model-sized, so this join never moves row-scale data."""
    ref = ref_profile.select(
        *group_cols, value_col, F.col("__n").alias("__r")
    )
    cur = cur_counts.select(
        *group_cols, value_col, F.col("__n").alias("__c")
    )
    return ref.join(cur, [*group_cols, value_col], "full_outer").select(
        *group_cols,
        value_col,
        F.coalesce("__r", F.lit(0)).alias("__r"),
        F.coalesce("__c", F.lit(0)).alias("__c"),
    )
