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
