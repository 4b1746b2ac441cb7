"""Score post-processing: threshold / labels / mu / sigma.

Parity: ``pytod/models/base.py:414-435`` — threshold =
percentile(scores, 100*(1-contamination)) with numpy's linear
interpolation (Spark's exact ``percentile`` uses the same
interpolation), labels = (score > threshold), _mu = mean,
_sigma = population std (np.std ddof=0 -> stddev_pop).

Per-group thresholds need the whole group's score distribution, so
this is a grouped aggregate broadcast-joined back — the two-stage
shape that also serves as the engine's checkpoint boundary
(SURVEY.md §7 risk 7).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def add_threshold_labels(
    scores: DataFrame,
    contamination: float = 0.1,
    score_col: str = "score",
    group_cols: Iterable[str] = (),
) -> DataFrame:
    """Append threshold/label/mu/sigma columns to a score DataFrame."""
    group_cols = list(group_cols)
    q = 1.0 - contamination
    aggs = [
        F.percentile(F.col(score_col), F.lit(q)).alias("threshold"),
        F.avg(score_col).alias("mu"),
        F.stddev_pop(score_col).alias("sigma"),
    ]
    if group_cols:
        stats = scores.groupBy(*group_cols).agg(*aggs)
        # no mandatory broadcast hint: the stats table has one row per
        # group, which at corpus scale (millions of repos) would OOM a
        # forced broadcast — AQE promotes it to a broadcast join
        # whenever it measures small, which is the right call per run
        joined = scores.join(stats, on=group_cols, how="left")
    else:
        stats = scores.agg(*aggs)
        joined = scores.crossJoin(F.broadcast(stats))
    return joined.withColumn(
        "label", (F.col(score_col) > F.col("threshold")).cast("int")
    )
