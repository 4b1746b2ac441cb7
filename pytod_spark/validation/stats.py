"""Per-partition column statistics (north_rule: null rate, distinct
via HLL, min/max, quantile sketches).

One grouped aggregation pass computes every metric for every column
(wide agg), then an unpivot produces the long-format profile — a
single shuffle on the partition key regardless of column count.
Distinct counts use approx_count_distinct (HLL++) by default, the
only sketch that survives 10^12 rows; ``exact=True`` switches to
count_distinct for oracle-checkable runs."""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

METRICS = ["n", "n_null", "n_distinct", "min_v", "max_v", "mean_v", "std_v", "p50", "p95"]


def column_stats(
    df: DataFrame,
    cols: Iterable[str],
    group_cols: Iterable[str] = (),
    exact_distinct: bool = False,
) -> DataFrame:
    """Long-format profile: one row per (partition, column)."""
    cols = list(cols)
    group_cols = list(group_cols)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        col = F.col(c)
        distinct = (
            F.count_distinct(col) if exact_distinct else F.approx_count_distinct(col)
        )
        aggs += [
            F.sum(col.isNull().cast("long")).alias(f"{c}__n_null"),
            distinct.alias(f"{c}__n_distinct"),
            F.min(col).cast("double").alias(f"{c}__min_v"),
            F.max(col).cast("double").alias(f"{c}__max_v"),
            F.avg(col).alias(f"{c}__mean_v"),
            F.stddev_samp(col).alias(f"{c}__std_v"),
            F.percentile_approx(col, 0.5).cast("double").alias(f"{c}__p50"),
            F.percentile_approx(col, 0.95).cast("double").alias(f"{c}__p95"),
        ]
    wide = df.groupBy(*group_cols).agg(*aggs) if group_cols else df.agg(*aggs)

    # unpivot: one stack expression, no extra shuffle
    per_col_metrics = [m for m in METRICS if m != "n"]
    stack_args = []
    for c in cols:
        fields = ", ".join(f"`{c}__{m}`" for m in per_col_metrics)
        stack_args.append(f"'{c}', {fields}")
    stack = f"stack({len(cols)}, {', '.join(stack_args)}) as (col_name, {', '.join(per_col_metrics)})"
    return wide.selectExpr(*group_cols, "__n as n_rows", stack)
