"""Distributed ranking — bucketed two-pass, no whole-column single-task
windows.

``Window.partitionBy(F.lit(1)).orderBy(...)`` (or a per-feature window
whose partition holds all n rows) funnels the entire column through one
task; correct, but a one-reducer plan that dies at 10^12 rows.  The
standard scale shape is two-pass range ranking:

1. split each ranking domain into B range buckets via approximate
   quantile boundaries (equal key values always land in the same
   bucket, so tie groups never straddle buckets);
2. per-bucket counts (a partial-aggregated shuffle of B rows per
   ranking domain) give each bucket's global rank offset through a
   cumulative sum over the *counts* frame — a per-group window for
   grouped domains, a broadcast self-join for the ungrouped case, so
   NO plan contains a single-partition exchange (cf. _cum_offsets);
3. the only full-data shuffle is keyed by (domain..., bucket), so no
   task sorts more than ~n/B rows; a row's global rank is its bucket
   offset plus its row_number within the bucket.

Ascending and descending ranks (the reference's argsort(X) /
argsort(-X) pair, pytod/models/ecod.py:88-92) share one exchange: both
within-bucket windows use the same partition key and only re-sort.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _attach_small(df: DataFrame, small: DataFrame, part_cols: Sequence[str]) -> DataFrame:
    small = F.broadcast(small)
    return df.join(small, on=list(part_cols)) if part_cols else df.crossJoin(small)


def with_group_size(df: DataFrame, part_cols: Sequence[str], out: str = "__n") -> DataFrame:
    """Attach the per-group row count as a column via a partial-agg +
    broadcast join (replaces ``F.count(...).over(partitionBy(lit(1)))``)."""
    agg = F.count(F.lit(1)).alias(out)
    sizes = df.groupBy(*part_cols).agg(agg) if part_cols else df.agg(agg)
    return _attach_small(df, sizes, part_cols)


def _with_bucket(
    df: DataFrame, key: str, part_cols: Sequence[str], n_buckets: int
) -> DataFrame:
    qs = ", ".join(str(i / n_buckets) for i in range(1, n_buckets))
    bexpr = F.expr(f"approx_percentile(`{key}`, array({qs}), 1000)").alias("__bnds")
    bounds = df.groupBy(*part_cols).agg(bexpr) if part_cols else df.agg(bexpr)
    df = _attach_small(df, bounds, part_cols)
    # bucket = #boundaries <= key: depends on the value only, so equal
    # keys share a bucket and tie-break ordering stays within-bucket
    bucket = F.size(F.filter(F.col("__bnds"), lambda b: b <= F.col(key)))
    return df.withColumn("__bucket", bucket).drop("__bnds")


def _cum_offsets(cnts: DataFrame, part_cols: Sequence[str],
                 specs: Sequence[tuple]) -> DataFrame:
    """Strict cumulative sums over the per-bucket counts frame, with
    NO single-partition exchange anywhere:

    * grouped domains — a window partitioned by the group key
      (parallel across groups, <= n_buckets rows per group);
    * ungrouped — the counts frame is <= n_buckets rows total, so a
      broadcast self-join with conditional sums replaces the
      ``partitionBy(lit(1))`` window (O(n_buckets^2) tiny rows,
      hash-partitioned aggregation, never one task holding the data).

    specs: (val_col, out_asc_or_None, out_desc_or_None) per value.
    """
    if part_cols:
        wp = Window.partitionBy(*part_cols)
        cum = lambda val, order: F.coalesce(  # noqa: E731
            F.sum(val).over(
                wp.orderBy(order).rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        )
        out = cnts
        for val, oa, od in specs:
            if oa:
                out = out.withColumn(oa, cum(val, F.col("__bucket").asc()))
            if od:
                out = out.withColumn(od, cum(val, F.col("__bucket").desc()))
        return out
    vals = [v for v, _, _ in specs]
    other = cnts.select(
        F.col("__bucket").alias("__ob"),
        *[F.col(v).alias(f"__ov_{v}") for v in vals],
    )
    aggs = []
    for val, oa, od in specs:
        if oa:
            aggs.append(
                F.sum(
                    F.when(F.col("__ob") < F.col("__bucket"), F.col(f"__ov_{val}"))
                    .otherwise(0)
                ).alias(oa)
            )
        if od:
            aggs.append(
                F.sum(
                    F.when(F.col("__ob") > F.col("__bucket"), F.col(f"__ov_{val}"))
                    .otherwise(0)
                ).alias(od)
            )
    return (
        cnts.crossJoin(F.broadcast(other))
        .groupBy("__bucket", *vals)
        .agg(*aggs)
    )


# Frame-size budget for the plain per-group window fast path in
# grouped_ranks: below it, even a single group's rows sort comfortably
# in one task (4M rows x ~16B sort keys ~ 64 MB) and the bucketed
# two-pass plan's ~5 extra metadata jobs dominate wall time (measured
# 5.6s vs 1.5s on the sf0.1 ECDF rows). Same gate philosophy as
# block_knn.fits_broadcast_budget: small input -> simple plan, scale
# input -> the shape that survives 10^12 rows.
SMALL_RANK_ROWS = 4_000_000


def grouped_ranks(
    df: DataFrame,
    key: str,
    tie: str,
    part_cols: Sequence[str],
    out_asc: str,
    n_buckets: int = 64,
    n_rows: int | None = None,
) -> DataFrame:
    """0-based ascending rank of `key` (ties by `tie` asc) within
    `part_cols`, dispatched by input size: a plain per-group window
    when the frame is provably under ``SMALL_RANK_ROWS`` (plan
    statistics via ``estimate_rows`` — no job; a count job only as the
    last resort), the bucketed two-pass core otherwise. Output is
    identical either way; only the physical plan changes."""
    from .block_knn import estimate_rows

    n = n_rows if n_rows is not None else (estimate_rows(df) or df.count())
    if n <= SMALL_RANK_ROWS:
        w = Window.partitionBy(*part_cols).orderBy(
            F.col(key).asc(), F.col(tie).asc()
        )
        return df.withColumn(out_asc, F.row_number().over(w) - 1)
    return bucketed_ranks(
        df, key, tie, part_cols, out_asc=out_asc, n_buckets=n_buckets
    )


def bucketed_ranks(
    df: DataFrame,
    key: str,
    tie: str,
    part_cols: Sequence[str],
    out_asc: str | None = None,
    out_desc: str | None = None,
    n_buckets: int = 64,
) -> DataFrame:
    """0-based dense row ranks of `key` within `part_cols`, ascending
    (stable ties by `tie` asc) and/or descending (ties still `tie` asc —
    numpy argsort(-X) stability, pytod/models/basic_operators.py:226).
    """
    part_cols = list(part_cols)
    df = _with_bucket(df, key, part_cols, n_buckets)
    cnts = df.groupBy(*part_cols, "__bucket").agg(F.count(F.lit(1)).alias("__bc"))
    offs = _cum_offsets(
        cnts, part_cols, [("__bc", "__off_a", "__off_d")]
    ).select(*part_cols, "__bucket", "__off_a", "__off_d")
    df = df.join(F.broadcast(offs), on=[*part_cols, "__bucket"])
    bw = Window.partitionBy(*part_cols, "__bucket")
    if out_asc:
        rn = F.row_number().over(bw.orderBy(F.col(key).asc(), F.col(tie).asc()))
        df = df.withColumn(out_asc, F.col("__off_a") + rn - 1)
    if out_desc:
        rn = F.row_number().over(bw.orderBy(F.col(key).desc(), F.col(tie).asc()))
        df = df.withColumn(out_desc, F.col("__off_d") + rn - 1)
    return df.drop("__bucket", "__off_a", "__off_d")


def bucketed_cumsums(
    df: DataFrame,
    key: str,
    vals: dict[str, str],
    part_cols: Sequence[str] = (),
    descending: bool = False,
    n_buckets: int = 64,
) -> DataFrame:
    """For each row, the sum of each `vals` column over rows whose
    `key` is strictly smaller (or strictly larger with descending=True)
    within `part_cols`. Caller must pre-aggregate to one row per
    distinct key (strictness is then exact).

    Same two-pass shape as bucketed_ranks: per-bucket totals give
    offsets through a <= n_buckets-row metadata window; the full-data
    exchange is keyed by (part, bucket)."""
    part_cols = list(part_cols)
    df = _with_bucket(df, key, part_cols, n_buckets)
    sums = [F.sum(c).alias(f"__s_{c}") for c in vals]
    cnts = df.groupBy(*part_cols, "__bucket").agg(*sums)
    specs = [
        (f"__s_{c}", None, f"__off_{c}") if descending else (f"__s_{c}", f"__off_{c}", None)
        for c in vals
    ]
    offs = _cum_offsets(cnts, part_cols, specs).select(
        *part_cols, "__bucket", *[f"__off_{c}" for c in vals]
    )
    df = df.join(F.broadcast(offs), on=[*part_cols, "__bucket"])
    bw = Window.partitionBy(*part_cols, "__bucket").orderBy(
        F.col(key).desc() if descending else F.col(key).asc()
    )
    for c, out in vals.items():
        within = F.coalesce(
            F.sum(c).over(bw.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
        )
        df = df.withColumn(out, F.col(f"__off_{c}") + within)
    return df.drop("__bucket", *[f"__off_{c}" for c in vals])
