"""Structured-Streaming drift monitor.

The reference is batch-only (SURVEY.md §2.5: no streams/watermarks/
state), but a validation engine at corpus scale watches *arriving*
data too. This module fits an HBOS reference model on a batch frame
(histt semantics, basic_operators.py:261-278), then scores a stream
against the frozen model with pure column expressions (the model's
bin edges/densities are inlined as literals — no UDF, no state), and
raises windowed drift alerts with event-time watermarks.

Scoring a stream against a *frozen* model is the streaming analogue of
the reference's fit-then-label contract: threshold_ comes from the
reference fit (base.py:425), arriving rows only get compared to it.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..oracle.operators import histt


def fit_reference_model(
    ref: DataFrame,
    value_col: str,
    n_bins: int = 10,
    alpha: float = 0.1,
    contamination: float = 0.1,
) -> dict:
    """Fit the HBOS histogram + threshold on a (small-aggregable)
    reference batch; returns a plain dict (checkpointable as JSON)."""
    vals = np.array([r[0] for r in ref.select(value_col).collect()], dtype=np.float64)
    dens, edges = histt(vals, bins=n_bins, density=True)
    lo, hi = float(edges[0]), float(edges[-1])
    w = (hi - lo) / n_bins if hi > lo else 1.0
    scores_ref = -np.log2(dens + alpha)[
        np.clip(np.searchsorted(edges, vals, side="left"), 1, n_bins) - 1
    ]
    threshold = float(np.percentile(scores_ref, 100 * (1 - contamination)))
    return {
        "lo": lo,
        "hi": hi,
        "w": w,
        "n_bins": n_bins,
        "alpha": alpha,
        "densities": [float(d) for d in dens],
        "threshold": threshold,
    }


def score_stream(stream: DataFrame, model: dict, value_col: str) -> DataFrame:
    """Append HBOS score + outlier label columns to a (streaming or
    batch) DataFrame using only built-in expressions."""
    v = F.col(value_col)
    nb = model["n_bins"]
    bin_ = F.least(
        F.greatest(F.ceil((v - F.lit(model["lo"])) / F.lit(model["w"])), F.lit(1)),
        F.lit(nb),
    ).cast("int")
    dens_arr = F.array(*[F.lit(d) for d in model["densities"]])
    score = -F.log2(F.element_at(dens_arr, bin_) + F.lit(model["alpha"]))
    return stream.withColumn("score", score).withColumn(
        "label", (F.col("score") > F.lit(model["threshold"])).cast("int")
    )


def drift_alerts(
    stream: DataFrame,
    model: dict,
    value_col: str,
    ts_col: str = "ts",
    group_cols: tuple[str, ...] = (),
    window: str = "1 minute",
    watermark: str = "2 minutes",
    max_outlier_rate: float = 0.15,
) -> DataFrame:
    """Windowed outlier-rate aggregation with late-data watermarking;
    emits one row per (window, group) with the drift verdict."""
    scored = score_stream(stream, model, value_col).withWatermark(ts_col, watermark)
    agg = scored.groupBy(F.window(F.col(ts_col), window), *group_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.avg("label").alias("outlier_rate"),
    )
    return agg.withColumn(
        "drift_alert", (F.col("outlier_rate") > F.lit(max_outlier_rate)).cast("int")
    )
