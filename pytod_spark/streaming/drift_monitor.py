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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fit_reference_model(
    ref: DataFrame,
    value_col: str,
    n_bins: int = 10,
    alpha: float = 0.1,
    contamination: float = 0.1,
) -> dict:
    """Fit the HBOS histogram + threshold on a reference batch of any
    size; returns a plain dict (checkpointable as JSON).

    Fully distributed — three partial-aggregated passes (bounds,
    histogram counts, threshold percentile), same shape as the batch
    HBOS detector (detectors/hbos.py); the driver only ever receives
    one stats row, <= n_bins histogram rows and one percentile row,
    never the reference column itself. Degenerate all-equal references
    use the single-occupied-bin width-1 convention (detectors/hbos.py),
    not np.histogram's +-0.5 range expansion.
    """
    v = F.col(value_col).cast("double")
    st = ref.agg(
        F.min(v).alias("lo"), F.max(v).alias("hi"), F.count(v).alias("n")
    ).collect()[0]
    if not st["n"] or st["lo"] is None:
        # empty / all-NULL reference windows are operationally normal
        # (monitor started before the window filled) — fail with a
        # clear message instead of float(None)
        raise ValueError(
            f"reference batch has no non-null '{value_col}' values — "
            "cannot fit a drift model yet"
        )
    lo, hi, n = float(st["lo"]), float(st["hi"]), int(st["n"])
    w = (hi - lo) / n_bins if hi > lo else 1.0
    # np.histogram bin semantics: right-open bins, hi lands in the last
    bin_ = F.least(
        F.greatest(F.floor((v - F.lit(lo)) / F.lit(w)), F.lit(0)), F.lit(n_bins - 1)
    ).cast("int")
    counts = {
        r["bin"]: r["cnt"]
        for r in ref.groupBy(bin_.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    model = {
        "lo": lo,
        "hi": hi,
        "w": w,
        "n_bins": n_bins,
        "alpha": alpha,
        "densities": [counts.get(b, 0) / w / n for b in range(n_bins)],
        "threshold": 0.0,
    }
    # threshold = percentile of the reference's own scores under the
    # frozen model — scored with the exact same expressions the stream
    # will use (score_stream), reduced to one row
    thr = (
        score_stream(ref, model, value_col)
        .agg(F.percentile("score", F.lit(1 - contamination)).alias("t"))
        .collect()[0]["t"]
    )
    model["threshold"] = float(thr)
    return model


#: bump on incompatible model-dict layout changes
MODEL_VERSION = 1


def save_reference_model(spark, model: dict, ref: str) -> None:
    """Persist a fitted drift model (the dict ``fit_reference_model``
    returns) through ``sources.write_table`` — parquet path or
    ``table:``/``iceberg:`` catalog ref, like every other artifact —
    so a restarted stream or a nightly validate scores against
    YESTERDAY'S frozen model instead of refitting (the serving-path
    mirror of validation/profile.py's persisted drift profile; the
    reference refits per call, pytod/models/knn.py:100-108). One row:
    scalars + the densities array; doubles round-trip parquet
    exactly, so load(save(m)) == m."""
    from ..sources import write_table

    row = (
        MODEL_VERSION,
        float(model["lo"]), float(model["hi"]), float(model["w"]),
        int(model["n_bins"]), float(model["alpha"]),
        [float(d) for d in model["densities"]],
        float(model["threshold"]),
    )
    write_table(
        spark.createDataFrame(
            [row],
            "version int, lo double, hi double, w double, n_bins int, "
            "alpha double, densities array<double>, threshold double",
        ),
        ref,
    )


def load_reference_model(spark, ref: str) -> dict:
    """Load a model persisted by :func:`save_reference_model`."""
    from ..sources import load_table

    rows = load_table(spark, ref).collect()
    if len(rows) != 1:
        raise ValueError(
            f"drift model at {ref!r} holds {len(rows)} rows (expected 1) — "
            "not a model artifact"
        )
    r = rows[0]
    if r["version"] != MODEL_VERSION:
        raise ValueError(
            f"drift model at {ref!r} is version {r['version']}, this "
            f"library reads {MODEL_VERSION} — refit it"
        )
    return {
        "lo": r["lo"], "hi": r["hi"], "w": r["w"], "n_bins": r["n_bins"],
        "alpha": r["alpha"], "densities": list(r["densities"]),
        "threshold": r["threshold"],
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
