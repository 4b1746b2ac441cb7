"""HBOS detector — aggregate a tiny histogram model, broadcast it,
score map-side (no big joins).

Parity: pytod/models/hbos.py:100-130 with both of the reference's bin
conventions reproduced faithfully:

* the histogram *counts* use torch.histc binning — floor((v-lo)/w)
  clamped to [0, n_bins-1] (max value in last bin);
* the score *lookup* uses torch.bucketize(v, edges) ==
  searchsorted(edges, side='left') == ceil((v-lo)/w) for off-edge
  values, clamped to [1, n_bins] (hbos.py:118-122) — note an exact
  interior-edge value is counted in the right bin but scored from the
  left bin; empty-bin lookups score density 0.

density = count / bin_width / n (basic_operators.py:261-278);
per-feature score = log2(density + alpha); total = -sum (hbos.py:129).

Physical plan (the 10^12-row shape): two partial-aggregated passes
build the model — per-(group, feature) min/max/count, then
per-(group, feature, bin) counts via a broadcast join of the tiny
stats — so shuffle volume is O(groups x features x bins), kilobytes.
The model is collected, broadcast, and scoring is a map-only
vectorized Arrow pass emitting (group, id, [passthrough...], score):
no n-row join, no final n-row aggregation. Falls back to the pure
join/agg plan when the model exceeds the broadcast budget.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from ..oracle.detectors import hbos_scores as _np_hbos_scores
from .base import SparkDetector

# above this many (group, feature) cells the collected model is no
# longer "tiny" and the join-based plan takes over
_MODEL_CELL_BUDGET = 200_000


class HBOS(SparkDetector):
    def __init__(
        self,
        contamination: float = 0.1,
        n_bins: int = 10,
        alpha: float = 0.1,
        strategy: str = "auto",
        n_cells_hint: int | None = None,
    ):
        super().__init__(contamination, strategy)
        self.n_bins = n_bins
        self.alpha = alpha
        # caller-known (group x feature) cell count; when provided and
        # under budget the broadcast-vs-join sizing job is skipped
        self.n_cells_hint = n_cells_hint

    _supports_keep_cols = True

    # ------------------------------------------------------- model build

    def _long_frame(self, df, id_col, features_col, group_cols):
        return df.select(
            *group_cols,
            id_col,
            F.posexplode(F.col(features_col).cast("array<double>")).alias("j", "v"),
        )

    def _distributed_scores(
        self, df, id_col, features_col, group_cols, n_rows, keep_cols=()
    ):
        nb = self.n_bins
        feat = self._long_frame(df, id_col, features_col, group_cols)
        fkeys = group_cols + ["j"]
        stats = feat.groupBy(*fkeys).agg(
            F.min("v").alias("lo"), F.max("v").alias("hi"), F.count("v").alias("n")
        )
        # degenerate all-equal feature: width 1 keeps arithmetic finite
        # (everything lands in bin 0 / density n, mirroring a single
        # occupied bin)
        width = F.when(
            F.col("hi") > F.col("lo"), (F.col("hi") - F.col("lo")) / nb
        ).otherwise(F.lit(1.0))

        # decide broadcast-vs-join cheaply BEFORE materializing the model
        # on the driver: a limit(budget+1).count() touches at most
        # budget+1 rows, so an over-budget model never reaches the driver
        st_w = stats.withColumn("w", width)
        hint = self.n_cells_hint
        over_budget = (
            hint > _MODEL_CELL_BUDGET
            if hint is not None
            else st_w.limit(_MODEL_CELL_BUDGET + 1).count() > _MODEL_CELL_BUDGET
        )
        if over_budget:
            scores = self._scores_via_joins(
                feat, fkeys, stats, width, group_cols, id_col
            )
            if keep_cols:
                scores = scores.join(
                    df.select(*group_cols, id_col, *keep_cols),
                    on=[*group_cols, id_col],
                )
            return scores
        stats_rows = st_w.collect()

        cbin = F.least(
            F.greatest(F.floor((F.col("v") - F.col("lo")) / F.col("w")), F.lit(0)),
            F.lit(nb - 1),
        )
        st = stats.withColumn("w", width)
        hist_rows = (
            feat.join(F.broadcast(st), on=fkeys)
            .withColumn("bin", cbin)
            .groupBy(*fkeys, "bin")
            .count()
            .collect()
        )

        # model: {group_key: {j: (lo, w, dens[nb])}}
        model: dict = {}
        meta = {}
        for r in stats_rows:
            gk = tuple(r[c] for c in group_cols)
            meta[gk + (r["j"],)] = (r["lo"], r["w"], r["n"])
            model.setdefault(gk, {})[r["j"]] = [r["lo"], r["w"], np.zeros(nb)]
        for r in hist_rows:
            gk = tuple(r[c] for c in group_cols)
            lo, w, n = meta[gk + (r["j"],)]
            model[gk][r["j"]][2][r["bin"]] = r["count"] / w / n

        alpha = self.alpha
        sc = spark_session_of(df)
        bmodel = sc.sparkContext.broadcast(model)
        keep_cols = list(keep_cols)
        # output types mirror the input schema (group keys / ids need
        # not be string/long — base.py's contract allows any type)
        in_type = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        out_schema = ", ".join(
            [f"`{c}` {in_type[c]}" for c in group_cols]
            + [f"`{id_col}` {in_type[id_col]}"]
            + [f"`{c}` {in_type[c]}" for c in keep_cols]
            + ["score double"]
        )

        def score_batches(batches):
            m = bmodel.value
            for pdf in batches:
                if pdf.empty:
                    continue
                X = np.stack(pdf[features_col].to_numpy()).astype(
                    np.float64, copy=False
                )
                out = np.zeros(len(pdf))
                if group_cols:
                    gks = list(zip(*(pdf[c] for c in group_cols)))
                else:
                    gks = [()] * len(pdf)
                # batches can span groups; score per group slice
                garr = pd.Series(gks)
                for gk, idx in garr.groupby(garr).groups.items():
                    gm = m.get(gk)
                    if gm is None:
                        continue
                    ix = np.asarray(idx)
                    s = np.zeros(len(ix))
                    for j, (lo, w, dens) in gm.items():
                        v = X[ix, j]
                        # torch.bucketize semantics: ceil((v-lo)/w)
                        # clamped to [1, nb] (hbos.py:118-122)
                        b = np.ceil((v - lo) / w)
                        b = np.clip(b, 1, nb).astype(np.int64) - 1
                        s += np.log2(dens[b] + alpha)
                    out[ix] = -s
                cols = {c: pdf[c].to_numpy() for c in group_cols}
                cols[id_col] = pdf[id_col].to_numpy()
                for c in keep_cols:
                    cols[c] = pdf[c].to_numpy()
                cols["score"] = out
                yield pd.DataFrame(cols)

        return df.select(
            *group_cols, id_col, *keep_cols, features_col
        ).mapInPandas(score_batches, schema=out_schema)

    # ------------------------------------------- fallback (huge models)

    def _scores_via_joins(self, feat, fkeys, stats, width, group_cols, id_col):
        """The all-DataFrame plan (two broadcast joins + final n-row
        aggregation) for when the histogram model itself is too large
        to collect — same arithmetic, same scores."""
        nb = self.n_bins
        joined = feat.join(F.broadcast(stats), on=fkeys).withColumn("w", width)
        cbin = F.least(
            F.greatest(F.floor((F.col("v") - F.col("lo")) / F.col("w")), F.lit(0)),
            F.lit(nb - 1),
        )
        hist = (
            joined.withColumn("bin", cbin)
            .groupBy(*fkeys, "bin")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.first("w").alias("bw"),
                F.first("n").alias("bn"),
            )
            .select(
                *fkeys,
                "bin",
                (F.col("cnt") / F.col("bw") / F.col("bn")).alias("density"),
            )
        )
        sbin = (
            F.least(
                F.greatest(F.ceil((F.col("v") - F.col("lo")) / F.col("w")), F.lit(1)),
                F.lit(nb),
            )
            - 1
        )
        scored = (
            joined.withColumn("bin", sbin)
            .join(F.broadcast(hist), on=fkeys + ["bin"], how="left")
            .withColumn(
                "fscore", F.log2(F.coalesce(F.col("density"), F.lit(0.0)) + self.alpha)
            )
        )
        return scored.groupBy(*group_cols, id_col).agg(
            (F.sum("fscore") * F.lit(-1.0)).alias("score")
        )

    def _kernel_fn(self):
        return partial(_np_hbos_scores, n_bins=self.n_bins, alpha=self.alpha)


def spark_session_of(df):
    return df.sparkSession
