"""HBOS detector — two-pass Spark SQL (agg -> histogram -> lookup).

Parity: pytod/models/hbos.py:100-130 with both of the reference's bin
conventions reproduced faithfully:

* the histogram *counts* use torch.histc binning — floor((v-lo)/w)
  clamped to [0, n_bins-1] (max value in last bin);
* the score *lookup* uses torch.bucketize(v, edges) ==
  searchsorted(edges, side='left') == ceil((v-lo)/w) for off-edge
  values, clamped to [1, n_bins] (hbos.py:118-122) — note an exact
  interior-edge value is counted in the right bin but scored from the
  left bin; the left join + coalesce(density, 0) reproduces the
  resulting zero-density lookup.

density = count / bin_width / n (basic_operators.py:261-278);
per-feature score = log2(density + alpha); total = -sum (hbos.py:129).
"""

from __future__ import annotations

from functools import partial

from pyspark.sql import functions as F

from ..oracle.detectors import hbos_scores as _np_hbos_scores
from .base import SparkDetector


class HBOS(SparkDetector):
    def __init__(
        self,
        contamination: float = 0.1,
        n_bins: int = 10,
        alpha: float = 0.1,
        strategy: str = "distributed",
    ):
        super().__init__(contamination, strategy)
        self.n_bins = n_bins
        self.alpha = alpha

    def _distributed_scores(self, df, id_col, features_col, group_cols, n_rows):
        nb = self.n_bins
        feat = df.select(
            *group_cols,
            id_col,
            F.posexplode(F.col(features_col).cast("array<double>")).alias("j", "v"),
        )
        fkeys = group_cols + ["j"]
        stats = feat.groupBy(*fkeys).agg(
            F.min("v").alias("lo"), F.max("v").alias("hi"), F.count("v").alias("n")
        )
        # degenerate all-equal feature: width 1 keeps arithmetic finite
        # (everything lands in bin 0 / density n, mirroring a single
        # occupied bin)
        width = F.when(F.col("hi") > F.col("lo"), (F.col("hi") - F.col("lo")) / nb).otherwise(
            F.lit(1.0)
        )
        joined = feat.join(F.broadcast(stats), on=fkeys).withColumn("w", width)

        cbin = F.least(
            F.greatest(F.floor((F.col("v") - F.col("lo")) / F.col("w")), F.lit(0)),
            F.lit(nb - 1),
        )
        hist = (
            joined.withColumn("bin", cbin)
            .groupBy(*fkeys, "bin")
            .agg(F.count(F.lit(1)).alias("cnt"), F.first("w").alias("bw"), F.first("n").alias("bn"))
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
