"""COPOD detector — pure Spark SQL (bucketed two-pass ranks + a
broadcast skewness join), no UDF, no whole-column single-task window.

Semantics: Li et al., "COPOD: Copula-Based Outlier Detection" (ICDM
2020) — the copula-tail stage BASELINE.json's north star names.  The
reference repo ships only the successor ECOD (pytod/models/ecod.py,
no copod.py), so this detector is a value-add implemented from the
published formulation rather than a parity port; it therefore uses
row-attributable ECDFs (the rank of the row's own value, ties broken
by row id) instead of ECOD's ``y[argsort]`` permutation quirk, and
keeps the paper's sign convention (higher score = more outlying — no
trailing ``* -1``).

Per feature j with group size n:

* ``u_l = rank_asc/n``, ``u_r = rank_desc/n`` — left/right empirical
  tail probabilities (= ecdf(X), ecdf(-X) for continuous data);
* ``U_* = -ln(u_*)``; the skewness-corrected tail ``U_skew`` is
  ``U_l`` when the feature's third central moment is negative (left-
  skewed -> small values are the rare tail), else ``U_r``;
* ``score = sum_j max(U_skew, (U_l + U_r) / 2)``.

Plan shape (the 10^12-row one): both per-feature ranks come from ONE
bucketed two-pass ranking (operators/ranking.py) — the only full-data
exchanges are keyed by (group..., feature, bucket), so no task ever
sorts more than ~n/B rows; the per-feature skewness is a partial-
aggregated groupBy (d rows out) broadcast back; the score is one
grouped sum keyed by row id. All JVM-side, whole-stage-codegen
friendly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.ranking import bucketed_ranks, with_group_size
from ..oracle.detectors import copod_scores as _np_copod_scores
from .base import SparkDetector


class COPOD(SparkDetector):
    def __init__(self, contamination: float = 0.1, strategy: str = "auto"):
        super().__init__(contamination, strategy)

    def _distributed_scores(self, df, id_col, features_col, group_cols, n_rows):
        group_cols = list(group_cols)
        base = df.select(*group_cols, id_col, features_col)
        base = with_group_size(base, group_cols, out="__n")
        feat = base.select(
            *group_cols,
            id_col,
            "__n",
            F.posexplode(F.col(features_col).cast("array<double>")).alias("j", "v"),
        )
        # asc + desc ranks share one (group, j, bucket)-keyed exchange;
        # ties broken by row id on both sides (desc keeps tie asc —
        # matches the stable argsort(-X) convention of the oracle).
        ranked = bucketed_ranks(
            feat,
            key="v",
            tie=id_col,
            part_cols=group_cols + ["j"],
            out_asc="__r_l",
            out_desc="__r_r",
        )
        # per-feature skewness sign: d rows out of a partial agg,
        # broadcast back. F.skewness = m3/m2^1.5 — same sign as the
        # third central moment; null/NaN (constant feature) falls
        # through WHEN to the right tail, same as m3 == 0.
        sk = feat.groupBy(*group_cols, "j").agg(F.skewness("v").alias("__skew"))
        ranked = ranked.join(F.broadcast(sk), on=group_cols + ["j"])
        u_l = -F.log((F.col("__r_l") + 1).cast("double") / F.col("__n"))
        u_r = -F.log((F.col("__r_r") + 1).cast("double") / F.col("__n"))
        u_skew = F.when(F.col("__skew") < 0, u_l).otherwise(u_r)
        o = F.greatest(u_skew, (u_l + u_r) / 2)
        return (
            ranked.withColumn("__o", o)
            .groupBy(*group_cols, id_col)
            .agg(F.sum("__o").alias("score"))
        )

    def _kernel_fn(self):
        return _np_copod_scores
