"""ECOD detector — pure Spark SQL (bucketed two-pass ranks + joins),
no UDF, no whole-column single-task window.

Parity: pytod/models/ecod.py:82-95, including the reference's
``y[argsort]`` ECDF construction (basic_operators.py:226-244), which
is a *permutation*, not a rank: the value landing on output matrix row
``i`` of feature ``j`` is ``(pos_of_rank_i + 1) / n`` where
``pos_of_rank_i`` is the 0-based matrix position of the row holding
the i-th smallest value. See oracle.operators.ecdf_multiple for the
full derivation; "matrix position" is defined as the rank of the row
id within its group.

Plan shape (the 10^12-row one): every rank — the position assignment
and the per-feature asc/desc sort ranks — is a bucketed two-pass rank
(operators/ranking.py): approximate range boundaries split each
ranking domain into B buckets, per-bucket counts give rank offsets via
a cumulative window over <= B metadata rows, and the only full-data
exchanges are keyed by (group..., feature, bucket) — no task ever
sorts more than ~n/B rows, unlike a ``Window.partitionBy(lit(1))`` /
per-feature global-sort plan.  Group sizes come from a partial agg +
broadcast join.  (The plan still shows ``Exchange SinglePartition``
nodes: those are scalar-aggregate merges — the group-size count, the
approx-quantile boundary aggregate, and <=B-row bucket-offset frames —
each moving one partial row per upstream task; no data-bearing
exchange is single-partition, which is the property that dies at
scale.)  Then a join on (group, feature, out_pos) pairs each
output position's left/right tail probabilities, and a grouped sum
finishes the score — all JVM-side, whole-stage-codegen friendly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.ranking import bucketed_ranks, with_group_size
from ..oracle.detectors import ecod_scores as _np_ecod_scores
from .base import SparkDetector


class ECOD(SparkDetector):
    def __init__(self, contamination: float = 0.1, strategy: str = "auto"):
        super().__init__(contamination, strategy)

    def _distributed_scores(self, df, id_col, features_col, group_cols, n_rows):
        group_cols = list(group_cols)
        base = df.select(*group_cols, id_col, features_col)
        base = with_group_size(base, group_cols, out="__n")
        # matrix position = rank of the row id within its group
        base = bucketed_ranks(
            base, key=id_col, tie=id_col, part_cols=group_cols, out_asc="__pos"
        )
        # base feeds the exploded rank pipeline (bounds agg, bucket
        # counts, bucket join) and the final pos_map — 4+ consumers of
        # a join-bearing subtree; persist the narrow frame so each
        # consumer replays a cached scan instead of the rank joins.
        # Tracked (operators/cache.py) so sessions running many queries
        # can release it between queries.
        from pyspark import StorageLevel

        from ..operators.cache import track

        base = track(base.persist(StorageLevel.MEMORY_AND_DISK))
        feat = base.select(
            *group_cols,
            id_col,
            "__pos",
            "__n",
            F.posexplode(F.col(features_col).cast("array<double>")).alias("j", "v"),
        )
        # out_pos for ascending sort of X and of -X (== descending of X);
        # ties broken by position, matching the oracle's stable argsort.
        # Both ranks share one (group, j, bucket)-keyed exchange.
        ranked = bucketed_ranks(
            feat,
            key="v",
            tie="__pos",
            part_cols=group_cols + ["j"],
            out_asc="out_pos_l",
            out_desc="out_pos_r",
        ).select(
            *group_cols,
            "j",
            "out_pos_l",
            "out_pos_r",
            ((F.col("__pos") + 1).cast("double") / F.col("__n")).alias("u"),
        )
        left = ranked.select(
            *group_cols, "j", F.col("out_pos_l").alias("out_pos"), F.col("u").alias("u_l")
        )
        right = ranked.select(
            *group_cols, "j", F.col("out_pos_r").alias("out_pos"), F.col("u").alias("u_r")
        )
        o = left.join(right, on=group_cols + ["j", "out_pos"]).select(
            *group_cols,
            "out_pos",
            F.greatest(-F.log("u_l"), -F.log("u_r")).alias("o"),
        )
        scores = o.groupBy(*group_cols, "out_pos").agg(
            (F.sum("o") * F.lit(-1.0)).alias("score")
        )
        pos_map = base.select(*group_cols, id_col, F.col("__pos").alias("out_pos"))
        return scores.join(pos_map, on=group_cols + ["out_pos"]).select(
            *group_cols, id_col, "score"
        )

    def _kernel_fn(self):
        return _np_ecod_scores
