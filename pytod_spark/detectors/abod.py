"""Fast ABOD detector — kNN join + vectorized pair kernel.

Parity: pytod/models/abod.py:119-169. The reference enumerates all
C(k, 2) neighbor pairs as a giant index list (abod.py:136-148); at
scale that explosion never becomes *rows* here — the neighbor feature
lists are gathered per row (collect_list over the kNN pair table, a
single shuffle) and the pair enumeration + weighted cosine + variance
run vectorized inside one Arrow kernel per batch of rows (k=5 -> 10
pairs/row in-register, not 10 rows/row on the wire).

Deviation: rows in groups with fewer than k+1 members are dropped
(their ABOD score is undefined) rather than erroring the whole job as
the reference does on n <= k — at 10^12 rows one tiny straggler group
must not kill the run; the drop is observable as missing row_ids.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from ..operators.block_knn import knn_join
from ..oracle.detectors import abod_scores as _np_abod_scores
from .base import SparkDetector


def _abod_batch_kernel(k: int):
    pairs = [(i, j) for i in range(k) for j in range(i + 1, k)]

    def kernel(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            A = np.stack(pdf["__feat"].to_numpy()).astype(np.float64, copy=False)
            NB = np.stack(
                [np.stack([np.asarray(e["nbr_feat"]) for e in lst]) for lst in pdf["nl"]]
            ).astype(np.float64, copy=False)  # (n, k, d)
            diffs = NB - A[:, None, :]
            n = A.shape[0]
            cos = np.empty((n, len(pairs)))
            for c, (i, j) in enumerate(pairs):
                n1, n2 = diffs[:, i, :], diffs[:, j, :]
                num = np.einsum("ij,ij->i", n1, n2)
                den = np.einsum("ij,ij->i", n1, n1) * np.einsum("ij,ij->i", n2, n2)
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos[:, c] = num / den
            score = -np.nan_to_num(cos.var(axis=1, ddof=1))
            # echo everything except the feature payloads: group
            # columns ride THROUGH the kernel (a join-back on id alone
            # would fan out / misattribute when row ids repeat across
            # groups)
            out = pdf.drop(columns=["__feat", "nl"]).copy()
            out["score"] = score
            yield out

    return kernel


class ABOD(SparkDetector):
    def __init__(
        self,
        contamination: float = 0.1,
        n_neighbors: int = 5,
        batch_size: int | None = None,
        strategy: str = "auto",
    ):
        super().__init__(contamination, strategy)
        self.n_neighbors = n_neighbors
        self.batch_size = batch_size or 4096

    def _distributed_scores(self, df, id_col, features_col, group_cols, n_rows):
        k = self.n_neighbors
        pairs = knn_join(
            df,
            k + 1,
            id_col=id_col,
            features_col=features_col,
            block_size=self.batch_size,
            group_cols=group_cols,
            n_rows=n_rows,
        ).where(F.col("rn") >= 2)  # drop self (abod.py:132)

        feats = df.select(
            *group_cols,
            F.col(id_col).alias("nbr_id"),
            F.col(features_col).cast("array<double>").alias("nbr_feat"),
        )
        # gather each row's k neighbor features, distance-ordered (abod
        # pair enumeration follows the kNN order; variance is order-
        # independent but we keep it deterministic)
        nbr_lists = (
            pairs.join(feats, on=group_cols + ["nbr_id"])
            .groupBy(*group_cols, id_col)
            .agg(F.sort_array(F.collect_list(F.struct("rn", "nbr_feat"))).alias("nl"))
        )
        # rows with fewer than k neighbors (group smaller than k+1) have
        # no defined ABOD score — drop, mirroring the reference's
        # requirement that n > n_neighbors
        nbr_lists = nbr_lists.where(F.size("nl") == k)
        joined = nbr_lists.join(
            df.select(
                *group_cols,
                F.col(id_col),
                F.col(features_col).cast("array<double>").alias("__feat"),
            ),
            on=group_cols + [id_col],
        ).withColumn("__keyid", F.col(id_col))

        scored = joined.select(*group_cols, "__keyid", "__feat", "nl")
        # group columns pass through the kernel with their INPUT types
        out_schema = ", ".join(
            [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in group_cols]
            + ["__keyid long", "score double"]
        )
        kern = _abod_batch_kernel(k)
        result = scored.mapInPandas(kern, schema=out_schema)
        return result.select(*group_cols, F.col("__keyid").alias(id_col), "score")

    def _kernel_fn(self):
        return partial(_np_abod_scores, n_neighbors=self.n_neighbors)
