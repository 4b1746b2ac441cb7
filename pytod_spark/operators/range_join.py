"""Distance-range join (all pairs within a distance threshold).

Spark-native re-expression of ``neighbor_within_range``
(pytod/models/intermediate_layers.py:92-103): emit every index pair
(i, j) with ||x_i - x_j|| <= theta — self pairs included, exactly as
the reference's ``distance_mat <= range_threshold`` mask (the diagonal
is 0 <= theta).

The fp16 filter-and-refine variants (intermediate_layers.py:25-83,
106-164) are precision optimizations with identical output; the block
kernel below computes fp64 directly.
"""

from __future__ import annotations

import math
from collections.abc import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..oracle.operators import cdist as _np_cdist


def neighbor_within_range(
    df: DataFrame,
    range_threshold: float,
    id_col: str = "row_id",
    features_col: str = "features",
    block_size: int = 4096,
    group_cols: Iterable[str] = (),
    n_rows: int | None = None,
) -> DataFrame:
    """Return ``group_cols + (row_id, nbr_id, dist)`` for pairs with
    dist <= range_threshold (self pairs included)."""
    group_cols = list(group_cols)
    n = n_rows if n_rows is not None else df.count()
    n_blocks = max(1, math.ceil(n / block_size))

    base = df.select(
        *group_cols,
        F.col(id_col).cast("long").alias("__id"),
        F.col(features_col).cast("array<double>").alias("__feat"),
    )
    block = F.pmod(F.xxhash64(F.col("__id")), F.lit(n_blocks)).cast("int")
    tiles = F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1)))
    left = base.withColumn("__bl", block).withColumn("__br", tiles)
    right = base.withColumn("__br", block).withColumn("__bl", tiles)
    keys = group_cols + ["__bl", "__br"]

    theta = float(range_threshold)

    def tile_kernel(key, l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if l.empty or r.empty:
            res = pd.DataFrame({"__id": [], "nbr_id": [], "dist": []}).astype(
                {"__id": "int64", "nbr_id": "int64", "dist": "float64"}
            )
        else:
            A = np.stack(l["__feat"].to_numpy()).astype(np.float64, copy=False)
            B = np.stack(r["__feat"].to_numpy()).astype(np.float64, copy=False)
            D = _np_cdist(A, B)
            ii, jj = np.nonzero(D <= theta)
            res = pd.DataFrame(
                {
                    "__id": l["__id"].to_numpy()[ii],
                    "nbr_id": r["__id"].to_numpy()[jj],
                    "dist": D[ii, jj],
                }
            )
        for i, c in enumerate(group_cols):
            res.insert(i, c, key[i])
        return res

    out_schema = ", ".join(
        [f"`{c}` string" for c in group_cols] + ["__id long", "nbr_id long", "dist double"]
    )
    return (
        left.groupBy(*keys)
        .cogroup(right.groupBy(*keys))
        .applyInPandas(tile_kernel, schema=out_schema)
        .withColumnRenamed("__id", id_col)
    )
