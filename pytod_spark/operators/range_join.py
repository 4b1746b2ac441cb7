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
from .block_knn import tile_sides


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

    left, right, lkeys, rkeys = tile_sides(df, id_col, features_col, group_cols, n_blocks)

    theta = float(range_threshold)

    def tile_kernel(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if l.empty or r.empty:
            res = pd.DataFrame({"__id": [], "nbr_id": [], "dist": []}).astype(
                {"__id": "int64", "nbr_id": "int64", "dist": "float64"}
            )
        else:
            A = np.stack(l["__feat"].to_numpy()).astype(np.float64, copy=False)
            B = np.stack(r["__rfeat"].to_numpy()).astype(np.float64, copy=False)
            D = _np_cdist(A, B)
            ii, jj = np.nonzero(D <= theta)
            res = pd.DataFrame(
                {
                    "__id": l["__id"].to_numpy()[ii],
                    "nbr_id": r["__rid"].to_numpy()[jj],
                    "dist": D[ii, jj],
                }
            )
        for i, c in enumerate(group_cols):
            res.insert(i, c, l[c].iloc[0] if len(l) else None)
        return res

    out_schema = ", ".join(
        [f"`{c}` string" for c in group_cols] + ["__id long", "nbr_id long", "dist double"]
    )
    return (
        left.groupBy(*lkeys)
        .cogroup(right.groupBy(*rkeys))
        .applyInPandas(tile_kernel, schema=out_schema)
        .withColumnRenamed("__id", id_col)
    )
