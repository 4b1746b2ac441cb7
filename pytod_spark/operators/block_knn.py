"""Distributed two-stage kNN self/cross join.

This is the Spark-native re-expression of the reference's batched kNN
(map step ``pytod/models/intermediate_layers.py:167-211`` "this is the
map step", reduce step ``:214-227`` "this is the reduce step"):

* rows are assigned to blocks; every (block_A, block_B) tile is a
  cogroup key (the reference's double loop over ``get_batch_index``
  tiles, utility.py:70-103);
* an Arrow kernel computes the tile's pairwise distances and keeps
  only the per-row bottom-k **within the tile** — the partial top-k
  pushed below the shuffle that the reference hand-codes at
  intermediate_layers.py:200-209 (Catalyst cannot see inside a UDF, so
  the plan shape encodes it: each tile emits ≤ k rows per left row,
  never the n×n distance matrix);
* the final merge is a plain window top-k (``row_number() <= k``),
  Spark's equivalent of ``get_knn_from_intermediate``'s argsort+gather.

Scale notes: shuffle volume is O(2·n·B) replicated feature rows plus
O(n·B·k) candidate rows for B = ceil(n / block_size) blocks — never
O(n^2). Blocks are hash-assigned (uniform), AQE handles residual skew,
and the whole pipeline is expressed on DataFrames so Catalyst prunes
columns into the exchange.

Exact -> IVF handoff policy (measured: scripts/knn_frontier.py,
BENCH/knn_frontier.json): tile COMPUTE is quadratic in group size n
(B^2 tiles of block_size^2 distance pairs) while shuffle grows only
linearly in B, so past the frontier the exact join is compute-bound at
~n^2·d/(cluster FLOP/s). Measured on this 32-thread host
(BENCH/knn_frontier.json): 250k x 20 in 267s steady, 500k in 435s,
1M x 20 in 2,202s = 36.7 min — inside the reference's ">1M within an
hour" GPU claim (README.rst:64) on CPU alone, with exact output.
Since round 5 the handoff is CODE, not policy: ``knn_join``'s default
``strategy='auto'`` dispatches ungrouped Euclidean inputs past
``IVF_HANDOFF_ROWS`` to ``similarity.ivf_knn_join`` (with a WARNING —
approximate past the frontier, ``strategy='exact'`` opts out). The
crossover rule per GROUP (groups are independent — only same-group
tiles pair):

* n <= ~1M per group — run this exact join (block_size 4096-8192;
  pick block_size ~ sqrt(n)·64 to keep B in the hundreds and tasks
  ~1s);
* n above the frontier, or many groups near it — hand off to
  ``operators/similarity.ivf_topk`` (equi-join on coarse cells:
  candidate volume n·(n_assign·n_probe/C)·avg_cell, tunable recall,
  recall shipped per bench artifact) and keep the exact join for the
  final verification of flagged rows only;
* distance-threshold (not top-k) semantics at scale — the banded
  RP-LSH path (``ann_neardup_pairs``), same handoff reasoning.
"""

from __future__ import annotations

import math
from collections.abc import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..oracle.operators import bottomk as _np_bottomk
from ..oracle.operators import cdist as _np_cdist
from ..oracle.operators import topk as _np_topk


def _features_matrix(col: pd.Series) -> np.ndarray:
    return np.stack(col.to_numpy()).astype(np.float64, copy=False)


def estimate_rows(df: DataFrame):
    """Row count from the optimizer's plan statistics when provable
    (e.g. a bare parquet scan's footer metadata); None otherwise.

    Tile planning only needs n to size the block grid, so callers use
    this to skip the extra count job: ``n_rows or estimate_rows(df) or
    df.count()`` (the count fallback on a columnar source prunes to
    zero columns — cheap, but still a scheduled job)."""
    try:
        plan = df._jdf.queryExecution().optimizedPlan()
        rc = plan.stats().rowCount()
        if rc.isDefined():
            return int(str(rc.get()))
        if plan.getClass().getSimpleName() == "LocalRelation":
            return int(plan.data().size())
    except Exception:
        pass
    return None


# leaves whose data lives on (or came through) the driver — counting
# them re-evaluates bounded local data, cheap by construction.
# createDataFrame produces LogicalRDD (sizeInBytes = Long.MaxValue,
# i.e. "unknown", despite being a handful of local rows).
_LOCAL_LEAVES = ("LocalRelation", "LogicalRDD")
_UNKNOWN_SIZE = (1 << 63) - 1


def _cheap_count_ok(df: DataFrame, max_bytes: int = 256 << 20) -> bool:
    """True when counting ``df`` is provably cheap: every leaf of the
    optimized plan is either driver-local data or a relation whose
    estimated size totals under ``max_bytes`` — lineage over a few
    hundred MB of source is bounded work no matter what sits above
    it. Plan inspection only, no job; an unknown-size non-local leaf
    makes the answer False."""
    try:
        leaves = df._jdf.queryExecution().optimizedPlan().collectLeaves()
        total = 0
        for i in range(leaves.size()):
            leaf = leaves.apply(i)
            if leaf.getClass().getSimpleName() in _LOCAL_LEAVES:
                continue
            size = int(str(leaf.stats().sizeInBytes()))
            if size >= _UNKNOWN_SIZE:
                return False
            total += size
        return total <= max_bytes
    except Exception:
        return False


def _lowprec_bottomk(A: np.ndarray, B: np.ndarray, kk: int, p: float):
    """Filter-and-refine bottom-k: fp32 pass + exact fp64 recheck of
    ambiguous rows.

    Parity with the reference's provable-quantization pattern
    (basic_operators.py:96-137 bottomk_low_prec /
    intermediate_layers.py:106-164): compute in low precision, find
    rows whose (k-1)/k/(k+1) neighbor distances collide within the
    reduced precision (the ambiguity band), recompute only those rows
    exactly. Distances returned are always exact fp64 (the reference
    gathers final distances from the original-precision matrix,
    basic_operators.py:128).
    """
    D32 = _np_cdist(A.astype(np.float32), B.astype(np.float32), p=p).astype(np.float32)
    k1 = min(kk + 1, B.shape[0])
    vals32, inds = _np_bottomk(D32, k1)
    if k1 > kk:
        amb = (vals32[:, kk] <= vals32[:, kk - 1]) | (
            vals32[:, kk - 2] >= vals32[:, kk - 1] if kk >= 2 else False
        )
        amb_rows = np.nonzero(amb)[0]
        if amb_rows.size:
            D64 = _np_cdist(A[amb_rows], B, p=p)
            _, exact_inds = _np_bottomk(D64, kk)
            inds[amb_rows, :kk] = exact_inds
        inds = inds[:, :kk]
    # exact distances for the selected pairs only (n*kk, not n*m, fp64 work)
    sel = B[inds.ravel()].reshape(inds.shape[0], kk, -1)
    if p == 2.0:
        dists = np.sqrt(((sel - A[:, None, :]) ** 2).sum(axis=2))
    else:
        dists = (np.abs(sel - A[:, None, :]) ** p).sum(axis=2) ** (1.0 / p)
    order = np.argsort(dists, axis=1, kind="stable")
    return np.take_along_axis(dists, order, axis=1), np.take_along_axis(inds, order, axis=1)


def _lowprec_topk(A: np.ndarray, B: np.ndarray, kk: int, p: float):
    """Filter-and-refine top-k (largest distances) mirror of
    ``_lowprec_bottomk``.

    Parity with the reference's ``topk_low_prec``
    (basic_operators.py:140-182): fp32 pass, top-(k+1); a row is
    ambiguous when reduced precision can no longer separate ranks
    k-2/k-1/k; ambiguous rows re-rank exactly; distances are always
    re-derived at fp64 for the selected pairs, so the output equals the
    exact top-k whenever the precision bound holds.
    """
    D32 = _np_cdist(A.astype(np.float32), B.astype(np.float32), p=p).astype(np.float32)
    k1 = min(kk + 1, B.shape[0])
    vals32, inds = _np_topk(D32, k1)
    if k1 > kk:
        amb = (vals32[:, kk] >= vals32[:, kk - 1]) | (
            vals32[:, kk - 2] <= vals32[:, kk - 1] if kk >= 2 else False
        )
        amb_rows = np.nonzero(amb)[0]
        if amb_rows.size:
            D64 = _np_cdist(A[amb_rows], B, p=p)
            _, exact_inds = _np_topk(D64, kk)
            inds[amb_rows, :kk] = exact_inds
        inds = inds[:, :kk]
    sel = B[inds.ravel()].reshape(inds.shape[0], kk, -1)
    if p == 2.0:
        dists = np.sqrt(((sel - A[:, None, :]) ** 2).sum(axis=2))
    else:
        dists = (np.abs(sel - A[:, None, :]) ** p).sum(axis=2) ** (1.0 / p)
    order = np.argsort(-dists, axis=1, kind="stable")
    return np.take_along_axis(dists, order, axis=1), np.take_along_axis(inds, order, axis=1)


def _tile_kernel_factory(k: int, p: float, precision: str = "high", largest: bool = False):
    def tile_kernel(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty or right.empty:
            return pd.DataFrame({"__id": [], "nbr_id": [], "dist": []}).astype(
                {"__id": "int64", "nbr_id": "int64", "dist": "float64"}
            )
        A = _features_matrix(left["__feat"])
        B = _features_matrix(right["__rfeat"])
        kk = min(k, B.shape[0])
        if largest:
            if precision == "low":
                vals, inds = _lowprec_topk(A, B, kk, p)
            else:
                vals, inds = _np_topk(_np_cdist(A, B, p=p), kk)
        elif precision == "low":
            vals, inds = _lowprec_bottomk(A, B, kk, p)
        else:
            vals, inds = _np_bottomk(_np_cdist(A, B, p=p), kk)
        rid = np.repeat(left["__id"].to_numpy(), kk)
        nbr = right["__rid"].to_numpy()[inds.ravel()]
        return pd.DataFrame({"__id": rid, "nbr_id": nbr, "dist": vals.ravel()})

    return tile_kernel


def tile_sides(df, id_col, features_col, group_cols, n_blocks):
    """Build the (left, right, left_keys, right_keys) tile frames for a
    self cogroup join.

    The right side gets entirely fresh column aliases (``__r*``): a
    cogroup of two frames sharing lineage mis-binds the right side's
    data columns to the left's expression ids (the analyzed plan shows
    FlatMapCoGroupsInPandas referencing left exprIds for the right
    child), which the optimizer may then prune away. Fresh aliases on
    every right column give the right child disjoint attribute ids, so
    no dedup/mis-binding can occur.
    """
    block_of = lambda c: F.pmod(F.xxhash64(F.col(c)), F.lit(n_blocks)).cast("int")  # noqa: E731
    tiles = F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1)))

    base = df.select(
        *group_cols,
        F.col(id_col).cast("long").alias("__id"),
        F.col(features_col).cast("array<double>").alias("__feat"),
    )
    left = base.withColumn("__bl", block_of("__id")).withColumn("__br", tiles)

    rbase = df.select(
        *[F.col(c).alias(f"__r_{c}") for c in group_cols],
        F.col(id_col).cast("long").alias("__rid"),
        F.col(features_col).cast("array<double>").alias("__rfeat"),
    )
    right = rbase.withColumn("__rbr", block_of("__rid")).withColumn("__rbl", tiles)

    left_keys = list(group_cols) + ["__bl", "__br"]
    right_keys = [f"__r_{c}" for c in group_cols] + ["__rbl", "__rbr"]
    return left, right, left_keys, right_keys


#: Exact->IVF handoff threshold for ``knn_join(strategy='auto')``, in
#: rows per (ungrouped) input. Grounded by the measured frontier
#: (scripts/knn_frontier.py, BENCH/knn_frontier.json): exact tile kNN
#: on this 32-thread host runs 250k rows in 267s, 500k in 435s, 1M in
#: 2,202s (36.7 min) — the module docstring's "n <= ~1M per group runs
#: exact" rule. Above it the quadratic tile compute dominates and the
#: IVF equi-join path (similarity.ivf_knn_join) takes over with a
#: logged WARNING (approximate: recall < 1 by IVF design).
IVF_HANDOFF_ROWS = 1_000_000

#: Default broadcast-side budget for the small-input fast path, in
#: fp64 feature ELEMENTS (n_rows x dim): 8M elements = 64 MB — the
#: same order as a comfortable BroadcastExchange build side. At or
#: under this, the whole feature matrix ships once per executor and
#: the kNN needs ZERO shuffles; above it, the tile cogroup join runs.
BROADCAST_MAX_ELEMS = 8 << 20


def fits_broadcast_budget(
    df: DataFrame,
    features_col: str = "features",
    n_rows: int | None = None,
    budget: int = BROADCAST_MAX_ELEMS,
    probe_jobs: bool = True,
) -> bool:
    """THE small-input gate, shared by every fast path that would
    otherwise re-implement it (kNN broadcast join here, the detectors'
    ``strategy='auto'`` kernel dispatch in detectors/base.py, the
    driver-local IVF Lloyd in operators/similarity.py — one definition
    so tuning the budget tunes all three). True when n x dim fits
    ``budget`` fp64 elements: n from ``n_rows`` if given, else plan
    statistics (``estimate_rows``), else a pruned count job; dim from
    one head row. ``budget=0`` disables (always False).

    ``probe_jobs=False`` bounds the count fallback: when the optimizer
    cannot prove a row count, the count job runs only if the plan's
    leaves are provably small (``_cheap_count_ok``) — otherwise answer
    False (take the distributed path) instead of executing a large
    frame's entire upstream lineage just to pick a strategy. This is
    the default for ``strategy='auto'`` dispatch, where an unprovable
    big input is exactly the derived frame that resolves to
    'distributed' anyway and would pay the probe twice."""
    if not budget:
        return False
    n = n_rows if n_rows is not None else estimate_rows(df)
    if n is None:
        if not probe_jobs and not _cheap_count_ok(df):
            return False
        n = df.count()
    if not 0 < n <= budget:
        return False
    head = df.select(features_col).head(1)
    dim = len(head[0][0]) if head and head[0][0] is not None else None
    return bool(dim and n * dim <= budget)


def _broadcast_knn(
    df: DataFrame,
    k: int,
    id_col: str,
    features_col: str,
    p: float,
    precision: str,
    largest: bool,
) -> DataFrame:
    """Shuffle-free kNN for inputs whose feature matrix fits a
    broadcast (the kNN analogue of a broadcast hash join): gather the
    (id, features) matrix driver-side — the exact data volume a
    BroadcastExchange build side would gather — broadcast it sorted by
    id, and let ONE ``mapInPandas`` pass emit each row's final top-k.
    No cogroup shuffle, no candidate shuffle, no window sort: the
    per-batch kernel already sees the full right side, so its bottom-k
    IS the answer. Output contract identical to the tile path:
    (row_id, nbr_id, dist, rn), rn = 1..k by (dist asc, nbr_id asc)
    [desc for ``largest``] — the broadcast side is id-sorted and the
    kernels' stable argsort breaks ties by position = id.
    """
    base = df.select(
        F.col(id_col).cast("long").alias("__id"),
        F.col(features_col).cast("array<double>").alias("__feat"),
    )
    # Arrow collection: .collect() would materialize one Python Row +
    # list per record (~20-50x the matrix's 64 MB budget in driver
    # heap); toPandas ships Arrow batches and stacks straight to numpy
    pdf = base.toPandas()
    ids = pdf["__id"].to_numpy(dtype=np.int64)
    M = np.stack(pdf["__feat"].to_numpy()).astype(np.float64, copy=False)
    order = np.argsort(ids, kind="stable")
    ids, M = ids[order], np.ascontiguousarray(M[order])
    bc = df.sparkSession.sparkContext.broadcast((ids, M))
    kk = min(k, len(ids))

    def kernel(it):
        bids, BM = bc.value
        for pdf in it:
            if not len(pdf):
                continue
            A = _features_matrix(pdf["__feat"])
            if largest:
                if precision == "low":
                    vals, inds = _lowprec_topk(A, BM, kk, p)
                else:
                    vals, inds = _np_topk(_np_cdist(A, BM, p=p), kk)
            elif precision == "low":
                vals, inds = _lowprec_bottomk(A, BM, kk, p)
            else:
                vals, inds = _np_bottomk(_np_cdist(A, BM, p=p), kk)
            yield pd.DataFrame(
                {
                    "__id": np.repeat(pdf["__id"].to_numpy(), kk),
                    "nbr_id": bids[inds.ravel()],
                    "dist": vals.ravel(),
                    "rn": np.tile(np.arange(1, kk + 1, dtype=np.int32), len(pdf)),
                }
            )

    out = base.mapInPandas(kernel, schema="__id long, nbr_id long, dist double, rn int")
    return out.withColumnRenamed("__id", id_col)


def knn_join(
    df: DataFrame,
    k: int,
    id_col: str = "row_id",
    features_col: str = "features",
    block_size: int = 4096,
    p: float = 2.0,
    group_cols: Iterable[str] = (),
    n_rows: int | None = None,
    precision: str = "high",
    largest: bool = False,
    broadcast_elems: int = BROADCAST_MAX_ELEMS,
    strategy: str = "auto",
    ivf_handoff_rows: int = IVF_HANDOFF_ROWS,
) -> DataFrame:
    """Self kNN join: for every row, its k nearest rows (self included,
    occupying the distance-0 slot, as in pytod knn.py:100-108).

    Returns ``group_cols + (row_id, nbr_id, dist, rn)`` with
    ``rn = 1..k`` ordered by (dist asc, nbr_id asc) — or, with
    ``largest=True`` (the reference's ``topk`` family,
    basic_operators.py:54-75/:140-182), the k FARTHEST rows ordered by
    (dist desc, nbr_id asc); each tile then keeps its per-row partial
    top-k, same shuffle math.

    Strategy dispatch (``strategy``):

    * ``'auto'`` (default) — broadcast path for small inputs (below),
      exact tile cogroup in the middle, and PAST THE MEASURED FRONTIER
      (``ivf_handoff_rows``, default 1M — BENCH/knn_frontier.json puts
      1M rows at 36.7 min on 32 threads and the cost is quadratic from
      there) an ungrouped Euclidean input hands off to the IVF
      equi-join path (``similarity.ivf_knn_join``) with a WARNING:
      output contract identical, results APPROXIMATE (recall < 1 —
      exact-rechecking flagged rows is the caller's move, module
      docstring). Grouped, non-L2 (p != 2) and ``largest`` inputs
      never hand off (IVF prunes by nearest-centroid, which bounds
      nothing for farthest-k); they stay exact at any size.
    * ``'exact'`` — never hand off (the pre-round-5 behavior);
    * ``'ivf'`` — force the IVF path regardless of size (its
      ``n_probe >= n_clusters`` setting reproduces exact output, the
      parity pin in tests).

    Small ungrouped inputs (n x dim <= ``broadcast_elems`` fp64
    elements; 0 disables) take the shuffle-free broadcast path
    (``_broadcast_knn``) — same exact output, no exchanges.
    """
    import logging

    group_cols = list(group_cols)
    if strategy not in ("auto", "exact", "ivf"):
        raise ValueError(f"unknown strategy {strategy!r}: auto|exact|ivf")
    n = n_rows if n_rows is not None else (estimate_rows(df) or df.count())
    ivf_eligible = not group_cols and not largest and p == 2.0
    if strategy == "ivf" or (
        strategy == "auto" and ivf_eligible and ivf_handoff_rows and n > ivf_handoff_rows
    ):
        if not ivf_eligible:
            raise ValueError(
                "strategy='ivf' needs an ungrouped Euclidean (p=2) "
                "nearest-k join — grouped/farthest/p!=2 inputs have no "
                "IVF pruning bound"
            )
        from .similarity import ivf_knn_join

        if strategy == "auto":
            logging.getLogger(__name__).warning(
                "knn_join: n=%d exceeds the exact-join frontier (%d rows, "
                "BENCH/knn_frontier.json) — dispatching to the IVF "
                "equi-join path; results are approximate (recall < 1). "
                "Force strategy='exact' to keep the quadratic tile plan.",
                n, ivf_handoff_rows,
            )
        return ivf_knn_join(
            df, k, id_col=id_col, features_col=features_col, n_rows=n
        )
    if not group_cols and fits_broadcast_budget(
        df, features_col, n_rows=n, budget=broadcast_elems
    ):
        return _broadcast_knn(df, k, id_col, features_col, p, precision, largest)
    n_blocks = max(1, math.ceil(n / block_size))

    # left row of block i joins every tile (i, *); right row of block j
    # joins every tile (*, j) — the all-pairs tile loop of the reference,
    # expressed as a cogroup so each tile is one Arrow kernel call.
    left, right, lkeys, rkeys = tile_sides(df, id_col, features_col, group_cols, n_blocks)

    # group columns keep their INPUT types (an int cluster_id from an
    # IVF assignment must not come back as string)
    out_schema = ", ".join(
        [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in group_cols]
        + ["__id long", "nbr_id long", "dist double"]
    )
    kernel = _tile_kernel_factory(k, p, precision, largest)
    if group_cols:
        # group values are read from the left frame (empty-left tiles
        # emit nothing anyway)
        def keyed_kernel(l, r):
            res = kernel(l, r)
            for i, c in enumerate(group_cols):
                res.insert(i, c, l[c].iloc[0] if len(l) else None)
            return res

        candidates = (
            left.groupBy(*lkeys)
            .cogroup(right.groupBy(*rkeys))
            .applyInPandas(keyed_kernel, schema=out_schema)
        )
    else:
        candidates = (
            left.groupBy(*lkeys)
            .cogroup(right.groupBy(*rkeys))
            .applyInPandas(kernel, schema=out_schema)
        )

    order = F.col("dist").desc() if largest else F.col("dist").asc()
    w = Window.partitionBy(*(group_cols + ["__id"])).orderBy(order, F.col("nbr_id").asc())
    return (
        candidates.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .withColumnRenamed("__id", id_col)
    )


def knn_scores_df(
    df: DataFrame,
    n_neighbors: int = 5,
    id_col: str = "row_id",
    features_col: str = "features",
    block_size: int = 4096,
    group_cols: Iterable[str] = (),
    n_rows: int | None = None,
    precision: str = "high",
) -> DataFrame:
    """KNN outlier score = k-th true-neighbor distance.

    Parity: pytod/models/knn.py:100-108 — knn over k+1 (self in slot 1),
    score = last column.

    Rows in a group SMALLER than n_neighbors+1 (out-of-contract for
    the reference, whose numpy argpartition would just error) score
    against their farthest AVAILABLE neighbor instead of silently
    vanishing from the output — a rank clamp via one more window over
    the partitioning the rank already used (no new exchange)."""
    pairs = knn_join(
        df,
        n_neighbors + 1,
        id_col=id_col,
        features_col=features_col,
        block_size=block_size,
        group_cols=group_cols,
        n_rows=n_rows,
        precision=precision,
    )
    w = Window.partitionBy(*group_cols, id_col)
    return (
        pairs.withColumn("__maxrn", F.max("rn").over(w))
        .where(F.col("rn") == F.least(F.lit(n_neighbors + 1), F.col("__maxrn")))
        .select(*group_cols, id_col, F.col("dist").alias("score"))
    )


def farthest_scores_df(
    df: DataFrame,
    k: int = 5,
    id_col: str = "row_id",
    features_col: str = "features",
    block_size: int = 4096,
    group_cols: Iterable[str] = (),
    n_rows: int | None = None,
    precision: str = "high",
) -> DataFrame:
    """k-th FARTHEST distance per row — the Spark surface of the
    reference's ``topk``/``topk_low_prec`` distance family
    (basic_operators.py:54-75 / :140-182), the building block of
    farthest-point/diversity sampling. ``precision='low'`` runs the
    fp32 filter-and-refine tile kernel whose output equals the exact
    one whenever the precision bound holds (by the same construction
    as the bottom-k path)."""
    pairs = knn_join(
        df,
        k,
        id_col=id_col,
        features_col=features_col,
        block_size=block_size,
        group_cols=group_cols,
        n_rows=n_rows,
        precision=precision,
        largest=True,
    )
    # same small-group rank clamp as knn_scores_df
    w = Window.partitionBy(*group_cols, id_col)
    return (
        pairs.withColumn("__maxrn", F.max("rn").over(w))
        .where(F.col("rn") == F.least(F.lit(k), F.col("__maxrn")))
        .select(*group_cols, id_col, F.col("dist").alias("score"))
    )
