"""knn_join strategy dispatch: the measured exact->IVF handoff
(operators/block_knn.py IVF_HANDOFF_ROWS; VERDICT r4 item 2) and the
L2 IVF join's parity/contract (operators/similarity.py ivf_knn_join)."""

import pytest
from pyspark.sql import functions as F

from pytod_spark.operators import similarity as S
from pytod_spark.operators.block_knn import knn_join


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _rows(df):
    return {
        (r.row_id, r.rn, r.nbr_id, round(r.dist, 9)) for r in df.collect()
    }


def test_ivf_knn_full_probe_equals_exact(spark, f1_df):
    """n_probe = n_clusters probes every cell -> the IVF join is
    bit-equal to the exact tile join (the parity pin the handoff
    rests on)."""
    exact = _rows(knn_join(f1_df, 4, strategy="exact"))
    ivf = _rows(
        S.ivf_knn_join(f1_df, 4, n_clusters=4, n_iters=2, n_probe=4, n_assign=1)
    )
    assert ivf == exact and exact


def test_ivf_knn_contract(spark, f1_df):
    out = S.ivf_knn_join(f1_df, 3, n_clusters=4, n_probe=4, n_assign=1)
    first = out.where(F.col("rn") == 1)
    # self occupies the distance-0 slot, rn dense from 1
    assert first.where(
        (F.col("row_id") == F.col("nbr_id")) & (F.col("dist") == 0.0)
    ).count() == f1_df.count()


def test_auto_dispatches_past_frontier(spark, f1_df, caplog):
    """Above ivf_handoff_rows the auto strategy must produce an IVF
    plan: no quadratic tile cogroup, a WARNING naming the handoff."""
    import logging

    with caplog.at_level(logging.WARNING, logger="pytod_spark.operators.block_knn"):
        out = knn_join(f1_df, 4, strategy="auto", ivf_handoff_rows=50)
    assert "FlatMapCoGroupsInPandas" not in _plan(out)
    assert any("IVF" in r.message for r in caplog.records)
    # contract columns survive the dispatch
    assert set(out.columns) == {"row_id", "nbr_id", "dist", "rn"}
    assert out.where(F.col("rn") == 1).count() == f1_df.count()


def test_auto_stays_exact_below_frontier(spark, f1_df):
    """200 rows is far under the 1M default — auto == exact output."""
    assert _rows(knn_join(f1_df, 4)) == _rows(knn_join(f1_df, 4, strategy="exact"))


def test_ivf_strategy_rejects_ineligible_inputs(spark, f1_df):
    grouped = f1_df.withColumn("g", F.col("row_id") % 2)
    with pytest.raises(ValueError, match="ungrouped Euclidean"):
        knn_join(grouped, 4, group_cols=["g"], strategy="ivf")
    with pytest.raises(ValueError, match="ungrouped Euclidean"):
        knn_join(f1_df, 4, largest=True, strategy="ivf")
    with pytest.raises(ValueError, match="unknown strategy"):
        knn_join(f1_df, 4, strategy="bogus")


def test_grouped_auto_never_hands_off(spark, f1_df):
    """Grouped inputs keep the exact tile plan even past the row
    threshold (per-group sizes are what the frontier bounds; the
    module docstring documents the per-group rule)."""
    grouped = f1_df.withColumn("g", (F.col("row_id") % 2).cast("int"))
    out = knn_join(grouped, 3, group_cols=["g"], ivf_handoff_rows=50)
    assert "FlatMapCoGroupsInPandas" in _plan(out)
