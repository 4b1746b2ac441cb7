"""Stateful streaming drift detection: per-group CUSUM over the
frozen-model outlier indicator, via ``applyInPandasWithState``.

The windowed outlier-rate alert (drift_monitor.drift_alerts) is
memoryless across windows; a slow drift that never pushes one window
over the rate threshold stays invisible. CUSUM accumulates evidence
across micro-batches: with x_t the outlier indicator and k the
expected rate (contamination + slack), the statistic

    c_t = max(0, c_{t-1} + x_t - k)

grows without bound only under sustained excess rate and resets under
the null. State per group is two scalars (c, n_seen) — the smallest
possible state footprint, partitioned by group key, so the stateful
stage scales horizontally like any keyed aggregation.

In-batch the recurrence is evaluated as a vectorized prefix-sum scan
(c_i = S_i - min(cummin(S)_i, -c_0), S = cumsum(x - k)) — no per-row
Python, matching the loop recurrence exactly (asserted in tests).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .drift_monitor import score_stream

_OUT_SCHEMA = StructType(
    [
        StructField("group", StringType()),
        StructField("n_seen", LongType()),
        StructField("cusum", DoubleType()),
        StructField("alert", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("cusum", DoubleType()), StructField("n_seen", LongType())]
)


def _cusum_scan(x: np.ndarray, k: float, c0: float) -> np.ndarray:
    """c_i = max(0, c_{i-1} + x_i - k), c at index -1 = c0, as a scan:
    with S_i = cumsum(x - k), c_i = S_i - min(-c0, min_{j<=i} S_j)."""
    s = np.cumsum(np.asarray(x, dtype=np.float64) - k)
    run_min = np.minimum.accumulate(np.concatenate(([-float(c0)], s)))[1:]
    return s - run_min


def cusum_drift_stream(
    stream: DataFrame,
    model: dict,
    value_col: str,
    group_col: str,
    ts_col: str = "ts",
    target_rate: float | None = None,
    alarm: float = 5.0,
) -> DataFrame:
    """One output row per (group, micro-batch) with the updated CUSUM
    statistic and alert flag; state survives across batches."""
    k = target_rate if target_rate is not None else 0.15
    scored = score_stream(stream, model, value_col)

    def update(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: Any
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            c0, n0 = state.get
        else:
            c0, n0 = 0.0, 0
        c, n = float(c0), int(n0)
        # the batch arrives as MULTIPLE Arrow chunks when a group
        # exceeds arrow.maxRecordsPerBatch; the recurrence is
        # ts-order-dependent, so sort ONCE across the whole batch —
        # per-chunk sorts would scan interleaved ts ranges in arrival
        # order
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            batch = pd.concat(chunks, ignore_index=True).sort_values(ts_col)
            cs = _cusum_scan(batch["label"].to_numpy(), k, c)
            c = float(cs[-1])
            n += len(batch)
        state.update((c, n))
        yield pd.DataFrame(
            {
                "group": [key[0]],
                "n_seen": [n],
                "cusum": [c],
                "alert": [1 if c > alarm else 0],
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return scored.groupBy(group_col).applyInPandasWithState(
        update,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
