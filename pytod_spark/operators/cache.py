"""Tracked persist handles.

Operators that persist a multi-consumer subtree (ECOD's ranked base,
MinHash's shingle frame) register the handle here so long-lived
sessions — the bench harness, the validation engine, a notebook — can
release executor memory/disk between queries instead of waiting for
LRU eviction pressure. The returned DataFrames stay lazy, so the
operator itself cannot unpersist (the final action happens at the
caller); tracking the handle is the contract instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_HANDLES: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Register a persisted DataFrame for later release; returns it."""
    _HANDLES.append(df)
    return df


def release_all() -> int:
    """Unpersist every tracked handle (blocking=False); returns count."""
    n = 0
    while _HANDLES:
        df = _HANDLES.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n
