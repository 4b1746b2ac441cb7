"""Streaming row-constraint gate — the ingest-time twin of the batch
RowConstraint check (validation/constraints.py): route arriving rows
into a clean stream and a violations stream against the same
declarative SQL rules the batch suite runs.

Pure stateless projection/filter — every predicate is a Catalyst
expression evaluated map-side inside the micro-batch, so the operator
adds no streaming state, no watermark requirement, and no shuffle;
it composes freely with the watermarked dedup/drift stages. Batch and
stream agree on semantics by construction (same NULL-hostile
``eqNullSafe(TRUE)`` evaluation, same rule names)."""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..validation.constraints import RowConstraint, _check_constraints


def streaming_constraint_split(
    stream: DataFrame,
    constraints: Iterable[RowConstraint],
) -> tuple[DataFrame, DataFrame]:
    """(clean, violations): rows satisfying every rule, and rows
    breaking >= 1 rule tagged with the sorted ``failed_constraints``
    names — exactly the batch operator's row contract, usable as two
    independent sinks (clean -> the corpus table, violations -> a
    quarantine table). Both sides are one map-only pass over the same
    micro-batch; Spark shares the scan per sink trigger."""
    cs = _check_constraints(constraints)
    failed = F.array_sort(
        F.array_compact(
            F.array(*[F.when(~c.passes(), F.lit(c.name)) for c in cs])
        )
    )
    tagged = stream.withColumn("failed_constraints", failed)
    clean = tagged.where(F.size("failed_constraints") == 0).drop(
        "failed_constraints"
    )
    violations = tagged.where(F.size("failed_constraints") > 0)
    return clean, violations
