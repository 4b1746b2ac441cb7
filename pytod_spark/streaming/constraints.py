"""Streaming row-constraint gate — the ingest-time twin of the batch
RowConstraint check (validation/constraints.py): route arriving rows
into a clean stream and a violations stream against the same
declarative SQL rules the batch suite runs.

Pure stateless projection/filter — every predicate is a Catalyst
expression evaluated map-side inside the micro-batch, so the operator
adds no streaming state, no watermark requirement, and no shuffle; it
composes freely with the watermarked dedup/drift stages. Batch and
stream agree on semantics by construction: the tag expression is the
ONE shared ``failed_constraints_col`` definition, and the same
zero-job analysis gate (``validate_constraints``) rejects typo'd
columns and non-boolean predicates at build time — streaming-frame
analysis is just as eager as batch.

Sink wiring note: ``clean`` and ``violations`` are two DataFrames; if
each is started as its OWN writeStream query, each query scans the
ingest source independently per trigger (Structured Streaming never
shares scans across queries) and the two checkpoints can sit at
different offsets. For single-pass fan-out, drive ONE query over the
tagged frame with ``foreachBatch`` and split + write both sinks from
the persisted micro-batch inside it.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..validation.constraints import (
    RowConstraint,
    _guard_reserved_tag,
    failed_constraints_col,
    validate_constraints,
)


def streaming_constraint_split(
    stream: DataFrame,
    constraints: Iterable[RowConstraint],
) -> tuple[DataFrame, DataFrame]:
    """(clean, violations): rows satisfying every rule, and rows
    breaking >= 1 rule tagged with the sorted ``failed_constraints``
    names — exactly the batch operator's row contract, usable as two
    independent sinks (clean -> the corpus table, violations -> a
    quarantine table; see the module docstring for single-pass
    fan-out)."""
    # materialize ONCE before anything iterates: a generator argument
    # would be exhausted by the validation pass and silently disable
    # every rule afterwards
    cs = list(constraints)
    _guard_reserved_tag(stream)
    validate_constraints(stream, cs)
    tagged = stream.withColumn(
        "failed_constraints", failed_constraints_col(cs)
    )
    clean = tagged.where(F.size("failed_constraints") == 0).drop(
        "failed_constraints"
    )
    violations = tagged.where(F.size("failed_constraints") > 0)
    return clean, violations
