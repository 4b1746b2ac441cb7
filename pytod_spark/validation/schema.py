"""Schema-contract check — the literal "schema" in the north rule's
schema + constraint engine.

Pure driver-side metadata comparison (ZERO Spark jobs): the input
DataFrame's StructType is checked against the declared contract
before any data is read, so a drifted upstream writer (renamed
column, string->binary content, dropped commit) fails in
milliseconds instead of after a 100-TB feature scan. Nullability is
deliberately not part of the contract — parquet footers routinely
disagree with catalog nullability, and the engine's null-rate column
stat measures the thing that matters (validation/stats.py).

Type names are Spark's ``DataType.simpleString()`` ("string",
"bigint", "array<double>", ...).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: The corpus contract of the validation engine's input table
#: (repo, path, commit, lang, content) — all strings.
CORPUS_CONTRACT: dict[str, str] = {
    "repo": "string",
    "path": "string",
    "commit": "string",
    "lang": "string",
    "content": "string",
}


def schema_violations(
    df: DataFrame,
    contract: dict[str, str] | None = None,
    strict: bool = False,
) -> list[dict]:
    """Compare ``df``'s schema to ``contract`` (column name -> Spark
    simpleString type). Returns one violation dict per problem:
    ``{"column", "violation": missing|type_mismatch|unexpected,
    "expected", "actual"}``. Empty list == contract satisfied.
    ``strict=True`` also flags columns outside the contract (off by
    default: engines commonly run over projections of wider tables).
    """
    contract = CORPUS_CONTRACT if contract is None else contract
    present = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    out: list[dict] = []
    for name, want in contract.items():
        if name not in present:
            out.append(
                {"column": name, "violation": "missing",
                 "expected": want, "actual": None}
            )
        elif present[name] != want:
            out.append(
                {"column": name, "violation": "type_mismatch",
                 "expected": want, "actual": present[name]}
            )
    if strict:
        for name, actual in present.items():
            if name not in contract:
                out.append(
                    {"column": name, "violation": "unexpected",
                     "expected": None, "actual": actual}
                )
    return out


class SchemaContractError(ValueError):
    """Raised by the engine when the input violates the contract."""

    def __init__(self, violations: list[dict]):
        self.violations = violations
        detail = "; ".join(
            f"{v['column']}: {v['violation']}"
            + (f" (expected {v['expected']}, got {v['actual']})"
               if v["violation"] == "type_mismatch" else "")
            for v in violations
        )
        super().__init__(f"input schema violates contract: {detail}")
