"""Run report: condense a completed (or resumed) ValidationSuite
run_dir into one JSON-able dict for humans and pagers — per-partition
verdicts, which checks failed, and up to N example violation rows per
(partition, check).

Scale shape: the verdict table is model-sized (one row per
partition); example rows come off each violations artifact via a
rank-per-partition filter that Spark rewrites into a WindowGroupLimit
partial/final pair, so every map task pre-trims to N rows per
partition before any shuffle — the driver never sees more than
|partitions| x N x |checks| rows no matter how many billions of
violations a bad snapshot produced. Tie-break ordering hashes the
whole row (to_json), so reports are deterministic for a given
artifact regardless of file/partition layout."""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .io import has_parquet, read_string_partitioned

# violations artifact -> (report key, verdict count column that proves
# the CURRENT verdict pass found something). The count gate keeps a
# stale artifact from a prior configuration (e.g. a resume that
# dropped --parent or the constraint rules) from attaching example
# rows that contradict the verdicts beside them.
_VIOLATION_ARTIFACTS = {
    "uniqueness_violations": ("uniqueness", "n_dup_keys"),
    # integer count, NOT the rounded outlier_rate: at 10^12-row
    # partitions a few outliers round the rate to 0.0 and the example
    # rows on disk would be silently dropped (verdicts written before
    # the n_outliers column fall back to the rate in the gate below)
    "drift_violations": ("drift", "n_outliers"),
    "ri_violations": ("ri", "n_orphans"),
    "constraint_violations": ("constraints", "n_constraint_viol"),
}


def _example_frame(df: DataFrame, pcol: str, n: int, parts: list[str]) -> DataFrame:
    """Up to ``n`` deterministic example rows per partition value,
    restricted to ``parts`` (the partitions in the verdicts — stale
    hive dirs left by dropped partitions are partition-pruned away,
    not sorted and discarded). The rank<=n filter plans as a
    WindowGroupLimit partial/final pair (map-side top-n heap; gated in
    tests/test_plan_shapes.py); the hash order key makes the pick
    layout-independent."""
    others = [c for c in df.columns if c != pcol]
    key = F.xxhash64(F.to_json(F.struct(*[F.col(c) for c in others])))
    w = Window.partitionBy(pcol).orderBy(key)
    return (
        df.where(F.col(pcol).isin(parts))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n)
        .drop("__rn")
    )


def _examples_per_partition(
    df: DataFrame, pcol: str, n: int, parts: list[str]
) -> dict[str, list[dict]]:
    rows = _example_frame(df, pcol, n, parts).collect()
    out: dict[str, list[dict]] = {}
    for r in rows:
        d = r.asDict(recursive=True)
        part = str(d.pop(pcol))
        out.setdefault(part, []).append(d)
    return out


def run_report(
    spark: SparkSession,
    run_dir: str,
    partition_col: str = "lang",
    examples: int = 3,
) -> dict:
    """Summarize ``run_dir`` (a completed ValidationSuite run).

    Returns {"partitions": {part: {"pass": bool, "checks": {check:
    bool}, "counts": {...}, "examples": {check: [row, ...]}}},
    "failed_partitions": [...], "metrics": <latest metrics json>}.
    Raises FileNotFoundError when the run has no verdicts (stage B
    never completed)."""
    vdir = os.path.join(run_dir, "verdicts")
    if not has_parquet(vdir):
        raise FileNotFoundError(
            f"{vdir}: no verdicts parquet — run the suite first "
            "(stage B writes verdicts last, so a crashed run has none)"
        )
    pcol = partition_col
    # the engine writes verdicts driver-side with pyarrow precisely
    # because a Spark job's task-launch latency dwarfs these few rows;
    # read them back the same way (no job)
    import pyarrow.parquet as pq

    vtable = pq.read_table(vdir)
    if pcol not in vtable.schema.names:
        # fail fast with the actual column instead of a bare KeyError
        # from the sort below (CLI convention for report preconditions)
        known = [
            c
            for c in vtable.schema.names
            if not (c.startswith("n_") or c.endswith("_pass")
                    or c in ("outlier_rate", "psi_max"))
        ]
        raise ValueError(
            f"partition column {pcol!r} not in the run's verdict table; "
            f"this run was partitioned on {known or vtable.schema.names!r}"
        )
    verdicts = vtable.to_pylist()
    pass_cols = {
        "uniqueness": "uniqueness_pass",
        "ri": "ri_pass",
        "drift": "drift_pass",
        "dist": "dist_pass",
        "constraints": "constraint_pass",
    }
    report: dict = {"partitions": {}, "failed_partitions": []}
    for v in sorted(verdicts, key=lambda r: str(r[pcol])):
        part = str(v[pcol])
        checks = {k: bool(v[c]) for k, c in pass_cols.items() if c in v}
        entry = {
            "pass": bool(v["partition_pass"]),
            "checks": checks,
            "counts": {
                k: v[k]
                for k in (
                    "n_rows", "n_dup_keys", "n_extra_rows", "n_orphans",
                    "n_outliers", "outlier_rate", "psi_max",
                    "n_dist_drifted", "n_constraint_viol",
                    "n_constraint_failed",
                )
                if k in v
            },
            "examples": {},
        }
        report["partitions"][part] = entry
        if not entry["pass"]:
            report["failed_partitions"].append(part)

    if examples > 0:
        for artifact, (check, count_col) in _VIOLATION_ARTIFACTS.items():
            path = os.path.join(run_dir, artifact)
            if not has_parquet(path):
                continue
            # only partitions whose CURRENT verdict counts say the
            # check found something — stale artifact rows from a
            # dropped configuration never surface as examples
            parts = [
                p
                for p, e in report["partitions"].items()
                if (
                    e["counts"].get(
                        count_col,
                        # pre-n_outliers verdict tables: fall back to
                        # the rounded rate rather than dropping the gate
                        e["counts"].get("outlier_rate")
                        if count_col == "n_outliers"
                        else None,
                    )
                    or 0
                )
                > 0
            ]
            if not parts:
                continue
            # inference-safe read: a numeric-looking partition value
            # ('007') must round-trip as the string the verdicts hold,
            # or its examples would be silently dropped
            per_part = _examples_per_partition(
                read_string_partitioned(spark, path), pcol, examples, parts
            )
            for part, rows in per_part.items():
                if part in report["partitions"]:
                    report["partitions"][part]["examples"][check] = rows

        # dist-drift "examples" are the drifted (feature) report rows
        # themselves — which feature moved, by how much. The artifact
        # is already model-sized (|partitions| x |features|), so the
        # same bounded extraction applies after the drifted filter;
        # the n_dist_drifted gate mirrors the loop above.
        ddir = os.path.join(run_dir, "dist_drift")
        dist_parts = [
            p
            for p, e in report["partitions"].items()
            if (e["counts"].get("n_dist_drifted") or 0) > 0
        ]
        if dist_parts and has_parquet(ddir):
            dd = read_string_partitioned(spark, ddir)
            drifted = dd.where(
                F.greatest(F.col("psi_drifted"), F.col("ks_drifted")) > 0
            )
            for part, rows in _examples_per_partition(
                drifted, pcol, examples, dist_parts
            ).items():
                if part in report["partitions"]:
                    report["partitions"][part]["examples"]["dist"] = rows

    metas = sorted(glob.glob(os.path.join(run_dir, "metrics_*.json")))
    if metas:
        with open(metas[-1]) as fh:
            report["metrics"] = json.load(fh)
    return report
