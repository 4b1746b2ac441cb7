"""Run-report surface (validation/report.py): verdict condensation,
bounded deterministic example rows per (partition, check), and the
CLI `report` subcommand."""

import json
import os

import pytest

from pytod_spark import cli
from pytod_spark.datagen import generate_repo_table, repo_commits_dim
from pytod_spark.validation import RowConstraint, ValidationSuite, run_report

N = 3000


@pytest.fixture(scope="module")
def run_dir(spark, tmp_path_factory):
    """One completed suite run with injected dup/orphan/drift bugs
    plus an always-failing constraint."""
    corpus = generate_repo_table(spark, N, seed=42, anomaly_every=10)
    parent = repo_commits_dim(spark, N, seed=42)
    rd = str(tmp_path_factory.mktemp("report") / "run")
    suite = ValidationSuite(
        contamination=0.1,
        constraints=[RowConstraint("impossible", "content_length < 0")],
    )
    suite.run(spark, corpus, rd, parent=parent)
    return rd


def test_report_structure_and_bounds(spark, run_dir):
    rep = run_report(spark, run_dir, examples=2)
    assert rep["partitions"] and "metrics" in rep
    # the impossible constraint fails every partition
    assert sorted(rep["failed_partitions"]) == sorted(rep["partitions"])
    for part, entry in rep["partitions"].items():
        assert entry["checks"]["constraints"] is False
        assert entry["pass"] is False
        assert entry["counts"]["n_constraint_viol"] > 0
        for check, rows in entry["examples"].items():
            assert 1 <= len(rows) <= 2, (part, check)
            for r in rows:
                # plain dicts (json-serializable), partition col popped
                assert isinstance(r, dict) and "lang" not in r
    # every partition has constraint violations -> examples present
    assert all(
        "constraints" in e["examples"] for e in rep["partitions"].values()
    )


def test_report_deterministic_and_examples_off(spark, run_dir):
    a = run_report(spark, run_dir, examples=3)
    b = run_report(spark, run_dir, examples=3)
    assert a["partitions"] == b["partitions"]
    none = run_report(spark, run_dir, examples=0)
    assert all(e["examples"] == {} for e in none["partitions"].values())


def test_report_missing_run_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError, match="no verdicts"):
        run_report(spark, str(tmp_path / "nope"))


def test_cli_report_emits_json(spark, run_dir, capsys):
    rc = cli.main(["report", "--run-dir", run_dir, "--examples", "1"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["failed_partitions"]
    assert os.path.isdir(run_dir)


def test_cli_report_rejects_bad_run_dir_before_any_scan(tmp_path):
    with pytest.raises(SystemExit) as e:
        cli.main(["report", "--run-dir", str(tmp_path / "nope")])
    assert e.value.code == 2


def test_numeric_looking_partition_values_keep_their_examples(spark, tmp_path):
    """Hive partition type inference rewrites lang=007 to int 7 on a
    naive read; the report's inference-safe read must keep the
    examples keyed by the exact string the verdicts hold."""
    rows = [
        ("r1", f"p{i}", "c1", lang, f"text {i} " + "x" * (i % 7))
        for i in range(40)
        for lang in ("007", "en")
    ]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    rd = str(tmp_path / "run007")
    suite = ValidationSuite(
        contamination=0.1,
        constraints=[RowConstraint("impossible", "content_length < 0")],
    )
    suite.run(spark, df, rd)
    rep = run_report(spark, rd, examples=2)
    assert set(rep["partitions"]) == {"007", "en"}
    for part in ("007", "en"):
        assert rep["partitions"][part]["examples"].get("constraints"), part


def test_report_dist_examples_name_the_drifted_features(spark, tmp_path):
    """With a reference snapshot attached, the report's dist examples
    are the drifted (feature, psi, ks) report rows for the partition
    — which feature moved and by how much."""
    from pyspark.sql import functions as F

    clean = generate_repo_table(spark, N, seed=42)
    shifted = clean.withColumn(
        "content",
        F.when(
            F.col("lang") == "python",
            F.concat(F.col("content"), F.lit("\n"), F.col("content")),
        ).otherwise(F.col("content")),
    )
    rd = str(tmp_path / "run_dist")
    ValidationSuite(contamination=0.1).run(
        spark, shifted, rd, reference=clean
    )
    rep = run_report(spark, rd, examples=3)
    py = rep["partitions"]["python"]
    assert py["checks"]["dist"] is False
    rows = py["examples"]["dist"]
    assert 1 <= len(rows) <= 3
    assert all("feature" in r and "psi" in r and "ks_d" in r for r in rows)
    # a clean lang has no drifted rows -> no dist examples
    clean_langs = [p for p, e in rep["partitions"].items() if e["checks"]["dist"]]
    assert clean_langs and all(
        "dist" not in rep["partitions"][p]["examples"] for p in clean_langs
    )


def test_report_skips_stale_artifacts_from_dropped_config(spark, tmp_path):
    """Resume without the constraint rules leaves the old
    constraint_violations parquet on disk while the fresh verdicts say
    constraint_pass=True with zero counts — the report must not attach
    the abandoned rule set's rows as examples beside them."""
    corpus = generate_repo_table(spark, N, seed=42)
    rd = str(tmp_path / "run_stale")
    with_rules = ValidationSuite(
        contamination=0.1,
        constraints=[RowConstraint("impossible", "content_length < 0")],
    )
    with_rules.run(spark, corpus, rd)
    assert run_report(spark, rd, examples=2)["failed_partitions"]

    # resume with NO constraints: markers cover, nothing recomputes,
    # verdicts rewritten without the constraint check
    no_rules = ValidationSuite(contamination=0.1)
    m = no_rules.run(spark, corpus, rd, resume=True)
    assert m["partitions_resumed_skip"] == m["partitions_total"]
    rep = run_report(spark, rd, examples=2)
    for part, entry in rep["partitions"].items():
        assert entry["checks"]["constraints"] is True, part
        assert entry["counts"]["n_constraint_viol"] == 0
        assert "constraints" not in entry["examples"], part
