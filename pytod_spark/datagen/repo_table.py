"""Deterministic synthetic source-code corpus (FIXTURES.md F5).

Generates the engine's input table per BASELINE.json input_hint:
``(repo string, path string, commit string, lang string,
content string)`` — seeded, Zipf-ish repo sizes (repo_0 is the
deliberately giant repo for skew/salting tests), per-repo commit sets
(drives referential integrity), per-lang token vocabularies, and
configurable injected violations with known ground truth:

* duplicated (repo, path, commit) keys      -> uniqueness violations
* commits absent from the repo's commit set -> RI violations
* anomalous content rows in one lang (very long, high-entropy)
  -> drift flags

Generation is distributed (mapInPandas over spark.range) and
row-id-deterministic: content depends only on (seed, row id), so any
partitioning yields the same table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

LANGS = ["python", "java", "go", "js", "rust"]
EXT = {"python": "py", "java": "java", "go": "go", "js": "js", "rust": "rs"}
# per-lang token pools (disjoint-ish so token entropy differs by lang)
_BASE_TOKENS = [
    "def", "class", "return", "import", "self", "if", "else", "for", "while",
    "public", "static", "void", "new", "extends", "interface", "final",
    "func", "package", "go", "chan", "defer", "struct", "map", "range",
    "const", "let", "var", "function", "async", "await", "export", "require",
    "fn", "impl", "trait", "match", "enum", "mut", "pub", "crate",
]
_LANG_SLICE = {
    "python": (0, 16), "java": (8, 24), "go": (16, 32), "js": (24, 40), "rust": (28, 40),
}
_DIRS = ["src", "lib", "core", "utils", "api", "internal", "pkg", "test"]
_NAMES = ["main", "engine", "parser", "model", "handler", "utils", "index", "config"]

ANOMALY_LANG = "go"  # the drift-injected partition


def _row_fields(seed: int, rid: int, n_repos: int, commits_per_repo: int,
                dup_every: int, orphan_every: int, anomaly_every: int):
    rng = np.random.default_rng((seed << 34) ^ rid)
    # Zipf-ish repo assignment: repo_0 absorbs ~20% of rows (skew)
    if rng.random() < 0.2:
        repo_i = 0
    else:
        repo_i = 1 + int(rng.pareto(1.2)) % (n_repos - 1)
    repo = f"repo_{repo_i}"
    lang = LANGS[int(rng.integers(0, len(LANGS)))]
    lo, hi = _LANG_SLICE[lang]
    vocab = _BASE_TOKENS[lo:hi]

    d1, d2 = _DIRS[int(rng.integers(0, 8))], _NAMES[int(rng.integers(0, 8))]
    path = f"{d1}/{d2}_{rid % 997}.{EXT[lang]}"

    # commit drawn from the repo's commit set (deterministic per repo)
    commit_idx = int(rng.integers(0, commits_per_repo))
    commit = f"{(repo_i * 1_000_003 + commit_idx * 7919) % (1 << 40):010x}"

    is_orphan = orphan_every > 0 and rid % orphan_every == 17
    if is_orphan:
        commit = f"{(rid * 104729) % (1 << 40):010x}bad"

    is_anomaly = anomaly_every > 0 and rid % anomaly_every == 5 and lang == ANOMALY_LANG
    if is_anomaly:
        # drift: very long, high-entropy content (unique tokens)
        n_lines = 40 + int(rng.integers(0, 20))
        lines = [
            " ".join(f"x{rng.integers(0, 1 << 30):x}" for _ in range(12))
            for _ in range(n_lines)
        ]
    else:
        n_lines = 3 + int(rng.integers(0, 15))
        lines = [
            " ".join(vocab[int(rng.integers(0, len(vocab)))] for _ in range(4 + int(rng.integers(0, 8))))
            for _ in range(n_lines)
        ]
    content = "\n".join(lines)
    return repo, path, commit, lang, content, int(is_anomaly), int(is_orphan)


def generate_repo_table(
    spark: SparkSession,
    n_rows: int,
    seed: int = 42,
    n_repos: int | None = None,
    commits_per_repo: int = 20,
    dup_every: int = 1000,
    orphan_every: int = 500,
    anomaly_every: int = 40,
    n_partitions: int | None = None,
    with_labels: bool = False,
) -> DataFrame:
    """Distributed deterministic generator. ``dup_every`` injects an
    exact duplicate of every k-th row (uniqueness violations);
    ``with_labels`` appends hidden ground-truth columns for tests."""
    n_repos = n_repos or max(10, n_rows // 200)
    n_partitions = n_partitions or max(8, n_rows // 50_000)

    def kernel(batches):
        for pdf in batches:
            rows = []
            for rid in pdf["id"].to_numpy():
                rid = int(rid)
                fields = _row_fields(
                    seed, rid, n_repos, commits_per_repo, dup_every, orphan_every, anomaly_every
                )
                rows.append((rid,) + fields)
                if dup_every > 0 and rid % dup_every == 3:
                    # duplicated business key (fresh row id, same key+content)
                    rows.append((rid + n_rows,) + fields)
            yield pd.DataFrame(
                rows,
                columns=["row_id", "repo", "path", "commit", "lang", "content",
                         "is_anomaly", "is_orphan"],
            )

    schema = (
        "row_id long, repo string, path string, commit string, lang string, "
        "content string, is_anomaly int, is_orphan int"
    )
    df = spark.range(0, n_rows, numPartitions=n_partitions).mapInPandas(kernel, schema=schema)
    if not with_labels:
        df = df.drop("is_anomaly", "is_orphan")
    return df


def repo_commits_dim(
    spark: SparkSession, n_rows: int, seed: int = 42,
    n_repos: int | None = None, commits_per_repo: int = 20,
) -> DataFrame:
    """The parent dimension for RI: every legitimate (repo, commit)
    pair, mirroring the generator's commit formula."""
    n_repos = n_repos or max(10, n_rows // 200)
    rows = [
        (f"repo_{r}", f"{(r * 1_000_003 + c * 7919) % (1 << 40):010x}")
        for r in range(n_repos)
        for c in range(commits_per_repo)
    ]
    return spark.createDataFrame(rows, "repo string, commit string")
