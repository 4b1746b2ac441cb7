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
row-id-deterministic: every field derives from counter-based hashing
of (seed, row id) — any partitioning yields the same table. The
kernel is batch-vectorized numpy (no per-row RNG construction); only
final string assembly touches Python-object land.
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

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — counter-based hash, vectorized uint64."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & _MASK
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK
    return x ^ (x >> np.uint64(31))


def _uniform(seed: int, rid: np.ndarray, stream: int) -> np.ndarray:
    """Deterministic U[0,1) per row id for a given stream index."""
    # mask to 64 bits BEFORE np.uint64: an unmasked Python int from a
    # seed >= 2**29 (or negative) overflows the C-long conversion
    h = _mix64(
        rid.astype(np.uint64)
        ^ np.uint64(((seed << 34) | (stream * 0x5DEECE66D)) & 0xFFFFFFFFFFFFFFFF)
    )
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _randint(seed: int, rid: np.ndarray, stream: int, n: int) -> np.ndarray:
    return (_uniform(seed, rid, stream) * n).astype(np.int64)


def _batch_fields(seed: int, rid: np.ndarray, n_repos: int, commits_per_repo: int,
                  orphan_every: int, anomaly_every: int):
    """Vectorized field generation for a batch of row ids."""
    # Zipf-ish repo assignment: repo_0 absorbs ~20% of rows (skew);
    # the rest follow an inverse-CDF Pareto(1.2) tail.
    u_head = _uniform(seed, rid, 1)
    u_tail = _uniform(seed, rid, 2)
    pareto = np.power(1.0 - u_tail, -1.0 / 1.2) - 1.0
    repo_i = np.where(
        u_head < 0.2, 0, 1 + (pareto.astype(np.int64) % max(1, n_repos - 1))
    )
    lang_i = _randint(seed, rid, 3, len(LANGS))

    d1 = _randint(seed, rid, 4, 8)
    d2 = _randint(seed, rid, 5, 8)

    commit_idx = _randint(seed, rid, 6, commits_per_repo)
    commit_num = (repo_i * 1_000_003 + commit_idx * 7919) % (1 << 40)

    # residue reduced mod the stride so small *_every values still
    # inject (rid % 5 == 17 would never fire)
    is_orphan = (
        (rid % orphan_every == 17 % orphan_every)
        if orphan_every > 0
        else np.zeros(len(rid), bool)
    )
    orphan_num = (rid * 104729) % (1 << 40)

    is_anomaly = (
        (rid % anomaly_every == 5 % anomaly_every)
        & (np.asarray(LANGS)[lang_i] == ANOMALY_LANG)
        if anomaly_every > 0
        else np.zeros(len(rid), bool)
    )

    # content shape: n_lines in [3,18) normal / [40,60) anomalous;
    # tokens per line in [4,12)
    n_lines = 3 + _randint(seed, rid, 7, 15)
    n_lines = np.where(is_anomaly, 40 + _randint(seed, rid, 8, 20), n_lines)

    langs = np.asarray(LANGS, dtype=object)[lang_i]
    exts = np.asarray([EXT[l] for l in LANGS], dtype=object)[lang_i]
    dirs = np.asarray(_DIRS, dtype=object)[d1]
    names = np.asarray(_NAMES, dtype=object)[d2]

    repos = np.array([f"repo_{r}" for r in repo_i], dtype=object)
    paths = np.array(
        [f"{a}/{b}_{r % 997}.{e}" for a, b, r, e in zip(dirs, names, rid, exts)],
        dtype=object,
    )
    commits = np.array(
        [
            f"{o:010x}bad" if bad else f"{c:010x}"
            for c, o, bad in zip(commit_num, orphan_num, is_orphan)
        ],
        dtype=object,
    )

    # token-level content: every random draw for the whole batch
    # happens in flat vectorized passes (per-line token counts, then
    # token ids); only the final string join touches Python objects.
    nrow = len(rid)
    contents = np.empty(nrow, dtype=object)

    # --- flat per-line token counts for all rows at once
    line_rid = np.repeat(rid, n_lines)  # row id of each line
    starts = np.zeros(nrow, dtype=np.int64)
    np.cumsum(n_lines[:-1], out=starts[1:])
    line_j = np.arange(line_rid.size, dtype=np.int64) - np.repeat(starts, n_lines)
    per_line = 4 + (
        _mix64(line_j.astype(np.uint64) + (line_rid * 31 + seed).astype(np.uint64))
        % np.uint64(8)
    ).astype(np.int64)
    # anomalous rows: fixed 12 unique-ish hex tokens per line
    anom_line = np.repeat(is_anomaly, n_lines)
    per_line = np.where(anom_line, 12, per_line)

    # --- flat token ids for all rows at once
    tok_rid = np.repeat(line_rid, per_line)
    tok_anom = np.repeat(anom_line, per_line)
    row_tok_total = np.add.reduceat(per_line, starts)
    tstarts = np.zeros(nrow, dtype=np.int64)
    np.cumsum(row_tok_total[:-1], out=tstarts[1:])
    tok_pos = np.arange(tok_rid.size, dtype=np.int64) - np.repeat(tstarts, row_tok_total)

    h_norm = _mix64(
        tok_pos.astype(np.uint64)
        ^ ((tok_rid.astype(np.uint64) * np.uint64(0x85EBCA6B)) ^ np.uint64(seed << 20))
    )
    lo_flat = np.repeat(np.asarray([_LANG_SLICE[l][0] for l in langs]), row_tok_total)
    nv_flat = np.repeat(
        np.asarray([_LANG_SLICE[l][1] - _LANG_SLICE[l][0] for l in langs]), row_tok_total
    )
    word_idx = lo_flat + (h_norm % nv_flat.astype(np.uint64)).astype(np.int64)
    words = np.asarray(_BASE_TOKENS, dtype=object)[word_idx]
    if tok_anom.any():
        h_anom = h_norm[tok_anom] & np.uint64((1 << 30) - 1)
        words[tok_anom] = np.array([f"x{t:x}" for t in h_anom], dtype=object)

    # --- assemble: append "\n" to each line's last token (except the
    # row's final line), then one " ".join per row; content stays
    # whitespace-delimited so \s+ tokenizers see identical tokens
    wl = words.tolist()
    last_tok = set((tstarts + row_tok_total - 1).tolist())
    for p in (np.cumsum(per_line) - 1).tolist():
        if p not in last_tok:
            wl[p] += "\n"
    ts = tstarts.tolist()
    tt = row_tok_total.tolist()
    for i in range(nrow):
        s = ts[i]
        contents[i] = " ".join(wl[s:s + tt[i]]).replace("\n ", "\n")

    return repos, paths, commits, langs, contents, is_anomaly, is_orphan


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
            rid = pdf["id"].to_numpy().astype(np.int64)
            repos, paths, commits, langs, contents, is_anom, is_orph = _batch_fields(
                seed, rid, n_repos, commits_per_repo, orphan_every, anomaly_every
            )
            out = pd.DataFrame(
                {
                    "row_id": rid,
                    "repo": repos,
                    "path": paths,
                    "commit": commits,
                    "lang": langs,
                    "content": contents,
                    "is_anomaly": is_anom.astype(np.int32),
                    "is_orphan": is_orph.astype(np.int32),
                }
            )
            if dup_every > 0:
                dup = out[rid % dup_every == 3 % dup_every].copy()
                if len(dup):
                    # duplicated business key (fresh row id, same key+content)
                    dup["row_id"] = dup["row_id"] + n_rows
                    out = pd.concat([out, dup], ignore_index=True)
            yield out

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
    # distributed like the fact side: the dimension is a pure function
    # of (r, c) — a driver-side list comprehension would build
    # n_repos * commits_per_repo Python tuples (10M at n_rows=1e8)
    from pyspark.sql import functions as F

    ids = spark.range(0, n_repos * commits_per_repo)
    r = (F.col("id") / commits_per_repo).cast("long")
    c = F.col("id") % commits_per_repo
    return ids.select(
        F.concat(F.lit("repo_"), r.cast("string")).alias("repo"),
        # lower(): the fact side formats commits with lowercase %x
        F.lower(
            F.lpad(F.hex((r * 1_000_003 + c * 7919) % F.lit(1 << 40)), 10, "0")
        ).alias("commit"),
    )
