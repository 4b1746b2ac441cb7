"""Quiet-host best-of-N re-measurement of the round-4 regressed
queries (VERDICT r4 'what's wrong' residual: minhash_pairs,
simhash_pairs, winnow_pairs, ecod_scores + the validation suite),
separating the hot-bucket cap's real per-key-pass cost from host
noise. One JVM, N passes per query, best + all passes recorded ->
BENCH/quiet_rebench.json (summarized in BENCH/NOTES.md).

Usage: python scripts/quiet_rebench.py [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TARGETS = ["minhash_pairs", "simhash_pairs", "winnow_pairs", "ecod_scores"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pytod_spark.operators.cache import release_all
    from pytod_spark.queries import QUERIES
    from pytod_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "quiet-rebench", master=f"local[{cpus}]",
        shuffle_partitions=max(8, int(cpus)),
        extra_conf={"spark.ui.enabled": "false"},
    )
    out: dict = {"sf_dir": args.sf_dir, "cpus": int(cpus), "queries": {}}
    for name in TARGETS:
        passes = []
        for _ in range(args.reps + 1):  # +1 cold pass, recorded too
            t0 = time.time()
            QUERIES[name](spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            passes.append(round(time.time() - t0, 3))
            release_all()
        out["queries"][name] = {
            "cold": passes[0],
            "passes": passes[1:],
            "best": min(passes[1:]),
        }

    from pytod_spark.datagen import generate_repo_table, repo_commits_dim
    from pytod_spark.validation import ValidationSuite

    rows = 100_000
    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_cache", f"corpus_{rows}",
    )
    if not os.path.exists(os.path.join(cache, "_SUCCESS")):
        generate_repo_table(spark, rows, seed=42, n_partitions=64).write.mode(
            "overwrite"
        ).parquet(cache)
        repo_commits_dim(spark, rows, seed=42).write.mode("overwrite").parquet(
            cache + "_parent"
        )
    corpus = spark.read.parquet(cache)
    parent = spark.read.parquet(cache + "_parent")
    passes = []
    for rep in range(args.reps + 1):
        run_dir = f"/tmp/quiet_rebench_{os.getpid()}_{rep}"
        shutil.rmtree(run_dir, ignore_errors=True)
        t0 = time.time()
        ValidationSuite(contamination=0.1).run(
            spark, corpus, run_dir, parent=parent, resume=False
        )
        passes.append(round(time.time() - t0, 3))
        shutil.rmtree(run_dir, ignore_errors=True)
    out["queries"]["validation_suite"] = {
        "cold": passes[0], "passes": passes[1:], "best": min(passes[1:]),
    }

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH", "quiet_rebench.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
