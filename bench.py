"""Benchmark runner (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": <total sec>, "unit": "sec",
"queries": {name: sec, ...}, "sf": ..., "files_per_sec": ...}.

Also benchmarks the validation suite itself (files validated/sec, the
BASELINE.json headline) over a cached deterministic synthetic corpus;
generation cost is excluded (cached parquet).

Flags:
  --suite-only     run only the validation suite (used by the scaling
                   harness at two parallelism levels)
  --rows N         corpus size for the suite benchmark (default 100000)
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "knn_scores",
    "lof_scores",
    "abod_scores",
    "ecod_scores",
    "pca_scores",
    "hbos_events",
    "ecdf_events",
    "psi_events",
    "ks_events",
    "stats_profile_sketch",
    "uniqueness_lineitem",
    "ri_lineitem_orders",
    "constraint_report",
    "text_features",
    "token_entropy",
    "redact_docs",
    "minhash_pairs",
    "simhash_pairs",
    "winnow_pairs",
    "cosine_topk",
    "embedding_neardup",
    "embedding_neardup_ann",
    "cosine_topk_ivf",
    "contamination_check",
    "repetition_signals",
    "token_shards",
    "vocab_topk",
    "bpe_merge_candidates",
    "doc_logprob",
    "chunk_dedup",
    "quantize_embeddings",
    "training_mix_report",
    "drift_verdicts",
    "multimodal_metadata",
    "prepare_corpus",
]


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite-only", action="store_true")
    ap.add_argument("--rows", type=int, default=int(os.environ.get("BENCH_ROWS", 100_000)))
    ap.add_argument("--skip-suite", action="store_true")
    ap.add_argument("--query-reps", type=int, default=3,
                    help="catalogue-query passes; each query reports its "
                    "BEST pass (noise-robust steady-state estimator; the "
                    "cold first pass also ships verbatim as cold_queries). "
                    "3 passes because one steady pass is not enough on "
                    "this host: measured back-to-back solo reps still "
                    "drop 10-20% from pass 2 to pass 3 (allocator/page "
                    "reuse), and a single noisy-neighbor spike otherwise "
                    "corrupts a query's record")
    ap.add_argument(
        "--repeats", type=int, default=2,
        help="suite repetitions in one JVM; the best run is reported "
        "(same best-of-N estimator as the catalogue queries — earlier "
        "runs absorb JIT + page-fault warmup, and this shared host's "
        "run-to-run noise is +-2-3x)",
    )
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").split("sf")[-1])

    from pytod_spark.deploy import ensure_shipped
    from pytod_spark.session import get_spark

    spark = get_spark(
        "pytod_spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(8, int(cpus)),
        extra_conf={"spark.ui.enabled": "false"},
    )
    ensure_shipped(spark)
    timings: dict[str, float] = {}

    cold: dict[str, float] = {}
    if not args.suite_only:
        from pytod_spark.operators.cache import release_all
        from pytod_spark.queries import QUERIES

        # N passes, report each query's BEST pass (best-of-N): the
        # first pass absorbs JIT, Python worker spawn and the
        # sandbox's slow first-touch page faults (measured 24.3s cold
        # -> 2.4s steady for the kNN join at sf0.1), and run-to-run
        # noise on this shared host is +-2-3x (noisy neighbors), so a
        # fixed "report pass 2" rule lets one noise spike corrupt the
        # record — min across passes is the standard noise-robust
        # steady-state estimator (same methodology as
        # scripts/run_scaling). The first (cold) pass is kept verbatim
        # in the output (cold_*) so both views publish from one run.
        for rep in range(max(1, args.query_reps)):
            for name in BENCH_QUERIES:
                t0 = time.time()
                _materialize(QUERIES[name](spark, sf_dir))
                dt = round(time.time() - t0, 3)
                timings[name] = min(dt, timings.get(name, dt))
                release_all()  # drop tracked persists between queries
            if rep == 0:
                cold = dict(timings)

    recalls: dict[str, float] = {}
    if not args.suite_only:
        # measured recall of the approximate similarity paths vs their
        # exact twins, shipped in the same artifact as the wall times so
        # the approximation is visible per run (not just in pytest gates)
        brute = {
            (r["row_id"], r["nbr_id"])
            for r in QUERIES["cosine_topk"](spark, sf_dir).collect()
        }
        ivf = {
            (r["row_id"], r["nbr_id"])
            for r in QUERIES["cosine_topk_ivf"](spark, sf_dir).collect()
        }
        recalls["cosine_topk_ivf"] = round(len(brute & ivf) / max(1, len(brute)), 4)
        exact_nd = {
            (r["doc_a"], r["doc_b"])
            for r in QUERIES["embedding_neardup"](spark, sf_dir).collect()
        }
        ann_nd = {
            (r["doc_a"], r["doc_b"])
            for r in QUERIES["embedding_neardup_ann"](spark, sf_dir).collect()
        }
        recalls["embedding_neardup_ann"] = round(
            len(exact_nd & ann_nd) / max(1, len(exact_nd)), 4
        )
        release_all()

    files_per_sec = None
    files_per_sec_dist = None
    files_per_sec_cons = None
    if not args.skip_suite:
        from pytod_spark.datagen import generate_repo_table, repo_commits_dim
        from pytod_spark.validation import ValidationSuite

        cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".bench_cache", f"corpus_{args.rows}")
        if not os.path.exists(os.path.join(cache, "_SUCCESS")):
            generate_repo_table(
                spark, args.rows, seed=42, n_partitions=max(64, args.rows // 50_000)
            ).write.mode("overwrite").parquet(cache)
            repo_commits_dim(spark, args.rows, seed=42).write.mode("overwrite").parquet(
                cache + "_parent"
            )
        corpus = spark.read.parquet(cache)
        parent = spark.read.parquet(cache + "_parent")
        # --repeats 0 builds/refreshes the corpus cache without paying
        # for a suite run (run_scaling.ensure_corpus relies on this)
        for rep in range(args.repeats):
            run_dir = os.path.join("/tmp", f"pytod_bench_run_{os.getpid()}_{rep}")
            shutil.rmtree(run_dir, ignore_errors=True)
            t0 = time.time()
            metrics = ValidationSuite(contamination=0.1).run(
                spark, corpus, run_dir, parent=parent, resume=False
            )
            dt = round(time.time() - t0, 3)
            shutil.rmtree(run_dir, ignore_errors=True)
            if rep == 0:
                cold["validation_suite"] = dt
            # best-of-N, same estimator as the catalogue queries
            if dt <= timings.get("validation_suite", dt):
                timings["validation_suite"] = dt
                files_per_sec = round(metrics["files_per_sec"], 1)
        # full-engine variant: the same corpus against a second
        # deterministic snapshot (seed 43), so the fifth concurrent
        # check — distribution drift, PSI + two-sample KS off the
        # shared per-value counts profile — runs alongside the other
        # four. Timed as its own entry so the headline files/sec
        # stays comparable across rounds.
        if args.repeats:
            ref_cache = cache + "_ref"
            if not os.path.exists(os.path.join(ref_cache, "_SUCCESS")):
                generate_repo_table(
                    spark, args.rows, seed=43,
                    n_partitions=max(64, args.rows // 50_000),
                ).write.mode("overwrite").parquet(ref_cache)
            ref_corpus = spark.read.parquet(ref_cache)
            for rep in range(args.repeats):
                run_dir = os.path.join(
                    "/tmp", f"pytod_bench_dist_{os.getpid()}_{rep}"
                )
                shutil.rmtree(run_dir, ignore_errors=True)
                t0 = time.time()
                m2 = ValidationSuite(contamination=0.1).run(
                    spark, corpus, run_dir, parent=parent,
                    reference=ref_corpus, resume=False,
                )
                dt = round(time.time() - t0, 3)
                shutil.rmtree(run_dir, ignore_errors=True)
                if rep == 0:
                    cold["validation_suite_dist"] = dt
                if dt <= timings.get("validation_suite_dist", dt):
                    timings["validation_suite_dist"] = dt
                    files_per_sec_dist = round(m2["files_per_sec"], 1)
        # constraint-check variant: base suite + three declarative
        # RowConstraint rules (one length bound, one rate-budgeted
        # bound, one never-violated format rule). Timed as its own
        # entry so the marginal cost of the sixth concurrent check —
        # one map-only violations pass + one partial-agg summary over
        # the cached feature frame — is visible per artifact.
        if args.repeats:
            from pytod_spark.validation import RowConstraint

            bench_rules = [
                RowConstraint("len_bound", "content_length <= 100000"),
                RowConstraint("len_soft", "content_length <= 2000",
                              max_violation_rate=0.25),
                RowConstraint("path_format", "length(path) > 0"),
            ]
            for rep in range(args.repeats):
                run_dir = os.path.join(
                    "/tmp", f"pytod_bench_cons_{os.getpid()}_{rep}"
                )
                shutil.rmtree(run_dir, ignore_errors=True)
                t0 = time.time()
                m3 = ValidationSuite(
                    contamination=0.1, constraints=bench_rules
                ).run(spark, corpus, run_dir, parent=parent, resume=False)
                dt = round(time.time() - t0, 3)
                shutil.rmtree(run_dir, ignore_errors=True)
                if rep == 0:
                    cold["validation_suite_constraints"] = dt
                if dt <= timings.get("validation_suite_constraints", dt):
                    timings["validation_suite_constraints"] = dt
                    files_per_sec_cons = round(m3["files_per_sec"], 1)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "total_bench_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": int(cpus),
        "files_per_sec": files_per_sec,
        "files_per_sec_dist": files_per_sec_dist,
        "files_per_sec_constraints": files_per_sec_cons,
        "recalls": recalls,
        "suite_rows": args.rows if not args.skip_suite else 0,
        "cold_queries": {k: v for k, v in cold.items()},
        "cold_total_sec": round(sum(cold.values()), 3),
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
