"""Incremental near-dup index benchmark -> BENCH/neardup_index.json.

Measures the cost the persisted index removes: a nightly snapshot that
changed `delta_frac` of the corpus either re-LSH-es EVERYTHING
(from-scratch minhash_dedup_pairs + cluster state recomputed) or
refreshes the index (fingerprint-skip the unchanged rows, LSH only the
delta, probe the stored bands). Both paths end value-identical
(oracle-checked in the catalogue: minhash_index_pairs); this artifact
records the wall-clock ratio at sf0.1 and a 4x-replicated corpus.

Usage: python scripts/neardup_index_bench.py [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(spark, docs, delta_frac: float, reps: int) -> dict:
    from pyspark.sql import functions as F

    from pytod_spark.operators import neardup_index as NI
    from pytod_spark.operators.cache import release_all
    from pytod_spark.operators.dedup import minhash_dedup_pairs

    n = docs.count()
    cut = F.pmod(F.xxhash64("doc_id"), F.lit(1000)) < int(1000 * (1 - delta_frac))
    base = docs.where(cut)
    res = {"n_docs": n, "delta_frac": delta_frac}

    # from-scratch cost (what every nightly pays without the index)
    best = None
    for _ in range(reps):
        t0 = time.time()
        n_pairs = minhash_dedup_pairs(docs, threshold=0.5).count()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
        release_all()
    res["from_scratch_sec"] = round(best, 3)
    res["n_pairs"] = int(n_pairs)

    # one-time build on the unchanged base (amortized across nights)
    ref = tempfile.mkdtemp(prefix="ndbench_")
    t0 = time.time()
    NI.minhash_index_build(base, ref)
    res["build_sec"] = round(time.time() - t0, 3)
    release_all()

    # nightly incremental: refresh with the full snapshot (base rows
    # fingerprint-skip, delta LSH-ed + probed + appended)
    best = None
    for i in range(reps):
        if i:  # restore pre-refresh artifacts for a fair re-run
            shutil.rmtree(ref, ignore_errors=True)
            NI.minhash_index_build(base, ref)
            release_all()
        t0 = time.time()
        NI.minhash_index_refresh(docs, ref)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
        release_all()
    res["refresh_sec"] = round(best, 3)
    res["speedup_vs_scratch"] = round(res["from_scratch_sec"] / res["refresh_sec"], 2)

    got = NI.minhash_index_pairs(spark, ref).count()
    res["pairs_match_scratch"] = bool(got == n_pairs)
    shutil.rmtree(ref, ignore_errors=True)
    return res


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from pytod_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "neardup-index-bench", master=f"local[{cpus}]",
        shuffle_partitions=max(8, int(cpus)),
        extra_conf={"spark.ui.enabled": "false"},
    )
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    out = {
        "sf_dir": args.sf_dir,
        "cpus": int(cpus),
        "note": (
            "refresh pays ~10 extra job barriers (fingerprint anti-join, "
            "probe, delta self-dedup, three appends), so below the "
            "crossover corpus its FIXED overhead exceeds from-scratch; "
            "the ratio is the O(delta)-vs-O(corpus) DATA work, which is "
            "why speedup widens with corpus size (the 10^12-doc regime "
            "is far right of the largest run here)"
        ),
        "runs": [],
    }
    out["runs"].append(run(spark, docs, delta_frac=0.1, reps=args.reps))

    # replicated corpora — the ratio should WIDEN with size:
    # from-scratch is O(corpus), refresh is O(delta) + probe
    def replicate(times: int):
        big = docs
        for i in range(1, times):
            # make the copies genuinely NEW docs (a trailing marker
            # would leave replicas near-dups of each other and measure
            # the refine explosion, not the index): weaving a
            # per-replica token between every token pair rewrites every
            # 3-shingle, so replicas share no shingles across i while
            # each replica preserves the original corpus's internal
            # near-dup structure
            big = big.unionByName(
                docs.select(
                    (F.col("doc_id") + F.lit(1_000_000 * i)).alias("doc_id"),
                    F.regexp_replace(
                        F.col("text"), r"\s+", f" xq{i}z "
                    ).alias("text"),
                )
            )
        return big.localCheckpoint()

    big = replicate(64)
    out["runs"].append(run(spark, big, delta_frac=0.1, reps=1))
    # the representative nightly regime: a 10^12-doc corpus changes
    # well under 1% per snapshot
    out["runs"].append(run(spark, big, delta_frac=0.01, reps=1))

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH", "neardup_index.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
