"""kNN scale-frontier probe vs the reference's 1M-row claim.

The reference README (README.rst:64) claims >1,000,000 samples "within
an hour" on GPU. This probe runs OUR exact two-stage kNN
(fp32 tiles + bounded-error exact recheck, operators/block_knn.py) at
250k / 500k / 1M x 20 rows on local[32] and records wall time and
tile count per size — the evidence behind the exact->IVF handoff
policy written in BENCH/NOTES.md (exact all-pairs cost is quadratic
in group size; the IVF path, similarity.ivf_topk, is the documented
handoff once a group crosses the frontier).

Emits one JSON line; recorded in BENCH/knn_frontier.json.
"""

import argparse
import json
import math
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(spark, n: int, d: int, k: int, block_size: int, reps: int) -> dict:
    rng = np.random.default_rng(7)
    X = rng.normal(size=(n, d)).astype(np.float64)
    pdf = pd.DataFrame({"row_id": np.arange(n), "features": list(X)})
    df = spark.createDataFrame(pdf).repartition(64).persist()
    df.count()
    del X, pdf

    from pytod_spark.operators.block_knn import knn_join

    n_blocks = max(1, math.ceil(n / block_size))
    times = []
    for _ in range(reps):
        t0 = time.time()
        # broadcast_elems=0: this probe measures the TILE frontier, so
        # pin the tile path — at 250k x 20 the default gate would
        # silently take the broadcast fast path and the reported
        # n_tiles would describe a plan that never ran
        knn_join(
            df, k, block_size=block_size, precision="low", n_rows=n,
            broadcast_elems=0,
        ).select("row_id").write.format("noop").mode("overwrite").save()
        times.append(round(time.time() - t0, 2))
    df.unpersist()
    return {
        "n": n,
        "d": d,
        "k": k,
        "block_size": block_size,
        "n_blocks": n_blocks,
        "n_tiles": n_blocks * n_blocks,
        "best_sec": min(times),
        "reps_sec": times,
        "rows_per_sec": round(n / min(times), 1),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--sizes", type=str, default="250000,500000,1000000")
    ap.add_argument("--block-size", type=int, default=8192)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--d", type=int, default=20)
    args = ap.parse_args()

    from pytod_spark.session import get_spark

    spark = get_spark(
        "knn-frontier", extra_conf={"spark.ui.enabled": "false"}
    )
    out = {
        "reference_claim": ">1M samples within an hour (README.rst:64, GPU)",
        "kernel": "fp32 tiles + bounded-error exact recheck (exact output)",
        "estimator": "best-of-reps, all reps listed",
        "runs": [],
    }
    for n in (int(s) for s in args.sizes.split(",")):
        r = run(spark, n, args.d, args.k, args.block_size, args.reps)
        print(json.dumps({"progress": r}), file=sys.stderr)
        out["runs"].append(r)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
