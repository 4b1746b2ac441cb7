"""Matched-workload kNN comparison against the reference's published
CPU number.

BASELINE.md records PyTOD-CPU at 3.36s for exact kNN on n=30,000,
d=20, k=10 (single machine, in-process tensors). This script runs OUR
distributed kNN join on exactly that workload shape (deterministic
rng(7) gaussian matrix — the values don't affect the cost of an exact
all-pairs kNN, only the shape does), plus a 4x-work variant
(40,000 x 64) where the marginal rate separates from fixed overhead,
at both precisions:

* ``high``  — fp64 tiles end-to-end.
* ``low``   — fp32 tiles + bounded-error exact recheck
  (operators/block_knn.py, reference intermediate_layers.py:106-164);
  output PROVABLY equals the fp64 kernel (driver row
  knn_scores_lowprec shares the exact oracle).

Reports best-of-reps per (shape, precision) with every rep listed
(same estimator and rationale as bench.py / run_scaling.py — the
sandbox's cold first-touch faults and noisy neighbors corrupt any
single-shot number). Emits one JSON line; recorded in
BENCH/knn_matched.json and discussed in BENCH/BASELINE.md.
"""

import argparse
import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(spark, n: int, d: int, k: int, reps: int) -> dict:
    rng = np.random.default_rng(7)
    X = rng.normal(size=(n, d)).astype(np.float64)
    pdf = pd.DataFrame({"row_id": np.arange(n), "features": list(X)})
    df = spark.createDataFrame(pdf).repartition(32).persist()
    df.count()

    from pytod_spark.operators.block_knn import knn_join

    out: dict = {"n": n, "d": d, "k": k}
    for prec in ("high", "low"):
        times = []
        for _ in range(reps):
            t0 = time.time()
            knn_join(df, k, block_size=4096, precision=prec).write.format(
                "noop"
            ).mode("overwrite").save()
            times.append(round(time.time() - t0, 2))
        out[prec] = {"best_sec": min(times), "reps_sec": times}
    df.unpersist()
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from pytod_spark.session import get_spark

    spark = get_spark("knn-matched-workload")
    results = {
        "reference_cpu_sec": 3.36,
        "reference_workload": "pytod CPU exact kNN n=30000 d=20 k=10 (BASELINE.md)",
        "estimator": "best-of-reps, all reps listed",
        "matched": run(spark, 30000, 20, 10, args.reps),
        "scaled_4x_work": run(spark, 40000, 64, 10, args.reps),
    }
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
