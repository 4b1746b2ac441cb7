"""Memory-bandwidth saturation probe (STREAM-triad style).

Direct evidence for the claim in BENCH/BASELINE.md that this single
host's shared memory bus — not the validation plan — is what degrades
high-core scaling pairs: a pure-bandwidth kernel with zero
synchronization, zero shuffle and zero Python/JVM machinery shows the
same aggregate-throughput ceiling.

Each worker process runs an independent numpy triad a = b + s*c over
arrays far larger than LLC (64 MiB per array), so every iteration
streams from DRAM. Workers synchronize on a barrier, run for a fixed
rep count, and report aggregate GB/s moved (24 bytes per element per
rep: two reads + one write, write-allocate ignored -> conservative).
If per-worker bandwidth were constant (as it is across *machines* in
a real cluster), aggregate GB/s would scale linearly with workers.

Usage: python scripts/membw_probe.py [--levels 1 4 8 32] [--reps 20]
Writes BENCH/membw.json and prints one JSON line per level.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import time

N_ELEM = 8 * 1024 * 1024  # 64 MiB per float64 array, 3 arrays/worker


def _worker(barrier, reps: int, out_q) -> None:
    import numpy as np

    rng = np.random.default_rng(os.getpid())
    b = rng.standard_normal(N_ELEM)
    c = rng.standard_normal(N_ELEM)
    a = np.empty_like(b)
    s = 3.0
    # touch everything once (page-fault warmup out of the timed region)
    np.add(b, c, out=a)
    barrier.wait()
    t0 = time.perf_counter()
    for _ in range(reps):
        np.multiply(c, s, out=a)
        np.add(a, b, out=a)
    dt = time.perf_counter() - t0
    # per rep: multiply reads c writes a (16B/elem), add reads a,b
    # writes a (24B/elem) -> 40 bytes moved per element per rep
    out_q.put(40.0 * N_ELEM * reps / dt / 1e9)


def run_level(n_workers: int, reps: int) -> dict:
    ctx = mp.get_context("spawn")
    barrier = ctx.Barrier(n_workers)
    q = ctx.Queue()
    procs = [
        ctx.Process(target=_worker, args=(barrier, reps, q)) for _ in range(n_workers)
    ]
    for p in procs:
        p.start()
    per_worker = sorted(q.get() for _ in procs)
    for p in procs:
        p.join()
    agg = sum(per_worker)
    return {
        "workers": n_workers,
        "aggregate_gb_s": round(agg, 2),
        "per_worker_gb_s_median": round(per_worker[len(per_worker) // 2], 2),
        "per_worker_gb_s_min": round(per_worker[0], 2),
        "per_worker_gb_s_max": round(per_worker[-1], 2),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", type=int, nargs="+", default=[1, 4, 8, 16, 32])
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    results = []
    for lvl in args.levels:
        r = run_level(lvl, args.reps)
        base = results[0]["aggregate_gb_s"] if results else r["aggregate_gb_s"]
        r["scaling_vs_1"] = round(r["aggregate_gb_s"] / (base * lvl / args.levels[0]), 3)
        results.append(r)
        print(json.dumps(r), flush=True)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(os.path.join(repo, "BENCH"), exist_ok=True)
    with open(os.path.join(repo, "BENCH", "membw.json"), "w") as fh:
        json.dump({"n_elem": N_ELEM, "reps": args.reps, "levels": results}, fh, indent=2)
    print("wrote BENCH/membw.json")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
