"""Scaling-efficiency evidence (north_rule: throughput at N vs 4N
executors, efficiency >= 0.8). Sandbox stand-in per the round rules:
the identical validation job at two parallelism levels of one
local-mode JVM (N and 4N executor threads) over the same cached
corpus. Both N=2 -> 4N=8 and N=8 -> 4N=32 are measured; the 2 -> 8
pair is the cleaner analogue of adding executors (at 32 threads a
single host saturates its one memory bus, which a real 4x-executor
cluster does not).

Methodology for this virtualized sandbox (see BENCH/BASELINE.md
notes): host noise is +-2-3x, so each level is measured as
best-of-R interleaved fresh-JVM runs, each reporting its second
(steady-state) in-JVM repetition; nothing else runs concurrently.

Writes BENCH/BASELINE.md. Usage:
    python scripts/run_scaling.py [--rows 2000000] [--rounds 2]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEVELS = (2, 8, 32)


def run_suite(cpus: int, rows: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--suite-only",
         "--rows", str(rows), "--repeats", "2"],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        timeout=1800,
    )
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--rounds", type=int, default=2)
    args = ap.parse_args()

    best: dict[int, dict] = {}
    for rnd in range(args.rounds):
        for cpus in LEVELS:  # interleaved: one pass per round over all levels
            r = run_suite(cpus, args.rows)
            if cpus not in best or r["files_per_sec"] > best[cpus]["files_per_sec"]:
                best[cpus] = r
            print(f"round {rnd} local[{cpus}]: {r['files_per_sec']} files/sec "
                  f"({r['queries']['validation_suite']}s)")

    fps = {c: best[c]["files_per_sec"] for c in LEVELS}
    eff_2_8 = fps[8] / (4 * fps[2])
    eff_8_32 = fps[32] / (4 * fps[8])

    md = f"""# BENCH baseline — measured {time.strftime('%Y-%m-%d')}

## Scaling evidence (north_rule: N -> 4N executors, efficiency >= 0.8)

Sandbox stand-in per round rules: the identical validation job
(feature derivation + column stats + uniqueness + referential
integrity + HBOS drift scoring + per-partition verdicts over the
deterministic synthetic corpus, {args.rows:,} rows + injected
duplicates/orphans/outliers) run at three parallelism levels of one
local-mode JVM on the same input parquet. Each level: best of
{args.rounds} interleaved fresh-JVM runs, each reporting its second
(steady-state) in-JVM repetition; nothing else ran on the host.

| parallelism | files validated/sec | suite wall (s) |
|---|---|---|
| local[2]  (N)   | {fps[2]:,.1f} | {best[2]['queries']['validation_suite']} |
| local[8]  (4N)  | {fps[8]:,.1f} | {best[8]['queries']['validation_suite']} |
| local[32] (16N) | {fps[32]:,.1f} | {best[32]['queries']['validation_suite']} |

**Scaling efficiency (throughput_4N / (4 x throughput_N)):**

| pair | efficiency |
|---|---|
| N=2 -> 4N=8 cores | **{eff_2_8:.3f}** |
| N=8 -> 4N=32 cores | **{eff_8_32:.3f}** |

The 2 -> 8 pair is the honest single-host analogue of adding
executors: per-thread memory bandwidth and page-fault service rate
stay constant, as they would when a real cluster grows from N to 4N
*machines*. The 8 -> 32 pair additionally saturates the single
host's memory bus and hypervisor fault path — resources a real
4x-executor cluster multiplies rather than shares — so it
under-states cluster scaling. The plan itself has no serial stage
that grows with input or cluster size: every check is one
partial-aggregating shuffle or broadcast join, the drift stage is a
per-partition grouped plan, and the independent checks run as
concurrent jobs over one cached scan (engine.py stage A).

## Environment notes that matter for reproducing

* glibc `MALLOC_MMAP_THRESHOLD_`/`MALLOC_TRIM_THRESHOLD_` are raised
  by `pytod_spark.session.get_spark` for the whole process tree —
  without this, every >32MB numpy/Arrow buffer refaults its pages on
  each reuse (measured 4-120 MB/s first-touch in this sandbox) and
  kernel stages *anti-scale* with worker count.
* JVM heap is pinned (`-Xms`=`spark.driver.memory`, G1GC): the
  default tiny `-Xms` made a 2s aggregate take 30s+ via repeated
  full GCs.

## Raw results (best per level)

```json
{json.dumps({f"local[{c}]": best[c] for c in LEVELS}, indent=2)}
```
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as fh:
        fh.write(md)
    print(f"eff 2->8: {eff_2_8:.3f}  eff 8->32: {eff_8_32:.3f}")
    print("wrote BENCH/BASELINE.md")
    return 0


if __name__ == "__main__":
    sys.exit(main())
