"""One-off direct measurement of the 4 -> 16 scaling pair at 16M rows
(VERDICT r2 'Next round' #2: publish direct evidence above 4 cores
next to the memory-bandwidth twin). Reuses run_scaling's worker and
methodology (tmpfs corpus, equal wall budget, best-of-reps); prints
JSON and leaves BENCH/BASELINE.md editing to the caller so the
hand-written analysis sections there are not clobbered."""

from __future__ import annotations

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0] + "/scripts")
from run_scaling import ensure_corpus, run_level  # noqa: E402


def main() -> int:
    rows = 16_000_000
    budget = 480.0
    ensure_corpus(rows)
    out = {}
    for cpus in (4, 16):
        out[cpus] = run_level(cpus, budget)
        print(json.dumps({f"local[{cpus}]": out[cpus]}), flush=True)
    eff = out[16]["files_per_sec"] / (4 * out[4]["files_per_sec"])
    print(json.dumps({"pair": "4->16", "efficiency": round(eff, 3)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
