"""Measured hot-bucket-cap demonstration on the real MinHash operator.

The round-3 verdict's one scale gripe: an uncapped LSH band self-join
emits C(n, 2) pairs for a single ubiquitous key (a license-header
k-gram, a boilerplate cluster), i.e. quadratic output on one skewed
shuffle key. ``operators/skew.py capped_self_join_pairs`` bounds that
to a linear star. ``tests/test_skew_cap.py`` proves semantics at 600
copies; THIS probe measures the claim at bench scale on the full
``minhash_dedup_pairs`` pipeline:

1. CONTROL (feasible quadratic): a planted clone cluster small enough
   to run uncapped — measure pairs + wall capped vs uncapped, showing
   the measured quadratic/linear output gap on identical input.
2. SCALE RUN (infeasible quadratic): a clone cluster whose uncapped
   join would emit ~N_BANDS * C(hot, 2) pairs (billions); run it
   capped, record wall, candidate volume, skew stats, and exact
   recovery of the planted cluster by connected_components.

Corpus is synthesized deterministically (counter-based rng, seed 7).
Emits one JSON line; recorded in BENCH/skew_cap.json.
"""

import argparse
import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOCAB = [f"tok{i:04d}" for i in range(5000)]


def make_corpus(spark, n_unique: int, n_clones: int, doc_len: int = 30):
    """n_unique distinct docs + n_clones copies of one boilerplate doc."""
    rng = np.random.default_rng(7)
    toks = rng.integers(0, len(VOCAB), size=(n_unique, doc_len))
    texts = [" ".join(VOCAB[t] for t in row) for row in toks]
    boiler = " ".join(VOCAB[t] for t in rng.integers(0, len(VOCAB), size=doc_len))
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(n_unique + n_clones, dtype=np.int64),
            "text": texts + [boiler] * n_clones,
        }
    )
    return spark.createDataFrame(pdf).repartition(64)


def run_case(spark, n_unique: int, n_clones: int, cap: int | None, label: str) -> dict:
    from pytod_spark.operators import cache
    from pytod_spark.operators.dedup import connected_components, minhash_dedup_pairs

    df = make_corpus(spark, n_unique, n_clones).persist()
    df.count()
    stats: dict = {}
    t0 = time.time()
    # cap=0 is the TRUE uncapped plan (plain self-join: no size
    # window, no persist, no stats job) — the honest control
    pairs = minhash_dedup_pairs(
        df,
        threshold=0.5,
        cap=cap if cap is not None else 0,
        skew_stats=stats if cap is not None else None,
    ).persist()
    n_pairs = pairs.count()
    pair_sec = round(time.time() - t0, 2)

    t0 = time.time()
    cc = connected_components(pairs)
    top = (
        cc.groupBy("cluster_id")
        .count()
        .orderBy("count", ascending=False)
        .first()
    )
    cc_sec = round(time.time() - t0, 2)
    pairs.unpersist()
    df.unpersist()
    cache.release_all()
    return {
        "case": label,
        "n_docs": n_unique + n_clones,
        "planted_clones": n_clones,
        "cap": cap,
        "candidate_pairs": n_pairs,
        "pair_gen_sec": pair_sec,
        "cc_sec": cc_sec,
        "largest_cluster": int(top["count"]),
        "cluster_recovered_exactly": int(top["count"]) == n_clones,
        "skew_stats": stats,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--control-clones", type=int, default=2000)
    ap.add_argument("--scale-unique", type=int, default=200_000)
    ap.add_argument("--scale-clones", type=int, default=50_000)
    args = ap.parse_args()

    from pytod_spark.operators.dedup import N_BANDS
    from pytod_spark.session import get_spark

    spark = get_spark("skew-cap-probe", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    out = {
        "claim": (
            "capped LSH band join emits O(n) star pairs per hot bucket "
            "instead of C(n,2); connected_components recovers the planted "
            "cluster exactly from the capped pair set"
        ),
        "uncapped_scale_projection_pairs": N_BANDS
        * args.scale_clones
        * (args.scale_clones - 1)
        // 2,
        "runs": [],
    }
    # control: same input capped vs uncapped, both feasible. cap=256 so
    # the 2000-clone bucket actually crosses it and the star engages —
    # the default cap (4096) would leave this input on the exact path.
    for cap, label in ((None, "control_uncapped"), (256, "control_capped")):
        r = run_case(spark, 20_000, args.control_clones, cap, label)
        print(json.dumps({"progress": r}), file=sys.stderr)
        out["runs"].append(r)
    # scale: only the capped plan is feasible
    r = run_case(
        spark, args.scale_unique, args.scale_clones, 4096, "scale_capped"
    )
    print(json.dumps({"progress": r}), file=sys.stderr)
    out["runs"].append(r)

    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
