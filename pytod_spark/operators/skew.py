"""Hot-bucket (skewed-key) capping for candidate-pair self-joins.

Every LSH-family candidate generator in this package (MinHash bands,
SimHash chunks, winnowing fingerprints, RP-LSH buckets) is an
equi-self-join on a bucket key. At 100-TB corpus scale a ubiquitous
key — a license-header k-gram, a million-copy boilerplate cluster
landing in one band — makes that join emit C(n, 2) pairs for one key:
a quadratic blow-up on a single skewed shuffle key, the classic LSH
scale-killer (AQE can split the *partition*, but not the output
volume).

``capped_self_join_pairs`` bounds the output per key:

* cold keys (bucket size <= cap): the exact all-pairs ``a < b``
  self-join — identical to the uncapped plan, so small-scale results
  (and the DuckDB oracles) are unchanged wherever no key exceeds the
  cap.
* hot keys  (bucket size >  cap): a K-HUB STAR — rows are hashed into
  ``n_hubs`` subgroups, each subgroup's minimum id becomes a hub, and
  every row pairs with every hub. Output is <= n_hubs * n pairs
  instead of C(n, 2). Connectivity within the bucket survives any
  downstream exact refine (Jaccard / Hamming / cosine) as long as AT
  LEAST ONE hub passes the refine against the bucket's true
  duplicates: a single-hub star dies entirely when its one center
  happens to fail the refine (e.g. the bucket's min-id doc is a
  below-threshold collision), K independent hubs fail together
  exponentially less often. Pair *multiplicity* (e.g. winnowing's
  n_shared count between two non-hub members) is still reduced —
  callers that threshold on multiplicity see hot-bucket pairs
  undercounted, which is why engagement is never silent (below).

No silent caps: pass ``stats`` (any dict) to run a small diagnostic
aggregate — it fills hot_keys / hot_rows / pairs_capped and logs a
WARNING when any key was capped. The CLI ``dedup`` subcommand passes
it and surfaces the numbers in its JSON; the probe scripts record
them in BENCH artifacts. (``pipeline.prepare_corpus`` performs only
EXACT dedup — a plain hash groupBy with no candidate join — so no cap
can engage there and it has nothing to report.) Without ``stats`` the returned plan is FULLY LAZY — no job
runs at construction time.

``cap=0`` disables capping entirely and returns the plain exact
self-join (no size pass, no persist) — the true uncapped plan, used
as the control in scripts/skew_cap_probe.py.

Plan shape (cap > 0): per-key sizes come from a ``groupBy().count()``
PARTIAL AGGREGATE joined back onto the banded frame — deliberately
NOT a ``Window.partitionBy(key)`` count. A window would (a) shuffle
every full-width row, (b) sort it, and (c) buffer each key's rows in
ONE task — i.e. the operator built to defuse a 10M-row hot bucket
would itself funnel those 10M rows through a single straggler, and
AQE cannot split window exchanges. The aggregate's map-side combine
never concentrates a key, the (key, count) shuffle is narrow, and the
tag join is an ordinary join: AQE broadcasts the count frame when it
is small (the usual case, under the 64 MB session threshold) and
skew-splits the sort-merge fallback when it is not. The BANDED frame
is persisted — `counts` and the tag join are two consumers of the
upstream banding subtree with no shared exchange, so without the
cache that subtree would evaluate twice; the tagged frame stays a
cheap view (cached scan + broadcast join) for the cold self-join's
two sides, the hot branch, and the optional stats job. Hub metadata
(subgroup minima) is
likewise a partial aggregate over the HOT SUBSET ONLY — a model-sized
frame (n_hot_keys x n_hubs rows) joined back to the hot spokes —
zero rows in the common all-cold case.
"""

from __future__ import annotations

import logging
from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger(__name__)

# Default bucket cap. A 4096-row bucket already emits ~8.4M pairs
# (C(4096,2)) for ONE key — about the largest single-key output a
# balanced shuffle partition should absorb; beyond it the star branch
# keeps output linear. Small-SF catalogue buckets are orders of
# magnitude below this (measured at sf0.1 with /tmp-style probe, see
# BENCH/NOTES.md: max MinHash band bucket 14, max winnow fingerprint
# 11, max SimHash chunk bucket 29 (60-bit hash), max RP-LSH band
# bucket 81), so default-capped operators stay bit-identical to their
# uncapped DuckDB oracles at test scale.
DEFAULT_BUCKET_CAP = 4096

# Hubs per hot bucket. One hub preserves connectivity only until the
# downstream refine rejects that single center; three independent
# hubs make a refine-orphaned bucket require all three subgroup
# minima to fail, at 3x the (still linear) pair volume.
DEFAULT_N_HUBS = 3


def capped_self_join_pairs(
    banded: DataFrame,
    key_cols: Iterable[str],
    id_col: str,
    cap: int = DEFAULT_BUCKET_CAP,
    a_name: str = "doc_a",
    b_name: str = "doc_b",
    keep_cols: Iterable[str] = (),
    carry_cols: Iterable[str] = (),
    stats: dict | None = None,
    n_hubs: int = DEFAULT_N_HUBS,
) -> DataFrame:
    """Bucket self-join with hot-key K-hub star capping.

    banded      — one row per (key, member): the bucket assignment frame.
    key_cols    — the bucket key (band/chunk/fingerprint [+ groups]).
    id_col      — member id; pairs are oriented ``a < b``.
    cap         — max bucket size joined all-pairs; 0 disables capping
                  (plain exact self-join, no window/persist overhead).
    keep_cols   — key columns to carry into the output (e.g. groups).
    carry_cols  — non-key member columns carried per side as
                  ``{col}_a`` / ``{col}_b`` (e.g. the simhash value for
                  the Hamming recheck); on star pairs the values follow
                  the a/b orientation, whichever side the hub lands on.
    stats       — optional dict: when given, an eager diagnostic
                  aggregate fills hot_keys / hot_rows / pairs_capped
                  and cap engagement is logged at WARNING. When None,
                  construction is fully lazy (no jobs).
    n_hubs      — hubs per hot bucket (refine-robustness vs pair
                  volume; see module docstring).

    Returns (keep_cols…, a_name, b_name, carry_a…, carry_b…) — NOT
    deduplicated across buckets (a pair can collide in several
    buckets); within ONE hot bucket each unordered pair appears at
    most once (hub-hub orientations are deduplicated, so
    multiplicity-counting callers only ever UNDER-count on capped
    buckets). Callers `.distinct()` or aggregate as before.
    """
    from pyspark import StorageLevel

    from .cache import track

    key_cols = list(key_cols)
    keep_cols = list(keep_cols)
    carry_cols = list(carry_cols)

    def _exact_pairs(src: DataFrame) -> DataFrame:
        a = src.select(
            *key_cols,
            F.col(id_col).alias(a_name),
            *[F.col(c).alias(f"{c}_a") for c in carry_cols],
        )
        b = src.select(
            *[F.col(c).alias(f"__r_{c}") for c in key_cols],
            F.col(id_col).alias(b_name),
            *[F.col(c).alias(f"{c}_b") for c in carry_cols],
        )
        cond = [a[c] == b[f"__r_{c}"] for c in key_cols] + [a[a_name] < b[b_name]]
        out_cols = (
            keep_cols
            + [a_name, b_name]
            + [f"{c}_a" for c in carry_cols]
            + [f"{c}_b" for c in carry_cols]
        )
        return a.join(b, on=cond).select(*out_cols)

    if not cap:
        return _exact_pairs(banded)

    # Persist the BANDED frame, not the tagged join result: `counts`
    # and the tag join are two consumers of the banding subtree (the
    # signature/tokenization/winnowing work upstream), and they share
    # no exchange ReuseExchange could exploit — without the persist
    # that subtree would evaluate twice per materialization. The
    # tagged frame (`ann`) stays a cheap view over the cache: each of
    # its consumers replays one cached scan + the (normally broadcast)
    # tag join, which is cheaper than caching a second full-width
    # copy of the data.
    banded = track(banded.persist(StorageLevel.MEMORY_AND_DISK))
    # per-key size via partial aggregate + tag join (NOT a window —
    # see module docstring: map-side combine never concentrates a hot
    # key in one task, and AQE can broadcast or skew-split a join)
    counts = banded.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("__ksz"))
    ann = banded.join(counts, on=key_cols)

    cold_pairs = _exact_pairs(ann.where(F.col("__ksz") <= cap))

    # hub metadata is derived ON THE HOT SUBSET ONLY and as a partial
    # aggregate: one (key, subgroup) row per hub — n_hot_keys * n_hubs
    # rows total, zero in the common all-cold case. min_by carries the
    # hub row's own payload columns. A subgroup with no members simply
    # yields no hub row; every hot row still pairs with every hub that
    # exists for its key.
    hot = ann.where(F.col("__ksz") > cap).withColumn(
        "__g", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_hubs))
    )
    hubs_g = hot.groupBy(*key_cols, "__g").agg(
        F.min(F.col(id_col)).alias("__hub"),
        *[
            F.min_by(F.col(c), F.col(id_col)).alias(f"__h_{c}")
            for c in carry_cols
        ],
    )
    hubs = hubs_g.drop("__g")
    # a spoke that is itself a hub meets every other hub of its key
    # from BOTH spoke perspectives; both orientations normalize to the
    # same (a, b) row, which would double-count hub-hub pairs for
    # multiplicity-counting callers (winnowing's n_shared). Flag
    # hub-spokes via their own subgroup's min (a model-sized broadcast
    # join) and keep only the spoke < hub orientation for them.
    own = hubs_g.select(*key_cols, "__g", F.col("__hub").alias("__own_min"))
    spokes = (
        hot.select(
            *key_cols,
            "__g",
            F.col(id_col).alias("__spoke"),
            *[F.col(c).alias(f"__s_{c}") for c in carry_cols],
        )
        .join(own, on=[*key_cols, "__g"])
        .withColumn("__s_is_hub", F.col("__spoke") == F.col("__own_min"))
        .drop("__g", "__own_min")
    )
    hub_first = F.col("__hub") < F.col("__spoke")
    hot_pairs = (
        spokes.join(hubs, on=key_cols)
        .where(
            (F.col("__hub") != F.col("__spoke"))
            & (~F.col("__s_is_hub") | (F.col("__spoke") < F.col("__hub")))
        )
        .select(
            *keep_cols,
            F.least("__hub", "__spoke").alias(a_name),
            F.greatest("__hub", "__spoke").alias(b_name),
            *[
                F.when(hub_first, F.col(f"__h_{c}"))
                .otherwise(F.col(f"__s_{c}"))
                .alias(f"{c}_a")
                for c in carry_cols
            ],
            *[
                F.when(hub_first, F.col(f"__s_{c}"))
                .otherwise(F.col(f"__h_{c}"))
                .alias(f"{c}_b")
                for c in carry_cols
            ],
        )
    )
    out = cold_pairs.unionByName(hot_pairs)

    if stats is not None:
        # opt-in diagnostic (the only eager work in this function):
        # one aggregate over the tagged view — a cached banded scan
        # plus the (broadcast) tag join, the same cost every other
        # consumer of `ann` pays
        hot_row = (
            ann.where(F.col("__ksz") > cap)
            .agg(
                F.count_distinct(*[F.col(c) for c in key_cols]).alias("hot_keys"),
                F.count(F.lit(1)).alias("hot_rows"),
                # pairs the quadratic plan would have emitted
                F.coalesce(
                    F.sum((F.col("__ksz") - 1) / 2.0),  # per-row share of C(n,2)
                    F.lit(0.0),
                ).alias("quad_pairs"),
            )
            .first()
        )
        hot_keys, hot_rows = int(hot_row["hot_keys"]), int(hot_row["hot_rows"])
        quad = int(hot_row["quad_pairs"] or 0)
        star_bound = hot_rows * n_hubs
        stats["hot_keys"] = hot_keys
        stats["hot_rows"] = hot_rows
        stats["pairs_capped"] = max(quad - star_bound, 0)
        if hot_keys:
            log.warning(
                "hot-bucket cap engaged: %d keys over cap=%d (%d rows) emit "
                "%d-hub star pairs (<= %d) instead of ~%d quadratic pairs; "
                "connectivity robust to refine unless all hubs fail, pair "
                "multiplicity reduced",
                hot_keys,
                cap,
                hot_rows,
                n_hubs,
                star_bound,
                quad,
            )
    return out
