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
* hot keys  (bucket size >  cap): a STAR — every row pairs with the
  bucket's minimum id. Output is n-1 pairs instead of C(n, 2), and
  connectivity within the bucket is fully preserved, so duplicate
  clusters are still recovered exactly by
  ``dedup.connected_components``; only pair *multiplicity* (e.g.
  winnowing's n_shared count between two non-minimum members) is
  reduced. Downstream exact refines (Jaccard / Hamming / cosine)
  apply to star pairs unchanged.

No silent caps: the helper counts hot keys and affected rows (one
small aggregate over the already-persisted banded frame) and logs
them at WARNING when any key was capped; callers can pass ``stats``
to capture the numbers programmatically.

Plan shape: ONE exchange — the banded frame is window-annotated with
per-key size and min id (count/min over an unordered key partition),
persisted (it feeds the cold self-join twice plus the hot branch and
the stats job), and filtered into the two branches. The cold self-join
shuffles on the same key the window already partitioned by.
"""

from __future__ import annotations

import logging
from collections.abc import Iterable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

log = logging.getLogger(__name__)

# Default bucket cap. A 4096-row bucket already emits ~8.4M pairs
# (C(4096,2)) for ONE key — about the largest single-key output a
# balanced shuffle partition should absorb; beyond it the star branch
# keeps output linear. Small-SF catalogue buckets are orders of
# magnitude below this (measured at sf0.1 with /tmp-style probe, see
# BENCH/NOTES.md: max MinHash band bucket 14, max winnow fingerprint
# 11, max SimHash chunk bucket 632, max RP-LSH band bucket 81), so
# default-capped operators stay bit-identical to their uncapped
# DuckDB oracles at test scale.
DEFAULT_BUCKET_CAP = 4096


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
) -> DataFrame:
    """Bucket self-join with hot-key star capping.

    banded      — one row per (key, member): the bucket assignment frame.
    key_cols    — the bucket key (band/chunk/fingerprint [+ groups]).
    id_col      — member id; pairs are oriented ``a < b``.
    keep_cols   — key columns to carry into the output (e.g. groups).
    carry_cols  — non-key member columns carried per side as
                  ``{col}_a`` / ``{col}_b`` (e.g. the simhash value for
                  the Hamming recheck).
    stats       — optional dict filled with hot_keys / hot_rows /
                  capped_pair_reduction.

    Returns (keep_cols…, a_name, b_name, carry_a…, carry_b…) — NOT
    deduplicated (a pair can collide in several buckets); callers
    `.distinct()` or aggregate as before.
    """
    from pyspark import StorageLevel

    from .cache import track

    key_cols = list(key_cols)
    keep_cols = list(keep_cols)
    carry_cols = list(carry_cols)

    w = Window.partitionBy(*key_cols)
    ann = track(
        banded.withColumn("__ksz", F.count(F.lit(1)).over(w))
        .withColumn("__kmin", F.min(id_col).over(w))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    # --- honesty job: how much did the cap bite? (reads the cache the
    # pair join is about to reuse, so the extra cost is one cached scan)
    hot_row = (
        ann.where(F.col("__ksz") > cap)
        .agg(
            F.count_distinct(*[F.col(c) for c in key_cols]).alias("hot_keys"),
            F.count(F.lit(1)).alias("hot_rows"),
            # pairs the quadratic plan would have emitted minus the star's
            F.coalesce(
                F.sum(
                    (F.col("__ksz") - 1) / 2.0  # per-row share of C(n,2)
                ),
                F.lit(0.0),
            ).alias("quad_pairs"),
        )
        .first()
    )
    hot_keys, hot_rows = int(hot_row["hot_keys"]), int(hot_row["hot_rows"])
    if stats is not None:
        stats["hot_keys"] = hot_keys
        stats["hot_rows"] = hot_rows
        stats["pairs_capped"] = int(hot_row["quad_pairs"] or 0) - max(
            hot_rows - hot_keys, 0
        )
    if hot_keys:
        log.warning(
            "hot-bucket cap engaged: %d keys over cap=%d (%d rows) emit "
            "star pairs (%d pairs) instead of ~%d quadratic pairs; "
            "connectivity preserved, pair multiplicity reduced",
            hot_keys,
            cap,
            hot_rows,
            hot_rows - hot_keys,
            int(hot_row["quad_pairs"] or 0),
        )

    cold = ann.where(F.col("__ksz") <= cap)
    a = cold.select(
        *key_cols,
        F.col(id_col).alias(a_name),
        *[F.col(c).alias(f"{c}_a") for c in carry_cols],
    )
    b = cold.select(
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
    cold_pairs = a.join(b, on=cond).select(*out_cols)

    if hot_keys == 0:
        # planner shortcut: no hot branch, no union — the cold plan IS
        # the exact uncapped plan
        return cold_pairs

    hot = ann.where(F.col("__ksz") > cap)
    # the star center's carry values: the row WITH id == __kmin
    center = hot.where(F.col(id_col) == F.col("__kmin")).select(
        *key_cols,
        *[F.col(c).alias(f"{c}_a") for c in carry_cols],
        F.col(id_col).alias("__center"),
    ).dropDuplicates([*key_cols])
    spokes = hot.where(F.col(id_col) != F.col("__kmin")).select(
        *key_cols,
        F.col(id_col).alias(b_name),
        *[F.col(c).alias(f"{c}_b") for c in carry_cols],
    )
    if carry_cols:
        hot_pairs = spokes.join(center, on=key_cols).select(
            *keep_cols,
            F.col("__center").alias(a_name),
            b_name,
            *[f"{c}_a" for c in carry_cols],
            *[f"{c}_b" for c in carry_cols],
        )
    else:
        hot_pairs = hot.where(F.col(id_col) != F.col("__kmin")).select(
            *keep_cols,
            F.col("__kmin").alias(a_name),
            F.col(id_col).alias(b_name),
        )
    return cold_pairs.unionByName(hot_pairs)
