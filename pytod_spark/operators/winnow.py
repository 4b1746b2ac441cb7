"""Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
SIGMOD'03 — the MOSS algorithm) and fingerprint-overlap candidate
pairs.

Upgrades the single min-hash "winnowing-lite" fingerprint
(functions/text.char_ngram_fingerprint): hash every character k-gram,
slide a window of w consecutive hashes, keep each window's minimum.
Detection guarantee (the MOSS theorem): any common substring of
length >= w + k - 1 between two documents is guaranteed to produce at
least one shared fingerprint (no false negatives above that length).
The converse is weaker: a single shared fingerprint only witnesses a
common k-gram (>= k chars), which is why callers refine with a
min_shared threshold.

100-TB shape: the k-gram hashes are computed ONCE per position via
posexplode (never re-inlined into each of the w window terms — the
single-expression formulation re-evaluates the md5 O(len * w) times
per row, the Catalyst-inlining trap BENCH/NOTES.md documents); the
window minimum is a rows-frame min over a (doc)-partitioned window —
one exchange, per-task work bounded by document length, parallel
across documents. Candidate pairs are an equi-join on the fingerprint
value (candidate-only, like the MinHash band join), never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import md5_hash60


def winnow_fingerprints(
    df: DataFrame,
    k: int = 5,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, fingerprint) — the distinct winnowed fingerprint set per
    document. Documents shorter than k + w - 1 chars contribute the
    minimum over whatever k-gram hashes exist (>= 1 window of fewer
    hashes), matching the algorithm's boundary behavior."""
    idx = F.sequence(F.lit(1), F.greatest(F.length(text_col) - k + 1, F.lit(1)))
    pos = df.select(
        F.col(id_col),
        F.posexplode(idx).alias("__p", "__i"),
        F.col(text_col).alias("__t"),
    ).select(
        id_col,
        "__p",
        md5_hash60(F.substr(F.col("__t"), F.col("__i"), F.lit(k))).alias("__h"),
    )
    win = (
        Window.partitionBy(id_col)
        .orderBy("__p")
        .rowsBetween(Window.currentRow, w - 1)
    )
    n_h = F.count(F.lit(1)).over(Window.partitionBy(id_col))
    return (
        pos.withColumn("fingerprint", F.min("__h").over(win))
        .withColumn("__nh", n_h)
        # full windows only (canonical winnowing; __p is 0-based, so
        # valid starts are __p < nh - w + 1); docs with fewer than w
        # hashes keep their single partial window
        .where(F.col("__p") < F.greatest(F.col("__nh") - (w - 1), F.lit(1)))
        .select(id_col, "fingerprint")
        .distinct()
    )


def winnow_pairs(
    df: DataFrame,
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    cap: int | None = None,
    skew_stats: dict | None = None,
) -> DataFrame:
    """(doc_a, doc_b, n_shared) — document pairs sharing at least
    ``min_shared`` winnowed fingerprints. Each shared fingerprint
    witnesses a common k-gram (>= k chars); the w + k - 1 bound is the
    detection guarantee (any common run that long MUST share a
    fingerprint), not a per-fingerprint witness length — tune
    min_shared accordingly.

    Hot-fingerprint cap (operators/skew.py): a fingerprint held by
    more than ``cap`` documents — a license-header k-gram at corpus
    scale — emits linear K-hub star pairs instead of C(n,2); the cap is
    logged. Star pairs contribute to n_shared only for the bucket-min
    document, so pairs between two non-minimum members of a capped
    bucket may undercount n_shared (recover cluster membership with
    dedup.connected_components, which the star preserves exactly)."""
    from .skew import DEFAULT_BUCKET_CAP, capped_self_join_pairs

    fps = winnow_fingerprints(df, k, w, id_col, text_col)
    return (
        capped_self_join_pairs(
            fps,
            ["fingerprint"],
            id_col,
            cap=cap if cap is not None else DEFAULT_BUCKET_CAP,
            stats=skew_stats,
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
