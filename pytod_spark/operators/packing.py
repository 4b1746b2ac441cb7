"""Token-budget shard packing: assign an ordered corpus to
fixed-token-budget training shards (contiguous fill).

The training-data step after dedup/filter/sample: split the corpus,
in a deterministic document order, into shards of ~``budget`` tokens
each so downstream loaders get balanced files. shard_id =
floor(tokens_before_this_doc / budget) — "contiguous fill" packing,
deterministic and expressible in plain SQL (the oracle mirrors it
with one window cumsum).

100-TB shape: a global ordered cumulative sum is the textbook
one-reducer trap (``Window.orderBy(...)`` with no partition funnels
the corpus through one task). This module reuses the bucketed
two-pass machinery from operators/ranking.py instead: range-bucket
the order key by approximate quantiles, per-bucket token totals
(B tiny rows) give each bucket's global offset through a broadcast
self-join, and the only full-data window is partitioned by bucket —
no task ever sorts more than ~n/B rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .ranking import _cum_offsets, _with_bucket


def bucketed_cumsum(
    df: DataFrame,
    order_col: str,
    val_col: str,
    out: str = "cum",
    n_buckets: int = 64,
    tie_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Inclusive cumulative sum of ``val_col`` in ``order_col`` order
    with NO single-partition exchange (see module docstring).
    ``tie_cols`` break ``order_col`` ties deterministically — required
    whenever the order key is not unique (buckets and offsets are
    unaffected; only within-bucket window order uses them)."""
    df = _with_bucket(df, order_col, [], n_buckets)
    cnts = df.groupBy("__bucket").agg(F.sum(val_col).alias("__v"))
    offs = _cum_offsets(cnts, [], [("__v", "__off", None)]).select("__bucket", "__off")
    w = (
        Window.partitionBy("__bucket")
        .orderBy(order_col, *tie_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.join(F.broadcast(offs), "__bucket")
        .withColumn(out, F.col("__off") + F.sum(val_col).over(w))
        .drop("__bucket", "__off")
    )


def contiguous_token_shards(
    df: DataFrame,
    budget: int,
    order_col: str = "doc_id",
    weight_col: str = "n_tokens",
    tie_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Attach ``shard_id`` = floor(cumulative tokens before this doc /
    budget) in ``order_col`` order (``tie_cols`` for non-unique
    keys)."""
    c = bucketed_cumsum(df, order_col, weight_col, out="__cum", tie_cols=tie_cols)
    shard = F.floor((F.col("__cum") - F.col(weight_col)) / F.lit(budget))
    return c.withColumn("shard_id", shard.cast("long")).drop("__cum")


def shard_report(shards: DataFrame, weight_col: str = "n_tokens") -> DataFrame:
    """Per-shard packing report (doc count + token total)."""
    return shards.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(weight_col).alias("shard_tokens"),
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Split each document into overlapping fixed-token chunks (the
    pretraining/RAG chunker): chunk i covers tokens
    [i*stride, i*stride + chunk_tokens) with stride = chunk_tokens -
    overlap; every document yields >= 1 chunk.

    100-TB shape: pure map-side — chunk boundaries are computed as a
    per-row ``transform`` over ``sequence(0, n_chunks-1)`` and
    exploded; no shuffle. The tokenizer split() re-evaluates once per
    chunk inside the lambda (Catalyst inlining, see
    BENCH/NOTES.md's case study) — bounded by ~n/stride chunks per
    doc, a constant factor, unlike the O(n^2) traps the notes pin.
    """
    from ..functions.text import tokens

    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")
    t = tokens(F.col(text_col))
    n = F.size(t)
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((n - F.lit(overlap)).cast("double") / stride).cast("int"),
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_id"),
            F.size(F.slice(t, i * stride + 1, chunk_tokens)).alias(
                "n_chunk_tokens"
            ),
            F.concat_ws(" ", F.slice(t, i * stride + 1, chunk_tokens)).alias(
                "chunk_text"
            ),
        ),
    )
    return df.select(
        F.col(id_col), *keep_cols, F.explode(chunks).alias("__c")
    ).select(id_col, *keep_cols, "__c.*")
