"""Streaming deduplication — the ingest-time twin of the batch exact
dedup (operators/dedup.py): drop re-deliveries / exact-duplicate
documents as they arrive, with state bounded by an event-time
watermark.

Two surfaces:

* ``streaming_exact_dedup`` — content-hash dedup via
  ``dropDuplicatesWithinWatermark`` (Spark 3.5+): state for a hash is
  held only within the watermark delay, so the operator runs forever
  on unbounded input with bounded state — the property a plain
  ``dropDuplicates`` on a stream lacks (its state grows without
  bound; documented anti-pattern).
* ``streaming_seen_filter`` — ingest-vs-catalog dedup: a stream-static
  LEFT ANTI join against a (batch) table of already-ingested hashes —
  Spark plans the static side per micro-batch, broadcast when small.

Both stay pure DataFrame plans; hashes use the same sha256 as the
batch/oracle path so batch and stream agree on identity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(
    stream: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exact-duplicate suppression within the watermark horizon.

    Emits ONE representative of each sha256(text); further copies
    arriving within ``watermark`` of it are dropped. (Which copy
    survives inside a single micro-batch is not ordered — Spark keeps
    an arbitrary row per key; across micro-batches the earlier batch
    wins.) State per key is evicted once the watermark passes —
    bounded by (arrival rate x delay), not by stream length.
    """
    hashed = stream.withColumn("text_sha", F.sha2(F.col(text_col), 256))
    return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["text_sha"]
    )


def streaming_seen_filter(
    stream: DataFrame,
    seen: DataFrame,
    text_col: str = "text",
    seen_hash_col: str = "text_sha",
) -> DataFrame:
    """Drop stream rows whose content hash already exists in the
    static ``seen`` catalog (stream-static left-anti join; the static
    side broadcasts when under the threshold)."""
    hashed = stream.withColumn("text_sha", F.sha2(F.col(text_col), 256))
    return hashed.join(
        seen.select(F.col(seen_hash_col).alias("text_sha")),
        on="text_sha",
        how="left_anti",
    )
