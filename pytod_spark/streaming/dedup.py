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

Round-5 addition — NEAR-dup ingest against the persisted MinHash index
(operators/neardup_index.py):

* ``streaming_neardup_candidates`` — a pure streaming plan (map-side
  band keys -> explode -> stream-static equi-join on the stored band
  table -> exact-Jaccard refine against the stored shingle sets) that
  emits every (arriving doc, indexed doc) near-dup MATCH. Useful as an
  alerting/annotation stream; it cannot *drop* the matched rows,
  because the complement of a stream-static join on an exploded frame
  needs a per-doc regroup (a stateful aggregation).
* ``streaming_neardup_ingest`` — the full ingest gate via
  ``foreachBatch`` (the standard Structured-Streaming shape for
  batch-relational logic per micro-batch): each batch drops exact
  re-deliveries and near-dups of the INDEX, keeps one canonical doc
  per within-batch near-dup cluster, appends the survivors to the
  index (so later batches dedup against earlier ones — the index IS
  the operator's state, persisted and restart-safe, unlike in-memory
  stream state), and writes survivors to the sink ref.
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


def streaming_neardup_candidates(
    stream: DataFrame,
    index_ref: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pure streaming near-dup MATCH stream against the persisted
    MinHash index: (arriving id, indexed id, jaccard), one row per
    match. Band keys are computed map-side (dedup.map_side_band_keys —
    bit-identical to the batch banding, parity-pinned in tests), the
    stored band table joins stream-static on the 8-byte key, and the
    refine is the exact shingle Jaccard against the stored shingle
    sets — candidates only, never all-pairs. Threshold and shingle
    width come from the index meta.

    Multiplicity note: a doc colliding with the same stored doc in
    several bands emits one match row per colliding band — a stateless
    plan cannot dedupe without unbounded (or watermarked) stream
    state. Alert consumers that need one row per pair add
    ``dropDuplicatesWithinWatermark([id_col, "indexed_id"])`` behind a
    watermark; the ingest gate (``neardup_ingest_batch``) is
    unaffected (its anti-join only needs existence)."""
    from ..operators.dedup import map_side_band_keys, shingles
    from ..operators.neardup_index import _load_meta, _sub_ref
    from ..sources import load_table

    spark = stream.sparkSession
    meta = _load_meta(spark, index_ref)
    n, threshold = meta["shingle_n"], meta["threshold"]

    banded = stream.select(
        F.col(id_col).alias("__new_id"),
        shingles(F.col(text_col), n).alias("sh_a"),
        F.explode(map_side_band_keys(F.col(text_col), n)).alias("band_key"),
    )
    stored_bands = load_table(spark, _sub_ref(index_ref, "bands"))
    stored_docs = load_table(spark, _sub_ref(index_ref, "docs")).select(
        F.col("doc_id").alias("__stored_id"), F.col("sh").alias("sh_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        banded.join(stored_bands, "band_key")
        .select("__new_id", F.col("doc_id").alias("__stored_id"), "sh_a")
        .join(stored_docs, "__stored_id")
        .withColumn("jaccard", inter.cast("double") / union)
        .where(F.col("jaccard") >= threshold)
        .select(
            F.col("__new_id").alias(id_col),
            F.col("__stored_id").alias("indexed_id"),
            F.round("jaccard", 6).alias("jaccard"),
        )
    )


def neardup_ingest_batch(
    batch_df: DataFrame,
    index_ref: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One micro-batch of the near-dup ingest gate; returns the
    SURVIVORS (eagerly materialized) after appending them to the
    index. Shared by the streaming wrapper below and callable directly
    for batch backfills — batch and stream run literally the same
    code, so they cannot disagree.

    Drop rules, in order:
    1. exact content re-delivery (sha256 already indexed);
    2. near-dup of an indexed doc (index probe, exact-Jaccard refine);
    3. within-batch near-dups: a doc with a smaller-id near-dup
       partner in the batch is dropped (transitively keeps each
       cluster's minimum id — the canonical-doc convention of
       dedup_clusters).
    Survivors are folded into the index via minhash_index_refresh
    (same fingerprint gate, appends docs/bands/pairs), so the NEXT
    batch dedups against them; restart safety comes from the index
    artifacts, not stream state."""
    from ..operators.dedup import minhash_dedup_pairs
    from ..operators.neardup_index import (
        _load_meta,
        _sub_ref,
        minhash_index_probe,
        minhash_index_refresh,
    )
    from ..sources import load_table

    spark = batch_df.sparkSession
    meta = _load_meta(spark, index_ref)
    n, threshold = meta["shingle_n"], meta["threshold"]

    stored_sha = load_table(spark, _sub_ref(index_ref, "docs")).select("text_sha")
    fresh = batch_df.withColumn(
        "__sha", F.sha2(F.col(text_col), 256)
    ).join(
        stored_sha.withColumnRenamed("text_sha", "__sha"), "__sha", "left_anti"
    )
    near_stored = minhash_index_probe(fresh, index_ref, id_col, text_col)
    matched = near_stored.select(F.col("doc_a").alias(id_col)).unionByName(
        near_stored.select(F.col("doc_b").alias(id_col))
    )
    # only ids present in the batch can be dropped; indexed ids pass through
    fresh2 = fresh.join(matched.distinct(), id_col, "left_anti")
    within = minhash_dedup_pairs(fresh2, id_col, text_col, n, threshold)
    losers = within.select(
        F.greatest("doc_a", "doc_b").alias(id_col)
    ).distinct()
    survivors = fresh2.join(losers, id_col, "left_anti").drop("__sha")
    # refresh re-reads the artifacts this function also read — cut the
    # lineage by materializing survivors first (refresh checkpoints its
    # own delta; this localCheckpoint protects OUR handle for the
    # return value / sink write after the index mutates)
    survivors = survivors.localCheckpoint()
    minhash_index_refresh(survivors, index_ref, id_col, text_col)
    return survivors


def streaming_neardup_ingest(
    stream: DataFrame,
    index_ref: str,
    survivors_ref: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Streaming near-dup ingest: wire ``neardup_ingest_batch`` into a
    ``foreachBatch`` writer. Returns the DataStreamWriter (caller sets
    checkpointLocation/trigger and .start()s it). Survivors append to
    ``survivors_ref`` through sources.write_table, so the sink can be
    a parquet path or a catalog/Iceberg table like every other ref."""
    from ..sources import write_table

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        survivors = neardup_ingest_batch(batch_df, index_ref, id_col, text_col)
        write_table(survivors, survivors_ref, mode="append")

    return stream.writeStream.foreachBatch(_process)
