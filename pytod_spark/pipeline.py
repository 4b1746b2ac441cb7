"""End-to-end training-corpus preparation: the composition a real
pipeline runs, built entirely from the verified operators.

    raw docs
      -> exact dedup        (keep min-doc_id copy)        dedup.py
      -> decontaminate      (benchmark shingle overlap)   decontaminate.py
      -> quality filter     (composite score threshold)   functions/text.py
      -> deterministic sample (md5-prefix rate)           sampling.py
      -> global shuffle     (keyed-md5 rank)              sampling.py
      -> chunk              (overlapping fixed-token)     packing.py
      -> token shards       (contiguous budget fill)      packing.py

Every stage is the same code path the catalogue rows verify against
DuckDB oracles; this module only composes them. The plan stays
scale-shaped end to end: two hash shuffles (dedup, contamination
agg), broadcast joins for the benchmark dictionary and sample
thresholds, the bucketed two-pass machinery for shuffle + shards, and
map-side chunking — no collect, no single-partition sort.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions import text as T
from .operators.decontaminate import drop_contaminated
from .operators.dedup import exact_duplicates
from .operators.packing import chunk_documents, contiguous_token_shards
from .operators.sampling import sample_predicate, shuffle_order


@dataclass
class PrepareConfig:
    contamination_threshold: float = 0.05
    min_quality: float = 0.3
    sample_fraction: float = 1.0
    sample_salt: str = "prep-v1"
    shuffle_salt: str = "epoch0"
    chunk_tokens: int = 512
    chunk_overlap: int = 64
    shard_budget_tokens: int = 100_000
    # scrub PII (functions/text.redact_pii) before chunking; off by
    # default so the catalogue row's oracle stays byte-stable
    redact: bool = False


def prepare_corpus(
    docs: DataFrame,
    bench: DataFrame | None = None,
    config: PrepareConfig | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Returns the training-ready chunk table:
    (doc_id, chunk_id, n_chunk_tokens, chunk_text, shuffle_rank,
    shard_id), deterministic end to end."""
    cfg = config or PrepareConfig()

    keep_ids = exact_duplicates(docs, id_col=id_col, text_col=text_col).select(
        F.col("min_doc_id").alias(id_col)
    )
    # plain shuffle semi-join: keep_ids is corpus-sized (one row per
    # distinct text), so broadcasting it would collect the corpus'
    # id set to the driver — same choice as q_training_mix_report
    d = docs.join(keep_ids, id_col, "left_semi")
    # the deduped frame feeds 3+ downstream branches (contamination
    # explode, the anti-join back, the shuffle/chunk trunk) — persist
    # it so the raw corpus scan + dedup join replay from cache instead
    # of re-reading the source per branch. Tracked so bench/sessions
    # can release it (operators/cache.release_all).
    from pyspark import StorageLevel

    from .operators.cache import track

    d = track(d.persist(StorageLevel.MEMORY_AND_DISK))

    if bench is not None:
        d = drop_contaminated(
            d, bench, id_col=id_col, text_col=text_col,
            threshold=cfg.contamination_threshold,
        )

    d = d.where(T.quality_score(F.col(text_col)) >= cfg.min_quality)
    if cfg.redact:
        # after the quality gate (scores judge the original text),
        # before sampling/chunking so no raw PII reaches the shards —
        # a map-side projection, no new shuffle
        d = d.withColumn(text_col, T.redact_pii(F.col(text_col)))
    if cfg.sample_fraction < 1.0:
        d = d.where(
            sample_predicate(F.col(id_col), cfg.sample_fraction, cfg.sample_salt)
        )

    d = shuffle_order(d, key_col=id_col, salt=cfg.shuffle_salt)
    chunks = chunk_documents(
        d.select(id_col, text_col, "shuffle_rank"),
        cfg.chunk_tokens, cfg.chunk_overlap, id_col=id_col, text_col=text_col,
        keep_cols=("shuffle_rank",),
    )
    # the shard cumsum makes three passes over the chunk frame
    # (quantile boundaries, per-bucket totals, final join+window) and
    # each pass would re-run the tokenizer explode — the single most
    # expensive expression in the pipeline (measured 2.2s/pass at
    # sf0.1, so caching cuts the shard stage ~3x). Persisted, not
    # checkpointed: recompute-on-evict is correct, just slower.
    chunks = track(chunks.persist(StorageLevel.MEMORY_AND_DISK))
    # shuffle_rank repeats across a doc's chunks -> chunk_id tiebreak
    sharded = contiguous_token_shards(
        chunks, budget=cfg.shard_budget_tokens,
        order_col="shuffle_rank", weight_col="n_chunk_tokens",
        tie_cols=("chunk_id",),
    )
    return sharded.select(
        id_col, "chunk_id", "n_chunk_tokens", "chunk_text",
        "shuffle_rank", "shard_id",
    )
