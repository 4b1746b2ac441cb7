"""Benchmark decontamination: n-gram overlap of a training corpus
against an evaluation/benchmark set.

The standard pre-training hygiene step (the reference engine has no
analogue; this is part of the training-data pipeline surface): for
every training document, measure what fraction of its word n-gram
shingles also appear anywhere in the benchmark set, and flag documents
above a contamination threshold for removal.

100-TB shape: the benchmark shingle dictionary is the SMALL side by
construction (eval sets are a few thousand documents even when the
corpus is 10^12 files), so it is distinct-ed once and broadcast — the
overlap test is a map-side broadcast hash join on the exploded
training shingles, followed by ONE partial-aggregated groupBy on
doc_id. No shuffle ever carries the benchmark side; the training
corpus is scanned exactly once (per-doc shingle totals ride through
the explode instead of a second scan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text as T


def benchmark_shingle_dict(bench: DataFrame, text_col: str = "text",
                           n: int = 3) -> DataFrame:
    """Distinct shingle dictionary of the benchmark set (the broadcast
    side), one column ``shingle``."""
    return (
        bench.select(F.explode(T.shingles(F.col(text_col), n)).alias("shingle"))
        .distinct()
    )


def drop_contaminated(
    train: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.05,
) -> DataFrame:
    """The cleaned corpus: ``train`` minus documents whose benchmark
    shingle overlap reaches ``threshold`` (shared by the CLI
    decontaminate subcommand and pipeline.prepare_corpus)."""
    rep = contamination_report(train, bench, id_col, text_col, n, threshold)
    bad = rep.where(F.col("contaminated") == 1).select(id_col)
    return train.join(bad, id_col, "left_anti")


def contamination_report(
    train: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.05,
) -> DataFrame:
    """Per-training-document contamination report.

    Returns (id, n_shingles, n_shared, overlap, contaminated) where
    overlap = |shingles(doc) ∩ shingles(benchmark)| / |shingles(doc)|
    and contaminated = 1 iff overlap >= threshold. Documents with no
    shingles (< n tokens) report overlap 0.0.
    """
    dict_df = F.broadcast(
        benchmark_shingle_dict(bench, text_col, n).withColumn("__hit", F.lit(1))
    )
    # single scan; explode_outer keeps shingle-less docs alive as one
    # null-shingle row. Deliberately NO size(shingles) column here:
    # Catalyst collapses such a projection ABOVE the Generate, where
    # the whole shingle expression is re-evaluated per exploded row
    # (measured 7x-inlined, ~50x per-doc recompute at 52 shingles/doc).
    # The array is distinct per doc, so count(shingle) in the agg IS
    # its size — one expression evaluation per document, total.
    ex = train.select(
        F.col(id_col),
        F.explode_outer(T.shingles(F.col(text_col), n)).alias("shingle"),
    )
    agg = (
        ex.join(dict_df, "shingle", "left")
        .groupBy(id_col)
        .agg(
            F.count("shingle").cast("int").alias("n_shingles"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_shared"),
        )
    )
    overlap: Column = F.col("n_shared") / F.greatest(F.col("n_shingles"), F.lit(1))
    return agg.select(
        id_col,
        "n_shingles",
        "n_shared",
        F.round(overlap, 6).alias("overlap"),
        (overlap >= threshold).cast("int").alias("contaminated"),
    )
