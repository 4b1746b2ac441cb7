"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship drift query: distributed KNN outlier
scoring with threshold/labels over the sf0.001 embeddings table
(pytod knn.py:100-108 + base.py:414-435 semantics).

``queries()`` / ``oracle_sql()`` — the operator catalogue from
SURVEY.md §2 with DuckDB oracles (see pytod_spark/queries.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pyspark.sql import functions as F

    from pytod_spark.deploy import ensure_shipped
    from pytod_spark.detectors import KNN

    ensure_shipped(spark)

    sf_dir = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("row_id"),
        F.col("embedding").cast("array<double>").alias("features"),
    )
    det = KNN(contamination=0.1, n_neighbors=5, batch_size=256, strategy="distributed")
    out = det.fit_df(emb)
    return out.select(
        "row_id",
        F.round("score", 6).alias("score"),
        F.round("threshold", 6).alias("threshold"),
        "label",
    ).orderBy("row_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pytod_spark.deploy import ensure_shipped
    from pytod_spark.queries import QUERIES

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_shipped(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from pytod_spark.queries import ORACLES

    return dict(ORACLES)
