"""Source/sink resolution for the validation engine.

The north_rule input is "an Iceberg table of source-code repositories";
this sandbox has no Iceberg runtime jars, so table references resolve
through Spark's catalog API when they name a catalog table (which is
exactly how an Iceberg table appears once `spark.sql.catalog.*` is
configured — no engine code changes needed) and fall back to parquet
paths for the driver-provided testdata. Either way the result is a
plain DataFrame and every downstream plan (pushdown, pruning,
partition filters) behaves identically.

Reference comparison: the reference's only "sources" are
scipy.io.loadmat / np.load (reproducibility/compare_real_data.py:55-76)
and its sink is appending to results.txt — there is no format layer to
port, so this one is Spark-native by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def load_table(spark: SparkSession, ref: str) -> DataFrame:
    """Resolve `ref` to a DataFrame.

    * ``table:<name>`` / ``iceberg:<name>`` — catalog table via
      ``spark.read.table`` (Iceberg, Hive, or a temp view; partition
      pruning and snapshot options come from the catalog impl);
    * a path containing ``/`` or ending in ``.parquet`` — parquet;
    * anything else — tried as a catalog table first, then parquet.
    """
    for prefix in ("iceberg:", "table:"):
        if ref.startswith(prefix):
            return spark.read.table(ref[len(prefix):])
    if "/" in ref or ref.endswith(".parquet"):
        return spark.read.parquet(ref)
    try:
        return spark.read.table(ref)
    except Exception:
        return spark.read.parquet(ref)


def write_table(df: DataFrame, ref: str, mode: str = "overwrite",
                partition_by: tuple[str, ...] = ()) -> None:
    """Write to a catalog table (``table:``/``iceberg:`` prefix) or a
    parquet path — the sink mirror of :func:`load_table`."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    for prefix in ("iceberg:", "table:"):
        if ref.startswith(prefix):
            w.saveAsTable(ref[len(prefix):])
            return
    w.parquet(ref)
