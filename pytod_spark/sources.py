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

import os
import re

from pyspark.sql import DataFrame, SparkSession

# dotted chain of plain SQL identifiers — anything a catalog could
# plausibly name; bare refs outside this (``corpus-v2``) can only be
# paths and go straight to parquet
_IDENTIFIER_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*)*\Z")

# one table for every format-prefixed ref — load_table, load_stream,
# and write_table must stay symmetric (a ref that loads must write)
_FORMAT_PREFIXES = (
    ("jsonl:", "json"),
    ("json:", "json"),
    ("csv:", "csv"),
    ("orc:", "orc"),
)


def load_table(spark: SparkSession, ref: str, schema=None) -> DataFrame:
    """Resolve `ref` to a DataFrame.

    * ``table:<name>`` / ``iceberg:<name>`` — catalog table via
      ``spark.read.table`` (Iceberg, Hive, or a temp view; partition
      pruning and snapshot options come from the catalog impl);
    * ``jsonl:<path>`` / ``json:<path>`` — line-delimited JSON (the
      standard LLM-corpus interchange format; Spark's json reader is
      jsonl-native), ``csv:<path>`` (with header), ``orc:<path>``;
    * a path containing ``/``, ending in ``.parquet``, or a bare name
      that is not a valid SQL identifier chain (``corpus-v2``) —
      parquet;
    * anything else — catalog table first (a registered view or table
      always wins over a same-named cwd entry), parquet fallback only
      when the table is genuinely absent.

    ``schema`` (DDL string or StructType) applies to the json/csv
    readers and is the SCALE path: without it Spark schema-infers with
    an extra full pass over the data — fine for ad-hoc refs, wrong at
    corpus scale. Parquet/ORC/tables carry their own schema; passing
    one there raises rather than silently ignoring it.
    """
    for prefix in ("iceberg:", "table:"):
        if ref.startswith(prefix):
            if schema is not None:
                raise ValueError(
                    f"{prefix} refs carry their own schema; drop the "
                    "schema argument"
                )
            return spark.read.table(ref[len(prefix):])
    for prefix, fmt in _FORMAT_PREFIXES:
        if ref.startswith(prefix):
            path = _absolutize_local(spark, ref[len(prefix):])
            if fmt == "orc":
                if schema is not None:
                    raise ValueError(
                        "orc: refs carry their own schema; drop the "
                        "schema argument"
                    )
                return spark.read.orc(path)
            reader = spark.read
            if schema is not None:
                reader = reader.schema(schema)
            if fmt == "csv":
                # multiLine: source text virtually always contains
                # newlines; without it a quoted embedded newline
                # silently splits one record into corrupt fragments.
                # escape='"' matches the writer's quote-doubling.
                reader = (
                    reader.option("header", "true")
                    .option("multiLine", "true")
                    .option("escape", '"')
                )
                if schema is None:
                    reader = reader.option("inferSchema", "true")
            return reader.format(fmt).load(path)
    if schema is not None:
        raise ValueError(
            "schema only applies to json:/jsonl:/csv: refs; parquet "
            "and catalog tables carry their own"
        )
    if "/" in ref or ref.endswith(".parquet") or not _IDENTIFIER_RE.match(ref):
        return spark.read.parquet(_absolutize_local(spark, ref))
    try:
        return spark.read.table(ref)
    except Exception as e:
        # fall back ONLY for a genuinely missing table — a metastore
        # connectivity / permission / corrupt-metadata error must
        # surface as itself, not as an unrelated parquet path error
        if "TABLE_OR_VIEW_NOT_FOUND" in str(e) or "Table or view not found" in str(e):
            return spark.read.parquet(_absolutize_local(spark, ref))
        raise


def _absolutize_local(spark: SparkSession, ref: str, for_write: bool = False) -> str:
    """Absolutize a bare relative dir, but ONLY when the session's
    default filesystem is local: the caller's intent was checked
    against the Python process's cwd, while Spark resolves a relative
    path against the JVM's user.dir — these differ under pytest chdir
    / notebook kernels. On a cluster whose fs.defaultFS is HDFS/S3 a
    relative ref means a defaultFS-relative path, and rewriting it to
    a driver-local abspath (that merely happens to exist in the
    checkout) would point Spark at the wrong filesystem entirely.

    ``for_write=True`` (the sink path) absolutizes even when the path
    does not exist yet — the normal case for a fresh write target;
    without it a fresh relative write resolves against the JVM's
    user.dir while a later load of the same ref resolves against the
    Python cwd, breaking load/write symmetry."""
    if "://" in ref or os.path.isabs(ref):
        return ref
    if not for_write and not os.path.exists(ref):
        return ref
    try:
        default_fs = (
            spark.sparkContext._jsc.hadoopConfiguration().get(
                "fs.defaultFS", "file:///"
            )
        )
    except Exception:
        default_fs = "file:///"
    if default_fs.startswith("file:"):
        return os.path.abspath(ref)
    return ref


def load_stream(spark: SparkSession, ref: str, schema=None) -> DataFrame:
    """Streaming mirror of :func:`load_table` — resolve ``ref`` to a
    ``readStream`` DataFrame for the ingest-time operators
    (streaming/). ``table:``/``iceberg:`` refs stream from the
    catalog (``readStream.table``; schema comes from the catalog and
    must not be passed). File refs (``jsonl:``/``json:``/``csv:``/
    ``orc:`` prefixes, else parquet) REQUIRE ``schema`` — Structured
    Streaming file sources never infer, by design: inference would
    re-run per restart and a schema drift would silently change the
    query instead of failing it."""
    for prefix in ("iceberg:", "table:"):
        if ref.startswith(prefix):
            if schema is not None:
                raise ValueError(
                    f"{prefix} refs carry their own schema; drop the "
                    "schema argument"
                )
            return spark.readStream.table(ref[len(prefix):])
    # mirror load_table's bare-identifier catalog resolution: a name
    # that streams fine as `table:corpus` must not be misdiagnosed as
    # a parquet path missing a schema
    if _IDENTIFIER_RE.match(ref) and spark.catalog.tableExists(ref):
        if schema is not None:
            raise ValueError(
                f"{ref!r} is a catalog table; it carries its own "
                "schema — drop the schema argument"
            )
        return spark.readStream.table(ref)
    if schema is None:
        raise ValueError(
            "streaming file sources require an explicit schema "
            "(inference would re-run per restart and mask drift)"
        )
    reader = spark.readStream.schema(schema)
    for prefix, fmt in _FORMAT_PREFIXES:
        if ref.startswith(prefix):
            if fmt == "csv":
                reader = (
                    reader.option("header", "true")
                    .option("multiLine", "true")
                    .option("escape", '"')
                )
            return reader.format(fmt).load(
                _absolutize_local(spark, ref[len(prefix):])
            )
    return reader.parquet(_absolutize_local(spark, ref))


def write_table(df: DataFrame, ref: str, mode: str = "overwrite",
                partition_by: tuple[str, ...] = (),
                bucket_by: tuple[str, ...] = (), n_buckets: int = 0) -> None:
    """Write to a catalog table (``table:``/``iceberg:`` prefix) or a
    parquet path — the sink mirror of :func:`load_table`.

    ``bucket_by`` + ``n_buckets`` write a bucketed (and bucket-sorted)
    catalog table: two tables bucketed on the same key with the same
    bucket count sort-merge join with ZERO exchanges
    (tests/test_plan_shapes.py::test_bucketed_tables_join_without_shuffle)
    — the co-location lever for repeated big-big joins at corpus
    scale. Bucketing requires a catalog table, not a bare path.
    """
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if bucket_by:
        if n_buckets <= 0:
            raise ValueError("bucket_by requires n_buckets > 0")
        w = w.bucketBy(n_buckets, *bucket_by).sortBy(*bucket_by)
    for prefix in ("iceberg:", "table:"):
        if ref.startswith(prefix):
            w.saveAsTable(ref[len(prefix):])
            return
    if bucket_by:
        raise ValueError("bucketed writes need a table: / iceberg: ref")
    spark = df.sparkSession
    for prefix, fmt in _FORMAT_PREFIXES:
        if ref.startswith(prefix):
            # jsonl export is how prepared corpora leave the engine
            # for training consumers; csv writes a header (and the
            # reader sets multiLine) so embedded newlines round-trip.
            # escape='"' = RFC-4180 quote-doubling on BOTH sides —
            # Spark's writer default escapes quotes with backslash,
            # which the multiLine reader would misparse.
            if fmt == "csv":
                w = w.option("header", "true").option("escape", '"')
            w.format(fmt).save(
                _absolutize_local(spark, ref[len(prefix):], for_write=True)
            )
            return
    w.parquet(_absolutize_local(spark, ref, for_write=True))
