"""Snapshot diffing: which partitions changed between two versions
of the corpus table — the input to ValidationSuite.run_incremental's
metadata fast path.

On Iceberg this is free: data files are immutable, a snapshot diff
lists exactly the added/removed files, and manifest metadata maps
files to partition values. This module is the plain-parquet analogue
for engines without a table format:

* ``snapshot_listing(path)`` — a driver-side manifest of the data
  files under a table directory: {relative_path: size}. Metadata
  only; no file content is read. Persist it (JSON) next to the run
  dir after each validated snapshot.
* ``changed_partitions_between(spark, old_listing, new_path, pcol)``
  — diff the current listing against the stored one; for files that
  are new or resized, read ONLY the partition column (parquet column
  pruning — KB-scale I/O per file regardless of content width) and
  return the distinct partition values touched. Files that vanished
  are reported separately; the caller decides whether a removal
  invalidates a partition (it does whenever files aren't immutable).

Works on append-style tables where files are immutable once written
(the Iceberg/Delta contract). A table that REWRITES files in place
with identical sizes defeats the listing diff — use
run_incremental's fingerprint scan there instead.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def snapshot_listing(path: str) -> dict[str, int]:
    """{relative file path: size in bytes} for every data file under
    ``path``. Skips Spark bookkeeping (_SUCCESS, .crc, _temporary)."""
    out: dict[str, int] = {}
    for root, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for f in files:
            if f.startswith(("_", ".")):
                continue
            full = os.path.join(root, f)
            out[os.path.relpath(full, path)] = os.path.getsize(full)
    return out


def changed_partitions_between(
    spark: SparkSession,
    old_listing: dict[str, int],
    new_path: str,
    pcol: str = "lang",
) -> tuple[list[str], list[str]]:
    """(changed partition values, removed file relpaths).

    Changed = partition values present in files that are new or
    resized since ``old_listing``. Only the partition column of those
    files is read (column-pruned scan); unchanged files cost zero I/O.
    """
    from urllib.parse import unquote

    new_listing = snapshot_listing(new_path)
    added = [
        rel
        for rel, size in new_listing.items()
        if old_listing.get(rel) != size
    ]
    removed = [rel for rel in old_listing if rel not in new_listing]
    if not added:
        return [], removed
    # hive-partitioned layout: the partition value is IN the path
    # (Spark %-escapes special chars) — zero I/O, exactly like an
    # Iceberg manifest's partition tuple
    pref = f"{pcol}="
    from_path = set()
    for rel in added:
        seg = next(
            (s for s in rel.split(os.sep) if s.startswith(pref)), None
        )
        if seg is None:
            break
        from_path.add(unquote(seg[len(pref):]))
    else:
        return sorted(from_path), removed
    # unpartitioned layout: column-pruned read of ONLY the added
    # files (basePath keeps any partial hive structure resolvable)
    paths = [os.path.join(new_path, rel) for rel in added]
    changed = [
        r[0]
        for r in spark.read.option("basePath", new_path)
        .parquet(*paths)
        .select(pcol)
        .distinct()
        .collect()
    ]
    return sorted(changed), removed
