"""Runtime packaging: make ``pytod_spark`` importable on executors.

The engine is designed for ``spark-submit --py-files pytod_spark.zip``
(north_rule). When the driver process imported the package from a
plain directory instead (driver harness, notebooks), executor Python
workers cannot resolve the module referenced by our Arrow-kernel
closures — so we zip the package once and ``addPyFile`` it, which is
exactly what --py-files does, just self-serve.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[str] = set()


def build_pyfiles_zip(target: str | None = None) -> str:
    """Zip the pytod_spark package. The default target is a
    per-process temp file: one fixed shared path would let a second
    process truncate the zip while this session's executors are still
    fetching it (corrupt imports), and fails outright across users."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    if target is None:
        fd, target = tempfile.mkstemp(
            prefix=f"pytod_spark_pyfiles_{os.getpid()}_", suffix=".zip"
        )
        os.close(fd)
    with zipfile.ZipFile(target, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for fname in files:
                if not fname.endswith(".py"):
                    continue
                full = os.path.join(root, fname)
                rel = os.path.join("pytod_spark", os.path.relpath(full, pkg_dir))
                zf.write(full, rel)
    return target


def ensure_shipped(spark: SparkSession) -> None:
    """Ship the package to this session's executors exactly once."""
    key = spark.sparkContext.applicationId
    if key in _SHIPPED:
        return
    spark.sparkContext.addPyFile(build_pyfiles_zip())
    _SHIPPED.add(key)
