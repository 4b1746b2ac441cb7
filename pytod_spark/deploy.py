"""Runtime packaging: make ``pytod_spark`` importable on executors.

The engine is designed for ``spark-submit --py-files pytod_spark.zip``
(north_rule). When the driver process imported the package from a
plain directory instead (driver harness, notebooks), executor Python
workers cannot resolve the module referenced by our Arrow-kernel
closures — so we zip the package once and ``addPyFile`` it, which is
exactly what --py-files does, just self-serve.
"""

from __future__ import annotations

import atexit
import os
import tempfile
import threading
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[str] = set()
_DEFAULT_ZIP: str | None = None
_ZIP_LOCK = threading.Lock()


def _default_zip_target() -> str:
    """One mkstemp'd zip path per process, unlinked at interpreter
    exit. Per-process (not one fixed shared path) so a second process
    can't truncate the zip while this session's executors are still
    fetching it; cached + atexit-cleaned so repeated session cycles in
    one harness don't leak a zip per call into $TMPDIR."""
    global _DEFAULT_ZIP
    if _DEFAULT_ZIP is None:
        fd, _DEFAULT_ZIP = tempfile.mkstemp(
            prefix=f"pytod_spark_pyfiles_{os.getpid()}_", suffix=".zip"
        )
        os.close(fd)
        atexit.register(_cleanup_default_zip)
    return _DEFAULT_ZIP


def _cleanup_default_zip() -> None:
    if _DEFAULT_ZIP and os.path.exists(_DEFAULT_ZIP):
        try:
            os.unlink(_DEFAULT_ZIP)
        except OSError:
            pass


def build_pyfiles_zip(target: str | None = None) -> str:
    """Zip the pytod_spark package (rebuilt on every call so the zip
    tracks the code; the default target is this process's cached temp
    path, see :func:`_default_zip_target`).

    The zip is written to a sibling temp file and ``os.replace``d onto
    the target: Spark's file server hands executors the file at its
    original path, fetched lazily at task start, so an in-place
    truncate-and-rewrite could serve a partial archive to a worker
    that fetches mid-rebuild. The rename keeps every reader on either
    the complete old bytes (their already-open fd) or the complete new
    ones, never a torn zip. The lock serializes first-call target
    creation and concurrent rebuilds within this process."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    with _ZIP_LOCK:
        if target is None:
            target = _default_zip_target()
        fd, tmp = tempfile.mkstemp(
            dir=os.path.dirname(os.path.abspath(target)) or ".",
            prefix=".pytod_spark_pyfiles_", suffix=".zip.tmp",
        )
        try:
            with os.fdopen(fd, "wb") as fh, \
                    zipfile.ZipFile(fh, "w", zipfile.ZIP_DEFLATED) as zf:
                for root, _dirs, files in os.walk(pkg_dir):
                    if "__pycache__" in root:
                        continue
                    for fname in files:
                        if not fname.endswith(".py"):
                            continue
                        full = os.path.join(root, fname)
                        rel = os.path.join(
                            "pytod_spark", os.path.relpath(full, pkg_dir))
                        zf.write(full, rel)
            os.replace(tmp, target)
        except BaseException:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise
    return target


def ensure_shipped(spark: SparkSession) -> None:
    """Ship the package to this session's executors exactly once."""
    key = spark.sparkContext.applicationId
    if key in _SHIPPED:
        return
    spark.sparkContext.addPyFile(build_pyfiles_zip())
    _SHIPPED.add(key)
