"""ValidationSuite: the end-to-end engine of the north_rule.

Composes, over an input corpus table (repo, path, commit, lang,
content):

  stage A (resumable per partition, idempotent writes):
    features -> per-partition column stats -> uniqueness violations ->
    referential-integrity violations -> drift scores (pytod-parity
    detector per partition)
  stage B (cheap, recomputed every run from persisted stage-A output):
    global score threshold -> drift violations/labels ->
    per-partition pass/fail verdicts + metrics

Scale/skew posture:
* every check is a single grouped aggregation / anti-join — partial
  aggregation absorbs the giant-repo key skew, AQE splits skewed
  joins;
* the feature stage repartitions on (partition, salt) so one giant
  lang cannot pin the Arrow UDF stage to a few tasks (salted
  repartitioning per north_rule);
* stage-A outputs are written with dynamic partition overwrite
  (partitionBy(partition_col) + mode=overwrite), so re-running a
  partition after a crash replaces, never duplicates — this is what
  makes resume idempotent;
* resume skips partitions with completion markers
  (<run_dir>/markers/<partition>.json holding per-check lineage
  counts) — kill the job mid-run, rerun, and only unfinished
  partitions recompute.

The drift stage defaults to HBOS (pure-SQL plan, scores comparable
across partitions); every other detector from pytod_spark.detectors
can be plugged in. Note ECOD reproduces the reference's argsort
permutation quirk (scores land on rank positions, not rows) — parity-
faithful but not row-attributable, hence not the engine default.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Iterable
from concurrent.futures import ThreadPoolExecutor, as_completed

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..detectors import ALL_DETECTORS
from .constraints import ri_violations, uniqueness_violations
from .features import derive_features
from .stats import column_stats

FEATURE_COLS = ["content_length", "line_count", "token_entropy"]


class ValidationSuite:
    def __init__(
        self,
        key_cols: Iterable[str] = ("repo", "path", "commit"),
        partition_col: str = "lang",
        detector: str = "hbos",
        detector_params: dict | None = None,
        contamination: float = 0.1,
        max_outlier_rate: float | None = None,
        n_salt: int = 16,
    ):
        self.key_cols = list(key_cols)
        self.partition_col = partition_col
        self.detector = detector
        self.detector_params = detector_params or {}
        self.contamination = contamination
        # a partition fails the drift check when its share of globally-
        # thresholded outliers exceeds this rate
        self.max_outlier_rate = max_outlier_rate or 1.5 * contamination
        self.n_salt = n_salt

    # ------------------------------------------------------------ helpers

    def _marker_path(self, run_dir: str, part: str) -> str:
        return os.path.join(run_dir, "markers", f"{part}.json")

    def _done_partitions(self, run_dir: str) -> set[str]:
        mdir = os.path.join(run_dir, "markers")
        if not os.path.isdir(mdir):
            return set()
        return {f[:-5] for f in os.listdir(mdir) if f.endswith(".json")}

    def _write_partitioned(self, df: DataFrame, run_dir: str, name: str) -> None:
        # one shuffle partition per partition value -> one file per
        # hive dir instead of (n_tasks x n_values) tiny files; the
        # commit protocol (driver-side file moves) is the serial part
        # of every write, so file count is what it scales with
        (
            df.repartition(self.partition_col)
            .write.partitionBy(self.partition_col)
            .mode("overwrite")
            .parquet(os.path.join(run_dir, name))
        )

    # ---------------------------------------------------------------- run

    def run(
        self,
        spark: SparkSession,
        df: DataFrame,
        run_dir: str,
        parent: DataFrame | None = None,
        ri_keys: Iterable[str] = ("repo", "commit"),
        resume: bool = True,
    ) -> dict:
        t0 = time.time()
        phase_times: dict[str, float] = {}

        def _mark(label, start):
            phase_times[label] = round(time.time() - start, 2)
            return time.time()

        os.makedirs(os.path.join(run_dir, "markers"), exist_ok=True)
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        pcol = self.partition_col

        all_parts = [r[0] for r in df.select(pcol).distinct().collect()]
        done = self._done_partitions(run_dir) if resume else set()
        pending = sorted(set(all_parts) - done)
        stage_a_rows = 0

        tp = time.time()
        if pending:
            work = df.where(F.col(pcol).isin(pending))
            # salted repartition: spread each (possibly giant) partition
            # across n_salt tasks for the Arrow feature stage
            salt = F.pmod(F.xxhash64(*self.key_cols), F.lit(self.n_salt))
            work = work.repartition(
                max(spark.sparkContext.defaultParallelism, self.n_salt),
                F.col(pcol), salt,
            )
            # drop the raw content before persisting: every downstream
            # check needs only keys + invariant hash + numeric features,
            # and caching multi-hundred-byte blobs per row would make the
            # cache (and the score join) content-bound
            feats = derive_features(work).select(
                pcol, "row_id", *self.key_cols, "content_sha256",
                *FEATURE_COLS, "features",
            ).persist()
            stage_a_rows = feats.count()
            tp = _mark("features", tp)

            # The four checks below are independent given the cached
            # feature frame — run them as concurrent driver threads so
            # their (serial) plan/commit overheads overlap and the
            # executor pool stays saturated. On a cluster this is the
            # standard multi-job scheduler pattern; correctness is
            # unaffected because each writes a distinct output.
            def _job_stats():
                self._write_partitioned(
                    column_stats(feats, FEATURE_COLS, [pcol]), run_dir, "stats"
                )

            def _job_uniqueness():
                self._write_partitioned(
                    uniqueness_violations(feats, self.key_cols, [pcol]),
                    run_dir,
                    "uniqueness_violations",
                )

            def _job_ri():
                if parent is not None:
                    self._write_partitioned(
                        ri_violations(
                            feats, parent, list(ri_keys),
                            child_cols=[pcol, *self.key_cols, "content_sha256"],
                        ),
                        run_dir,
                        "ri_violations",
                    )

            def _job_drift():
                det_cls = ALL_DETECTORS[self.detector]
                det = det_cls(contamination=self.contamination, **self.detector_params)
                scores = det.score_df(
                    feats, id_col="row_id", features_col="features", group_cols=[pcol]
                )
                keyed = scores.join(
                    feats.select(pcol, "row_id", *self.key_cols, "content_sha256"),
                    on=[pcol, "row_id"],
                )
                self._write_partitioned(keyed, run_dir, "drift_scores")

            counts: dict = {}

            def _job_counts():
                counts.update(
                    {
                        r[pcol]: r["n"]
                        for r in feats.groupBy(pcol).agg(
                            F.count(F.lit(1)).alias("n")
                        ).collect()
                    }
                )

            jobs = [
                ("stats", _job_stats),
                ("uniqueness", _job_uniqueness),
                ("ri", _job_ri),
                ("drift_scores", _job_drift),
                ("counts", _job_counts),
            ]
            with ThreadPoolExecutor(max_workers=len(jobs)) as pool:
                futs = {pool.submit(fn): name for name, fn in jobs}
                for fut in as_completed(futs):
                    fut.result()  # propagate the first failure
            tp = _mark("checks_parallel", tp)
            feats.unpersist()
            for part in pending:
                with open(self._marker_path(run_dir, part), "w") as fh:
                    json.dump(
                        {
                            "partition": part,
                            "n_rows": counts.get(part, 0),
                            "checks": ["stats", "uniqueness", "ri", "drift_scores"],
                            "completed_at": time.time(),
                        },
                        fh,
                    )

        # ---------------- stage B: global threshold + verdicts (always)
        tp = time.time()
        scores = spark.read.parquet(os.path.join(run_dir, "drift_scores"))
        thr = scores.agg(
            F.percentile("score", 1 - self.contamination).alias("t")
        ).collect()[0]["t"]
        labeled = scores.withColumn("label", (F.col("score") > F.lit(thr)).cast("int"))
        self._write_partitioned(
            labeled.where(F.col("label") == 1).withColumn("threshold", F.lit(thr)),
            run_dir,
            "drift_violations",
        )

        drift_rates = labeled.groupBy(pcol).agg(
            F.count(F.lit(1)).alias("n_rows"), F.avg("label").alias("outlier_rate")
        )
        uniq = (
            spark.read.parquet(os.path.join(run_dir, "uniqueness_violations"))
            .groupBy(pcol)
            .agg(
                F.count(F.lit(1)).alias("n_dup_keys"),
                F.sum(F.col("n_copies") - 1).alias("n_extra_rows"),
            )
        )
        verdicts = drift_rates.join(uniq, on=pcol, how="left").na.fill(
            {"n_dup_keys": 0, "n_extra_rows": 0}
        )
        if parent is not None:
            ri = (
                spark.read.parquet(os.path.join(run_dir, "ri_violations"))
                .groupBy(pcol)
                .agg(F.count(F.lit(1)).alias("n_orphans"))
            )
            verdicts = verdicts.join(ri, on=pcol, how="left").na.fill({"n_orphans": 0})
        else:
            verdicts = verdicts.withColumn("n_orphans", F.lit(0))

        verdicts = verdicts.select(
            pcol,
            "n_rows",
            "n_dup_keys",
            "n_extra_rows",
            "n_orphans",
            F.round("outlier_rate", 6).alias("outlier_rate"),
            (F.col("n_dup_keys") == 0).alias("uniqueness_pass"),
            (F.col("n_orphans") == 0).alias("ri_pass"),
            (F.col("outlier_rate") <= self.max_outlier_rate).alias("drift_pass"),
        ).withColumn(
            "partition_pass",
            F.col("uniqueness_pass") & F.col("ri_pass") & F.col("drift_pass"),
        )
        # collect the (tiny) verdict table once and write from the
        # driver-side rows — avoids re-running the join DAG for the
        # metrics pass
        verdict_rows = verdicts.collect()
        spark.createDataFrame(verdict_rows, verdicts.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(run_dir, "verdicts"))
        _mark("stage_b", tp)

        elapsed = time.time() - t0
        total_rows = sum(r["n_rows"] for r in verdict_rows)
        metrics = {
            "elapsed_sec": elapsed,
            "partitions_total": len(all_parts),
            "partitions_resumed_skip": len(done),
            "stage_a_rows": stage_a_rows,
            "rows_total": total_rows,
            "files_per_sec": stage_a_rows / elapsed if elapsed > 0 else 0.0,
            "threshold": thr,
            "phase_times": phase_times,
            "failed_partitions": [r[self.partition_col] for r in verdict_rows if not r["partition_pass"]],
        }
        with open(os.path.join(run_dir, f"metrics_{int(t0)}.json"), "w") as fh:
            json.dump(metrics, fh, indent=2)
        return metrics
