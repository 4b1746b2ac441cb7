"""Structured-streaming drift monitor: file source -> frozen HBOS
model scoring -> windowed alerts, executed with availableNow triggers
and a memory sink (deterministic, offline)."""

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from pytod_spark.oracle.detectors import hbos_scores
from pytod_spark.streaming import drift_alerts, fit_reference_model, score_stream


@pytest.fixture(scope="module")
def ref_df(spark):
    rng = np.random.default_rng(5)
    vals = rng.normal(50, 5, size=500)
    return spark.createDataFrame([(float(v),) for v in vals], "value double")


def test_model_matches_oracle_hbos(spark, ref_df):
    model = fit_reference_model(ref_df, "value", n_bins=10, alpha=0.1)
    scored = score_stream(ref_df, model, "value").collect()
    vals = np.array([r["value"] for r in ref_df.collect()])[:, None]
    expected = hbos_scores(vals, n_bins=10, alpha=0.1)
    got = np.array([r["score"] for r in scored])
    np.testing.assert_allclose(np.sort(got), np.sort(expected), rtol=1e-9)


def test_streaming_drift_alert(spark, ref_df, tmp_path):
    model = fit_reference_model(ref_df, "value")
    src = str(tmp_path / "stream_src")

    rng = np.random.default_rng(6)
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    normal = [(t0 + dt.timedelta(seconds=int(i)), "a", float(v))
              for i, v in enumerate(rng.normal(50, 5, size=200))]
    # a drifted group: values far outside the reference histogram
    drifted = [(t0 + dt.timedelta(seconds=int(i)), "b", float(v))
               for i, v in enumerate(rng.normal(200, 5, size=200))]
    spark.createDataFrame(normal + drifted, "ts timestamp, grp string, value double").write.mode(
        "overwrite"
    ).parquet(src)

    stream = spark.readStream.schema("ts timestamp, grp string, value double").parquet(src)
    alerts = drift_alerts(
        stream, model, "value", ts_col="ts", group_cols=("grp",),
        window="1 minute", watermark="2 minutes", max_outlier_rate=0.35,
    )
    q = (
        alerts.writeStream.format("memory")
        .queryName("drift_alerts_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("select * from drift_alerts_t").collect()
    # windows may be withheld by the watermark in append mode; assert on
    # what was emitted plus a complete-mode re-run for full coverage
    q2 = (
        drift_alerts(stream, model, "value", ts_col="ts", group_cols=("grp",), max_outlier_rate=0.35)
        .writeStream.format("memory")
        .queryName("drift_alerts_c")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    rows = spark.sql("select * from drift_alerts_c").collect()
    by_grp = {}
    for r in rows:
        by_grp.setdefault(r["grp"], []).append(r)
    assert all(r["drift_alert"] == 1 for r in by_grp["b"])  # drifted group alerts
    assert all(r["drift_alert"] == 0 for r in by_grp["a"])  # normal group clean
    assert isinstance(out, list)  # append-mode ran without error


def test_cusum_scan_matches_recurrence():
    import numpy as np

    from pytod_spark.streaming.cusum import _cusum_scan

    rng = np.random.default_rng(0)
    for _ in range(50):
        x = rng.integers(0, 2, rng.integers(1, 40)).astype(float)
        k, c0 = rng.uniform(0, 1), rng.uniform(0, 8)
        c, exp = c0, []
        for v in x:
            c = max(0.0, c + v - k)
            exp.append(c)
        np.testing.assert_allclose(_cusum_scan(x, k, c0), exp)


def test_cusum_stateful_stream(spark, ref_df, tmp_path):
    import time

    from pyspark.sql import functions as F

    from pytod_spark.streaming.cusum import cusum_drift_stream
    from pytod_spark.streaming.drift_monitor import fit_reference_model

    model = fit_reference_model(ref_df, "value", contamination=0.1)
    src = str(tmp_path / "src")
    chk = str(tmp_path / "chk")
    # batch 1: all-drift group 'b' (values far outside the reference),
    # clean group 'a'
    rows_a = [("a", 45.0 + float(v % 10), i) for i, v in enumerate(range(40))]
    rows_b = [("b", 99.0, i) for i in range(40)]
    df = spark.createDataFrame(rows_a + rows_b, "g string, value double, seq long")
    df = df.withColumn("ts", F.timestamp_seconds(F.lit(1700000000) + F.col("seq")))
    df.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(df.schema).parquet(src)
    out = cusum_drift_stream(stream, model, "value", "g", target_rate=0.3)
    q = (
        out.writeStream.format("memory")
        .queryName("cusum_out")
        .outputMode("update")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    res = {r["group"]: r for r in spark.sql("SELECT * FROM cusum_out").collect()}
    assert res["b"]["alert"] == 1 and res["b"]["cusum"] > 5.0
    assert res["a"]["alert"] == 0
    assert res["a"]["n_seen"] == 40 and res["b"]["n_seen"] == 40


def test_streaming_exact_dedup(spark, tmp_path):
    """Exactly one representative per content hash survives (which
    copy is unordered within a micro-batch); in-watermark
    re-deliveries are dropped; distinct texts all pass."""
    import datetime as dt

    from pytod_spark.streaming import streaming_exact_dedup

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = []
    for i in range(50):
        rows.append((t0 + dt.timedelta(seconds=i), i, f"doc body {i % 20}"))
    src = str(tmp_path / "dedup_src")
    spark.createDataFrame(rows, "ts timestamp, doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(src)

    stream = spark.readStream.schema("ts timestamp, doc_id long, text string").parquet(src)
    out = streaming_exact_dedup(stream, ts_col="ts", watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from dedup_t").collect()
    # 20 distinct bodies -> exactly 20 survivors, one per body
    assert len(got) == 20
    assert sorted(r["text"] for r in got) == sorted(f"doc body {i}" for i in range(20))
    # every survivor's doc_id is congruent to its body index mod 20
    for r in got:
        assert r["text"] == f"doc body {r['doc_id'] % 20}"


def test_streaming_seen_filter(spark, tmp_path):
    import datetime as dt

    from pyspark.sql import functions as F

    from pytod_spark.streaming import streaming_seen_filter

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = [(t0, i, f"body {i}") for i in range(10)]
    src = str(tmp_path / "seen_src")
    spark.createDataFrame(rows, "ts timestamp, doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(src)
    # catalog already contains bodies 0-4
    seen = spark.createDataFrame([(f"body {i}",) for i in range(5)], "text string").select(
        F.sha2("text", 256).alias("text_sha")
    )
    stream = spark.readStream.schema("ts timestamp, doc_id long, text string").parquet(src)
    out = streaming_seen_filter(stream, seen)
    q = (
        out.writeStream.format("memory")
        .queryName("seen_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r["doc_id"] for r in spark.sql("select * from seen_t").collect())
    assert got == [5, 6, 7, 8, 9]


def test_cusum_multi_chunk_batch_is_ts_ordered(spark, ref_df, tmp_path):
    """A group bigger than arrow.maxRecordsPerBatch arrives as several
    Arrow chunks; the order-dependent CUSUM scan must sort the WHOLE
    batch by ts, not each chunk independently."""
    import time

    from pyspark.sql import functions as F

    from pytod_spark.streaming.cusum import _cusum_scan, cusum_drift_stream
    from pytod_spark.streaming.drift_monitor import fit_reference_model, score_stream

    model = fit_reference_model(ref_df, "value", contamination=0.1)
    # drift early in ts, clean late — written in REVERSE ts order so
    # chunk-local sorting would scan clean-before-drift
    n = 400
    rows = [("g", 99.0 if i < n // 2 else 45.0 + (i % 10), i)
            for i in range(n)][::-1]
    df = spark.createDataFrame(rows, "g string, value double, seq long")
    df = df.withColumn("ts", F.timestamp_seconds(F.lit(1700000000) + F.col("seq")))
    src, chk = str(tmp_path / "src"), str(tmp_path / "chk")
    df.coalesce(1).write.mode("overwrite").parquet(src)

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
    try:
        stream = spark.readStream.schema(df.schema).parquet(src)
        out = cusum_drift_stream(stream, model, "value", "g", target_rate=0.3)
        q = (out.writeStream.format("memory").queryName("cusum_chunks")
             .outputMode("update").option("checkpointLocation", chk)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
    finally:
        if old is not None:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    res = spark.sql("SELECT * FROM cusum_chunks").collect()[0]
    # expected: the ts-sorted scan over the batch's labels
    labels = (score_stream(spark.createDataFrame(sorted(rows, key=lambda r: r[2]),
                                                 "g string, value double, seq long"),
                           model, "value")
              .orderBy("seq").select("label").toPandas()["label"].to_numpy())
    expected = float(_cusum_scan(labels, 0.3, 0.0)[-1])
    assert res["n_seen"] == n
    assert abs(res["cusum"] - expected) < 1e-9


def test_streaming_constraint_split(spark, tmp_path):
    """Ingest-time constraint gate: rows route to clean/violations
    sinks under an availableNow trigger with the batch operator's
    NULL-hostile semantics, and the union of sinks is the input."""
    from pytod_spark.streaming import streaming_constraint_split
    from pytod_spark.validation.constraints import RowConstraint

    src = str(tmp_path / "src")
    df = spark.createDataFrame(
        [(1, "short", "ok"), (2, "x" * 50, "ok"), (3, "mid", None), (4, "y" * 50, None)],
        "doc_id long, text string, src string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(df.schema).parquet(src)
    clean, viol = streaming_constraint_split(
        stream,
        [
            RowConstraint("len_bound", "length(text) < 20"),
            RowConstraint("src_present", "src IS NOT NULL"),
        ],
    )
    out_c, out_v = str(tmp_path / "clean"), str(tmp_path / "viol")
    for frame, out, name in ((clean, out_c, "c"), (viol, out_v, "v")):
        q = (
            frame.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    got_c = spark.read.parquet(out_c)
    got_v = spark.read.parquet(out_v)
    assert {r["doc_id"] for r in got_c.collect()} == {1}
    failed = {r["doc_id"]: list(r["failed_constraints"]) for r in got_v.collect()}
    assert failed == {
        2: ["len_bound"],
        3: ["src_present"],
        4: ["len_bound", "src_present"],
    }
    # clean side drops the tag column; violations keep it
    assert "failed_constraints" not in got_c.columns

    # build-time gates: non-boolean predicate and reserved tag column
    # are rejected before any query starts (same gates as batch)
    with pytest.raises(ValueError, match="expected boolean"):
        streaming_constraint_split(
            stream, [RowConstraint("notbool", "length(text)")]
        )
    with pytest.raises(ValueError, match="failed_constraints column"):
        streaming_constraint_split(
            viol, [RowConstraint("ok", "doc_id > 0")]
        )


def test_drift_model_save_load_roundtrip(spark, ref_df, tmp_path):
    """Persisted serving model: load(save(m)) == m exactly (doubles
    round-trip parquet bit-for-bit), and scoring against the loaded
    model is identical to scoring against the in-session fit — a
    restarted stream needs no refit."""
    from pytod_spark.streaming.drift_monitor import (
        load_reference_model,
        save_reference_model,
    )

    model = fit_reference_model(ref_df, "value", n_bins=10, alpha=0.1)
    ref = str(tmp_path / "drift_model")
    save_reference_model(spark, model, ref)
    loaded = load_reference_model(spark, ref)
    assert loaded == model
    a = score_stream(ref_df, model, "value").collect()
    b = score_stream(ref_df, loaded, "value").collect()
    assert [(r.value, r.score, r.label) for r in a] == [
        (r.value, r.score, r.label) for r in b
    ]


def test_drift_model_load_rejects_non_model(spark, tmp_path):
    from pytod_spark.streaming.drift_monitor import load_reference_model

    bad = str(tmp_path / "not_model")
    spark.range(5).write.parquet(bad)
    with pytest.raises(ValueError, match="not a model artifact"):
        load_reference_model(spark, bad)


def test_cli_fit_monitor(spark, ref_df, tmp_path):
    """CLI surface: fit-monitor persists a model the library loads."""
    import json as _json

    from pytod_spark.cli import main as cli_main
    from pytod_spark.streaming.drift_monitor import load_reference_model

    src = str(tmp_path / "refdata")
    ref_df.write.parquet(src)
    out = str(tmp_path / "model")
    import contextlib
    import io as _io

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli_main([
            "fit-monitor", "--ref", src, "--value-col", "value",
            "--out", out, "--contamination", "0.1",
        ])
    assert rc == 0
    summary = _json.loads(buf.getvalue().strip().splitlines()[-1])
    model = load_reference_model(spark, out)
    assert summary["threshold"] == model["threshold"]
    assert model["n_bins"] == 10
