"""SparkSession factory tuned for the validation engine.

Defaults encode the scale posture (SURVEY.md §7): Arrow batching for
kernel UDFs, AQE + skew-join handling on (replaces the reference's
static tile slicing, multi-knn.py:154-168), and partition counts sized
for the local[N] sandbox while remaining overridable for a real
cluster via ``spark-submit --conf``.
"""

from __future__ import annotations

import os
import warnings

from pyspark.sql import SparkSession

DEFAULT_CONFS: dict[str, str] = {
    # Arrow is the transport for every kernel (no per-row Python).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # AQE replaces pytod's hand-rolled static batching/tiling
    # (reference intermediate_layers.py:167-211) at the plan level.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Small-dim broadcast joins stay automatic; threshold is generous
    # because our dimension tables (histogram models, thresholds,
    # per-group stats) are tiny.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.session.timeZone": "UTC",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


# glibc malloc tuning for every process in the Spark tree (driver,
# JVM, forked Python workers): without it each large numpy/Arrow
# buffer (>32MB: a cdist tile, an Arrow batch) is mmap'd and munmap'd
# per use, the freed pages are returned to the OS, and every reuse
# pays first-touch page faults again — measured in this virtualized
# sandbox at 4-120 MB/s fault rate, i.e. a 134MB tile buffer cost
# 1-30s per *reuse* and made kernel stages anti-scale with worker
# count (concurrent faulting serializes in the hypervisor). With the
# thresholds raised, glibc keeps freed blocks on the heap free list:
# pages fault once per worker, then every reuse is memory-speed
# (measured 30.7s first alloc+touch -> 0.033s steady state).
_MALLOC_ENV = {
    "MALLOC_MMAP_THRESHOLD_": str(1 << 30),
    "MALLOC_TRIM_THRESHOLD_": str(1 << 30),
}


def get_spark(
    app_name: str = "pytod_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` in the sandbox;
    on a real cluster leave it unset and let spark-submit decide.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if master is None:
        # Respect a master already chosen by spark-submit: its
        # PythonRunner launches this process with the JVM gateway
        # already up and --master applied, and advertises that gateway
        # via PYSPARK_GATEWAY_PORT. That env var is the reliable
        # signal — a pre-JVM SparkConf() is a plain Python dict that
        # cannot see --master, so probing it finds nothing and
        # builder.master would then OVERRIDE the submitted master and
        # silently run the whole job single-node on the driver
        # (verified with a live spark-submit --master probe). Default
        # to local only when nothing upstream decided; SPARK_MASTER is
        # an explicit env override for harnesses that cannot pass
        # arguments through.
        if "PYSPARK_GATEWAY_PORT" in os.environ:
            master = None
        else:
            master = os.environ.get("SPARK_MASTER") or f"local[{cpus}]"
    # remember whether partition sizing was an explicit caller choice
    # (argument) vs our sandbox default — the default must NOT
    # override a spark-submit --conf on the cluster path below.
    # SPARK_GRAFT_CPUS deliberately does NOT count as explicit: it is
    # the harness's CPU-sizing knob (it sizes --master local[N]), and
    # treating its mere presence as a shuffle-partition decision would
    # stomp a submitted --conf spark.sql.shuffle.partitions.
    shuffle_explicit = shuffle_partitions is not None
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus == "*" else max(8, int(cpus))

    for k, v in _MALLOC_ENV.items():
        # exported before JVM launch so the whole process tree (JVM ->
        # pyspark.daemon -> workers) inherits it; executorEnv carries
        # the same to real-cluster executors
        os.environ.setdefault(k, v)
    confs = dict(DEFAULT_CONFS)
    for k, v in _MALLOC_ENV.items():
        confs.setdefault(f"spark.executorEnv.{k}", os.environ[k])
    confs["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    confs.update(extra_conf or {})
    # Pin the heap (-Xms = Xmx) with G1: with the JVM's tiny default
    # -Xms the heap grows through repeated full GCs and a 2s aggregate
    # takes 30s+ (measured here: percentile-sketch agg 31s -> 1.8s,
    # cache materialize 47s -> 17s). Keep the heap modest rather than
    # huge: in this virtualized sandbox first-touch of guest memory
    # faults through the VMM at ~100 MB/s, so an oversized heap (or
    # -XX:+AlwaysPreTouch, measured 167s startup at 16g) costs more
    # than it saves. On a real cluster apply the same sizing via
    # spark.executor.memory / spark.executor.extraJavaOptions.
    confs.setdefault(
        "spark.driver.extraJavaOptions",
        f"-Xms{confs['spark.driver.memory']} -XX:+UseG1GC",
    )
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    if "PYSPARK_GATEWAY_PORT" in os.environ:
        # spark-submit path: the JVM is already up, so static confs
        # (driver memory, extraJavaOptions, executorEnv) are decided —
        # and builder.config would OVERRIDE any --conf the operator
        # submitted (builder options are applied on top of the
        # submitted SparkConf in getOrCreate). Build the session bare,
        # then apply our spark.sql.* runtime defaults only where the
        # submitted conf didn't set the key; explicit caller choices
        # (extra_conf, shuffle_partitions arg / SPARK_GRAFT_CPUS)
        # still win over --conf.
        # a session that ALREADY exists in this process (notebook
        # kernel, repeated get_spark) may carry runtime tuning the
        # user applied via spark.conf.set — those never appear in the
        # submit-time SparkConf, so our defaults must not touch an
        # existing session's runtime state at all; only a session we
        # create here (on top of spark-submit's bare conf) gets them
        existing = SparkSession.getActiveSession()
        spark = builder.getOrCreate()
        submitted = spark.sparkContext.getConf()
        explicit = dict(extra_conf or {})
        if shuffle_explicit:
            explicit["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
        if existing is None:
            for k, v in confs.items():
                if (
                    k.startswith("spark.sql.")
                    and k not in explicit
                    and not submitted.contains(k)
                ):
                    spark.conf.set(k, v)
        for k, v in explicit.items():
            try:
                spark.conf.set(k, v)
            except Exception as e:
                # only a static conf on a live JVM (driver memory,
                # extraJavaOptions in extra_conf) is expected here —
                # the JVM already decided it, warn and continue. An
                # INVALID value (non-numeric partitions etc.) must
                # surface as itself, not be misdiagnosed as static.
                msg = str(e)
                if "CANNOT_MODIFY_CONFIG" in msg or "Cannot modify" in msg:
                    warnings.warn(
                        f"conf {k!r} cannot be applied to the running "
                        "spark-submit session; pass it via --conf instead"
                    )
                else:
                    raise
        return spark
    for k, v in confs.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
