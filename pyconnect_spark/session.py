"""SparkSession factory tuned for both local testing and cluster scale.

Local mode (``local[N]``) is used for correctness tests; the same config
surface is what a 1000-executor deployment would tune. Scale-relevant
defaults set here:

- AQE on (runtime re-planning: partition coalescing, skew-join splitting,
  broadcast demotion/promotion) — the single most important knob at 100 TB.
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a real
  cluster AQE's coalescing makes the initial number much less sensitive.
- Arrow enabled so every pandas-UDF operator moves columns, not pickled rows.
- Session timezone pinned to UTC so timestamp semantics are deterministic
  and independent of the host (also required for oracle comparisons).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULT_APP = "pyconnect-spark"


def get_spark(
    app_name: str = _DEFAULT_APP,
    *,
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-aware defaults.

    ``cores`` defaults to ``$SPARK_GRAFT_CPUS`` or ``*``. On a real cluster
    the builder would instead carry master/deploy-mode from the environment;
    nothing else here is local-specific.
    """
    cores = cores or os.environ.get("SPARK_GRAFT_CPUS", "*")
    n_cores = os.cpu_count() or 8 if cores in ("*", None) else int(cores)
    shuffle_partitions = shuffle_partitions or max(2 * n_cores, 32)

    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "64g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # The fixture `events` table stores TIMESTAMP(NANOS) which Spark's
        # parquet reader rejects outright; read as long and convert in the
        # catalog (stays in the vectorized reader, fully distributed).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Keep the derby metastore + warehouse (used only by bucketed-table
        # features) out of the repo working tree.
        .config("spark.sql.warehouse.dir", "/tmp/pyconnect-spark-warehouse")
        .config("spark.driver.extraJavaOptions", "-Dderby.system.home=/tmp/pyconnect-spark-derby")
        # files.maxPartitionBytes default 128m is right for the 100 TB target;
        # leave it — small local files read as one task regardless.
        # Answer bare MIN/MAX/COUNT from parquet footers instead of scanning
        # row groups (applies when no post-scan filter remains; at 100 TB a
        # COUNT(*) over a partition becomes a metadata read).
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # Iterative operators (connected_components) truncate lineage with
        # reliable checkpoint() when a checkpoint dir is configured; GC the
        # per-iteration checkpoint files once their RDDs go out of scope so
        # a long-lived cluster session doesn't accumulate max_iter dirs per
        # invocation on HDFS/S3.
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def runtime_filter_conf(*, test_scale: bool = False) -> dict[str, str]:
    """Conf block enabling runtime bloom-filter pushdown on shuffle joins.

    When a join's build side is selective (a filtered dimension) but too
    big to broadcast, Spark 3.3+ can inject a ``bloom_filter_agg`` on the
    build side's join key and semi-filter the probe side's SCAN with it —
    at 100 TB this prunes most of a fact-table shuffle for
    dim-filter-then-join shapes, the same effect DPP gives on partition
    columns but for arbitrary keys.

    The stock thresholds are sized for clusters (probe side > 10 GB); the
    ``test_scale`` variant lowers them so the mechanism is exercisable on
    fixture-sized data (see tests/test_scale_utils.py), which is how this
    repo proves the plan shape without a cluster.
    """
    conf = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        # ~100 MB creation-side cap: a filtered dim slice of a 100 TB join
        # typically lands well under this; bigger build sides would make
        # the bloom filter itself shuffle-expensive.
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    if test_scale:
        conf["spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"] = "1KB"
        conf["spark.sql.autoBroadcastJoinThreshold"] = "-1"
    return conf
