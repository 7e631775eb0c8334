"""Table catalog: load the driver's parquet fixture tables as DataFrames.

At test scale each table is a single parquet file; at 100 TB each would be
a partitioned parquet/iceberg dataset — ``spark.read.parquet`` handles both
transparently (directory of part-files, partition-pruned by Catalyst).
Reads are lazy; Catalyst prunes columns and pushes filters into the scan,
so loading "the whole table" here costs nothing until an action runs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy scan of one fixture table.

    `events.ts` is parquet TIMESTAMP(NANOS). Depending on the Spark build it
    arrives either as TIMESTAMP_NTZ (current behavior) or — under
    ``spark.sql.legacy.parquet.nanosAsLong=true`` — as a long of epoch-nanos.
    Both paths are normalized HERE, once, to TIMESTAMP (with local time zone):
    every downstream consumer (watermarks, ``unix_micros``, window functions)
    then sees one canonical type. The session time zone is pinned to UTC, so
    the NTZ→LTZ cast preserves wall-clock values exactly, and the fixture's
    nanos are µs-aligned so nothing is lost either way.
    """
    from pyspark.sql import functions as F

    if name == "events":
        # Must be set before the scan is planned; harmless if already set
        # (and a no-op on builds that read nanos as NTZ natively). Works
        # under ANY caller-provided SparkSession (e.g. the driver's).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # The NTZ->LTZ normalization below is exact ONLY under a UTC
        # session time zone; under a non-UTC caller session, epoch-derived
        # values (unix_micros, watermark alignment) would silently shift.
        # Pin it here rather than trusting the caller — same rationale as
        # the nanos conf: the events path owns its session prerequisites.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros((F.col("ts") / F.lit(1000)).cast("long")))
        elif ts_type == "timestamp_ntz":
            # Watermarks (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE) and epoch
            # functions require TIMESTAMP_LTZ; UTC session makes this exact.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession,
    sf_dir: str = DEFAULT_SF_DIR,
    *,
    names: tuple[str, ...] = TABLES,
    register_views: bool = False,
) -> dict[str, DataFrame]:
    """Load fixture tables; optionally register them as temp views for SQL."""
    out: dict[str, DataFrame] = {}
    for name in names:
        df = load_table(spark, sf_dir, name)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
