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

    `events.ts` is parquet TIMESTAMP(NANOS), which Spark cannot map to a
    timestamp type; with ``spark.sql.legacy.parquet.nanosAsLong=true`` it
    arrives as a long of epoch-nanos and is converted here (values are
    µs-aligned in the fixtures, so the conversion is lossless).
    """
    from pyspark.sql import functions as F

    if name == "events":
        # Must be set before the scan is planned; harmless if already set.
        # Works under ANY caller-provided SparkSession (e.g. the driver's),
        # not just ones built by get_spark().
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros((F.col("ts") / F.lit(1000)).cast("long")))
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
