"""Shared helpers for operator builders.

The decimal-accumulation pattern: fixture money/quantity columns hold exact
2-decimal values stored as DOUBLE. Summing doubles is order-dependent, and
Spark's partial aggregation order differs from DuckDB's — so instead we cast
to DECIMAL (exact), aggregate exactly, and cast the final scalar back to
DOUBLE. Both engines then produce bitwise-identical results regardless of
parallelism — which also means the answer is stable when the same query runs
on a 1000-executor cluster with different partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pyconnect_spark.catalog import load_table

MONEY = "decimal(12,2)"  # exact 2-dp values up to 10^10 — covers all fixtures
FACTOR = "decimal(4,2)"  # discount / tax factors in [0, 2)

# spread()'s partition-count probe memo: (applicationId, semanticHash) -> n
_SPREAD_MEMO: dict[tuple[str, int], int] = {}

# Measurement-only kill switch for spread(), flipped by tools/abtime.py's
# interleaved A/B arms via direct module-attribute assignment. Deliberately
# NOT an environment variable: a stale env var in a driver environment
# would silently change production job structure (round-11 advice).
_AB_DISABLE_SPREAD = False


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def spread(df: DataFrame, *keys: str | Column) -> DataFrame:
    """Scale-adaptive map-parallelism floor for heavy map chains.

    The fixture tables are single-row-group parquet files, so a scan is ONE
    task and every map-heavy stage fused to it (md5 fingerprinting,
    tokenize+explode, shingling, per-row array math) runs single-threaded
    regardless of core count — the "one huge unsplittable input" case of the
    optimization guide (§2.5 input skew: repartition immediately after the
    read; §6: a single-row-group file cannot be split further by
    maxPartitionBytes). Round-robin repartition to the session's default
    parallelism, but ONLY when the plan currently has fewer partitions: at
    100 TB a scan already carries >= cores partitions and this returns the
    input unchanged — the trigger is measured from the plan, never a
    constant tuned to either environment. Callers select the needed columns
    FIRST so the exchange moves only those bytes (§2.3). Determinism: Spark
    sorts input before round-robin repartition (SPARK-23207, on by default),
    so the row-to-partition assignment replays under task retry, and every
    declared query's result is partitioning-independent (proven by the
    two-partitioning strict sweep).

    Pass a unique key column (``spread(df, "doc_id")``) where one exists:
    hash repartitioning on a real key skips round-robin's
    sort-before-repartition pass and distributes evenly for unique keys.
    """
    if _AB_DISABLE_SPREAD:  # set ONLY by tools/abtime.py (measurement A/B)
        return df
    if df.isStreaming:  # streaming plans have no RDD to probe; no-op
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    # The partition-count probe (plan → RDD) costs ~40-100 ms of driver
    # planning per call; memoize it on the ANALYZED plan's semantic hash
    # (analysis is cached on the DataFrame and the hash is a cheap tree
    # walk), so e.g. a tuning-curve query building 8 signature variants
    # over the same tokenized frame probes once, not 8 times.
    key = (sc.applicationId, df._jdf.queryExecution().analyzed().semanticHash())
    nparts = _SPREAD_MEMO.get(key)
    if nparts is None:
        nparts = df.rdd.getNumPartitions()
        if len(_SPREAD_MEMO) > 4096:  # bound a long session's memo
            _SPREAD_MEMO.clear()
        _SPREAD_MEMO[key] = nparts
    if nparts >= target:
        return df
    return df.repartition(target, *keys) if keys else df.repartition(target)


def dec(col: str | Column, typ: str = MONEY) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(typ)


def dsum(col: str | Column, typ: str = MONEY) -> Column:
    """Exact decimal sum, surfaced as DOUBLE."""
    return F.sum(dec(col, typ)).cast("double")


def davg(col: str | Column, typ: str = MONEY) -> Column:
    """Exact decimal sum / count, computed in double — matches
    CAST(SUM(CAST(x AS DECIMAL))AS DOUBLE)/COUNT(x) on the oracle side."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c, typ)).cast("double") / F.count(c)


def one_minus(col: str) -> Column:
    """(1 - x) computed entirely in decimal."""
    return F.lit(1).cast(FACTOR) - dec(col, FACTOR)


def one_plus(col: str) -> Column:
    return F.lit(1).cast(FACTOR) + dec(col, FACTOR)


# Oracle-side SQL fragments mirroring the helpers above.
def sql_dsum(expr: str, typ: str = MONEY) -> str:
    return f"CAST(SUM(CAST({expr} AS {typ})) AS DOUBLE)"


def sql_davg(expr: str, typ: str = MONEY) -> str:
    return f"CAST(SUM(CAST({expr} AS {typ})) AS DOUBLE) / COUNT({expr})"


SQL_ONE_MINUS = "(CAST(1 AS decimal(4,2)) - CAST({c} AS decimal(4,2)))"
SQL_ONE_PLUS = "(CAST(1 AS decimal(4,2)) + CAST({c} AS decimal(4,2)))"
