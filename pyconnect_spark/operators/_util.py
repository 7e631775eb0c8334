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


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


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
