"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1 shape) on sf0.001.
``queries()`` exposes every implemented operator from SURVEY.md §2 as
(spark, sf_dir) -> DataFrame; ``oracle_sql()`` gives the DuckDB-runnable
ANSI-SQL twin for every SQL-expressible one. Column names/types are
aligned pairwise (see pyconnect_spark/query.py for the determinism rules).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyconnect_spark.registry import ALL  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    q = ALL.queries()["b03_tpch_q1"]
    return q.builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return ALL.builders()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query — including
    the MinHash/SimHash sketches, both LSH ANN pipelines (md5-derived
    projection bases as of round 5), the IVF quantizers, the full
    IVFADC composite, and the iterative operators (tx32 BPE training,
    sm20 power-iteration PCA, sm19 MMR — recursive-CTE / unrolled-step
    replays; md5 hash families and JVM-fold arithmetic make DuckDB
    match bit-for-bit). Rows-only by design: tx27 (zlib pandas UDF),
    x49 (DataSketches HLL), ts40 (KLL quantiles), dd24 (Theta
    sketches) — engine-private estimators, each with a tolerance/replay
    pytest."""
    return ALL.oracles()
