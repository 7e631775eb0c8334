"""Skew-mitigation utilities: salted joins and two-phase aggregation.

AQE's skew-join splitting handles most cases at runtime
(spark.sql.adaptive.skewJoin.enabled, on by default in get_spark); these
helpers cover the shapes AQE can't fix:

- a *broadcast-ineligible* join where one key holds a huge share of rows:
  ``salted_join`` fans the hot key across ``n_salts`` reducers by salting
  the big side content-deterministically and replicating the small side;
- a high-cardinality aggregation with hot groups: ``two_phase_agg``
  pre-aggregates on (keys + salt) and combines, bounding any single
  reducer's input.

Salts derive from xxhash64 of the row content — deterministic across
retries/partitionings (no rand()), so results are stable and tasks are
idempotent under speculative execution.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _content_salt(df: DataFrame, n_salts: int) -> Column:
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    *,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated
    n_salts×. Output columns = big ∪ (small − join keys), like df.join(on).

    Cost model: small side shuffles n_salts× its size; the hot key's rows
    spread over n_salts reducers instead of one. Use when the small side
    is too big to broadcast but far smaller than the big side.
    """
    keys = list(on)
    salted_big = big.withColumn("_salt", _content_salt(big, n_salts))
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    joined = salted_big.join(salted_small, keys + ["_salt"], how)
    return joined.drop("_salt")


def two_phase_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: dict[str, Column],
    final_aggs: dict[str, Column],
    *,
    n_salts: int = 16,
) -> DataFrame:
    """Salted two-phase aggregation: groupBy(keys+salt).agg(partial) then
    groupBy(keys).agg(final over the partial columns).

    partial_aggs/final_aggs map output-column name → aggregate expression;
    final expressions reference the partial columns by name, e.g.::

        two_phase_agg(df, ["k"],
            {"s": F.sum("v"), "c": F.count("v")},
            {"total": F.sum("s"), "n": F.sum("c")})
    """
    salted = df.withColumn("_salt", _content_salt(df, n_salts))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[expr.alias(name) for name, expr in partial_aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[expr.alias(name) for name, expr in final_aggs.items()]
    )
