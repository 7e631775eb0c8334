"""Aggregate query registry: every declared operator across modules."""

from __future__ import annotations

from pyconnect_spark.operators import dedup, extended, multimodal, relational, similarity, text, timeseries, tpch
from pyconnect_spark.query import Query, QueryRegistry

ALL = QueryRegistry()
for mod in (relational, extended, tpch, timeseries, text, dedup, similarity, multimodal):
    ALL.merge(mod.REGISTRY)


def queries():
    return ALL.builders()


def oracles():
    return ALL.oracles()


def get(name: str) -> Query:
    return ALL.queries()[name]
