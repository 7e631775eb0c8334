"""Declared-query contract plumbing.

Each operator the engine claims is represented as a :class:`Query`: a
Spark DataFrame builder plus (when SQL-expressible) an equivalent ANSI-SQL
oracle string that DuckDB can run over the same parquet tables. The driver
(and our own tests) run both and compare row-count + schema + an
order-insensitive value hash.

Determinism rules every query in the registry follows:

- every computed column is aliased identically in the builder and oracle;
- floating-point *aggregates* are computed by casting exact 2-decimal
  inputs to DECIMAL, summing exactly, and casting the result to DOUBLE —
  so Spark and DuckDB agree bitwise, with no rounding-boundary lottery;
- transcendental math outputs are rounded (6 dp) to absorb last-ulp libm
  differences;
- top-k queries break ties on a unique key so the selected set is unique.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    """One declared operator/query: Spark builder + optional DuckDB oracle."""

    name: str
    builder: Builder
    oracle: Optional[str]
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


class QueryRegistry:
    def __init__(self) -> None:
        self._queries: dict[str, Query] = {}

    def add(self, q: Query) -> None:
        if q.name in self._queries:
            raise ValueError(f"duplicate query name: {q.name}")
        self._queries[q.name] = q

    def register(
        self,
        name: str,
        oracle: Optional[str],
        doc: str = "",
        tags: tuple[str, ...] = (),
    ) -> Callable[[Builder], Builder]:
        """Decorator: ``@REGISTRY.register("b01", oracle="SELECT ...")``."""

        def wrap(fn: Builder) -> Builder:
            self.add(Query(name=name, builder=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags))
            return fn

        return wrap

    def queries(self) -> dict[str, Query]:
        return dict(self._queries)

    def builders(self) -> dict[str, Builder]:
        return {n: q.builder for n, q in self._queries.items()}

    def oracles(self) -> dict[str, str]:
        return {n: q.oracle for n, q in self._queries.items() if q.oracle is not None}

    def merge(self, other: "QueryRegistry") -> None:
        for q in other._queries.values():
            self.add(q)
