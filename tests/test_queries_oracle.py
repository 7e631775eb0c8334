"""Oracle correctness: every declared query with an oracle must hash-match
DuckDB on the sf0.01 fixtures (the driver's t2 gate, run locally).
Queries without an oracle are smoke-checked (runs, stable schema)."""

from __future__ import annotations

import pytest

from pyconnect_spark.registry import ALL
from tests.conftest import SF_ORACLE, compare_with_oracle

_QUERIES = ALL.queries()
_WITH_ORACLE = sorted(n for n, q in _QUERIES.items() if q.oracle)
_NO_ORACLE = sorted(n for n, q in _QUERIES.items() if not q.oracle)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_match(spark, ddb, name):
    q = _QUERIES[name]
    df = q.builder(spark, SF_ORACLE)
    ok, detail = compare_with_oracle(df, ddb, q.oracle)
    assert ok, f"{name}: {detail}"


@pytest.mark.parametrize("name", _NO_ORACLE)
def test_no_oracle_smoke(spark, name):
    q = _QUERIES[name]
    df = q.builder(spark, SF_ORACLE)
    assert df.columns  # stable schema
    assert df.count() >= 0
