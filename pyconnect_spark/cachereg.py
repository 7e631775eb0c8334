"""Registry for operator-internal persisted frames.

A few operators persist an intermediate that several downstream branches
consume (dd03/dd10 minhash signatures, sm06 normalized vectors). The
builders return lazy DataFrames, so they cannot unpersist themselves —
the cache must outlive the caller's action. Spark's CacheManager dedupes
by canonicalized plan, so repeated invocations of the same query reuse
one entry rather than stacking new ones; what CAN accumulate in a
long-lived session is one entry per distinct cached operator/SF. Callers
that run many operators in one session (bench, notebook sessions, the
driver) call :func:`clear_operator_caches` at a quiescent point — after
the final action consuming the returned frames — to release storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Record an operator-persisted frame for later bulk release."""
    _TRACKED.append(df)
    return df


def clear_operator_caches() -> int:
    """Unpersist every tracked frame; returns how many were released.
    Safe to call at any quiescent point; lazy re-execution after release
    just recomputes (and re-caches) on next use."""
    n = 0
    for df in _TRACKED:
        try:
            df.unpersist()
            n += 1
        except Exception:  # noqa: BLE001 — session may already be stopped
            pass
    _TRACKED.clear()
    return n
