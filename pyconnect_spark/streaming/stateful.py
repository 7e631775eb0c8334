"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no stateful operators (its only state is the flush
buffer + offsets); this is part of the EXT streaming surface
(SURVEY.md §2.2 "Stateful processing"). The canonical example operator —
a per-key running aggregate that survives across micro-batches and
restarts (state lives in the state store, checkpointed per batch) — is
the building block for counters, rate limiters, and dedup-with-TTL.

At scale: state is partitioned by key across executors; use the RocksDB
state store provider for large keyspaces
(spark.sql.streaming.stateStore.providerClass=...RocksDBStateStoreProvider).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

RUNNING_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)
RUNNING_STATE = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _running_totals(
    key: Tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (n, total) = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
    )


def running_totals_per_user(stream: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) maintained in the state store;
    emits the updated running totals for every key seen in each batch."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _running_totals,
        outputStructType=RUNNING_OUTPUT,
        stateStructType=RUNNING_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
