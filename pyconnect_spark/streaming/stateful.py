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


CUSUM_OUTPUT = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("n_seen", T.LongType()),
        T.StructField("cusum", T.DoubleType()),
        T.StructField("max_cusum", T.DoubleType()),
    ]
)
CUSUM_STATE = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s", T.DoubleType()),
        T.StructField("m", T.DoubleType()),
    ]
)


def cusum_per_key(stream: DataFrame, mu: float) -> DataFrame:
    """Streaming twin of ts18's one-sided CUSUM: per event_type, fold
    S_i = max(0, S_{i-1} + (value - mu)) across micro-batches, carrying
    (count, running statistic, running max) in the state store. The
    reference mean ``mu`` is a fixed SPC target supplied a priori (the
    batch operator derives it from history; a monitor pins it). The fold
    is order-sensitive, so rows are sorted by (ts, event_id) WITHIN each
    batch — the result matches the batch fold whenever batch boundaries
    respect event-time order, which is the deployment contract for any
    streaming ordered fold (same caveat as EWMA's streaming twin S08)."""

    def _cusum(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (n, s, m) = state.get if state.exists else (0, 0.0, 0.0)
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        for v in rows["value"]:
            s = max(0.0, s + (float(v) - mu))
            m = max(m, s)
        n += len(rows)
        state.update((n, s, m))
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_seen": [n],
                "cusum": [round(s, 6)],
                "max_cusum": [round(m, 6)],
            }
        )

    return stream.groupBy("event_type").applyInPandasWithState(
        _cusum,
        outputStructType=CUSUM_OUTPUT,
        stateStructType=CUSUM_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
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


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4.x stateful-processor API)
# ---------------------------------------------------------------------------
try:  # the processor API is new in Spark 4.0 and its state-server protocol
    # needs protobuf at runtime; gate on both so environments without either
    # still import this module (applyInPandasWithState above has no such
    # dependency and stays the portable path).
    import google.protobuf.descriptor  # noqa: F401  (runtime requirement)
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotalsProcessor(StatefulProcessor):
        """Per-key running (count, sum) on the modern stateful-processor
        API. Functionally the twin of `_running_totals` above; the new API
        gives named typed state slots (ValueState/ListState/MapState),
        per-slot TTL, and timers — the shape production stateful operators
        should target going forward. State lives in the state store keyed
        by the grouping key, exactly like applyInPandasWithState.
        """

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "n long, total double"
            )

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            n, total = (
                tuple(self._totals.get()) if self._totals.exists() else (0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 2)],
                }
            )

        def close(self) -> None:
            pass

    def running_totals_tws(stream: DataFrame) -> DataFrame:
        """running_totals_per_user on transformWithStateInPandas."""
        return stream.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=RunningTotalsProcessor(),
            outputStructType=RUNNING_OUTPUT,
            outputMode="Update",
            timeMode="None",
        )

    class AlertGateProcessor(StatefulProcessor):
        """S35: alert_gate_per_key's EXACT semantics on the Spark 4
        stateful-processor API (round-7 verdict task #8 — the streaming
        state surface tracks the current API before the old one ages
        out). Same deterministic fold: first above-threshold event per
        key alerts, breaches inside the event-time cooldown are counted
        into the NEXT alert's n_suppressed (none lost), rows sorted by
        (ts, event_id) within each batch. State = one named ValueState
        slot (last alert epoch, suppressed count) instead of the
        positional state struct — the API difference is the slot
        registry; the semantics are pinned equal to the S34 operator
        and the sequential Python fold in test_s35."""

        def __init__(self, threshold: float, cooldown_s: float) -> None:
            self._threshold = threshold
            self._cooldown_s = cooldown_s

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._gate = handle.getValueState(
                "gate", "last_alert_sec double, suppressed long"
            )

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            last, supp = (
                tuple(self._gate.get())
                if self._gate.exists()
                else (float("-inf"), 0)
            )
            pdf = pd.concat(list(rows), ignore_index=True)
            pdf = pdf.sort_values(["ts", "event_id"])
            out_ts, out_v, out_supp = [], [], []
            for ts_, v in zip(pdf["ts"], pdf["value"]):
                if float(v) < self._threshold:
                    continue
                sec = ts_.timestamp()
                if sec - last >= self._cooldown_s:
                    out_ts.append(ts_)
                    out_v.append(float(v))
                    out_supp.append(supp)
                    last = sec
                    supp = 0
                else:
                    supp += 1
            self._gate.update((last, supp))
            yield pd.DataFrame(
                {
                    "event_type": pd.Series(
                        [key[0]] * len(out_ts), dtype="object"
                    ),
                    "ts": pd.Series(out_ts, dtype="datetime64[ns]"),
                    "value": pd.Series(out_v, dtype="float64"),
                    "n_suppressed": pd.Series(out_supp, dtype="int64"),
                }
            )

        def close(self) -> None:
            pass

    def alert_gate_tws(
        stream: DataFrame, threshold: float, cooldown_s: float = 3600.0
    ) -> DataFrame:
        """alert_gate_per_key on transformWithStateInPandas."""
        return stream.groupBy("event_type").transformWithStateInPandas(
            statefulProcessor=AlertGateProcessor(threshold, cooldown_s),
            outputStructType=ALERT_OUTPUT,
            outputMode="Append",
            timeMode="None",
        )

except ImportError:  # pragma: no cover - pyspark < 4.0 or no protobuf
    RunningTotalsProcessor = None  # type: ignore[assignment]
    AlertGateProcessor = None  # type: ignore[assignment]

    def running_totals_tws(stream: DataFrame) -> DataFrame:
        raise NotImplementedError(
            "transformWithStateInPandas requires pyspark >= 4.0 and protobuf"
        )

    def alert_gate_tws(
        stream: DataFrame, threshold: float, cooldown_s: float = 3600.0
    ) -> DataFrame:
        raise NotImplementedError(
            "transformWithStateInPandas requires pyspark >= 4.0 and protobuf"
        )


ALERT_OUTPUT = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("n_suppressed", T.LongType()),
    ]
)
ALERT_STATE = T.StructType(
    [
        T.StructField("last_alert_sec", T.DoubleType()),
        T.StructField("suppressed", T.LongType()),
    ]
)


def alert_gate_per_key(
    stream: DataFrame, threshold: float, cooldown_s: float = 3600.0
) -> DataFrame:
    """S34: threshold alerting with per-key cooldown suppression — the
    operator between a detector (S21 CUSUM, ts15/ts36 rules) and a
    pager: the FIRST above-threshold event per key fires an alert row,
    and further breaches inside `cooldown_s` are counted but NOT
    re-emitted (alert-storm suppression, the on-call dedup every
    production monitor ships). State per key = (last alert epoch,
    suppressed-since count); the suppressed counter is carried to the
    next EMITTED alert so no breach is ever silently lost — the
    at-least-once accounting contract. Rows sort by (ts, event_id)
    within each batch; the gate is a deterministic fold, so replays of
    the same ordered batches reproduce identical alert streams (pinned
    stream-vs-recompute in test_s34). At scale the state is two numbers
    per key in the state store (RocksDB provider for large keyspaces),
    and the cooldown clock is EVENT time, so backfills behave."""

    def _gate(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (last, supp) = state.get if state.exists else (float("-inf"), 0)
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        out_ts, out_v, out_supp = [], [], []
        for ts_, v in zip(rows["ts"], rows["value"]):
            if float(v) < threshold:
                continue
            sec = ts_.timestamp()
            if sec - last >= cooldown_s:
                out_ts.append(ts_)
                out_v.append(float(v))
                out_supp.append(supp)
                last = sec
                supp = 0
            else:
                supp += 1
        state.update((last, supp))
        yield pd.DataFrame(
            {
                "event_type": [key[0]] * len(out_ts),
                "ts": out_ts,
                "value": out_v,
                "n_suppressed": out_supp,
            }
        )

    return stream.groupBy("event_type").applyInPandasWithState(
        _gate,
        outputStructType=ALERT_OUTPUT,
        stateStructType=ALERT_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
