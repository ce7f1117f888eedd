"""Custom stateful streaming operator via ``applyInPandasWithState``:
per-user running aggregates with timeout-based session flushing — the
"custom operator Spark lacks" tier of the build guidance (state machine
semantics that windowed aggs can't express).

Semantics: for each user, maintain (event_count, total_value, last_ts);
emit the running snapshot on every trigger; when the processing-time
timeout fires with no new data, emit a final ``closed=true`` row and drop
the state. This is the streaming analog of the reference's per-key
checkpoint documents (``extract_load_template.py:196-209``) — state keyed
per entity, bounded by timeout, survives across micro-batches.

Scale: state is partitioned by user_id across executors (HDFS/RocksDB
state store on a cluster); the closure is self-contained (worker
portability — see tests/test_worker_portability.py).

Spark Connect (r9 audit): ``applyInPandasWithState`` is NOT part of the
Connect API surface — :func:`user_running_totals` raises a clear error
on a Connect session instead of failing deep inside the plan. Run this
pipeline on a classic session, or port to the ``transformWithState``
family where the server offers it; every other streaming module in this
package is foreachBatch over batch operators and is Connect-clean.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, event_count bigint, total_value double,"
    " last_ts timestamp, closed boolean"
)
STATE_SCHEMA = "event_count bigint, total_value double, last_ts_us bigint"


def user_running_totals(
    events: DataFrame, timeout_ms: int = 30_000
) -> DataFrame:
    """Stateful per-user running totals over a stream of events.

    ``events`` must be a streaming DataFrame with (user_id, ts, value),
    on a CLASSIC session (see module docstring re Spark Connect).
    """
    from lakehouse_adventureworks2022_spark.session import is_connect

    if is_connect(events.sparkSession):
        raise RuntimeError(
            "applyInPandasWithState is not available over Spark Connect; "
            "run user_running_totals on a classic session (see "
            "streaming/stateful.py docstring)"
        )

    def update(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            count, total, last_us = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "event_count": [count],
                    "total_value": [total],
                    "last_ts": [pd.Timestamp(last_us, unit="us")],
                    "closed": [True],
                }
            )
            return

        count, total, last_us = state.get if state.exists else (0, 0.0, 0)
        for pdf in batches:
            count += len(pdf)
            total += float(pdf["value"].sum())
            batch_max = pdf["ts"].max()
            last_us = max(last_us, int(batch_max.value // 1_000))
        state.update((count, total, last_us))
        state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "event_count": [count],
                "total_value": [round(total, 4)],
                "last_ts": [pd.Timestamp(last_us, unit="us")],
                "closed": [False],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def user_running_totals_tws(
    events: DataFrame, timeout_ms: int = 30_000
) -> DataFrame:
    """The SAME per-user running-totals state machine on Spark 4's
    ``transformWithStateInPandas`` (r9) — the successor API the Connect
    audit pointed at: typed value state, explicit processing-time
    timers, and (unlike ``applyInPandasWithState``) availability over
    Spark Connect. Output contract is identical to
    :func:`user_running_totals` (running ``closed=false`` snapshots per
    trigger; a final ``closed=true`` row when the inactivity timer
    fires), so the stream≡batch equality test runs against either
    implementation.

    Requires the RocksDB state store
    (``spark.sql.streaming.stateStore.providerClass =
    org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider``
    on the query) — transformWithState is RocksDB-only by design; the
    classic operator keeps the default HDFS-backed store working. The
    worker protocol also needs ``google.protobuf`` on the Python
    workers (absent in this test container, so the differential test is
    skip-marked here and runs on a real deployment — same seam class as
    delta-spark/grpcio).

    Scale posture unchanged: state partitioned by user_id, one value
    row per live user, timers bound the state lifetime.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    timeout = timeout_ms

    class _RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._totals = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            count, total, last_us = (
                self._totals.get() if self._totals.exists() else (0, 0.0, 0)
            )
            for pdf in rows:
                count += len(pdf)
                total += float(pdf["value"].sum())
                batch_max = pdf["ts"].max()
                last_us = max(last_us, int(batch_max.value // 1_000))
            self._totals.update((count, total, last_us))
            # one live inactivity timer per key: re-arm on every batch
            for t in self._handle.listTimers():
                self._handle.deleteTimer(t)
            self._handle.registerTimer(
                timerValues.getCurrentProcessingTimeInMs() + timeout
            )
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "event_count": [count],
                    "total_value": [round(total, 4)],
                    "last_ts": [pd.Timestamp(last_us, unit="us")],
                    "closed": [False],
                }
            )

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            (user_id,) = key
            if not self._totals.exists():
                return
            count, total, last_us = self._totals.get()
            self._totals.clear()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "event_count": [count],
                    "total_value": [round(total, 4)],
                    "last_ts": [pd.Timestamp(last_us, unit="us")],
                    "closed": [True],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        _RunningTotals(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="processingTime",
    )
