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
