"""Streaming ingestion deduplication (beyond-reference scope): the
streaming member of the dedup family in ``operators/dedup.py``.

A replayed source (Kafka re-delivery, file re-drop, the reference's
re-run-able batch extract — ``extract_load_template.py:60-83`` would
happily re-append) produces duplicate rows. The scale-correct streaming
tool is ``dropDuplicatesWithinWatermark``: state is keyed on the dedup
key and EVICTED at the watermark horizon, so memory is bounded by
(arrival rate × watermark) instead of growing with the whole stream —
the plain streaming ``dropDuplicates`` would keep every key forever.

Semantics: duplicates arriving within the watermark delay of the first
copy are dropped; a duplicate arriving later than the horizon would pass
(by then the upstream replay window has closed). The batch twin is exact
``dropDuplicates`` over the same key — tested equal on a replayed
fixture whose duplicates all fall inside the horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def stream_dedup(
    events: DataFrame,
    key_cols: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop re-delivered copies of each key within the watermark horizon
    (state-bounded streaming dedup)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def dedup_batch(
    events: DataFrame, key_cols: tuple[str, ...] = ("event_id",)
) -> DataFrame:
    """Batch twin: exact key dedup (the oracle face for tests)."""
    return events.dropDuplicates(list(key_cols))
