"""Streaming frequent-items (streaming/frequent.py): MG-merge state vs
exact counts — the bound every stored weight must satisfy — plus
at-least-once idempotence and the mid-stream m-change guard."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from lakehouse_adventureworks2022_spark.operators.sketches import (
    mg_merge,
    mg_summarize,
)
from lakehouse_adventureworks2022_spark.sources.readers import read_table
from lakehouse_adventureworks2022_spark.streaming.frequent import (
    apply_frequent_batch,
    frequent_values,
    stream_frequent_items,
)

SF = "/root/testdata/sf0.001"


def test_mg_merge_bound_holds_under_splits(spark):
    """Summaries of stream pieces merged with mg_merge must satisfy the
    whole-stream MG bound: true − N/(m+1) ≤ weight ≤ true, and every
    value with frequency > N/(m+1) must be present."""
    events = read_table(spark, SF, "events")
    exact = {
        r["event_type"]: r["c"]
        for r in events.groupBy("event_type").agg(F.count("*").alias("c")).collect()
    }
    n = sum(exact.values())
    m = 4
    pieces = [
        mg_summarize(events.filter(F.col("event_id") % 3 == i), "event_type", m)
        for i in range(3)
    ]
    merged = {r["value"]: r["weight"] for r in mg_merge(*pieces, m=m).collect()}
    bound = n // (m + 1)
    for v, true in exact.items():
        w = merged.get(v, 0)
        assert w <= true, f"{v}: weight {w} overcounts {true}"
        assert w >= true - bound, f"{v}: weight {w} below {true} - {bound}"
        if true > bound:
            assert v in merged, f"frequent value {v} missing"


@pytest.mark.slow
def test_streaming_state_matches_exact_within_bound(spark, tmp_path):
    """Feed the fixture events through the streaming sink in micro
    batches; the persisted state's top value and bound must agree with
    the exact counter."""
    events = read_table(spark, SF, "events")
    exact = Counter(
        r["event_type"] for r in events.select("event_type").collect()
    )
    src_dir = tmp_path / "src"
    # three files → three-ish micro batches with maxFilesPerTrigger=1
    for i in range(3):
        events.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src_dir / f"part{i}"))
    source = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir / "part*"))
    )
    state = str(tmp_path / "state")
    q = stream_frequent_items(
        source, state, str(tmp_path / "ckpt"), "event_type", m=16
    )
    q.processAllAvailable()
    q.stop()
    rows = frequent_values(spark, state, k=5).collect()
    got = {r["value"]: r["weight"] for r in rows}
    bound = rows[0]["max_undercount"]
    n = sum(exact.values())
    assert bound == n // 17
    for v, w in got.items():
        assert exact[v] - bound <= w <= exact[v]
    # the distinct-type count is tiny, so ordering by weight must match
    # the exact ranking's head
    assert rows[0]["value"] == exact.most_common(1)[0][0]


@pytest.mark.slow
def test_replayed_batch_is_not_double_counted(spark, tmp_path):
    docs = spark.createDataFrame(
        [("a",)] * 30 + [("b",)] * 5, "k string"
    )
    state = str(tmp_path / "state")
    import os

    os.makedirs(state, exist_ok=True)
    apply_frequent_batch(docs, 0, state, "k", m=8)
    before = {r["value"]: r["weight"] for r in frequent_values(spark, state, 5, "string").collect()}
    apply_frequent_batch(docs, 0, state, "k", m=8)  # at-least-once replay
    after = {r["value"]: r["weight"] for r in frequent_values(spark, state, 5, "string").collect()}
    assert before == after == {"a": 30, "b": 5}
    # a NEW batch does count
    apply_frequent_batch(docs, 1, state, "k", m=8)
    final = {r["value"]: r["weight"] for r in frequent_values(spark, state, 5, "string").collect()}
    assert final == {"a": 60, "b": 10}
    # changing m mid-stream is refused loudly
    with pytest.raises(ValueError, match="m=8"):
        apply_frequent_batch(docs, 2, state, "k", m=4)
