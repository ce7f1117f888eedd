"""Streaming quantiles (streaming/quantiles.py): KLL state over
micro-batches vs the exact whole-stream distribution, at-least-once
idempotence, and the mid-stream k-change guard."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lakehouse_adventureworks2022_spark.sources.readers import read_table
from lakehouse_adventureworks2022_spark.streaming.quantiles import (
    apply_quantile_batch,
    quantiles_from_state,
    stream_quantiles,
)

SF = "/root/testdata/sf0.001"


def _rank_interval_err(sorted_vals, est, q):
    n = len(sorted_vals)
    lo = np.searchsorted(sorted_vals, est, side="left") / n
    hi = np.searchsorted(sorted_vals, est, side="right") / n
    return max(0.0, lo - q, q - hi)


def test_streaming_state_matches_exact_within_bound(spark, tmp_path):
    """Feed the fixture events through the stream in micro-batches; the
    persisted sketches must answer per-group quantiles within the KLL
    bound of the whole-stream exact distribution."""
    events = read_table(spark, SF, "events")
    exact = {
        r["event_type"]: np.sort(np.array(r["vals"], dtype=float))
        for r in events.groupBy("event_type")
        .agg(F.collect_list("value").alias("vals"))
        .collect()
    }
    src_dir = tmp_path / "src"
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
    q = stream_quantiles(
        source, state, str(tmp_path / "ckpt"), "value", ["event_type"], k=200
    )
    q.processAllAvailable()
    q.stop()
    rows = quantiles_from_state(
        spark, state, [0.0, 0.25, 0.5, 0.9, 1.0], keys=["event_type"]
    ).collect()
    assert {r["event_type"] for r in rows} == set(exact)
    for r in rows:
        vals = exact[r["event_type"]]
        assert r["n"] == len(vals)
        if r["q"] in (0.0, 1.0):  # extrema exact
            want = vals[0] if r["q"] == 0.0 else vals[-1]
            assert r["value"] == pytest.approx(float(want))
        else:
            err = _rank_interval_err(vals, r["value"], r["q"])
            assert err < 0.025, (r["event_type"], r["q"], err)


def test_replayed_batch_is_not_double_sketched(spark, tmp_path):
    """At-least-once delivery: re-applying a batch id must not inflate
    n or shift quantiles."""
    events = read_table(spark, SF, "events").limit(500)
    state = str(tmp_path / "state")
    apply_quantile_batch(events, 0, state, "value", [], k=100)
    before = {
        (r["q"]): (r["value"], r["n"])
        for r in quantiles_from_state(spark, state, [0.5], keys=[]).collect()
    }
    apply_quantile_batch(events, 0, state, "value", [], k=100)  # replay
    after = {
        (r["q"]): (r["value"], r["n"])
        for r in quantiles_from_state(spark, state, [0.5], keys=[]).collect()
    }
    assert before == after
    assert after[0.5][1] == 500


def test_mid_stream_k_change_is_refused(spark, tmp_path):
    events = read_table(spark, SF, "events").limit(100)
    state = str(tmp_path / "state")
    apply_quantile_batch(events, 0, state, "value", [], k=100)
    with pytest.raises(ValueError, match="k=100"):
        apply_quantile_batch(events, 1, state, "value", [], k=200)
