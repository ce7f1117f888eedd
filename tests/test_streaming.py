"""Structured Streaming: the real readStream path must produce exactly
the batch twin's result (same F.window operator under the hood), and the
watermark config must be accepted for append-mode state bounding."""

from __future__ import annotations

from lakehouse_adventureworks2022_spark.plans.events import event_windows
from lakehouse_adventureworks2022_spark.streaming.events import (
    run_stream_once,
    session_windows_batch,
    sliding_windows_batch,
    stream_events_source,
    stream_tumbling_counts,
)


def _rowset(df):
    return {tuple(r) for r in df.collect()}


def test_stream_tumbling_equals_batch(spark, sf_dir):
    stream = stream_tumbling_counts(stream_events_source(spark, sf_dir))
    assert stream.isStreaming
    got = run_stream_once(stream, "t_tumbling")
    want = event_windows(spark, sf_dir)
    assert _rowset(got) == _rowset(want)


def test_stream_sliding_equals_batch(spark, sf_dir):
    from pyspark.sql import functions as F

    src = stream_events_source(spark, sf_dir)
    stream = (
        src.withWatermark("ts", "1 hour")
        .groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).alias("event_count"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "event_count"
        )
    )
    got = run_stream_once(stream, "t_sliding")
    want = sliding_windows_batch(spark, sf_dir).drop("total_value")
    assert _rowset(got) == _rowset(want)


def test_stream_session_windows_equals_batch(spark, sf_dir):
    from pyspark.sql import functions as F

    src = stream_events_source(spark, sf_dir)
    stream = (
        src.withWatermark("ts", "1 hour")
        .groupBy(
            F.session_window("ts", "30 minutes").alias("w"), F.col("user_id")
        )
        .agg(F.count(F.lit(1)).alias("event_count"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "event_count",
        )
    )
    got = run_stream_once(stream, "t_session")
    want = session_windows_batch(spark, sf_dir).drop("total_value")
    assert _rowset(got) == _rowset(want)


def test_stream_stream_interval_join_equals_batch(spark, sf_dir):
    from lakehouse_adventureworks2022_spark.streaming.joins import (
        click_purchase_join_batch,
        stream_click_purchase_join,
    )
    from lakehouse_adventureworks2022_spark.sources.readers import read_table

    stream = stream_click_purchase_join(stream_events_source(spark, sf_dir))
    assert stream.isStreaming
    got = run_stream_once(stream, "t_ss_join", output_mode="append")
    want = click_purchase_join_batch(read_table(spark, sf_dir, "events"))
    assert _rowset(got) == _rowset(want)
    assert got.count() > 0
