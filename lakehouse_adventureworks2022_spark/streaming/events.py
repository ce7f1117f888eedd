"""Structured Streaming over the events table (SURVEY.md §2.9: the
reference has NO streaming — its "incremental" is batch-with-watermark;
this module is the idiomatic Spark replacement, per the BASELINE.json
north star).

Design:
- the *same* windowed aggregations exist as batch twins
  (:func:`sliding_windows_batch`, :func:`session_windows_batch`, and
  ``plans/events.event_windows`` for tumbling) — batch and streaming
  share ``F.window`` / ``F.session_window`` semantics exactly, so the
  batch twin is the oracle-checkable face and the streaming path is
  tested against it;
- ``withWatermark`` bounds state for append-mode output (late events
  beyond the watermark are dropped — the late-data policy the
  reference's hand-rolled checkpoint loop cannot express);
- at scale the stream partitions by grouping key after the source stage;
  state lives in the executor state store keyed by (window, key) and is
  bounded by the watermark horizon.

The parquet fixture stands in for a Kafka/file stream: ``readStream``
over the same files (ns-timestamp fixup identical to the batch reader).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_adventureworks2022_spark.functions.dialect import money
from lakehouse_adventureworks2022_spark.sources.readers import read_table

#: Schema for the streaming source (ts arrives as raw ns-epoch long —
#: the nanosAsLong representation the batch reader uses).
EVENTS_RAW_SCHEMA = (
    "event_id bigint, ts bigint, user_id bigint, event_type string,"
    " value double, props string"
)


def stream_events_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet with the ns→µs fixup.

    The file source requires a *directory* (it watches for new files — a
    real deployment points at a landing dir or Kafka); the read-only
    single-file fixture is exposed through a symlink staging dir.
    """
    import hashlib
    import os
    import tempfile

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    stage = os.path.join(tempfile.gettempdir(), f"events_stream_{tag}")
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.join(sf_dir, "events.parquet"), link)

    raw = spark.readStream.schema(EVENTS_RAW_SCHEMA).parquet(stage)
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def stream_tumbling_counts(
    events: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming tumbling 1-hour counts per event type with a late-data
    watermark — the streaming twin of ``plans/events.event_windows``."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            money(F.sum("value")).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "event_count",
            "total_value",
        )
    )


def run_stream_once(
    stream_df: DataFrame, query_name: str, output_mode: str = "complete"
) -> DataFrame:
    """Drive a stream to completion against the fixture files and return
    the final result from the memory sink (test/dev harness).

    ``complete`` suits aggregations; stream-stream joins (no aggregation)
    require ``append``.
    """
    spark = stream_df.sparkSession
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .start()
    )
    q.processAllAvailable()
    out = spark.table(query_name)
    q.stop()
    return out


# ---- batch twins (oracle-checkable faces of the streaming ops) -------

def sliding_windows_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 15 minutes (each event lands in 4
    windows). Same ``F.window`` operator a stream would run under a
    watermark."""
    events = read_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            money(F.sum("value")).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "event_count",
            "total_value",
        )
    )


def session_windows_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 30-minute inactivity gap
    (``F.session_window``: start = first event, end = last event + gap;
    a gap of exactly 30 min starts a NEW session — end bound exclusive).
    """
    events = read_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.session_window("ts", "30 minutes").alias("w"),
            F.col("user_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            money(F.sum("value")).alias("total_value"),
        )
        .select(
            F.col("user_id"),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "event_count",
            "total_value",
        )
    )
