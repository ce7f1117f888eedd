"""Streaming sinks: exactly-once file append with checkpoint resume, and
foreachBatch ingestion idempotence across restarts."""

from __future__ import annotations

from lakehouse_adventureworks2022_spark.sources.readers import read_table
from lakehouse_adventureworks2022_spark.storage.tables import TableManager
from lakehouse_adventureworks2022_spark.streaming.events import stream_events_source
from lakehouse_adventureworks2022_spark.streaming.sink import (
    stream_to_bronze,
    stream_to_bronze_foreach_batch,
)


def test_file_sink_resume_does_not_duplicate(spark, sf_dir, tmp_path):
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    src = stream_events_source(spark, sf_dir)
    q = stream_to_bronze(src, out, ckpt)
    q.processAllAvailable()
    q.stop()
    n1 = spark.read.parquet(out).count()
    assert n1 == 1000

    # restart against the same checkpoint: source exhausted ⇒ no new rows
    q2 = stream_to_bronze(stream_events_source(spark, sf_dir), out, ckpt)
    q2.processAllAvailable()
    q2.stop()
    assert spark.read.parquet(out).count() == n1


def test_foreach_batch_ingestion_idempotent(spark, sf_dir, tmp_path):
    tm = TableManager(spark, str(tmp_path / "wh"))
    ckpt = str(tmp_path / "ckpt2")
    src = stream_events_source(spark, sf_dir)
    q = stream_to_bronze_foreach_batch(src, tm, "bronze.events_stream", ckpt)
    q.processAllAvailable()
    q.stop()
    assert tm.read("bronze.events_stream").count() == 1000

    # restart: no new source data and applied batch ids recorded ⇒ no dupes
    q2 = stream_to_bronze_foreach_batch(
        stream_events_source(spark, sf_dir), tm, "bronze.events_stream", ckpt
    )
    q2.processAllAvailable()
    q2.stop()
    assert tm.read("bronze.events_stream").count() == 1000
    # the ingested rows match the batch source exactly
    want = read_table(spark, sf_dir, "events").count()
    assert tm.read("bronze.events_stream").count() == want