"""Streaming sinks into the medallion tables: checkpointed file sink and
foreachBatch bronze ingestion.

This replaces the reference's hand-rolled pull loop (read checkpoint →
filter → append → write checkpoint, ``extract_load_template.py:60-83``)
with Structured Streaming's own exactly-once machinery:

- :func:`stream_to_bronze` — file-sink append with a checkpoint
  location: restarts resume from the last committed offset, files are
  committed atomically via the sink log (no duplicate ingestion on
  crash/restart — the property the reference's loop could not guarantee
  between its append and its checkpoint write);
- :func:`stream_to_bronze_foreach_batch` — ``foreachBatch`` into a
  :class:`TableManager` table for sinks the file sink can't express
  (partition overwrite, MERGE on Delta). Idempotence comes from the
  ``batch_id``: re-delivered batches skip when the recorded id is
  already applied (the checkpoint stores the offset→batch mapping).

Scale: checkpoints/offsets are tiny metadata; data flows
executor→files; state never passes the driver.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from lakehouse_adventureworks2022_spark.storage.tables import TableManager


def stream_to_bronze(
    events: DataFrame, out_dir: str, checkpoint_dir: str
) -> StreamingQuery:
    """Exactly-once parquet append with ingestion metadata (W1 semantics
    under streaming): restartable via the checkpoint."""
    enriched = events.withColumn(
        "ingestion_date", F.to_date(F.current_timestamp())
    )
    return (
        enriched.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


def stream_to_bronze_foreach_batch(
    events: DataFrame,
    tables: TableManager,
    table: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """foreachBatch ingestion into a managed table with explicit
    batch-id idempotence (re-delivered batches are skipped)."""
    applied_path = Path(checkpoint_dir) / "_applied_batches.json"

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        applied: set[int] = set()
        if applied_path.exists():
            applied = set(json.loads(applied_path.read_text()))
        if batch_id in applied:
            return  # re-delivery after restart: already applied
        batch = batch_df.withColumn(
            "ingestion_date", F.to_date(F.current_timestamp())
        )
        tables.append(batch, table, partition_by="ingestion_date")
        applied.add(batch_id)
        applied_path.parent.mkdir(parents=True, exist_ok=True)
        tmp = applied_path.with_suffix(".tmp")
        tmp.write_text(json.dumps(sorted(applied)))
        tmp.rename(applied_path)

    return (
        events.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )
