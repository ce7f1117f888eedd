"""Streaming crawl ingestion — the streaming face of
``sources.warc.warc_incremental_ingest`` (r13). A Structured Streaming
``binaryFile`` file stream watches the crawl directory; each
micro-batch parses its NEW files with the same record parser and lands
the records via dynamic-partition-overwrite into the same
``file=<sanitized>-<hash8>`` layout, so:

- the output is row-equal to the batch backfill over the same files
  (stream≡batch, tested);
- a replayed micro-batch rewrites exactly its own per-file partition
  dirs (idempotent on re-delivery — the ``warc_incremental_ingest``
  posture, with the file-source checkpoint replacing the JSON state);
- downstream consumers (``warc_pages`` → the curation chain,
  ``cdx_records``, ``dedup_payload_digest``) read the SAME parquet
  contract either way.

Scale: the file stays the unit of parallelism (one task per WARC file,
the :func:`~sources.warc.read_warc` layout); ``maxFilesPerTrigger``
bounds a backlog catch-up so one micro-batch never schedules a 64k-file
write; the checkpoint is Spark's own file-source log (exactly-once file
accounting across restarts).

Reference parity note: the reference pipeline (racenak/
lakehouse-adventureworks2022) has no streaming surface — this module is
part of the beyond-reference crawl tier (`SURVEY.md` §2.9 posture:
foreachBatch over the SAME batch operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: binaryFile's fixed schema — a streaming source cannot infer it
#: (Spark refuses schema inference on file streams), so it is pinned
#: here; the format itself validates columns at read.
BINARY_FILE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("modificationTime", T.TimestampType()),
        T.StructField("length", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def stream_warc_ingest(
    spark,
    crawl_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    pattern: str = "*.warc*",
    max_files_per_trigger: int | None = None,
):
    """Start the ingest stream: new ``.warc(.gz)`` files appearing
    under ``crawl_dir`` land as parsed records under ``out_dir`` in the
    batch backfill's exact partition layout. Returns the
    ``StreamingQuery``; stop it (or use ``trigger(availableNow)``
    semantics via ``max_files_per_trigger`` + external stop) per the
    deployment's cadence."""
    from lakehouse_adventureworks2022_spark.sources.warc import (
        _file_key_col,
        parse_warc_frame,
    )

    reader = (
        spark.readStream.format("binaryFile")
        .schema(BINARY_FILE_SCHEMA)
        .option("pathGlobFilter", pattern)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.load(crawl_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        recs = parse_warc_frame(batch_df, "content", "path")
        (
            recs.withColumn("file", _file_key_col(F.col("source_file")))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("file")
            .parquet(out_dir)
        )

    return (
        src.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )
