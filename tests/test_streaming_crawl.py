"""Streaming WARC ingestion (streaming/crawl.py): stream≡batch row
equality against warc_incremental_ingest over the same files,
two-micro-batch file accumulation, restart no-reingest, and the shared
partition layout contract."""

from __future__ import annotations

from lakehouse_adventureworks2022_spark.sources.warc import (
    build_warc_codec,
    warc_incremental_ingest,
)
from lakehouse_adventureworks2022_spark.streaming.crawl import (
    stream_warc_ingest,
)

CODEC = build_warc_codec()


def _blob(tag, n=3, gz=True):
    return CODEC["write"](
        [
            {"uri": f"http://{tag}.io/p/{i}", "record_id": f"<u:{tag}:{i}>",
             "body": f"<p>{tag} {i}</p>".encode()}
            for i in range(n)
        ],
        gzip_members=gz,
    )


def _rows(spark, out):
    return sorted(
        (r["record_id"], r["warc_type"], r["target_uri"],
         bytes(r["payload"]) if r["payload"] is not None else None)
        for r in spark.read.parquet(out).collect()
    )


def test_stream_equals_batch_and_accumulates(spark, tmp_path):
    crawl = tmp_path / "crawl"
    crawl.mkdir()
    (crawl / "a.warc.gz").write_bytes(_blob("a"))
    (crawl / "b.warc").write_bytes(_blob("b", gz=False))

    # batch reference over the same files
    batch_out = str(tmp_path / "batch_out")
    warc_incremental_ingest(
        spark, str(crawl), str(tmp_path / "state.json"), batch_out
    )

    stream_out = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")
    q = stream_warc_ingest(spark, str(crawl), stream_out, ckpt)
    q.processAllAvailable()

    assert _rows(spark, stream_out) == _rows(spark, batch_out)
    # same partition layout: file=<sanitized>-<hash8> dirs
    import os

    dirs = sorted(
        d for d in os.listdir(stream_out) if d.startswith("file=")
    )
    assert len(dirs) == 2 and all("-" in d for d in dirs)

    # a THIRD file arrives mid-stream: next micro-batch ingests ONLY it
    (crawl / "c.warc.gz").write_bytes(_blob("c"))
    q.processAllAvailable()
    q.stop()
    got = _rows(spark, stream_out)
    assert len(got) == 12  # 3 files x (warcinfo + 3 responses)
    assert any("c.io" in (u or "") for _, _, u, _ in got)

    # restart against the same checkpoint: nothing re-ingests, rows
    # unchanged (the file-source log is the state)
    q2 = stream_warc_ingest(spark, str(crawl), stream_out, ckpt)
    q2.processAllAvailable()
    q2.stop()
    assert _rows(spark, stream_out) == got


def test_stream_max_files_per_trigger_bounds_batches(spark, tmp_path):
    """A backlog catch-up with maxFilesPerTrigger=1 lands every file
    (bounded micro-batches, same final rows)."""
    crawl = tmp_path / "crawl"
    crawl.mkdir()
    for tag in ("x", "y", "z"):
        (crawl / f"{tag}.warc.gz").write_bytes(_blob(tag, n=2))
    out = str(tmp_path / "out")
    q = stream_warc_ingest(
        spark, str(crawl), out, str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    q.processAllAvailable()
    q.stop()
    rows = _rows(spark, out)
    assert len(rows) == 9  # 3 files x (warcinfo + 2 responses)
