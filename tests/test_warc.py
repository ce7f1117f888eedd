"""WARC ingestion (sources/warc.py): codec round-trip (plain +
per-record gzip members), spec-shaped byte layout pins, malformed-input
refusal, the binaryFile read path, the (url, html) page projection
feeding prepare_web_corpus, the catalog twin at two SFs, and
foreign-cwd worker portability of the by-value closures."""

from __future__ import annotations

import duckdb
import pytest

from lakehouse_adventureworks2022_spark.sources.warc import (
    build_warc_codec,
    parse_warc_frame,
    read_warc,
    warc_pages,
)

CODEC = build_warc_codec()


def _responses():
    return [
        {
            "uri": "http://site.io/a",
            "record_id": "<urn:uuid:1>",
            "body": b"<p>hello</p>",
        },
        {
            "uri": "http://site.io/b",
            "record_id": "<urn:uuid:2>",
            # CRLFs and header-terminator lookalikes INSIDE the payload:
            # Content-Length framing must carry the record, not
            # delimiter scanning
            "body": b"line1\r\n\r\nWARC/1.0\r\nnot a real record",
        },
        {
            "uri": "http://site.io/404",
            "record_id": "<urn:uuid:3>",
            "body": b"gone",
            "status": 404,
        },
    ]


@pytest.mark.parametrize("gz", [False, True])
def test_codec_roundtrip(gz):
    blob = CODEC["write"](_responses(), gzip_members=gz)
    recs = CODEC["parse"](blob)
    assert [r[1] for r in recs] == ["warcinfo", "response", "response", "response"]
    assert [r[2] for r in recs[1:]] == [
        "http://site.io/a", "http://site.io/b", "http://site.io/404",
    ]
    assert [r[5] for r in recs[1:]] == [200, 200, 404]
    assert recs[1][7] == b"<p>hello</p>"
    assert recs[2][7] == b"line1\r\n\r\nWARC/1.0\r\nnot a real record"
    assert recs[1][6].startswith("text/html")
    assert recs[0][5] is None  # warcinfo has no HTTP envelope


def test_gzip_members_are_individually_seekable():
    """The spec's point of per-record members: every record starts its
    own gzip stream (magic at each member boundary)."""
    blob = CODEC["write"](_responses(), gzip_members=True)
    assert blob[:2] == b"\x1f\x8b"
    # more than one member: the whole blob is NOT one stream
    import zlib

    d = zlib.decompressobj(wbits=31)
    d.decompress(blob)
    assert d.eof and d.unused_data  # first member ends, more follow


def test_spec_layout_pins():
    """Hand-check the byte layout of one record against ISO 28500:
    version line, named headers, Content-Length framing, the two CRLFs
    after the block."""
    blob = CODEC["write"](
        [{"uri": "http://x/", "record_id": "<urn:uuid:9>", "body": b"BODY"}]
    )
    # skip the warcinfo record: find the second version line
    second = blob.index(b"WARC/1.0\r\n", 1)
    rec = blob[second:]
    head, _, rest = rec.partition(b"\r\n\r\n")
    assert b"WARC-Type: response" in head
    assert b"WARC-Target-URI: http://x/" in head
    import re

    # the WARC header block ends "...Content-Length: N\r\n\r\n" — the
    # partition consumed the separator, so the length is head's tail
    m = re.search(rb"Content-Length: (\d+)$", head)
    block = rest[: int(m.group(1))]
    assert block.endswith(b"BODY")
    assert rest[int(m.group(1)) :] == b"\r\n\r\n"


@pytest.mark.parametrize(
    "mutate,msg",
    [
        (lambda b: b[:40], "truncated|Content-Length"),
        (lambda b: b.replace(b"WARC/1.0", b"HARC/1.0", 1), "bad WARC version"),
        (
            lambda b: b.replace(b"Content-Length: ", b"X-Length: "),
            "Content-Length",
        ),
        (
            lambda b: CODEC["write"]([{"uri": "u", "record_id": "r", "body": b"x" * 10}])[:-20],
            "past end|truncated",
        ),
    ],
)
def test_malformed_refuses_loudly(mutate, msg):
    blob = mutate(CODEC["write"](_responses()))
    with pytest.raises(ValueError, match=msg):
        CODEC["parse"](blob)


def test_truncated_gzip_member_refused():
    blob = CODEC["write"](_responses(), gzip_members=True)
    with pytest.raises(ValueError, match="gzip|trailing"):
        CODEC["parse"](blob[: len(blob) - 7])


def test_read_warc_binaryfile_path(spark, tmp_path):
    """The deployment entry point: .warc.gz files on disk via Spark's
    binaryFile source — one row per record, source_file populated."""
    (tmp_path / "crawl").mkdir()
    for i, gz in enumerate([False, True]):
        ext = "warc.gz" if gz else "warc"
        (tmp_path / "crawl" / f"part-{i}.{ext}").write_bytes(
            CODEC["write"](_responses(), gzip_members=gz)
        )
    recs = read_warc(spark, str(tmp_path / "crawl"))
    rows = recs.collect()
    assert len(rows) == 8  # (1 warcinfo + 3 responses) × 2 files
    assert all(r["source_file"] for r in rows)
    pages = warc_pages(recs).collect()
    # 404 filtered; 2 files × 2 OK pages
    assert sorted(r["url"] for r in pages) == [
        "http://site.io/a", "http://site.io/a",
        "http://site.io/b", "http://site.io/b",
    ]
    assert all("hello" in r["html"] or "line1" in r["html"] for r in pages)


def test_pages_feed_web_corpus_front_door(spark, tmp_path):
    """End-to-end crawl chain: WARC file → warc_pages → URL dedup +
    extraction + gates (prepare_web_corpus(url_col='url'))."""
    from pyspark.sql import functions as F

    from lakehouse_adventureworks2022_spark.operators import dedup
    from lakehouse_adventureworks2022_spark.operators.curation import (
        prepare_web_corpus,
    )

    page = (
        "<p>tiny healthy document with enough plain words"
        " to pass the quality gate today</p>"
    )
    blob = CODEC["write"](
        [
            {"uri": "http://site.io/a?b=2&a=1", "record_id": "<u:1>",
             "body": page.encode()},
            # same resource, noisier spelling — URL dedup drops it
            {"uri": "HTTP://SITE.IO:80/a?a=1&utm_source=x&b=2#f",
             "record_id": "<u:2>", "body": page.encode()},
        ],
        gzip_members=True,
    )
    (tmp_path / "f.warc.gz").write_bytes(blob)
    pages = warc_pages(read_warc(spark, str(tmp_path))).select(
        F.monotonically_increasing_id().alias("doc_id"),
        F.lit("crawl").alias("source"),
        F.lit("en").alias("lang"),
        "url",
        "html",
    )
    out = prepare_web_corpus(pages, url_col="url")
    n = out.count()
    dedup.release_cached_inputs(out)
    assert n == 1


@pytest.mark.parametrize(
    "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_catalog_twin_hash_parity(spark, sf):
    from lakehouse_adventureworks2022_spark.plans.catalog import (
        ORACLES,
        PYTEST_ORACLES,
        QUERIES,
    )
    from tools.check_oracles import TABLES, canonical_hash, normalize_pandas

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    spark_pdf = normalize_pandas(QUERIES["warc_ingest"](spark, sf).toPandas())
    duck_pdf = normalize_pandas(
        con.sql({**PYTEST_ORACLES, **ORACLES}["warc_ingest"]).df()
    )
    con.close()
    assert canonical_hash(spark_pdf) == canonical_hash(duck_pdf)
    assert len(spark_pdf) > 0


def test_incremental_ingest_idempotent_and_file_granular(spark, tmp_path):
    """warc_incremental_ingest: only NEW files are parsed per run, a
    replay after a simulated crash (checkpoint not written) overwrites
    the same per-file dirs instead of duplicating rows, and readers see
    the union."""
    import json
    import os

    from lakehouse_adventureworks2022_spark.sources.warc import (
        warc_incremental_ingest,
    )

    crawl = tmp_path / "crawl"
    crawl.mkdir()
    out = str(tmp_path / "records")
    state = str(tmp_path / "state" / "ingested.json")

    def drop(name, uris):
        (crawl / name).write_bytes(
            CODEC["write"](
                [
                    {"uri": u, "record_id": f"<u:{u}>", "body": b"<p>x</p>"}
                    for u in uris
                ],
                gzip_members=name.endswith(".gz"),
            )
        )

    drop("a.warc", ["http://a/1", "http://a/2"])
    drop("b.warc.gz", ["http://b/1"])
    assert warc_incremental_ingest(spark, str(crawl), state, out) == [
        "a.warc", "b.warc.gz",
    ]
    # 2 warcinfo + 3 responses
    assert spark.read.parquet(f"{out}/*").count() == 5

    # nothing new -> no work, no state churn
    assert warc_incremental_ingest(spark, str(crawl), state, out) == []

    # a third file arrives; simulate a crash AFTER its parquet write by
    # re-running with the checkpoint rolled back — the replay overwrites
    # file=c.warc, never duplicates
    drop("c.warc", ["http://c/1"])
    assert warc_incremental_ingest(spark, str(crawl), state, out) == ["c.warc"]
    rolled_back = [n for n in json.loads(open(state).read()) if n != "c.warc"]
    with open(state, "w") as f:
        json.dump(rolled_back, f)
    assert warc_incremental_ingest(spark, str(crawl), state, out) == ["c.warc"]
    assert spark.read.parquet(f"{out}/*").count() == 7  # 3 info + 4 resp
    assert sorted(os.listdir(out)) == [
        "file=a.warc", "file=b.warc.gz", "file=c.warc",
    ]
