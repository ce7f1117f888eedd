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


@pytest.mark.slow
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


def test_wet_conversion_records_roundtrip(spark):
    """WET layout (CommonCrawl *.warc.wet.gz): conversion records whose
    block IS the extracted text — written, parsed back through the same
    record parser, projected by wet_pages; digest surfaced; response
    records in the same file are untouched by the projection."""
    import hashlib

    from lakehouse_adventureworks2022_spark.sources.warc import (
        wet_pages,
    )

    text = "already-extracted text body, no markup"
    blob = CODEC["write"](
        [
            {"uri": "http://h/wet", "record_id": "<w:1>",
             "body": text.encode(), "conversion": True},
            {"uri": "http://h/html", "record_id": "<w:2>",
             "body": b"<p>html page</p>"},
        ],
        gzip_members=True,
    )
    recs = CODEC["parse"](blob)
    assert [r[1] for r in recs] == ["warcinfo", "conversion", "response"]
    conv = recs[1]
    assert conv[4] == "text/plain" and conv[7] == text.encode()
    assert conv[8] == f"md5:{hashlib.md5(text.encode()).hexdigest()}"
    assert conv[5] is None  # no HTTP envelope on conversion records
    df = spark.createDataFrame([(blob,)], "content binary")
    pages = wet_pages(parse_warc_frame(df, "content", path_col=None))
    assert [(r["url"], r["text"]) for r in pages.collect()] == [
        ("http://h/wet", text)
    ]


def test_digest_dedup_ahead_of_url_dedup_in_chain(spark, tmp_path):
    """The full crawl dedup ladder, cheapest tier first: records →
    dedup_payload_digest (crawler digests, no payload work) →
    warc_pages → dedup_urls (canonical URL) → extraction. A revisit
    and a byte-identical recapture at another URL both drop at the
    digest tier; a canonical-URL variant drops at the URL tier."""
    from pyspark.sql import functions as F

    from lakehouse_adventureworks2022_spark.operators.textops import (
        dedup_urls,
    )
    from lakehouse_adventureworks2022_spark.sources.warc import (
        dedup_payload_digest,
    )

    page = b"<p>one page body</p>"
    other = b"<p>a different page</p>"
    blob = CODEC["write"](
        [
            {"uri": "http://h/a", "record_id": "<u:1>", "body": page},
            # byte-identical recapture at another URL: digest tier drops
            {"uri": "http://h/mirror", "record_id": "<u:2>", "body": page},
            # crawler-marked duplicate: digest tier drops
            {"uri": "http://h/a", "record_id": "<u:3>", "body": page,
             "revisit": True},
            # canonical-URL variant of a distinct page: URL tier drops
            {"uri": "http://h/b?y=2&x=1", "record_id": "<u:4>",
             "body": other},
            {"uri": "HTTP://H:80/b?x=1&y=2#frag", "record_id": "<u:5>",
             "body": other + b"<!-- trailing noise -->"},
        ],
        gzip_members=True,
    )
    (tmp_path / "f.warc.gz").write_bytes(blob)
    records = read_warc(spark, str(tmp_path))
    pages = warc_pages(dedup_payload_digest(records)).select(
        F.monotonically_increasing_id().alias("doc_id"), "url", "html"
    )
    kept = sorted(r["url"] for r in dedup_urls(pages, "url").collect())
    assert kept == ["http://h/a", "http://h/b?y=2&x=1"]


def test_record_offsets_self_validate():
    """The CDX range contract, proven by slicing: for every parsed
    record, bytes[offset : offset+length] of the ORIGINAL file must
    itself parse back to the same record — plain files (record byte
    range) and .warc.gz (compressed member range) alike; a whole-file
    single gzip member has no per-record range and reports NULL."""
    import gzip

    resp = [
        {"uri": "http://x/a", "record_id": "<u:1>", "body": b"<p>one</p>"},
        {"uri": "http://x/b", "record_id": "<u:2>", "body": b"<p>two</p>"},
    ]
    blob = CODEC["write"](resp)
    for r in CODEC["parse"](blob):
        sub = blob[r[10] : r[10] + r[11]]
        (rr,) = CODEC["parse"](sub)
        assert rr[0] == r[0] and rr[7] == r[7]
    gzblob = CODEC["write"](resp, gzip_members=True)
    offs = []
    for r in CODEC["parse"](gzblob):
        member = gzblob[r[10] : r[10] + r[11]]
        (rr,) = CODEC["parse"](member)
        assert rr[0] == r[0] and rr[7] == r[7]
        offs.append((r[10], r[11]))
    # contiguous non-overlapping members covering the whole file
    assert offs[0][0] == 0 and offs[-1][0] + offs[-1][1] == len(gzblob)
    single = gzip.compress(CODEC["write"](resp))
    assert all(
        r[10] is None and r[11] is None for r in CODEC["parse"](single)
    )


def test_surt_key_worked_examples(spark):
    from pyspark.sql import functions as F

    from lakehouse_adventureworks2022_spark.operators.textops import (
        surt_key_col,
    )

    rows = [
        ("HTTP://Sub.Example.COM:80/P/x?b=2&utm_source=t&a=1#f",
         "com,example,sub)/P/x?a=1&b=2"),
        ("https://example.com", "com,example)/"),
        ("http://h.io:8080/p", "io,h:8080)/p"),  # non-default port kept
        ("not a url", None),
    ]
    df = spark.createDataFrame([(u,) for u, _ in rows], "url string")
    got = [
        r["k"] for r in df.select(surt_key_col(F.col("url")).alias("k")).collect()
    ]
    assert got == [k for _, k in rows]


def test_cdx_records_end_to_end(spark, tmp_path):
    """records → cdx_records: urlkey is the SURT of the canonical URL,
    timestamp the 14-digit WARC-Date, digest carried, offset/length
    range-fetchable from the original file, filename the basename;
    sort=True orders (urlkey, timestamp)."""
    from lakehouse_adventureworks2022_spark.sources.warc import (
        cdx_records,
    )

    blob = CODEC["write"](
        [
            {"uri": "http://B.io/x?b=2&a=1", "record_id": "<u:1>",
             "body": b"<p>bee</p>", "date": "2024-03-05T06:07:08Z"},
            {"uri": "http://a.io/y", "record_id": "<u:2>",
             "body": b"<p>ay</p>", "date": "2024-01-02T03:04:05Z"},
            {"uri": "http://a.io/y", "record_id": "<u:3>",
             "body": b"<p>ay</p>", "revisit": True,
             "date": "2024-06-01T00:00:00Z"},
        ],
        gzip_members=True,
    )
    (tmp_path / "crawl-00001.warc.gz").write_bytes(blob)
    rows = cdx_records(
        read_warc(spark, str(tmp_path)), sort=True
    ).collect()
    assert [r["urlkey"] for r in rows] == [
        "io,a)/y", "io,a)/y", "io,b)/x?a=1&b=2",
    ]
    assert [r["timestamp"] for r in rows] == [
        "20240102030405", "20240601000000", "20240305060708",
    ]
    # the revisit row carries the SAME digest as its original capture
    assert rows[0]["digest"] == rows[1]["digest"]
    assert all(r["filename"] == "crawl-00001.warc.gz" for r in rows)
    # the range contract against the real on-disk file
    for r in rows:
        member = blob[r["offset"] : r["offset"] + r["length"]]
        (rr,) = CODEC["parse"](member)
        assert rr[2] == r["url"]


@pytest.mark.slow
def test_web_corpus_from_warc_one_call_front_door(spark, tmp_path):
    """The full one-call chain: WARC files on disk → digest dedup →
    page projection → robots gate → URL dedup → extraction → quality
    gates → split. Every dedup tier claims its intended victim and the
    survivors carry file-basename provenance + deterministic ids."""
    from lakehouse_adventureworks2022_spark.operators import dedup
    from lakehouse_adventureworks2022_spark.operators.curation import (
        web_corpus_from_warc,
    )
    from lakehouse_adventureworks2022_spark.operators.textops import (
        parse_robots,
    )

    page_a = (
        "<p>tiny healthy document with enough plain words"
        " to pass the quality gate today</p>"
    ).encode()
    page_b = (
        "<p>another entirely different page describing oranges,"
        " bicycles and seven rainy tuesdays in quiet detail</p>"
    ).encode()
    (tmp_path / "f1.warc.gz").write_bytes(
        CODEC["write"](
            [
                {"uri": "http://site.io/a", "record_id": "<c:1>",
                 "body": page_a},
                # byte-identical recapture -> digest tier drops
                {"uri": "http://site.io/a-mirror", "record_id": "<c:2>",
                 "body": page_a},
                # crawler-marked duplicate -> digest tier drops
                {"uri": "http://site.io/a", "record_id": "<c:3>",
                 "body": page_a, "revisit": True},
            ],
            gzip_members=True,
        )
    )
    (tmp_path / "f2.warc").write_bytes(
        CODEC["write"](
            [
                {"uri": "http://site.io/b?y=2&x=1", "record_id": "<c:4>",
                 "body": page_b},
                # canonical-URL variant -> URL tier drops
                {"uri": "HTTP://SITE.IO:80/b?x=1&y=2#f",
                 "record_id": "<c:5>", "body": page_b + b"<!-- noise -->"},
                # robots-blocked -> compliance gate drops
                {"uri": "http://site.io/private/x", "record_id": "<c:6>",
                 "body": page_b.replace(b"oranges", b"plums")},
                # 2xx binary -> Content-Type gate drops at the scan
                # (r13), BEFORE decode/extraction ever touch it
                {"uri": "http://site.io/logo.jpg", "record_id": "<c:7>",
                 "body": b"\xff\xd8\xff\xe0binarybytes",
                 "http_content_type": "image/jpeg"},
            ]
        )
    )
    rules = parse_robots(
        spark.createDataFrame(
            [("site.io", "User-agent: *\nDisallow: /private/")],
            "host string, robots_txt string",
        )
    )
    out = web_corpus_from_warc(
        spark, str(tmp_path), robots_rules=rules
    )
    rows = out.collect()
    dedup.release_cached_inputs(out)
    assert len(rows) == 2
    assert sorted(r["source"] for r in rows) == ["f1.warc.gz", "f2.warc"]
    assert all(r["split"] in ("train", "val", "test") for r in rows)
    # replay-deterministic ids (xxhash64 of the spec-unique record id)
    out2 = web_corpus_from_warc(spark, str(tmp_path), robots_rules=rules)
    ids2 = sorted(r["doc_id"] for r in out2.collect())
    dedup.release_cached_inputs(out2)
    assert ids2 == sorted(r["doc_id"] for r in rows)


@pytest.mark.slow
def test_streaming_digest_dedup_stream_equals_batch(spark, tmp_path):
    """Streaming crawl ingest twin (the foreachBatch-over-the-same-
    batch-operator posture): micro-batches of parsed WARC records
    dedup against a persisted digest history — within-batch via
    dedup_payload_digest, across batches via an anti-join on the
    accepted-digest state — and the accepted set equals the one-shot
    batch dedup over the union (the plant puts each digest's keeper in
    the earliest batch, so first-seen == min-keeper)."""
    from pyspark.sql import functions as F

    from lakehouse_adventureworks2022_spark.sources.warc import (
        dedup_payload_digest,
        parse_warc_frame,
    )

    def records_df(responses):
        blob = CODEC["write"](responses, gzip_members=True)
        df = spark.createDataFrame([(blob,)], "content binary")
        return parse_warc_frame(df, "content", path_col=None)

    shared = b"<p>same payload</p>"
    b1 = records_df(
        [
            {"uri": "http://h/a", "record_id": "<s:1>", "body": shared},
            {"uri": "http://h/a", "record_id": "<s:2>", "body": shared,
             "revisit": True},
            {"uri": "http://h/c", "record_id": "<s:3>",
             "body": b"<p>first-only</p>"},
        ]
    )
    b2 = records_df(
        [
            # recapture of batch-1 content at another URL: history drops
            {"uri": "http://h/mirror", "record_id": "<s:4>",
             "body": shared},
            {"uri": "http://h/d", "record_id": "<s:5>",
             "body": b"<p>second-only</p>"},
        ]
    )
    src = tmp_path / "src"
    b1.write.parquet(str(src / "f1"))
    b2.write.parquet(str(src / "f2"))
    out_dir = str(tmp_path / "accepted")
    state_dir = str(tmp_path / "digests")
    schema = b1.schema
    digest = F.coalesce(
        F.col("payload_digest"),
        F.concat(F.lit("md5:"), F.md5(F.col("payload"))),
    )

    def handle(batch_df, _bid):
        import os

        within = dedup_payload_digest(batch_df).filter(
            F.col("warc_type") == "response"
        )
        if os.path.exists(state_dir):
            seen = batch_df.sparkSession.read.parquet(state_dir)
            within = within.join(
                seen,
                digest == F.col("__digest__"),
                "left_anti",
            )
        # materialize before appending to a path the plan reads
        # (the recache-by-path footgun)
        accepted = within.localCheckpoint(eager=True)
        accepted.write.mode("append").parquet(out_dir)
        accepted.select(digest.alias("__digest__")).write.mode(
            "append"
        ).parquet(state_dir)

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = sorted(
        r["record_id"] for r in spark.read.parquet(out_dir).collect()
    )
    batch_ref = sorted(
        r["record_id"]
        for r in dedup_payload_digest(b1.unionByName(b2))
        .filter(F.col("warc_type") == "response")
        .collect()
    )
    assert streamed == batch_ref == ["<s:1>", "<s:3>", "<s:5>"]


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
    # c.warc's partition dir, never duplicates, never touches siblings
    drop("c.warc", ["http://c/1"])
    assert warc_incremental_ingest(spark, str(crawl), state, out) == ["c.warc"]
    rolled_back = [n for n in json.loads(open(state).read()) if n != "c.warc"]
    with open(state, "w") as f:
        json.dump(rolled_back, f)
    assert warc_incremental_ingest(spark, str(crawl), state, out) == ["c.warc"]
    assert spark.read.parquet(f"{out}/*").count() == 7  # 3 info + 4 resp
    # reading the partitioned root directly works too
    assert spark.read.parquet(out).count() == 7

    def key(name):
        import hashlib

        safe = "".join(
            ch if ch.isalnum() or ch in "._-" else "_" for ch in name
        )
        return f"file={safe}-{hashlib.md5(name.encode()).hexdigest()[:8]}"

    assert sorted(
        d for d in os.listdir(out) if d.startswith("file=")
    ) == sorted(key(n) for n in ["a.warc", "b.warc.gz", "c.warc"])


def test_incremental_ingest_one_job_collision_free_metachar_safe(
    spark, tmp_path
):
    """The backfill shape: MANY new files land in ONE binaryFile read +
    ONE dynamic-partition write (not a per-file job loop), names that
    sanitize identically ('a=b.warc' vs 'a_b.warc') land in DISTINCT
    partition dirs, and glob metachars in a filename load literally."""
    import os

    from lakehouse_adventureworks2022_spark.sources.warc import (
        warc_incremental_ingest,
    )

    crawl = tmp_path / "crawl"
    crawl.mkdir()
    out = str(tmp_path / "records")
    state = str(tmp_path / "ingested.json")
    names = ["a=b.warc", "a_b.warc", "snap{1}.warc", "q?x[2].warc"] + [
        f"bulk-{i:03d}.warc" for i in range(12)
    ]
    for n in names:
        (crawl / n).write_bytes(
            CODEC["write"](
                [{"uri": f"http://h/{n}", "record_id": f"<u:{n}>",
                  "body": b"<p>x</p>"}]
            )
        )
    tracker = spark.sparkContext.statusTracker()
    jobs_before = len(tracker.getJobIdsForGroup(None) or [])
    assert warc_incremental_ingest(spark, str(crawl), state, out) == sorted(
        names
    )
    jobs_after = len(tracker.getJobIdsForGroup(None) or [])
    # one binaryFile-read+write job (+ at most a couple of planning
    # jobs, e.g. the dynamic-overwrite partition listing) — NOT one per
    # file: 16 files must not cost 16 write jobs
    assert jobs_after - jobs_before <= 4, jobs_after - jobs_before
    recs = spark.read.parquet(out)
    assert recs.count() == 2 * len(names)  # warcinfo + response each
    dirs = [d for d in os.listdir(out) if d.startswith("file=")]
    assert len(dirs) == len(names)  # collision-free keys, one dir each
    got_uris = sorted(
        r["target_uri"]
        for r in recs.filter("warc_type = 'response'").collect()
    )
    assert got_uris == sorted(f"http://h/{n}" for n in names)


def test_batch_ingest_equivalent_to_per_file_reads(spark, tmp_path):
    """The one-job batch form lands exactly the records the per-file
    read_warc loop produces (same rows, modulo the partition layout)."""
    from lakehouse_adventureworks2022_spark.sources.warc import (
        warc_incremental_ingest,
    )

    crawl = tmp_path / "crawl"
    crawl.mkdir()
    for i in range(4):
        (crawl / f"f{i}.warc.gz").write_bytes(
            CODEC["write"](
                [
                    {"uri": f"http://h/{i}/{j}", "record_id": f"<u:{i}-{j}>",
                     "body": f"<p>doc {i}-{j}</p>".encode()}
                    for j in range(3)
                ],
                gzip_members=True,
            )
        )
    out = str(tmp_path / "records")
    warc_incremental_ingest(
        spark, str(crawl), str(tmp_path / "st.json"), out
    )
    def keyed(rows):
        # source_file basename rides along: the warcinfo record is
        # byte-identical across files and would otherwise collapse
        return {
            (r["source_file"].rsplit("/", 1)[-1], r["record_id"],
             r["warc_type"], r["target_uri"],
             bytes(r["payload"] or b""), r["payload_digest"])
            for r in rows
        }

    batch = keyed(spark.read.parquet(out).collect())
    loop = set()
    for i in range(4):
        loop |= keyed(
            read_warc(spark, str(crawl / f"f{i}.warc.gz")).collect()
        )
    assert batch == loop and len(batch) == 16


def test_revisit_records_and_payload_digest(spark):
    """Revisit records (the crawler's own dedup tier) parse as
    first-class rows: warc_type='revisit', digest surfaced, empty
    payload, HTTP envelope fields recovered from the headers-only
    block; response records surface their WARC-Payload-Digest too."""
    import hashlib

    body = b"<p>same payload twice</p>"
    blob = CODEC["write"](
        [
            {"uri": "http://h/orig", "record_id": "<u:1>", "body": body},
            {"uri": "http://h/dup", "record_id": "<u:2>", "body": body,
             "revisit": True},
        ]
    )
    recs = CODEC["parse"](blob)
    md5 = f"md5:{hashlib.md5(body).hexdigest()}"
    assert [(r[1], r[8]) for r in recs[1:]] == [
        ("response", md5), ("revisit", md5),
    ]
    revisit = recs[2]
    assert revisit[7] == b"" and revisit[5] == 200
    # headers-only block WITHOUT the \r\n\r\n terminator still parses
    # (the tolerant revisit path) — build one by hand
    head = (
        b"WARC/1.0\r\nWARC-Type: revisit\r\nWARC-Record-ID: <u:3>\r\n"
        b"WARC-Target-URI: http://h/d2\r\n"
        b"WARC-Payload-Digest: " + md5.encode() + b"\r\n"
        b"Content-Type: application/http;msgtype=response\r\n"
    )
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html"
    raw = head + b"Content-Length: %d\r\n\r\n" % len(http) + http + b"\r\n\r\n"
    (r3,) = CODEC["parse"](raw)
    assert r3[1] == "revisit" and r3[5] == 200 and r3[7] == b""
    assert r3[8] == md5


def test_content_encoding_gzip_inflated_unknown_gated(spark):
    """HTTP payloads under Content-Encoding: gzip/deflate are inflated
    at parse (real crawl WARCs store wire bytes); an encoding the
    stdlib can't inflate (br) keeps raw bytes, surfaces the token, and
    warc_pages EXCLUDES it so compressed bytes never become 'html'."""
    blob = CODEC["write"](
        [
            {"uri": "http://h/plain", "record_id": "<u:1>",
             "body": b"<p>plain</p>"},
            {"uri": "http://h/gz", "record_id": "<u:2>",
             "body": b"<p>was gzipped</p>", "content_encoding": "gzip"},
            {"uri": "http://h/br", "record_id": "<u:3>",
             "body": b"\x8b\x00opaque-brotli", "content_encoding": "br"},
        ]
    )
    df = spark.createDataFrame([(blob,)], "content binary")
    recs = parse_warc_frame(df, "content", path_col=None)
    rows = {r["target_uri"]: r for r in recs.collect() if r["target_uri"]}
    assert bytes(rows["http://h/gz"]["payload"]) == b"<p>was gzipped</p>"
    assert rows["http://h/gz"]["http_content_encoding"] is None
    assert rows["http://h/br"]["http_content_encoding"] == "br"
    pages = sorted(r["url"] for r in warc_pages(recs).collect())
    assert pages == ["http://h/gz", "http://h/plain"]


def test_content_type_gate_excludes_non_html(spark):
    """r12 verdict ask #2: 2xx responses whose Content-Type is outside
    the HTML family (JPEG, PDF, JS, JSON…) must not become pages — they
    would decode as replacement-char soup and pay the full extraction
    pipeline. NULL Content-Type passes (permissive default — WARC
    headers are messy); parameterized forms and XHTML pass; the gate
    is parameterizable and ``None`` disables it."""
    from lakehouse_adventureworks2022_spark.sources.warc import (
        HTML_CONTENT_TYPES,
    )

    blob = CODEC["write"](
        [
            {"uri": "http://h/html", "record_id": "<u:1>",
             "body": b"<p>a</p>"},  # text/html; charset=utf-8 default
            {"uri": "http://h/xhtml", "record_id": "<u:2>",
             "body": b"<p>x</p>",
             "http_content_type": "application/xhtml+xml"},
            {"uri": "http://h/upper", "record_id": "<u:3>",
             "body": b"<p>u</p>", "http_content_type": "TEXT/HTML"},
            {"uri": "http://h/noct", "record_id": "<u:4>",
             "body": b"<p>n</p>", "http_content_type": None},
            {"uri": "http://h/jpeg", "record_id": "<u:5>",
             "body": b"\xff\xd8\xff\xe0fakejpeg",
             "http_content_type": "image/jpeg"},
            {"uri": "http://h/json", "record_id": "<u:6>",
             "body": b'{"k": 1}',
             "http_content_type": "application/json"},
            {"uri": "http://h/pdf", "record_id": "<u:7>",
             "body": b"%PDF-1.7 fake",
             "http_content_type": "application/pdf"},
        ]
    )
    df = spark.createDataFrame([(blob,)], "content binary")
    recs = parse_warc_frame(df, "content", path_col=None)
    pages = sorted(r["url"] for r in warc_pages(recs).collect())
    assert pages == [
        "http://h/html", "http://h/noct", "http://h/upper",
        "http://h/xhtml",
    ]
    # widen the gate: JSON family admitted alongside HTML
    widened = sorted(
        r["url"]
        for r in warc_pages(
            recs, content_types=HTML_CONTENT_TYPES + ("application/json",)
        ).collect()
    )
    assert "http://h/json" in widened and "http://h/jpeg" not in widened
    # disable: every successful response is a page again
    assert warc_pages(recs, content_types=None).count() == 7


def test_corrupt_or_truncated_compressed_body_survives_parse(spark):
    """r12 ADVICE (medium): a truncated or corrupt gzip/deflate body —
    or wire bytes still framed by chunked Transfer-Encoding — must NOT
    abort the file's parse (one bad record would fail a whole one-job
    batch ingest). The raw bytes are kept, the Content-Encoding token
    stays surfaced, and the downstream gate excludes the row."""
    import gzip as _gz

    good_gz = _gz.compress(b"<p>ok</p>", compresslevel=1, mtime=0)
    corrupt = good_gz[:8] + b"\xff\xff\xde\xad" + good_gz[12:]
    truncated = good_gz[: len(good_gz) // 2]
    # chunked framing around the gzip member: not a gzip stream at all
    chunked = (
        b"%x\r\n" % len(good_gz) + good_gz + b"\r\n0\r\n\r\n"
    )
    blob = CODEC["write"](
        [
            {"uri": "http://h/good", "record_id": "<u:1>",
             "body": b"<p>plain</p>"},
            # body_is_wire: bodies below already ARE the (broken) wire
            # bytes — the writer must not re-compress them
            {"uri": "http://h/corrupt", "record_id": "<u:2>",
             "body": corrupt, "content_encoding": "gzip",
             "body_is_wire": True},
            {"uri": "http://h/trunc", "record_id": "<u:3>",
             "body": truncated, "content_encoding": "gzip",
             "body_is_wire": True},
            {"uri": "http://h/chunked", "record_id": "<u:4>",
             "body": chunked, "content_encoding": "gzip",
             "body_is_wire": True},
            {"uri": "http://h/baddeflate", "record_id": "<u:5>",
             "body": b"\x00not-deflate", "content_encoding": "deflate",
             "body_is_wire": True},
        ]
    )
    df = spark.createDataFrame([(blob,)], "content binary")
    recs = parse_warc_frame(df, "content", path_col=None)
    rows = {r["target_uri"]: r for r in recs.collect() if r["target_uri"]}
    # the whole file parsed — five records, no exception
    assert len(rows) == 5
    # failures keep raw bytes + the token; downstream gate excludes them
    for bad in ("corrupt", "trunc", "chunked"):
        assert rows[f"http://h/{bad}"]["http_content_encoding"] == "gzip"
    assert (
        rows["http://h/baddeflate"]["http_content_encoding"] == "deflate"
    )
    assert bytes(rows["http://h/trunc"]["payload"]) == truncated
    pages = sorted(r["url"] for r in warc_pages(recs).collect())
    assert pages == ["http://h/good"]


def test_mislabeled_binary_decodes_with_replacement(spark):
    """The page decode is TOTAL (r13): ``F.decode`` is strict in
    Spark 4, and predicate pushdown can substitute the ``html`` alias
    into filters that run before the content-type gate — a JPEG
    mislabeled ``text/html`` (real crawls are full of them) must
    decode to U+FFFD replacement soup for the quality gates to drop,
    never abort the job with MALFORMED_CHARACTER_CODING."""
    blob = CODEC["write"](
        [
            {"uri": "http://h/ok", "record_id": "<u:1>",
             "body": b"<p>fine</p>"},
            # binary bytes under an HTML label: passes the gate,
            # must not kill the decode
            {"uri": "http://h/lying", "record_id": "<u:2>",
             "body": b"\xff\xd8\xff\xe0 jfif \x00\x81",
             "http_content_type": "text/html"},
        ]
    )
    df = spark.createDataFrame([(blob,)], "content binary")
    recs = parse_warc_frame(df, "content", path_col=None)
    rows = {r["url"]: r["html"] for r in warc_pages(recs).collect()}
    assert set(rows) == {"http://h/ok", "http://h/lying"}
    assert rows["http://h/ok"] == "<p>fine</p>"
    # byte-exact python replacement-decode equivalence
    assert rows["http://h/lying"] == (
        b"\xff\xd8\xff\xe0 jfif \x00\x81".decode("utf-8", "replace")
    )


def test_dedup_payload_digest(spark):
    """Crawl-level content dedup on the crawler's digests: revisits all
    drop, one response survives per digest (min (uri, date, id)),
    non-HTTP records pass through, and responses WITHOUT a header
    digest dedup via the recomputed md5 fallback."""
    from pyspark.sql import functions as F

    from lakehouse_adventureworks2022_spark.sources.warc import (
        dedup_payload_digest,
    )

    body = b"<p>shared content</p>"
    blob = CODEC["write"](
        [
            # two full captures of the SAME payload at different URIs
            {"uri": "http://h/a", "record_id": "<u:1>", "body": body},
            {"uri": "http://h/b", "record_id": "<u:2>", "body": body},
            # a revisit pointing at that digest
            {"uri": "http://h/c", "record_id": "<u:3>", "body": body,
             "revisit": True},
            # distinct content survives independently
            {"uri": "http://h/d", "record_id": "<u:4>",
             "body": b"<p>unique</p>"},
        ]
    )
    df = spark.createDataFrame([(blob,)], "content binary")
    recs = parse_warc_frame(df, "content", path_col=None)
    out = dedup_payload_digest(recs)
    got = sorted(
        (r["warc_type"], r["target_uri"]) for r in out.collect()
    )
    assert got == [
        ("response", "http://h/a"),  # keeper: min uri of the pair
        ("response", "http://h/d"),
        ("warcinfo", None),
    ]
    # fallback tier: strip the header digests -> same verdict via md5
    stripped = recs.withColumn(
        "payload_digest", F.lit(None).cast("string")
    )
    got2 = sorted(
        (r["warc_type"], r["target_uri"])
        for r in dedup_payload_digest(stripped).collect()
    )
    assert got2 == got


def test_fetch_by_cdx_random_access_roundtrip(spark, tmp_path):
    """fetch_by_cdx (r13): CDX byte ranges fetch exactly their capture
    out of plain AND gzip archives on disk — no full-file scan, parsed
    through the standard record parser, with the FILE-relative range
    restored on the output rows so a fetched row's own CDX entry
    round-trips."""
    from lakehouse_adventureworks2022_spark.sources.warc import (
        cdx_records,
        fetch_by_cdx,
        read_warc,
    )

    for gz, name in ((False, "a.warc"), (True, "b.warc.gz")):
        blob = CODEC["write"](
            [
                {"uri": f"http://h/{name}/{i}", "record_id": f"<u:{name}:{i}>",
                 "body": f"<p>doc {name} {i}</p>".encode()}
                for i in range(5)
            ],
            gzip_members=gz,
        )
        (tmp_path / name).write_bytes(blob)
    recs = read_warc(spark, str(tmp_path))
    cdx = cdx_records(recs)
    fetched = fetch_by_cdx(cdx, str(tmp_path))
    want = {
        r["record_id"]: (r["target_uri"], bytes(r["payload"]))
        for r in recs.filter(recs["warc_type"] == "response").collect()
    }
    got_rows = fetched.collect()
    got = {
        r["record_id"]: (r["target_uri"], bytes(r["payload"]))
        for r in got_rows
    }
    assert got == want and len(got) == 10
    # file-relative ranges restored: re-indexing the FETCHED rows and
    # fetching again returns the same captures (fetch∘cdx idempotent)
    again = fetch_by_cdx(cdx_records(fetched), str(tmp_path))
    assert {
        r["record_id"]: bytes(r["payload"]) for r in again.collect()
    } == {k: v[1] for k, v in want.items()}


def test_fetch_by_cdx_null_ranges_skip_and_corrupt_raises(spark, tmp_path):
    """NULL offset/length rows (pre-r12 ingests) skip; a range that
    parses to no record raises loudly — a stale index must not
    silently drop captures."""
    import pytest as _pytest

    from lakehouse_adventureworks2022_spark.sources.warc import (
        fetch_by_cdx,
    )

    blob = CODEC["write"](
        [{"uri": "http://h/x", "record_id": "<u:1>", "body": b"<p>x</p>"}]
    )
    (tmp_path / "c.warc").write_bytes(blob)
    cdx = spark.createDataFrame(
        [("c.warc", None, None)],
        "filename string, offset long, length long",
    )
    assert fetch_by_cdx(cdx, str(tmp_path)).count() == 0
    bad = spark.createDataFrame(
        [("c.warc", 3, 7)], "filename string, offset long, length long"
    )
    with _pytest.raises(
        Exception, match="stale or corrupt|no record|bad WARC version"
    ):
        fetch_by_cdx(bad, str(tmp_path)).collect()


@pytest.mark.slow
def test_web_corpus_from_wet_front_door_and_detect_lang(spark, tmp_path):
    """web_corpus_from_wet (r13): *.warc.wet.gz files → digest dedup →
    conversion projection → the full curation chain; detect_lang runs
    the stopword verdict on the CLEAN text; byte-identical text drops
    on the sidecar digests; response records in the same file are
    ignored by the projection."""
    from lakehouse_adventureworks2022_spark.operators import dedup
    from lakehouse_adventureworks2022_spark.operators.curation import (
        web_corpus_from_wet,
    )

    en = ("the quiet harbour and the long road of the north is that "
          "way to a lighthouse and the ferry " * 3)
    es = ("el puerto y la carretera de los barcos que en un rincon "
          "la costa y los faros " * 3)
    blob = CODEC["write"](
        [
            {"uri": "http://a.io/en", "record_id": "<w:1>",
             "body": en.encode(), "conversion": True},
            # byte-identical duplicate text at another url: the digest
            # tier claims it before anything downstream runs
            {"uri": "http://b.io/en-copy", "record_id": "<w:2>",
             "body": en.encode(), "conversion": True},
            {"uri": "http://a.io/es", "record_id": "<w:3>",
             "body": es.encode(), "conversion": True},
            # a response record in the same file: not a conversion,
            # never becomes a page here
            {"uri": "http://a.io/html", "record_id": "<w:4>",
             "body": b"<p>" + en.encode() + b"</p>"},
        ],
        gzip_members=True,
    )
    (tmp_path / "f.warc.wet.gz").write_bytes(blob)
    out = web_corpus_from_wet(
        spark, str(tmp_path), detect_lang=True
    )
    rows = {r["lang"]: r for r in out.collect()}
    n = len(rows)
    dedup.release_cached_inputs(out)
    assert n == 2  # en survives once (digest dedup), es once
    assert set(rows) == {"en", "es"}
    assert all(r["split"] in ("train", "val", "test") for r in rows.values())


@pytest.mark.slow
def test_web_corpus_from_warc_detect_lang(spark, tmp_path):
    """detect_lang=True on the WARC front door: the stopword verdict
    over the decoded page replaces the constant lang (markup dilutes
    the counts but stopwords dominate on real pages)."""
    from lakehouse_adventureworks2022_spark.operators import dedup
    from lakehouse_adventureworks2022_spark.operators.curation import (
        web_corpus_from_warc,
    )

    en = ("<html><body><p>the quiet harbour and the long road of the "
          "north is that way to a lighthouse and the ferry schedule "
          "of the island</p></body></html>")
    es = ("<html><body><p>el puerto y la carretera de los barcos que "
          "en un rincon de la costa y los faros del sur</p></body>"
          "</html>")
    blob = CODEC["write"](
        [
            {"uri": "http://a.io/en", "record_id": "<d:1>",
             "body": en.encode()},
            {"uri": "http://a.io/es", "record_id": "<d:2>",
             "body": es.encode()},
        ],
        gzip_members=True,
    )
    (tmp_path / "f.warc.gz").write_bytes(blob)
    out = web_corpus_from_warc(spark, str(tmp_path), detect_lang=True)
    langs = sorted(r["lang"] for r in out.collect())
    dedup.release_cached_inputs(out)
    assert langs == ["en", "es"]


def test_cdxj_roundtrip_and_interop(spark, tmp_path):
    """CDXJ interop (r13): write_cdxj emits spec-ordered
    '<urlkey> <timestamp> {json}' lines (string-typed json fields per
    pywb convention, range-partitioned global sort), read_cdxj
    round-trips them back to the cdx_records shape, a foreign
    hand-written line parses, and a malformed payload quarantines as
    NULL instead of aborting."""
    import json as _json

    from lakehouse_adventureworks2022_spark.sources.warc import (
        cdx_records,
        fetch_by_cdx,
        read_cdxj,
        read_warc,
        write_cdxj,
    )

    blob = CODEC["write"](
        [
            {"uri": f"http://h{9 - i}.io/p/{i}", "record_id": f"<u:{i}>",
             "body": f"<p>{i}</p>".encode()}
            for i in range(6)
        ],
        gzip_members=True,
    )
    (tmp_path / "a.warc.gz").write_bytes(blob)
    cdx = cdx_records(read_warc(spark, str(tmp_path / "a.warc.gz")))
    out_dir = str(tmp_path / "cdxj")
    write_cdxj(cdx, out_dir)

    # file-level: every line is 'urlkey ts {json}' and GLOBALLY sorted
    import glob

    lines = []
    for f in sorted(glob.glob(out_dir + "/part-*")):
        lines += open(f).read().splitlines()
    keys = []
    for ln in lines:
        urlkey, ts, payload = ln.split(" ", 2)
        j = _json.loads(payload)
        assert set(j) == {"url", "digest", "length", "offset", "filename"}
        assert j["offset"].isdigit() and j["length"].isdigit()
        keys.append((urlkey, ts))
    assert keys == sorted(keys) and len(keys) == 6

    # round-trip equals the original index (schema + values)
    back = read_cdxj(spark, out_dir)
    a = sorted(map(tuple, cdx.collect()))
    b = sorted(map(tuple, back.select(*cdx.columns).collect()))
    assert a == b
    # and the round-tripped index still FETCHES
    fetched = fetch_by_cdx(back, str(tmp_path))
    assert fetched.count() == 6

    # foreign line (hand-written, pywb-shaped) parses; junk quarantines
    foreign = tmp_path / "foreign"
    foreign.mkdir()
    (foreign / "part-00000").write_text(
        'com,example)/x 20240101000000 {"url": "http://example.com/x",'
        ' "digest": "md5:ff", "length": "10", "offset": "0",'
        ' "filename": "f.warc.gz"}\n'
        "com,example)/y 20240101000001 not-json\n"
    )
    rows = read_cdxj(spark, str(foreign)).collect()
    ok = [r for r in rows if r["url"] is not None]
    bad = [r for r in rows if r["url"] is None]
    assert len(ok) == 1 and ok[0]["offset"] == 0 and ok[0]["length"] == 10
    assert len(bad) == 1 and bad[0]["urlkey"] == "com,example)/y"


def test_crawl_health_report_all_bands(spark):
    """crawl_health_report covers the branches the catalog plant zeros:
    revisit counting, encoding-excluded counting, and per-host
    separation with canonical host folding (case/port noise)."""
    import gzip as _gz

    from lakehouse_adventureworks2022_spark.sources.warc import (
        crawl_health_report,
    )

    wire = _gz.compress(b"<p>x</p>", compresslevel=1, mtime=0)[:5]
    blob = CODEC["write"](
        [
            {"uri": "http://A.IO:80/ok", "record_id": "<h:1>",
             "body": "<p>ok page</p>".encode()},
            {"uri": "http://a.io/dup", "record_id": "<h:2>",
             "body": b"<p>ok</p>", "revisit": True},
            # un-inflatable: truncated gzip wire bytes keep the token
            {"uri": "http://a.io/gz", "record_id": "<h:3>",
             "body": wire, "content_encoding": "gzip",
             "body_is_wire": True},
            {"uri": "http://b.io/miss", "record_id": "<h:4>",
             "body": b"<p>m</p>", "status": 404},
        ]
    )
    df = spark.createDataFrame([(blob,)], "content binary")
    recs = parse_warc_frame(df, "content", path_col=None)
    rows = {r["host"]: r for r in crawl_health_report(recs).collect()}
    a = rows["a.io"]
    assert a["n_responses"] == 2 and a["n_revisits"] == 1
    assert a["n_2xx"] == 2 and a["n_encoding_excluded"] == 1
    assert a["n_html"] == 2  # both responses carry the default html ct
    b = rows["b.io"]
    assert b["n_4xx"] == 1 and b["n_revisits"] == 0
    assert b["payload_bytes"] == len(b"<p>m</p>")
