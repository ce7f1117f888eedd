"""Format surface: CSV quarantine ingestion, ORC managed tables, and
zstd parquet round-trips."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from lakehouse_adventureworks2022_spark.sources.formats import (
    read_csv_corpus,
    write_parquet_zstd,
)
from lakehouse_adventureworks2022_spark.sources.readers import read_table
from lakehouse_adventureworks2022_spark.storage.tables import TableManager

SF = "/root/testdata/sf0.001"


def test_csv_quarantine_split(spark, tmp_path):
    p = tmp_path / "dump.csv"
    p.write_text(
        "doc_id,text,lang,source\n"
        '1,"hello world",en,web\n'
        '2,"quoted, with comma",en,web\n'
        "not-a-number,broken,en,web\n"  # type mismatch → quarantine
        '3,"multi\nline text",de,books\n'  # quoted newline: VALID csv
    )
    good, quarantine = read_csv_corpus(
        spark, str(p), multiLine="true"
    )
    rows = {r["doc_id"]: r for r in good.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[2]["text"] == "quoted, with comma"
    assert rows[3]["text"] == "multi\nline text"  # parser, not split(",")
    bad = quarantine.collect()
    assert len(bad) == 1 and "not-a-number" in bad[0]["raw_line"]


def test_csv_roundtrip_of_fixture(spark, tmp_path):
    docs = read_table(spark, SF, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    out = str(tmp_path / "docs_csv")
    docs.write.option("header", "true").option("quoteAll", "true").mode(
        "overwrite"
    ).csv(out)
    good, quarantine = read_csv_corpus(spark, out)
    assert quarantine.count() == 0
    assert good.count() == docs.count()
    a = {r["doc_id"]: r["text"] for r in docs.collect()}
    b = {r["doc_id"]: r["text"] for r in good.collect()}
    assert a == b


def test_orc_managed_table_roundtrip(spark, tmp_path):
    tm = TableManager(spark, str(tmp_path / "wh"), fmt="orc")
    docs = read_table(spark, SF, "documents")
    tm.overwrite(docs, "docs_orc")
    assert glob.glob(f"{tm.path('docs_orc')}/*.orc")
    back = tm.read("docs_orc")
    assert back.count() == docs.count()
    assert dict(back.dtypes) == dict(docs.dtypes)
    s = lambda df: {tuple(r) for r in df.select("doc_id", "text").collect()}
    assert s(back) == s(docs)


def test_zstd_parquet_roundtrip_and_ratio(spark, tmp_path):
    docs = read_table(spark, SF, "documents")
    zp, sp = str(tmp_path / "z"), str(tmp_path / "s")
    write_parquet_zstd(docs.coalesce(1), zp)
    docs.coalesce(1).write.mode("overwrite").option(
        "compression", "snappy"
    ).parquet(sp)

    def size(d):
        return sum(
            os.path.getsize(f) for f in glob.glob(f"{d}/*.parquet")
        )

    # values round-trip exactly and zstd compresses at least as well
    back = spark.read.parquet(zp)
    assert back.count() == docs.count()
    assert {tuple(r) for r in back.collect()} == {
        tuple(r) for r in docs.collect()
    }
    assert size(zp) <= size(sp)
    # codec is actually zstd in the file metadata
    import pyarrow.parquet as pq

    f = glob.glob(f"{zp}/*.parquet")[0]
    comp = pq.ParquetFile(f).metadata.row_group(0).column(0).compression
    assert comp.lower() == "zstd"
