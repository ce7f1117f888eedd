"""Interchange-format round-trips (sources/formats.py): every fixture
table through ORC/JSON (and CSV where faithful), hash-compared to the
parquet truth; schema enforcement, corrupt-row quarantine, and the
loud-refusal contracts."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from lakehouse_adventureworks2022_spark.sources.formats import (
    CORRUPT_COL,
    UnsupportedOperationError,
    clean_records,
    corrupt_records,
    read_interchange,
    write_interchange,
)
from lakehouse_adventureworks2022_spark.sources.readers import (
    TABLES,
    read_table,
)
from tools.check_oracles import canonical_hash, normalize_pandas

SF = "/root/testdata/sf0.001"

#: embeddings carries array<float> — CSV must refuse it; every other
#: fixture table is atomic-only and must round-trip CSV byte-faithfully.
CSV_TABLES = tuple(t for t in TABLES if t != "embeddings")


def _hash(df):
    return canonical_hash(normalize_pandas(df.toPandas()))


@pytest.mark.parametrize("fmt", ["orc", "json"])
@pytest.mark.parametrize("table", sorted(TABLES))
def test_roundtrip_all_tables(spark, tmp_path, fmt, table):
    src = read_table(spark, SF, table)
    path = str(tmp_path / f"{table}.{fmt}")
    write_interchange(src, path, fmt)
    got = clean_records(
        read_interchange(spark, path, fmt, schema=src.schema)
    )
    assert got.columns == src.columns
    assert _hash(got) == _hash(src)


@pytest.mark.parametrize("table", sorted(CSV_TABLES))
def test_roundtrip_csv_atomic_tables(spark, tmp_path, table):
    src = read_table(spark, SF, table)
    path = str(tmp_path / f"{table}.csv")
    write_interchange(src, path, "csv")
    got = clean_records(
        read_interchange(spark, path, "csv", schema=src.schema)
    )
    assert _hash(got) == _hash(src)


def test_csv_refuses_complex_columns(spark, tmp_path):
    emb = read_table(spark, SF, "embeddings")
    with pytest.raises(UnsupportedOperationError, match="embedding"):
        write_interchange(emb, str(tmp_path / "emb.csv"), "csv")


def test_text_read_requires_schema_or_explicit_infer(spark, tmp_path):
    docs = read_table(spark, SF, "documents").limit(5)
    path = str(tmp_path / "d.json")
    write_interchange(docs, path, "json")
    with pytest.raises(ValueError, match="carries no types"):
        read_interchange(spark, path, "json")
    # loud opt-in works
    inferred = read_interchange(spark, path, "json", infer=True)
    assert inferred.count() == 5


def test_corrupt_rows_are_quarantined_not_dropped(spark, tmp_path):
    path = str(tmp_path / "mixed_json")
    good = '{"id": 1, "v": 2.5}\n{"id": 2, "v": 3.5}'
    bad = '{"id": "NOT A NUMBER", "v": []}\nnot json at all'
    import os

    os.makedirs(path)
    with open(f"{path}/part-000.json", "w") as f:
        f.write(good + "\n" + bad)
    df = read_interchange(
        spark, path, "json", schema="id long, v double"
    )
    assert CORRUPT_COL in df.columns
    assert clean_records(df).count() == 2
    quarantined = corrupt_records(df)
    assert quarantined.count() == 2  # both bad rows captured WITH bytes
    assert all(r[CORRUPT_COL] for r in quarantined.collect())


def test_strict_mode_fails_fast_on_bad_rows(spark, tmp_path):
    import os

    path = str(tmp_path / "bad_json")
    os.makedirs(path)
    with open(f"{path}/part-000.json", "w") as f:
        f.write('{"id": 1}\ngarbage')
    df = read_interchange(
        spark, path, "json", schema="id long", strict=True
    )
    with pytest.raises(Exception):  # FAILFAST surfaces at execution
        df.collect()


def test_timestamp_microseconds_survive_text_formats(spark, tmp_path):
    """The default timestampFormat drops sub-seconds — the configured
    ISO-µs pattern must round-trip them exactly through BOTH text
    formats (events.ts carries real µs precision)."""
    src = spark.createDataFrame(
        [(1, "2024-03-01 12:34:56.789123")], "id long, ts string"
    ).select("id", F.to_timestamp("ts").alias("ts"))
    for fmt in ("csv", "json"):
        path = str(tmp_path / f"ts.{fmt}")
        write_interchange(src, path, fmt)
        got = clean_records(
            read_interchange(spark, path, fmt, schema="id long, ts timestamp")
        )
        assert got.collect() == src.collect(), fmt


def test_csv_null_vs_empty_string_distinguished(spark, tmp_path):
    src = spark.createDataFrame(
        [(1, None), (2, ""), (3, "x")], "id long, s string"
    )
    path = str(tmp_path / "nulls.csv")
    write_interchange(src, path, "csv")
    got = {
        r["id"]: r["s"]
        for r in clean_records(
            read_interchange(spark, path, "csv", schema="id long, s string")
        ).collect()
    }
    assert got[1] is None and got[2] == "" and got[3] == "x"


def test_tablemanager_orc_backend_roundtrip(spark, tmp_path):
    """TableManager's fmt seam is generic: ORC works as a managed-table
    backend for the non-delta-specific operations."""
    from lakehouse_adventureworks2022_spark.storage.tables import TableManager

    tm = TableManager(spark, str(tmp_path), fmt="orc")
    src = read_table(spark, SF, "nation")
    tm.overwrite(src, "nation")
    assert _hash(tm.read("nation")) == _hash(src)
    tm.append(src.limit(5), "nation")
    assert tm.read("nation").count() == src.count() + 5
