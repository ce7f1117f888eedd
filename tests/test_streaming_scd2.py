"""CDC stream → SCD2 dimension maintenance (streaming/scd2_stream.py):
stream result ≡ sequential batch merges, restart idempotence, and
mid-batch-crash atomicity."""

from __future__ import annotations

import pytest

import os
import time

from pyspark.sql import functions as F

from lakehouse_adventureworks2022_spark.operators.scd2 import scd2_apply
from lakehouse_adventureworks2022_spark.storage.tables import TableManager
from lakehouse_adventureworks2022_spark.streaming.scd2_stream import (
    apply_scd2_batch,
    stream_scd2,
)

KEY, TRACKED = "part_id", ["price", "container"]
SCHEMA = "part_id long, price double, container string, change_ts timestamp"
RAW_SCHEMA = "part_id long, price double, container string, change_ts string"

#: Three CDC days: day 1 initializes, day 2 changes part 1 (and repeats
#: part 2 unchanged — must NOT version), day 3 changes part 2 twice in
#: one batch (intra-batch dedup-latest on change_ts must pick 19.0).
BATCHES = [
    [
        (1, 10.0, "BOX", "2024-01-01 08:00:00"),
        (2, 20.0, "JAR", "2024-01-01 09:00:00"),
        (3, 30.0, "BAG", "2024-01-01 10:00:00"),
    ],
    [
        (1, 11.0, "BOX", "2024-01-02 08:00:00"),
        (2, 20.0, "JAR", "2024-01-02 09:00:00"),
    ],
    [
        (2, 18.0, "CAN", "2024-01-03 08:00:00"),
        (2, 19.0, "CAN", "2024-01-03 11:00:00"),
        (4, 40.0, "TUB", "2024-01-03 12:00:00"),
    ],
]


def _batch_df(spark, rows):
    return spark.createDataFrame(rows, RAW_SCHEMA).withColumn(
        "change_ts", F.to_timestamp("change_ts")
    )


def _expected_snapshot(spark):
    cur = None
    for rows in BATCHES:
        df = _batch_df(spark, rows)
        eff = df.select(
            F.max(F.col("change_ts").cast("date").cast("string"))
        ).collect()[0][0]
        cur = scd2_apply(
            cur, df, KEY, TRACKED, effective_date=eff, order_col="change_ts"
        )
    return cur


def _rowset(df):
    return {
        tuple(
            str(r[c])
            for c in (
                KEY,
                *TRACKED,
                "effective_date",
                "expiration_date",
                "is_current",
            )
        )
        for r in df.collect()
    }


def _write_cdc_files(spark, src_dir):
    """One parquet file per CDC day, strictly increasing mtimes so the
    file stream (maxFilesPerTrigger=1) replays them in day order."""
    os.makedirs(src_dir, exist_ok=True)
    for i, rows in enumerate(BATCHES):
        day = str(src_dir / f"day{i}")
        _batch_df(spark, rows).coalesce(1).write.mode("overwrite").parquet(day)
        t = time.time() + i * 10
        for root, _, files in os.walk(day):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))


def _run_stream(spark, src_dir, tables, ckpt):
    src = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src_dir))
    )
    q = stream_scd2(
        src, tables, "silver.dim_part_scd2", str(ckpt), KEY, TRACKED,
        change_date_col="change_ts", order_col="change_ts",
    )
    q.processAllAvailable()
    q.stop()


@pytest.mark.slow
def test_stream_equals_sequential_batch_merges(spark, tmp_path):
    src_dir = tmp_path / "cdc"
    _write_cdc_files(spark, src_dir)
    tables = TableManager(spark, str(tmp_path / "wh"))
    _run_stream(spark, src_dir, tables, tmp_path / "ckpt")

    got = tables.read("silver.dim_part_scd2")
    want = _expected_snapshot(spark)
    assert _rowset(got) == _rowset(want)
    # semantic spot-checks: part 1 has 2 versions, part 2 has 2 (the
    # repeated unchanged row created none; the double-change took the
    # latest), part 4 initialized on day 3
    cur = got.filter("is_current").collect()
    by_key = {r[KEY]: r for r in cur}
    assert by_key[1]["price"] == 11.0
    assert by_key[2]["price"] == 19.0 and by_key[2]["container"] == "CAN"
    assert str(by_key[4]["effective_date"]).startswith("2024-01-03")
    assert got.filter(f"{KEY} = 2").count() == 2


@pytest.mark.slow
def test_restart_is_idempotent(spark, tmp_path):
    src_dir = tmp_path / "cdc"
    _write_cdc_files(spark, src_dir)
    tables = TableManager(spark, str(tmp_path / "wh"))
    ckpt = tmp_path / "ckpt"
    _run_stream(spark, src_dir, tables, ckpt)
    first = _rowset(tables.read("silver.dim_part_scd2"))
    # restart against the same checkpoint: source exhausted + batch ids
    # recorded ⇒ snapshot unchanged
    _run_stream(spark, src_dir, tables, ckpt)
    assert _rowset(tables.read("silver.dim_part_scd2")) == first


def test_empty_batch_is_noop_and_crash_keeps_snapshot(spark, tmp_path):
    tables = TableManager(spark, str(tmp_path / "wh"))
    apply_scd2_batch(
        tables, "silver.d", _batch_df(spark, BATCHES[0]), KEY, TRACKED,
        "change_ts", "change_ts",
    )
    before = _rowset(tables.read("silver.d"))
    # empty batch: no merge, no version churn
    apply_scd2_batch(
        tables, "silver.d", _batch_df(spark, []), KEY, TRACKED,
        "change_ts", "change_ts",
    )
    assert _rowset(tables.read("silver.d")) == before
    # a failing merge (bad column) must leave the snapshot intact —
    # the staging+swap overwrite never exposes a half-written table
    try:
        apply_scd2_batch(
            tables, "silver.d",
            _batch_df(spark, BATCHES[1]).drop("price"), KEY, TRACKED,
            "change_ts", "change_ts",
        )
        raise AssertionError("expected failure on missing tracked column")
    except Exception:
        pass
    assert _rowset(tables.read("silver.d")) == before
