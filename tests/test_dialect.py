"""Unit tests for the dialect shims — the silently-wrong-prone semantics
called out in SURVEY.md §7 hard part 3 (ISO day-of-week, fiscal calendar,
date keys, change hash)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from lakehouse_adventureworks2022_spark.functions.dialect import (
    change_hash,
    date_key,
    fiscal_month,
    fiscal_quarter,
    fiscal_year,
    iso_day_of_week,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_iso_day_of_week_known_dates(spark):
    # 2024-01-01 was a Monday; 2024-01-07 a Sunday (ISO: Mon=1, Sun=7)
    for date, expected in [
        ("2024-01-01", 1),
        ("2024-01-06", 6),
        ("2024-01-07", 7),
    ]:
        assert _one(spark, iso_day_of_week(F.to_date(F.lit(date)))) == expected


def test_weekend_is_iso_6_7(spark):
    sat = iso_day_of_week(F.to_date(F.lit("2024-01-06")))
    assert _one(spark, sat.isin(6, 7))
    mon = iso_day_of_week(F.to_date(F.lit("2024-01-01")))
    assert not _one(spark, mon.isin(6, 7))


def test_fiscal_calendar_july_start(spark):
    # July = FY start: FY(2024-07-01) = 2025, Q1, M1
    jul = F.to_date(F.lit("2024-07-01"))
    assert _one(spark, fiscal_year(jul)) == 2025
    assert _one(spark, fiscal_quarter(jul)) == 1
    assert _one(spark, fiscal_month(jul)) == 1
    # June = FY end: FY(2024-06-30) = 2024, Q4, M12
    jun = F.to_date(F.lit("2024-06-30"))
    assert _one(spark, fiscal_year(jun)) == 2024
    assert _one(spark, fiscal_quarter(jun)) == 4
    assert _one(spark, fiscal_month(jun)) == 12
    # October = Q2
    assert _one(spark, fiscal_quarter(F.to_date(F.lit("2024-10-15")))) == 2
    # January = Q3
    assert _one(spark, fiscal_quarter(F.to_date(F.lit("2024-01-15")))) == 3


def test_date_key(spark):
    assert _one(spark, date_key(F.to_date(F.lit("2024-03-09")))) == 20240309


def test_change_hash_null_safe(spark):
    df = spark.createDataFrame(
        [("a", None), ("a", "x"), ("a", None)], ["c1", "c2"]
    )
    hashes = [r["h"] for r in df.select(change_hash("c1", "c2").alias("h")).collect()]
    assert hashes[0] == hashes[2]  # null handled consistently
    assert hashes[0] != hashes[1]  # value change detected
    assert len(hashes[0]) == 32  # md5 hex


def test_change_hash_matches_reference_construction(spark):
    # reference F1: md5(concat_ws('|', coalesce(cast(c as string), '')))
    row = (
        spark.createDataFrame([("p", 1)], ["name", "size"])
        .select(
            change_hash("name", "size").alias("ours"),
            F.md5(F.concat_ws("|", F.lit("p"), F.lit("1"))).alias("ref"),
        )
        .collect()[0]
    )
    assert row["ours"] == row["ref"]
