"""Data-quality gate operators (oracle-hash coverage is in test_catalog;
these exercise the violation paths with planted bad data)."""

from __future__ import annotations

from lakehouse_adventureworks2022_spark.operators.quality import (
    fk_violations,
    null_profile,
    range_violations,
    uniqueness_violations,
)


def test_null_profile_counts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (None, None)], ["k", "v"]
    )
    prof = {r["column_name"]: r for r in null_profile(df).collect()}
    assert prof["k"]["null_count"] == 1
    assert prof["v"]["null_count"] == 2
    assert abs(prof["v"]["null_ratio"] - 2 / 3) < 1e-12


def test_fk_violations_finds_orphans(spark):
    child = spark.createDataFrame([(1,), (2,), (9,)], ["fk"])
    parent = spark.createDataFrame([(1,), (2,), (3,)], ["pk"])
    rows = fk_violations(child, parent, "fk", "pk").collect()
    assert [r["orphan_key"] for r in rows] == [9]


def test_range_violations(spark):
    df = spark.createDataFrame([(0.5,), (1.5,), (-2.0,)], ["x"])
    got = sorted(r["x"] for r in range_violations(df, "x", lo=0.0, hi=1.0).collect())
    assert got == [-2.0, 1.5]


def test_uniqueness_violations(spark):
    df = spark.createDataFrame([(1, 1), (1, 1), (1, 2)], ["a", "b"])
    rows = uniqueness_violations(df, ["a", "b"]).collect()
    assert len(rows) == 1 and rows[0]["dup_count"] == 2
