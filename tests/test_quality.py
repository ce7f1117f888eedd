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


def test_accepted_values_violations(spark):
    from lakehouse_adventureworks2022_spark.operators.quality import (
        accepted_values_violations,
    )

    df = spark.createDataFrame(
        [(1, "O"), (2, "F"), (3, "X"), (4, None)], "id int, status string"
    )
    bad = {r["id"] for r in accepted_values_violations(df, "status", ["O", "F"]).collect()}
    assert bad == {3, 4}  # unknown value AND null flagged
    bad_null_ok = {
        r["id"]
        for r in accepted_values_violations(df, "status", ["O", "F", None]).collect()
    }
    assert bad_null_ok == {3}  # null explicitly allowed


def test_freshness_check_deterministic_clock(spark, sf_dir):
    from lakehouse_adventureworks2022_spark.operators.quality import freshness_check
    from lakehouse_adventureworks2022_spark.sources.readers import read_table

    events = read_table(spark, sf_dir, "events")
    latest = events.agg({"ts": "max"}).collect()[0][0]
    # clock 1 hour after latest event: fresh within '2 hours', stale within '30 minutes'
    now = (latest.replace(microsecond=0)).isoformat(sep=" ")
    fresh = freshness_check(events, "ts", "2 hours", now=now).collect()[0]
    assert fresh["is_fresh"] is True
    assert 0 <= fresh["age_seconds"] <= 1
    import datetime

    later = (latest + datetime.timedelta(hours=1)).isoformat(sep=" ")
    stale = freshness_check(events, "ts", "30 minutes", now=later).collect()[0]
    assert stale["is_fresh"] is False
    assert stale["age_seconds"] >= 3600 - 1
