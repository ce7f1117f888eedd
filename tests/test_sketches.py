"""Mergeable HLL distinct sketches: error bounds vs exact, and the
mergeability property (rollup of stored sketches == sketch of the whole,
without re-reading the base data)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_adventureworks2022_spark.operators import sketches
from lakehouse_adventureworks2022_spark.sources.readers import read_table

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def events(spark):
    return read_table(spark, SF, "events").withColumn(
        "day", F.to_date("ts")
    ).cache()


def test_sketch_estimate_within_error(spark, events):
    daily = sketches.distinct_sketches(events, ["day"], "user_id")
    merged = sketches.merge_distinct(daily).collect()[0]
    exact = events.select("user_id").distinct().count()
    assert abs(merged["distinct_estimate"] - exact) / exact < 0.05
    assert merged["row_count"] == events.count()


def test_sketches_are_mergeable_across_groupings(spark, events):
    """Storing per-(day, type) sketches must let ANY rollup (per type,
    per day, grand total) come out of the stored sketches alone, each
    within error of its exact count."""
    stored = sketches.distinct_sketches(events, ["day", "event_type"], "user_id")
    per_type = {
        r["event_type"]: r["distinct_estimate"]
        for r in sketches.merge_distinct(stored, ["event_type"]).collect()
    }
    exact_per_type = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for t, exact in exact_per_type.items():
        assert abs(per_type[t] - exact) / exact < 0.05, t

    total = sketches.merge_distinct(stored).collect()[0]["distinct_estimate"]
    exact_total = events.select("user_id").distinct().count()
    assert abs(total - exact_total) / exact_total < 0.05


def test_sketch_column_survives_a_table_roundtrip(spark, events, tmp_path):
    """The binary sketch column persists like any mart column and merges
    after reload — the incremental-mart property."""
    from lakehouse_adventureworks2022_spark.storage.tables import TableManager

    tm = TableManager(spark, str(tmp_path))
    tm.overwrite(
        sketches.distinct_sketches(events, ["day"], "user_id"), "mart.daily_users"
    )
    reloaded = tm.read("mart.daily_users")
    est = sketches.merge_distinct(reloaded).collect()[0]["distinct_estimate"]
    exact = events.select("user_id").distinct().count()
    assert abs(est - exact) / exact < 0.05
