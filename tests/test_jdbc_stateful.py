"""JDBC-shaped source interface (transport-independent core) and the
custom stateful streaming operator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_adventureworks2022_spark.sources.jdbc import (
    JdbcSource,
    JdbcSourceConfig,
    apply_incremental,
    jdbc_pushdown_predicate,
)
from lakehouse_adventureworks2022_spark.sources.readers import read_table
from lakehouse_adventureworks2022_spark.sources.watermark import Watermark


def test_jdbc_incremental_core_matches_manual_filter(spark, sf_dir):
    events = read_table(spark, sf_dir, "events")
    wm = Watermark("t", last_event_time="2024-01-15 00:00:00.123456")
    got = apply_incremental(events, "ts", wm, ms_precision=True).count()
    want = events.filter(
        F.col("ts") > F.to_timestamp(F.lit("2024-01-15 00:00:00.123"))
    ).count()
    assert got == want


def test_jdbc_pushdown_predicate_string():
    wm = Watermark("t", last_event_time="2024-01-15 10:20:30.123456")
    assert (
        jdbc_pushdown_predicate("ModifiedDate", wm)
        == "ModifiedDate > CAST('2024-01-15 10:20:30.123' AS TIMESTAMP)"
    )
    assert jdbc_pushdown_predicate("ModifiedDate", None) is None


def test_jdbc_reader_configuration(spark):
    src = JdbcSource(
        spark,
        JdbcSourceConfig(
            url="jdbc:sqlserver://host:1433;databaseName=db",
            table="Sales.SalesOrderDetail",
            options={"user": "u", "password": "p"},
        ),
    )
    # an unpartitioned reader builds without a live DB; load() would
    # need the driver. A partitioned reader now performs the MIN/MAX
    # bounds roundtrip at build time (r9 — Spark rejects
    # partitionColumn without bounds), so its live behavior is covered
    # by tests/test_jdbc_live.py against an embedded Derby database.
    assert src._reader() is not None


def test_stateful_running_totals(spark, sf_dir):
    """Drive the applyInPandasWithState operator over the event stream;
    the final running snapshot per user must equal the batch aggregate."""
    from lakehouse_adventureworks2022_spark.streaming.events import (
        stream_events_source,
    )
    from lakehouse_adventureworks2022_spark.streaming.stateful import (
        user_running_totals,
    )

    import time

    stream = user_running_totals(
        stream_events_source(spark, sf_dir).select("user_id", "ts", "value")
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_stateful")
        .outputMode("append")
        .start()
    )
    # NOTE: processAllAvailable() never returns under
    # ProcessingTimeTimeout (the engine keeps scheduling batches to fire
    # timeouts) — poll the sink until the first full snapshot lands
    n_users = read_table(spark, sf_dir, "events").select("user_id").distinct().count()
    deadline = time.time() + 120
    while time.time() < deadline:
        if spark.table("t_stateful").filter("NOT closed").count() >= n_users:
            break
        time.sleep(2)
    got = {
        r["user_id"]: (r["event_count"], r["total_value"])
        for r in spark.table("t_stateful").filter("NOT closed").collect()
    }
    q.stop()

    want = {
        r["user_id"]: (r["c"], r["v"])
        for r in read_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.round(F.sum("value"), 4).alias("v"),
        )
        .collect()
    }
    assert got == want


def _protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithState's worker protocol needs google.protobuf "
    "(not installed in this container; runs on a real deployment)",
)
def test_stateful_running_totals_tws(spark, sf_dir):
    """(r9) The transformWithStateInPandas twin: same state machine on
    the Spark-4 successor API (typed value state + explicit timers,
    RocksDB store, Connect-compatible). The final running snapshot per
    user must equal the batch aggregate — the same contract as the
    classic operator's test."""
    import time

    from lakehouse_adventureworks2022_spark.streaming.events import (
        stream_events_source,
    )
    from lakehouse_adventureworks2022_spark.streaming.stateful import (
        user_running_totals_tws,
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = user_running_totals_tws(
            stream_events_source(spark, sf_dir).select("user_id", "ts", "value")
        )
        q = (
            stream.writeStream.format("memory")
            .queryName("t_stateful_tws")
            .outputMode("append")
            .start()
        )
        n_users = (
            read_table(spark, sf_dir, "events").select("user_id").distinct().count()
        )
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.table("t_stateful_tws").filter("NOT closed").count() >= n_users:
                break
            time.sleep(2)
        got = {
            r["user_id"]: (r["event_count"], r["total_value"])
            for r in spark.table("t_stateful_tws").filter("NOT closed").collect()
        }
        q.stop()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )

    want = {
        r["user_id"]: (r["c"], r["v"])
        for r in read_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.round(F.sum("value"), 4).alias("v"),
        )
        .collect()
    }
    assert got == want
