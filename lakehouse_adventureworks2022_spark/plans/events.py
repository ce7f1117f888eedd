"""Event-table queries: watermark-incremental reads, semi-structured
flattening, dedup-latest, and (batch-equivalent) windowed aggregation.

Reference parity:
- incremental scan S2 (``extract_load_template.py:126-159``): predicate on
  the watermark column evaluated at the scan (pushed into parquet
  row-group pruning here; into the source DB over JDBC);
- global watermark aggregate A1/A2 (``extract_load_template.py:190-195``,
  ``dags/product.py:262-263``);
- semi-structured parse F9: the reference parses an XML column via
  ``from_xml`` (``dags/customer_pipeline.py:74-90``); the events fixture
  carries JSON ``props`` — same operator shape via ``from_json``;
- dedup-latest WF1 (``dags/product.py:174-179``): row_number over
  (key, ts desc) keep first;
- tumbling-window aggregation: the batch twin of the Structured Streaming
  path in ``streaming/`` (same ``F.window`` semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lakehouse_adventureworks2022_spark.functions.dialect import money
from lakehouse_adventureworks2022_spark.sources.readers import read_table

#: Fixed watermark used by the oracle-checked incremental query (the
#: pipeline's real watermark is state-managed — sources/watermark.py).
DEMO_WATERMARK = "2024-01-15 00:00:00"


def incremental_read(
    spark: SparkSession, sf_dir: str, watermark: str = DEMO_WATERMARK
) -> DataFrame:
    """Rows strictly after the watermark, summarized per event type (S2 +
    grouped agg). The filter sits directly on the scan so Catalyst pushes
    it to the parquet reader (min/max row-group pruning)."""
    events = read_table(spark, sf_dir, "events")
    return (
        events.filter(F.col("ts") > F.to_timestamp(F.lit(watermark)))
        .groupBy(F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.max("ts").alias("max_ts"),
            F.max("event_id").alias("last_event_id"),
            money(F.sum("value")).alias("total_value"),
        )
    )


def watermark_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-row watermark snapshot (A1/A2): COALESCE(MAX(id),0),
    MAX(event_time), row count — the exact fields the reference persists
    in its checkpoint docs (``extract_load_template.py:196-209``)."""
    events = read_table(spark, sf_dir, "events")
    return events.agg(
        F.coalesce(F.max("event_id"), F.lit(0)).alias("last_id"),
        F.max("ts").alias("last_event_time"),
        F.count(F.lit(1)).alias("record_count"),
    )


def flatten_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the JSON ``props`` column into typed fields and filter (F9 +
    P2/P3). JVM-side ``from_json`` — no UDF."""
    events = read_table(spark, sf_dir, "events")
    return (
        events.withColumn("props_parsed", F.from_json("props", "k INT"))
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            "ts",
            F.col("props_parsed.k").alias("prop_k"),
            "value",
        )
    )


def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-latest (WF1): keep each user's most recent event.

    ``row_number`` partitioned by user, ordered ts desc with event_id desc
    as a deterministic tiebreak (the reference order by ingestion_date desc
    alone is nondeterministic on ties — fixed here).
    """
    events = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "props")
    )


def latest_event_per_user_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path for :func:`latest_event_per_user` (tested equal): one
    ``max_by`` aggregation keyed on (ts, event_id) struct order.

    The window form sorts every event inside each user partition after a
    full shuffle; this form pre-reduces map-side — each input partition
    forwards ONE candidate row per user through the exchange — so the
    shuffle volume is #users × #partitions rows instead of #events. At
    extreme per-user event counts (the 100 TB case) that is the
    difference between a skew hazard and a bounded combine.
    """
    events = read_table(spark, sf_dir, "events").drop("props")
    others = [c for c in events.columns if c != "user_id"]
    picked = events.groupBy("user_id").agg(
        F.max_by(F.struct(*others), F.struct("ts", "event_id")).alias("r")
    )
    # same column order as the window form: events schema minus props
    return picked.select(
        *[F.col(f"r.{c}").alias(c) if c != "user_id" else F.col(c) for c in events.columns]
    )


def event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windowed aggregate per event type — batch twin of
    the Structured Streaming query (``streaming/events.py``); same
    ``F.window`` operator Spark uses under a watermark."""
    events = read_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "1 hour").alias("w"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            money(F.sum("value")).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "event_count",
            "total_value",
        )
    )


def user_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-filled hourly activity per user (time-series gap filling):
    generated hour spine × distinct users, left-joined to the hourly
    aggregate, gaps coalesced to zero.

    All-declarative two-pass: the spine bounds come from a 1-row
    aggregate cross-joined back (no driver collect). Scale: the dense
    grid is |users| × |hours| — intentional (that's the operator);
    the expensive side (events) is aggregated BEFORE the outer join, so
    the grid join is agg-row sized, and the 1-row bounds frame
    broadcasts."""
    events = read_table(spark, sf_dir, "events")
    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 HOUR"))
        ).alias("hour_ts")
    )
    users = events.select("user_id").distinct()
    hourly = events.groupBy(
        F.col("user_id").alias("a_user"),
        F.date_trunc("hour", F.col("ts")).alias("a_hour"),
    ).agg(
        F.count(F.lit(1)).alias("c"),
        money(F.sum("value")).alias("v"),
    )
    return (
        users.crossJoin(hours)
        .join(
            hourly,
            (F.col("user_id") == F.col("a_user")) & (F.col("hour_ts") == F.col("a_hour")),
            "left",
        )
        .select(
            "user_id",
            "hour_ts",
            F.coalesce(F.col("c"), F.lit(0).cast("long")).alias("event_count"),
            F.coalesce(F.col("v"), F.lit(0.0)).alias("total_value"),
        )
    )
