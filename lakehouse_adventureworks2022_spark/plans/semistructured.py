"""Semi-structured + reshaping surface: XML parsing (the reference's F9
operator — ``from_xml`` over Person.Demographics,
``dags/customer_pipeline.py:74-90``), set operations, and pivot.

XML oracle construction: DuckDB has no XML functions, so the query
builds the XML *from known fixture columns* in Spark, parses it back
with ``from_xml``, and emits the parsed fields — while the oracle emits
the original columns directly. If the parse is correct the two agree
exactly; any parser deviation (type coercion, whitespace, escaping)
breaks the hash. Doubles survive because Spark's double→string→double
round-trip is exact (shortest-representation formatting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_adventureworks2022_spark.sources.readers import read_table


def xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build an XML document per event, parse it with ``from_xml`` into a
    typed struct (F9), flatten the fields (P2)."""
    events = read_table(spark, sf_dir, "events")
    xml = F.concat(
        F.lit("<event><type>"),
        F.col("event_type"),
        F.lit("</type><user>"),
        F.col("user_id").cast("string"),
        F.lit("</user><value>"),
        F.col("value").cast("string"),
        F.lit("</value></event>"),
    )
    parsed = F.from_xml(xml, "type STRING, user BIGINT, value DOUBLE")
    return (
        events.withColumn("x", parsed)
        .select(
            "event_id",
            F.col("x.type").alias("parsed_type"),
            F.col("x.user").alias("parsed_user"),
            F.col("x.value").alias("parsed_value"),
        )
    )


ORACLE_XML_ROUNDTRIP = """
    SELECT event_id,
           event_type AS parsed_type,
           user_id AS parsed_user,
           value AS parsed_value
    FROM events
"""


def user_churn_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations: users active in the first week but not the last
    week (EXCEPT), tagged against users active in both (INTERSECT)."""
    events = read_table(spark, sf_dir, "events")
    week1 = events.filter(
        F.col("ts") < F.to_timestamp(F.lit("2024-01-08"))
    ).select("user_id")
    last = events.filter(
        F.col("ts") >= F.to_timestamp(F.lit("2024-01-24"))
    ).select("user_id")
    # subtract = EXCEPT (set) semantics; exceptAll would keep a user who
    # merely has MORE week-1 events than last-week events
    churned = week1.subtract(last).withColumn("status", F.lit("churned"))
    retained = week1.intersect(last).withColumn("status", F.lit("retained"))
    return churned.unionByName(retained)


ORACLE_USER_CHURN = """
    WITH week1 AS (
      SELECT DISTINCT user_id FROM events WHERE ts < TIMESTAMP '2024-01-08'
    ),
    last AS (
      SELECT DISTINCT user_id FROM events WHERE ts >= TIMESTAMP '2024-01-24'
    )
    SELECT user_id, 'churned' AS status FROM (
      SELECT user_id FROM week1 EXCEPT SELECT user_id FROM last
    )
    UNION ALL
    SELECT user_id, 'retained' AS status FROM (
      SELECT user_id FROM week1 INTERSECT SELECT user_id FROM last
    )
"""

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def daily_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: one row per day, one count column per event type (explicit
    pivot values — required for a deterministic schema, and at scale it
    skips the extra distinct-values job)."""
    events = read_table(spark, sf_dir, "events")
    return (
        events.withColumn("day", F.date_trunc("day", "ts"))
        .groupBy("day")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, EVENT_TYPES)
    )


ORACLE_DAILY_PIVOT = """
    SELECT date_trunc('day', ts) AS day,
           COALESCE(COUNT(*) FILTER (event_type = 'click'), 0) AS click,
           COALESCE(COUNT(*) FILTER (event_type = 'error'), 0) AS error,
           COALESCE(COUNT(*) FILTER (event_type = 'purchase'), 0) AS purchase,
           COALESCE(COUNT(*) FILTER (event_type = 'signup'), 0) AS signup,
           COALESCE(COUNT(*) FILTER (event_type = 'view'), 0) AS view
    FROM events
    GROUP BY 1
"""
