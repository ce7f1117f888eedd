"""Funnel conversion (plans/relational.funnel_conversion): DuckDB
differential with the same earliest-chain semantics, hand-built chain
scenarios, and a no-events×events-join plan guard."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from lakehouse_adventureworks2022_spark.plans.relational import funnel_conversion

SF = "/root/testdata/sf0.001"

FUNNEL_SQL = """
WITH s1 AS (
    SELECT user_id, MIN(ts) AS t FROM events
    WHERE event_type = 'view' GROUP BY user_id
), s2 AS (
    SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN s1 USING (user_id)
    WHERE e.event_type = 'click' AND e.ts > s1.t
      AND e.ts <= s1.t + INTERVAL 1440 MINUTES
    GROUP BY e.user_id
), s3 AS (
    SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN s2 USING (user_id)
    WHERE e.event_type = 'purchase' AND e.ts > s2.t
      AND e.ts <= s2.t + INTERVAL 1440 MINUTES
    GROUP BY e.user_id
)
SELECT '1_view' AS step, (SELECT COUNT(*) FROM s1) AS users
UNION ALL SELECT '2_click', (SELECT COUNT(*) FROM s2)
UNION ALL SELECT '3_purchase', (SELECT COUNT(*) FROM s3)
ORDER BY step
"""


def test_funnel_matches_duckdb(spark):
    got = {
        r["step"]: (r["users"], r["conversion"])
        for r in funnel_conversion(spark, SF).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    want = dict(con.sql(FUNNEL_SQL).fetchall())
    assert {k: v[0] for k, v in got.items()} == want
    base = want["1_view"]
    for k, (users, conv) in got.items():
        assert abs(conv - round(users / base, 6)) < 1e-9
    # funnel is monotone non-increasing
    assert want["1_view"] >= want["2_click"] >= want["3_purchase"]
    assert want["2_click"] > 0  # non-vacuous on the fixture


def test_funnel_chain_semantics(spark):
    rows = [
        # user 1: full chain within gaps
        (1, "view", "2024-01-01 10:00:00"),
        (1, "click", "2024-01-01 10:30:00"),
        (1, "purchase", "2024-01-01 11:00:00"),
        # user 2: click BEFORE view — not a chain
        (2, "click", "2024-01-01 09:00:00"),
        (2, "view", "2024-01-01 10:00:00"),
        # user 3: click too late (gap 2 days > 1 day)
        (3, "view", "2024-01-01 10:00:00"),
        (3, "click", "2024-01-03 10:30:00"),
        # user 4: greedy-earliest — first view anchors; click fits from
        # the SECOND view only, so the chain fails (accepted semantics)
        (4, "view", "2024-01-01 00:00:00"),
        (4, "view", "2024-01-05 00:00:00"),
        (4, "click", "2024-01-05 01:00:00"),
    ]
    df = (
        spark.createDataFrame(
            rows, "user_id long, event_type string, ts string"
        )
        .withColumn("ts", F.to_timestamp("ts"))
        .withColumn("event_id", F.monotonically_increasing_id())
        .withColumn("value", F.lit(0.0))
        .withColumn("props", F.lit("{}"))
    )
    import lakehouse_adventureworks2022_spark.plans.relational as rel
    import lakehouse_adventureworks2022_spark.sources.readers as readers

    orig = readers.read_table
    try:
        readers.read_table = lambda spark, sf_dir, name: df
        got = {
            r["step"]: r["users"]
            for r in rel.funnel_conversion(spark, SF).collect()
        }
    finally:
        readers.read_table = orig
    assert got == {"1_view": 4, "2_click": 1, "3_purchase": 1}


def test_funnel_plan_never_joins_events_to_events(spark):
    plan = (
        funnel_conversion(spark, SF)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
