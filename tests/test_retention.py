"""Retention cohorts (plans/relational.retention_cohorts): DuckDB
differential + structural invariants."""

from __future__ import annotations

import duckdb

from lakehouse_adventureworks2022_spark.plans.relational import retention_cohorts

SF = "/root/testdata/sf0.001"

RETENTION_SQL = """
WITH ev AS (
    SELECT user_id, date_trunc('week', ts) AS wk FROM events
), firsts AS (
    SELECT user_id, MIN(wk) AS cohort FROM ev GROUP BY user_id
), cells AS (
    SELECT DISTINCT e.user_id,
           CAST(f.cohort AS DATE) AS cohort_week,
           CAST((CAST(e.wk AS DATE) - CAST(f.cohort AS DATE)) / 7 AS INT)
               AS week_n
    FROM ev e JOIN firsts f USING (user_id)
), counts AS (
    SELECT cohort_week, week_n, COUNT(*) AS active_users
    FROM cells WHERE week_n <= 8 GROUP BY cohort_week, week_n
), sizes AS (
    SELECT CAST(cohort AS DATE) AS cohort_week, COUNT(*) AS cohort_size
    FROM firsts GROUP BY 1
)
SELECT CAST(c.cohort_week AS VARCHAR) AS cohort_week, c.week_n,
       c.active_users, s.cohort_size,
       ROUND(c.active_users / CAST(s.cohort_size AS DOUBLE), 6) AS retention
FROM counts c JOIN sizes s USING (cohort_week)
ORDER BY cohort_week, week_n
"""


def test_retention_matches_duckdb(spark):
    got = [
        (r["cohort_week"], r["week_n"], r["active_users"], r["cohort_size"], r["retention"])
        for r in retention_cohorts(spark, SF).collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    want = [tuple(r) for r in con.sql(RETENTION_SQL).fetchall()]
    assert got == want
    assert len(got) > 1  # non-vacuous


def test_retention_invariants(spark):
    rows = retention_cohorts(spark, SF).collect()
    by_cohort: dict[str, dict[int, int]] = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_week"], {})[r["week_n"]] = r[
            "active_users"
        ]
        assert 0 < r["retention"] <= 1.0
    for cohort, weeks in by_cohort.items():
        # week 0 retention is exactly the cohort (every user active in
        # their own first week by definition)
        assert 0 in weeks
        sizes = {
            r["cohort_size"] for r in rows if r["cohort_week"] == cohort
        }
        assert weeks[0] == sizes.pop()
