"""SQL entry point (the reference's entry point C — SURVEY.md §3.3):
the same analytics expressed as pure Spark SQL text over registered
views, proving the Trino scripts re-target to ``spark.sql`` with only
dialect translation (UNNEST→explode, %-patterns→JDK patterns, ISO
day-of-week remap — `functions/dialect.py` notes).

``register_views`` exposes the fixture tables under their names;
``run_sql`` executes any of the SQL_CATALOG statements. The DataFrame
catalog (plans/*.py) remains the primary surface — these SQL twins are
dialect-parity evidence, tested equal to their DataFrame counterparts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lakehouse_adventureworks2022_spark.sources.readers import TABLES, read_table

#: Spark-SQL twins of representative catalog queries (dialect-translated
#: from the Trino-ish forms; aliases match the DataFrame versions).
SQL_CATALOG: dict[str, str] = {
    "top_products": """
        SELECT p.p_partkey, p.p_name, p.p_brand,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS total_revenue,
               ROUND(SUM(l.l_quantity), 4) AS total_qty,
               COUNT(DISTINCT l.l_orderkey) AS order_count
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_partkey, p.p_name, p.p_brand
        ORDER BY total_revenue DESC, p.p_partkey ASC
        LIMIT 10
    """,
    "dim_date": """
        SELECT CAST(date_format(d, 'yyyyMMdd') AS INT) AS date_key,
               CAST(d AS TIMESTAMP) AS full_date,
               CAST(year(d) AS INT) AS year,
               CAST(quarter(d) AS INT) AS quarter,
               CAST(month(d) AS INT) AS month,
               date_format(d, 'MMMM') AS month_name,
               date_format(d, 'MMM') AS month_abbr,
               CAST(day(d) AS INT) AS day_of_month,
               CAST(dayofyear(d) AS INT) AS day_of_year,
               CAST(weekofyear(d) AS INT) AS week_of_year,
               CAST(weekday(d) + 1 AS INT) AS day_of_week,
               date_format(d, 'EEEE') AS day_name,
               date_format(d, 'EEE') AS day_abbr,
               (weekday(d) + 1) IN (6, 7) AS is_weekend,
               CAST(year(d) + CASE WHEN month(d) >= 7 THEN 1 ELSE 0 END AS INT)
                 AS fiscal_year,
               CAST(FLOOR(((month(d) + 5) % 12) / 3) + 1 AS INT) AS fiscal_quarter,
               CAST(((month(d) + 5) % 12) + 1 AS INT) AS fiscal_month
        FROM (
          SELECT explode(sequence(to_date('2010-01-01'), to_date('2029-12-31')))
                   AS d
        )
    """,
    "latest_event_per_user": """
        SELECT event_id, ts, user_id, event_type, value
        FROM (
          SELECT e.*, row_number() OVER (
                   PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          FROM events e
        )
        WHERE rn = 1
    """,
    "sales_summary": """
        SELECT CAST(year(o.o_orderdate) AS INT) AS order_year,
               o.o_orderpriority AS order_priority,
               r.r_name AS region_name,
               n.n_name AS nation_name,
               c.c_mktsegment AS market_segment,
               l.l_returnflag AS return_flag,
               l.l_linestatus AS line_status,
               COUNT(DISTINCT o.o_orderkey) AS order_count,
               COUNT(*) AS line_count,
               CAST(ROUND(SUM(CAST(l.l_quantity AS DECIMAL(28,6))), 4)
                    AS DOUBLE) AS total_qty,
               CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                    AS DECIMAL(28,6))), 4) AS DOUBLE) AS total_revenue,
               CAST(ROUND(SUM(CAST(l.l_extendedprice * l.l_discount
                    AS DECIMAL(28,6))), 4) AS DOUBLE) AS total_discount_amount,
               CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(28,6))), 2)
                    AS DOUBLE) / COUNT(*) AS avg_unit_price_ext
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        GROUP BY 1, 2, 3, 4, 5, 6, 7
    """,
    "tpch_q1": """
        SELECT l_returnflag, l_linestatus,
               CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(28,6))), 4) AS DOUBLE) AS sum_qty,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(28,6))), 4) AS DOUBLE) AS sum_base_price,
               CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))), 4) AS DOUBLE) AS sum_disc_price,
               CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,6))), 6) AS DOUBLE)
                 AS sum_charge,
               CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(28,6))), 2) AS DOUBLE) / COUNT(*) AS avg_qty,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(28,6))), 2) AS DOUBLE) / COUNT(*) AS avg_price,
               CAST(ROUND(SUM(CAST(l_discount AS DECIMAL(28,6))), 2) AS DOUBLE) / COUNT(*) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "tpch_q5": """
        SELECT n.n_name AS nation_name,
               CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))), 4) AS DOUBLE) AS revenue
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
                       AND c.c_nationkey = s.s_nationkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY n.n_name
    """,
    "sales_rollup": """
        SELECT r.r_name AS region_name,
               n.n_name AS nation_name,
               c.c_mktsegment AS market_segment,
               CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))), 4) AS DOUBLE) AS total_revenue,
               CAST(ROUND(SUM(CAST(l.l_quantity AS DECIMAL(28,6))), 4) AS DOUBLE) AS total_qty,
               COUNT(*) AS line_count,
               CAST((CASE WHEN grouping(r.r_name) = 1 THEN 4 ELSE 0 END
                   + CASE WHEN grouping(n.n_name) = 1 THEN 2 ELSE 0 END
                   + CASE WHEN grouping(c.c_mktsegment) = 1 THEN 1 ELSE 0 END) AS INT)
                 AS grouping_level
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        GROUP BY ROLLUP (r.r_name, n.n_name, c.c_mktsegment)
    """,
    "customers_without_orders": """
        SELECT c.c_custkey AS customer_key,
               c.c_name AS customer_name,
               c.c_mktsegment AS market_segment
        FROM customer c
        WHERE NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '2000-01-01'
        )
    """,
    # earliest-chain funnel as chained CTEs — the per-step min_by joins
    # the DataFrame form plans, spelled in pure SQL (dialect parity for
    # the product-analytics family)
    "funnel_conversion": """
        WITH s1 AS (
            SELECT user_id, MIN(ts) AS t FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ), s2 AS (
            SELECT e.user_id, MIN(e.ts) AS t
            FROM events e JOIN s1 ON e.user_id = s1.user_id
            WHERE e.event_type = 'click' AND e.ts > s1.t
              AND e.ts <= s1.t + INTERVAL 1440 MINUTES
            GROUP BY e.user_id
        ), s3 AS (
            SELECT e.user_id, MIN(e.ts) AS t
            FROM events e JOIN s2 ON e.user_id = s2.user_id
            WHERE e.event_type = 'purchase' AND e.ts > s2.t
              AND e.ts <= s2.t + INTERVAL 1440 MINUTES
            GROUP BY e.user_id
        ), counts AS (
            SELECT '1_view' AS step, (SELECT COUNT(*) FROM s1) AS users
            UNION ALL SELECT '2_click', (SELECT COUNT(*) FROM s2)
            UNION ALL SELECT '3_purchase', (SELECT COUNT(*) FROM s3)
        )
        SELECT step, users,
               ROUND(users / MAX(CASE WHEN step = '1_view' THEN users END)
                         OVER (), 6) AS conversion
        FROM counts ORDER BY step
    """,
    # weekly retention-cohort matrix in pure SQL (r6 — keeps the
    # Trino-migration surface level with the analytics family)
    "retention_cohorts": """
        WITH ev AS (
            SELECT user_id, date_trunc('week', ts) AS wk FROM events
        ), firsts AS (
            SELECT user_id, MIN(wk) AS cohort FROM ev GROUP BY user_id
        ), cells AS (
            SELECT DISTINCT e.user_id,
                   CAST(f.cohort AS DATE) AS cohort_week,
                   CAST(FLOOR(datediff(e.wk, f.cohort) / 7) AS INT) AS week_n
            FROM ev e JOIN firsts f ON e.user_id = f.user_id
        ), counts AS (
            SELECT cohort_week, week_n, COUNT(*) AS active_users
            FROM cells WHERE week_n <= 8 GROUP BY cohort_week, week_n
        ), sizes AS (
            SELECT CAST(cohort AS DATE) AS cohort_week,
                   COUNT(*) AS cohort_size
            FROM firsts GROUP BY CAST(cohort AS DATE)
        )
        SELECT CAST(c.cohort_week AS STRING) AS cohort_week, c.week_n,
               c.active_users, s.cohort_size,
               ROUND(c.active_users / s.cohort_size, 6) AS retention
        FROM counts c JOIN sizes s ON c.cohort_week = s.cohort_week
        ORDER BY cohort_week, week_n
    """,
    # trailing-window z-score anomalies in pure SQL: the PRECEDING-only
    # frame (an anomaly must not dilute its own baseline) and the
    # (ts, event_id) deterministic order, spelled as a WINDOW clause
    "event_anomalies": """
        WITH scored AS (
            SELECT event_id, user_id, value,
                   AVG(value) OVER win AS baseline_mean,
                   STDDEV_SAMP(value) OVER win AS baseline_std,
                   COUNT(*) OVER win AS n
            FROM events
            WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
        )
        SELECT event_id, user_id, value,
               ROUND(baseline_mean, 6) AS baseline_mean,
               ROUND(baseline_std, 6) AS baseline_std,
               ROUND(CASE WHEN n >= 5 AND baseline_std > 0
                          THEN (value - baseline_mean) / baseline_std END,
                     6) AS z_score,
               CASE WHEN n < 5 THEN FALSE
                    WHEN baseline_std = 0 THEN value <> baseline_mean
                    ELSE ABS(ROUND(CASE WHEN n >= 5 AND baseline_std > 0
                                        THEN (value - baseline_mean)
                                             / baseline_std END, 6)) > 3.0
               END AS is_anomaly
        FROM scored
    """,
}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose the fixture tables as temp views for the SQL surface."""
    for name in TABLES:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)


def run_sql(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(SQL_CATALOG[name])
