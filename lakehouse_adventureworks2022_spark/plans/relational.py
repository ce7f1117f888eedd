"""Additional relational surface the reference never needed but a
complete engine must offer (SURVEY.md §2.4/§2.5 "not present" notes):
rollup subtotals, semi/anti joins, subquery predicates, and ordered
statistics — all Catalyst-native, each with a DuckDB oracle.

Determinism notes: exact interpolated percentiles (Spark ``percentile``
== DuckDB ``quantile_cont``: same sort + same IEEE interpolation) and
sample stddev verified bit-identical on the fixtures, so they are
compared unrounded; rollup subtotal rows use the engines' shared
NULL-for-total convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_adventureworks2022_spark.sources.readers import read_table


def sales_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Region → nation → market-segment revenue rollup (hierarchical
    subtotals + grand total in one pass — Spark plans a single Expand +
    hash aggregate, no repeated scans)."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
            F.col("c_mktsegment").alias("market_segment"),
            revenue.alias("rev"),
            F.col("l_quantity"),
        )
    )
    # Pre-aggregate to the leaf grouping FIRST (≈ |regions|×|nations|×
    # |segments| rows), then rollup over the partials — the Expand ×4
    # multiplies hundreds of rows instead of the whole fact. Exact:
    # decimal partial sums re-sum exactly; counts sum.
    leaf = base.groupBy("region_name", "nation_name", "market_segment").agg(
        F.sum(F.col("rev").cast("decimal(28,6)")).alias("_rev"),
        F.sum(F.col("l_quantity").cast("decimal(28,6)")).alias("_qty"),
        F.count(F.lit(1)).alias("_cnt"),
    )
    return (
        leaf.rollup("region_name", "nation_name", "market_segment")
        .agg(
            F.round(F.sum("_rev"), 4).cast("double").alias("total_revenue"),
            F.round(F.sum("_qty"), 4).cast("double").alias("total_qty"),
            F.sum("_cnt").alias("line_count"),
            F.grouping_id().cast("int").alias("grouping_level"),
        )
    )


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join — the declarative form of the reference's manual
    left-join-then-null-filter key-existence test (J5,
    ``dags/product.py:276-291``). Restricted to recent orders so the
    churned-customer set is non-empty on the fixtures."""
    cust = read_table(spark, sf_dir, "customer")
    recent = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.to_timestamp(F.lit("2000-01-01"))
    )
    return (
        cust.join(
            recent, cust["c_custkey"] == recent["o_custkey"], "left_anti"
        )
        .select(
            F.col("c_custkey").alias("customer_key"),
            F.col("c_name").alias("customer_name"),
            F.col("c_mktsegment").alias("market_segment"),
        )
    )


def repeat_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join against a grouped subquery: customers with more
    than 10 orders (the IN/EXISTS-subquery shape)."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    frequent = (
        orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 10)
    )
    return (
        cust.join(
            frequent, cust["c_custkey"] == frequent["o_custkey"], "left_semi"
        )
        .select(
            F.col("c_custkey").alias("customer_key"),
            F.col("c_name").alias("customer_name"),
        )
    )


def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many customers placed exactly N urgent orders (TPC-H Q13
    shape): LEFT OUTER join with the filter *in the join condition* (so
    zero-order customers survive), per-customer count, then a histogram
    of the counts.

    Scale shape: two aggregations, both key-reducing; the outer join
    shuffles on custkey (or disappears if both tables are bucketed on
    it — ``storage/tables.py``)."""
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    per_customer = (
        customer.join(
            orders,
            (customer["c_custkey"] == orders["o_custkey"])
            & (orders["o_orderpriority"] == "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_count"))
    )
    return (
        per_customer.groupBy("order_count")
        .agg(F.count(F.lit(1)).alias("customer_count"))
    )


def event_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered statistics per event type: exact interpolated percentiles
    + sample stddev + extrema. At 100 TB swap ``percentile`` for
    ``approx_percentile`` (t-digest) — the exact form requires a per-group
    sort."""
    events = read_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("min_value"),
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.9)").alias("p90"),
        F.expr("percentile(value, 0.99)").alias("p99"),
        F.max("value").alias("max_value"),
        F.stddev("value").alias("stddev_value"),
    )


def revenue_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond ROLLUP's nested prefixes): revenue
    by region, by market segment, and grand total — three independent
    groupings in ONE pass over the join (the Expand operator multiplies
    rows per set AFTER the partial aggregation, not at scan)."""
    lineitem = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    base = (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .select(
            F.col("r_name").alias("region_name"),
            F.col("c_mktsegment").alias("market_segment"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        )
    )
    # leaf pre-aggregation before Expand (see sales_rollup)
    leaf = base.groupBy("region_name", "market_segment").agg(
        F.sum(F.col("rev").cast("decimal(28,6)")).alias("_rev"),
        F.count(F.lit(1)).alias("_cnt"),
    )
    return leaf.groupingSets(
        [["region_name"], ["market_segment"], []],
        "region_name",
        "market_segment",
    ).agg(
        F.round(F.sum("_rev"), 4).cast("double").alias("total_revenue"),
        F.sum("_cnt").alias("line_count"),
        F.grouping_id().cast("int").alias("grouping_level"),
    )


def event_value_stats_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB variant of :func:`event_value_stats`: t-digest
    ``approx_percentile`` — single pass, bounded memory, no per-group
    sort. Approximate by design ⇒ rows-only check."""
    events = read_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("approx_percentile(value, 0.5)").alias("p50_approx"),
        F.expr("approx_percentile(value, 0.9)").alias("p90_approx"),
        F.expr("approx_percentile(value, 0.99)").alias("p99_approx"),
    )


def funnel_conversion(
    spark: SparkSession,
    sf_dir: str,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    max_gap_minutes: int = 1440,
) -> DataFrame:
    """Ordered-funnel conversion over the events stream: per user, the
    EARLIEST chain view → click → purchase where each step lands within
    ``max_gap_minutes`` of the previous one; output is one row per step
    with the surviving-user count and conversion rate from step 1.

    Earliest-chain semantics (the standard funnel definition): step 1
    anchors at the user's first step-1 event; step k is the first
    step-k event after the chosen step-(k−1) time within the gap. A
    greedy earliest chain can miss a later successful chain — that is
    the accepted product-analytics semantics, and it is what the SQL
    twin (tests/test_funnel.py) computes too.

    Plan shape: one filtered scan per step (pushed predicate), each
    reduced to one row per user BEFORE joining (min_by aggregation), so
    the k−1 joins are user-keyed equi-joins between |users|-row frames
    that all reuse one hash partitioning — no events×events join, no
    window over the whole stream.
    """
    from lakehouse_adventureworks2022_spark.sources.readers import read_table

    events = read_table(spark, sf_dir, "events")
    gap = F.expr(f"INTERVAL {max_gap_minutes} MINUTES")
    cur = (
        events.filter(F.col("event_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t"))
    )
    # zero-padded step labels so the final ORDER BY (a string sort)
    # stays step-ordered past 9 steps ("02" < "10")
    pad = len(str(len(steps)))
    counts = [(f"{1:0{pad}d}_" + steps[0], cur)]
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            events.filter(F.col("event_type") == step)
            .join(cur.select("user_id", F.col("t").alias("__prev__")), "user_id")
            .filter((F.col("ts") > F.col("__prev__")) & (F.col("ts") <= F.col("__prev__") + gap))
            .groupBy("user_id")
            .agg(F.min("ts").alias("t"))
        )
        counts.append((f"{i:0{pad}d}_{step}", nxt))
        cur = nxt
    rows = None
    for name, df in counts:
        one = df.agg(F.count(F.lit(1)).alias("users")).select(
            F.lit(name).alias("step"), "users"
        )
        rows = one if rows is None else rows.unionByName(one)
    # conversion = users / step-1 users, computed over the k-row result
    # frame itself (no extra driver action)
    base = F.max(
        F.when(F.col("step") == f"{1:0{pad}d}_" + steps[0], F.col("users"))
    ).over(Window.partitionBy())
    return rows.select(
        "step",
        "users",
        F.round(F.col("users") / base, 6).alias("conversion"),
    ).orderBy("step")


def retention_cohorts(
    spark: SparkSession,
    sf_dir: str,
    max_weeks: int = 8,
) -> DataFrame:
    """Weekly retention-cohort matrix over the events stream: users
    cohort by the Monday of their FIRST event; cell (cohort, week_n) =
    how many of that cohort were active n weeks later, with the rate
    against cohort size. Week 0 is the cohort week itself (rate 1.0 by
    construction — kept as the sanity row).

    Plan shape: one scan → per-user first-event aggregation (one
    user-keyed shuffle) → join back on user (same partitioning reused)
    → distinct (cohort, user, week_n) → count. The user⋈user join is
    |users| × activity rows on a uniform key — never events×events.
    """
    from lakehouse_adventureworks2022_spark.sources.readers import read_table

    events = read_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    )
    firsts = events.groupBy("user_id").agg(F.min("wk").alias("cohort"))
    cells = (
        events.join(firsts, "user_id")
        .select(
            "user_id",
            F.col("cohort").cast("date").alias("cohort_week"),
            F.floor(
                F.datediff(F.col("wk"), F.col("cohort")) / 7
            ).cast("int").alias("week_n"),
        )
        .filter(F.col("week_n") <= max_weeks)
        .distinct()
        .groupBy("cohort_week", "week_n")
        .agg(F.count(F.lit(1)).alias("active_users"))
    )
    sizes = firsts.groupBy(
        F.col("cohort").cast("date").alias("cohort_week")
    ).agg(F.count(F.lit(1)).alias("cohort_size"))
    return (
        cells.join(sizes, "cohort_week")
        .select(
            F.col("cohort_week").cast("string").alias("cohort_week"),
            "week_n",
            "active_users",
            "cohort_size",
            F.round(
                F.col("active_users") / F.col("cohort_size"), 6
            ).alias("retention"),
        )
        .orderBy("cohort_week", "week_n")
    )


def audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise user-audience overlap between event types from KMV
    sketch state (r7, ``operators/theta.py``): for every type pair,
    estimated distinct users of each, of the union, of the
    intersection, and the Jaccard — the set-operation questions HLL
    state cannot answer, from kilobyte sketches. Approximate by design
    (rows-only; the error-bound differential vs exact DuckDB
    intersections runs in tests/test_theta_query.py). Scale: one
    bounded two-phase sketch build over events + a |types|² kilobyte
    self-join — the corpus is scanned once, never joined."""
    from lakehouse_adventureworks2022_spark.operators.theta import (
        kmv_pairwise_overlap,
        kmv_sketches,
    )

    events = read_table(spark, sf_dir, "events")
    sk = kmv_sketches(events, ["event_type"], "user_id", k=1024)
    out = kmv_pairwise_overlap(sk, "event_type", k=1024)
    return out.select(
        "label_a",
        "label_b",
        F.round("est_a", 2).alias("est_a"),
        F.round("est_b", 2).alias("est_b"),
        F.round("est_union", 2).alias("est_union"),
        F.round("est_intersection", 2).alias("est_intersection"),
        F.round("est_jaccard", 6).alias("est_jaccard"),
    )


def dq_expectations_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative expectation suite over orders (r7,
    ``operators/expectations.py`` — the Deequ/dbt-tests analog): six
    constraint kinds in TWO jobs (all row-level checks share one
    conditional-count aggregation; the uniqueness check is one
    groupBy). Exact — counts only — so the DuckDB twin matches by
    hash."""
    from lakehouse_adventureworks2022_spark.operators.expectations import (
        expect_accepted_values,
        expect_in_range,
        expect_matches,
        expect_not_null,
        expect_row_count_between,
        expect_unique,
        run_expectations,
    )

    orders = read_table(spark, sf_dir, "orders")
    return run_expectations(
        orders,
        [
            expect_not_null("o_orderkey"),
            expect_not_null("o_custkey"),
            expect_accepted_values("o_orderstatus", ["O", "F", "P"]),
            expect_in_range("o_totalprice", 0.0, 1e9),
            expect_matches("o_orderpriority", "^[1-5]-"),
            expect_unique(["o_orderkey"]),
            expect_row_count_between(1, 10_000_000_000),
        ],
    )


ORACLE_DQ_EXPECTATIONS_ORDERS = """
    WITH t AS (
      SELECT COUNT(*) AS total,
             SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS v_nn_ok,
             SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS v_nn_ck,
             SUM(CASE WHEN o_orderstatus IS NOT NULL
                       AND o_orderstatus NOT IN ('O','F','P')
                      THEN 1 ELSE 0 END) AS v_av,
             SUM(CASE WHEN o_totalprice IS NOT NULL
                       AND (o_totalprice < 0.0 OR o_totalprice > 1e9)
                      THEN 1 ELSE 0 END) AS v_ir,
             SUM(CASE WHEN o_orderpriority IS NOT NULL
                       AND NOT regexp_matches(o_orderpriority, '^[1-5]-')
                      THEN 1 ELSE 0 END) AS v_rx
      FROM orders
    ),
    u AS (
      SELECT CAST(COALESCE(SUM(CASE WHEN c > 1 THEN c END), 0) AS BIGINT)
               AS violations,
             CAST(COALESCE(SUM(c), 0) AS BIGINT) AS total
      FROM (SELECT COUNT(*) AS c FROM orders GROUP BY o_orderkey)
    )
    SELECT * FROM (
      SELECT 'not_null' AS expectation, 'o_orderkey' AS "column",
             CAST(v_nn_ok AS BIGINT) AS violations,
             CAST(total AS BIGINT) AS total, v_nn_ok = 0 AS passed FROM t
      UNION ALL
      SELECT 'not_null', 'o_custkey', CAST(v_nn_ck AS BIGINT),
             CAST(total AS BIGINT), v_nn_ck = 0 FROM t
      UNION ALL
      SELECT 'accepted_values', 'o_orderstatus', CAST(v_av AS BIGINT),
             CAST(total AS BIGINT), v_av = 0 FROM t
      UNION ALL
      SELECT 'in_range', 'o_totalprice', CAST(v_ir AS BIGINT),
             CAST(total AS BIGINT), v_ir = 0 FROM t
      UNION ALL
      SELECT 'matches', 'o_orderpriority', CAST(v_rx AS BIGINT),
             CAST(total AS BIGINT), v_rx = 0 FROM t
      UNION ALL
      SELECT 'row_count_between', '*',
             CAST(CASE WHEN total BETWEEN 1 AND 10000000000 THEN 0 ELSE 1 END AS BIGINT),
             CAST(total AS BIGINT),
             total BETWEEN 1 AND 10000000000 FROM t
      UNION ALL
      SELECT 'unique', 'o_orderkey', violations, total,
             violations = 0 FROM u
    )
    ORDER BY expectation, "column"
"""
