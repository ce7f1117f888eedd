"""Window-function breadth: analytic shapes beyond the reference's two
``row_number`` uses (SURVEY.md §2.6 — the reference exercises WF1/WF2 only;
frames, lag/lead, rank, and ratio-to-total are "not used ... Spark supplies
natively". These queries supply them as first-class catalog entries).

Scale notes (100 TB posture):
- every window here partitions by a high-cardinality key (customer,
  nation) — the shuffle is hash-partitioned on that key and each partition
  sorts locally; no global sort, no single-partition window (the
  reference's WF2 anti-pattern, SURVEY.md §4.3).
- running totals use an explicit ``rowsBetween(unboundedPreceding,
  currentRow)`` frame with a *deterministic* sort tiebreak (date, key) so
  the cumulative float sum is reproducible run-to-run and engine-to-engine.
- ``nation_top_customers`` aggregates BEFORE windowing: the rank runs over
  one row per customer, not per order — windows over pre-aggregated data
  keep state bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_adventureworks2022_spark.functions.dialect import money, money_sum
from lakehouse_adventureworks2022_spark.sources.readers import read_table


def customer_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order timeline: sequence number (``row_number``),
    days since previous order (``lag``), and cumulative spend (running
    ``sum`` with an explicit rows frame).

    The frame sort is (order_date, order_key) — total and deterministic —
    so the running double sum is identical in any engine that follows the
    same order.
    """
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        F.col("o_custkey").alias("customer_key"),
        F.col("o_orderkey").alias("order_key"),
        F.col("o_orderdate").alias("order_date"),
        F.col("o_totalprice").alias("order_total"),
        F.row_number().over(w).alias("order_seq"),
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).alias("days_since_prev"),
        money(F.sum("o_totalprice").over(running)).alias("cum_spend"),
    )


def nation_top_customers(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Top-k customers by order revenue within each nation
    (aggregate → dense_rank → filter; the canonical top-n-per-group).

    Revenue is rounded to the engine's money resolution *before* ranking so
    float accumulation order can never reorder ranks; the rank order adds
    ``customer_key`` as a total tiebreak.
    """
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    per_customer = (
        orders.groupBy("o_custkey")
        .agg(money(F.sum("o_totalprice")).alias("revenue"))
        .join(F.broadcast(customer), F.col("o_custkey") == customer["c_custkey"])
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
    )
    w = Window.partitionBy("n_name").orderBy(F.desc("revenue"), F.asc("c_custkey"))
    return (
        per_customer.select(
            F.col("n_name").alias("nation_name"),
            F.col("c_custkey").alias("customer_key"),
            F.col("c_name").alias("customer_name"),
            F.col("revenue"),
            F.dense_rank().over(w).alias("revenue_rank"),
        )
        .filter(F.col("revenue_rank") <= k)
    )


def priority_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-total: yearly revenue per order priority and its share of
    the year's total (window aggregate over pre-aggregated rows).

    The share divides two already-rounded money values and is itself
    rounded to 6dp, so partition-sum association order cannot flip the
    hash.
    """
    orders = read_table(spark, sf_dir, "orders")
    per = (
        orders.groupBy(
            F.year("o_orderdate").cast("int").alias("order_year"),
            F.col("o_orderpriority").alias("order_priority"),
        )
        .agg(
            # year-priority totals are coarse -> exact decimal accumulation
            money_sum(F.col("o_totalprice")).alias("revenue"),
            F.count(F.lit(1)).alias("order_count"),
        )
    )
    w = Window.partitionBy("order_year")
    return per.select(
        "order_year",
        "order_priority",
        "revenue",
        "order_count",
        F.round(F.col("revenue") / F.sum("revenue").over(w), 6).alias("revenue_share"),
    )
