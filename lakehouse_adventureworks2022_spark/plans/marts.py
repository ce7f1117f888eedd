"""Mart queries (the reference's Trino CTAS analytics, re-targeted to
Spark SQL/DataFrame — SURVEY.md §2.5, §3.3).

- ``top_products``: ``trino_scripts/top_product.sql:1-14`` — star join J8 +
  grouped agg with COUNT(DISTINCT) A5 + top-k T1. This is the engine's
  flagship query (SURVEY.md §7 minimum slice).
- ``sales_summary``: ``trino_scripts/business_sales_summary.sql:1-33`` —
  wide-key grouped aggregate A4 over the star join J7, with the measure
  bugs *corrected* (per-row ``SUM(price*qty)`` instead of the reference's
  sum-of-products; ``COUNT(order)`` instead of ``COUNT(x IS NOT NULL)`` —
  SURVEY.md §2.5 quirk note).

Scale notes:
- dims are broadcast (no shuffle on the fact side for the dim joins);
  only the groupBy shuffles, with map-side partial aggregation.
- COUNT(DISTINCT) is computed as a *two-phase exact* aggregation (group by
  (keys, order_key) first, then count the pre-aggregated rows) instead of
  Spark's distinct-expand, which doubles every fact row through the
  shuffle. The pre-aggregation combines map-side, so shuffled bytes
  *shrink* with data volume instead of doubling — measured ~2× faster at
  sf0.1 and structurally better at 100 TB. The HLL variant
  ``top_products_approx`` remains the approximate path.
- top-k compiles to ``TakeOrderedAndProject`` — no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_adventureworks2022_spark.functions.dialect import money, money_sum
from lakehouse_adventureworks2022_spark.sources.readers import read_table


def top_products(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """Top-K products by net revenue (flagship; reference
    ``top_product.sql``: SUM(linetotal), SUM(orderqty),
    COUNT(DISTINCT salesordernumber), ORDER BY revenue DESC LIMIT 10)."""
    lineitem = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    # Exact two-phase distinct: pre-aggregate per (part, order) — one row
    # per distinct pair with partial sums (map-side combined) — then count
    # pairs per part. Same result as COUNT(DISTINCT l_orderkey), no expand.
    per_order = lineitem.groupBy("l_partkey", "l_orderkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_rev"),
        F.sum("l_quantity").alias("_qty"),
    )
    return (
        per_order.join(
            F.broadcast(part), per_order["l_partkey"] == part["p_partkey"], "inner"
        )
        .groupBy("p_partkey", "p_name", "p_brand")
        .agg(
            money(F.sum("_rev")).alias("total_revenue"),
            money(F.sum("_qty")).alias("total_qty"),
            F.count(F.lit(1)).alias("order_count"),
        )
        .orderBy(F.desc("total_revenue"), F.asc("p_partkey"))
        .limit(k)
    )


def top_products_approx(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """100 TB variant: HLL distinct counts (no expand, single shuffle).

    Not oracle-checked for exact equality (approximate by design); the
    driver records a rows-only check.
    """
    lineitem = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    return (
        lineitem.join(
            F.broadcast(part), lineitem["l_partkey"] == part["p_partkey"], "inner"
        )
        .groupBy("p_partkey", "p_name", "p_brand")
        .agg(
            money(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "total_revenue"
            ),
            F.approx_count_distinct("l_orderkey").alias("order_count_approx"),
        )
        .orderBy(F.desc("total_revenue"), F.asc("p_partkey"))
        .limit(k)
    )


def sales_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Business sales summary: star join (fact ⋈ customer-geo dims ⋈ date
    attrs) grouped on a wide key with corrected measures.

    Reference ``business_sales_summary.sql:1-33`` (J7 + A4 + A6); the
    latest-batch scalar-subquery filter (A6) applies to the partitioned
    pipeline table and is exercised in the pipeline tests — on the
    immutable fixtures the whole history is the latest batch.
    """
    lineitem = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    # Exact two-phase distinct (no expand) with EAGER AGGREGATION pushed
    # below the join: phase 1 groups the raw fact by (l_orderkey,
    # flag-combo) — order/customer attributes are functionally dependent
    # on the order key, so grouping BEFORE the join yields exactly the
    # rows the old join-then-group plan produced, but the big
    # fact ⋈ orders join now processes ≤ one row per (order, flag-combo)
    # (~4× fewer at TPC-H line counts) and the aggregation shuffle
    # carries the narrow measure projection instead of the joined row.
    # The join on o_orderkey then REUSES the aggregation's partitioning
    # (no extra exchange on the fact side). Phase 2 counts pre-aggregated
    # rows for order_count. Identical results to
    # COUNT(DISTINCT o_orderkey) + direct sums.
    li_per_order = lineitem.groupBy(
        F.col("l_orderkey"),
        F.col("l_returnflag").alias("return_flag"),
        F.col("l_linestatus").alias("line_status"),
    ).agg(
        F.count(F.lit(1)).alias("_lines"),
        F.sum("l_quantity").alias("_qty"),
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_rev"),
        F.sum(F.col("l_extendedprice") * F.col("l_discount")).alias("_disc"),
        F.sum("l_extendedprice").alias("_price"),
    )
    per_order = (
        li_per_order.join(
            orders, li_per_order["l_orderkey"] == orders["o_orderkey"], "inner"
        )
        .join(
            F.broadcast(customer),
            orders["o_custkey"] == customer["c_custkey"],
            "inner",
        )
        .join(
            F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"], "inner"
        )
        .join(
            F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"], "inner"
        )
        .select(
            F.year("o_orderdate").cast("int").alias("order_year"),
            F.col("o_orderpriority").alias("order_priority"),
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
            F.col("c_mktsegment").alias("market_segment"),
            "return_flag",
            "line_status",
            "_lines",
            "_qty",
            "_rev",
            "_disc",
            "_price",
        )
    )
    return (
        per_order.groupBy(
            "order_year",
            "order_priority",
            "region_name",
            "nation_name",
            "market_segment",
            "return_flag",
            "line_status",
        )
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            F.sum("_lines").alias("line_count"),
            # group count is bounded (~50k key combos) while sums grow
            # with the fact -> coarse at scale: exact decimal accumulation
            money_sum(F.col("_qty")).alias("total_qty"),
            money_sum(F.col("_rev")).alias("total_revenue"),
            money_sum(F.col("_disc")).alias("total_discount_amount"),
            # avg computed as round(sum,2)/count: the numerator is an exact
            # 2dp decimal in every engine, so the division is bit-identical
            # IEEE — no final rounding that could straddle a half boundary.
            (money_sum(F.col("_price"), 2) / F.sum("_lines")).alias("avg_unit_price_ext"),
        )
    )
