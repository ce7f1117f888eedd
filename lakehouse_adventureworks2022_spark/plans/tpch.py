"""TPC-H-shaped analytical queries over the star fixtures — the classic
shapes the reference's mart queries approximate (A4 wide aggregates, J7
star joins, T1 top-k; SURVEY.md §2.5/§2.7), exercised at full TPC-H
selectivity and breadth.

Rounding policy per column follows the exact-decimal-resolution rule
(functions.dialect.money): price×(1-disc) is exact at 4dp → round 4;
price×(1-disc)×(1+tax) is exact at 6dp → round 6; averages divide a
2dp-rounded sum by the count (bit-identical division in every engine).

Scale notes: q1 is a pure scan+partial-agg (no join); q3/q5 broadcast
every dimension side; the only shuffles are the grouping keys. Filters
sit on base columns so they push to the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_adventureworks2022_spark.functions.dialect import money, money_sum
from lakehouse_adventureworks2022_spark.sources.readers import read_table


def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report (scan + wide aggregate, no join)."""
    li = read_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # coarse groups (6 flag combos hold the whole fact): exact
            # decimal accumulation — double sums drift past the rounding
            # resolution at these magnitudes (see dialect.money_sum)
            money_sum(F.col("l_quantity")).alias("sum_qty"),
            money_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            money_sum(disc_price).alias("sum_disc_price"),
            money_sum(charge, 6).alias("sum_charge"),
            (money_sum(F.col("l_quantity"), 2) / F.count(F.lit(1))).alias("avg_qty"),
            (money_sum(F.col("l_extendedprice"), 2) / F.count(F.lit(1))).alias(
                "avg_price"
            ),
            (money_sum(F.col("l_discount"), 2) / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority top-10: selective star join + grouped revenue +
    top-k (fixture adaptation: o_orderpriority stands in for
    o_shippriority)."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") > F.to_timestamp(F.lit("1998-06-15")))
        .join(
            orders.filter(
                F.col("o_orderdate") < F.to_timestamp(F.lit("1998-06-15"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(cust.filter(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(
            F.col("l_orderkey").alias("order_key"),
            F.col("o_orderdate").alias("order_date"),
            F.col("o_orderpriority").alias("order_priority"),
        )
        .agg(money(F.sum(revenue)).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("order_key"))
        .limit(10)
    )


def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier volume: 6-way star join (customer and supplier
    constrained to the same nation), grouped by nation."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(
            (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
            & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01")))
        )
        .groupBy(F.col("n_name").alias("nation_name"))
        # nation-level totals are coarse → exact decimal accumulation
        .agg(money_sum(revenue).alias("revenue"))
    )


def silver_lineitem_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-way snowflake→flat enrichment (J1 analog: the reference's
    silver.product_enriched, ``dags/product.py:80-130`` — multi-join +
    wide rename projection + metadata-free business view)."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    part = read_table(spark, sf_dir, "part")
    supp = read_table(spark, sf_dir, "supplier")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("l_orderkey").alias("order_key"),
            F.col("l_linenumber").alias("line_number"),
            F.col("o_orderstatus").alias("order_status"),
            F.col("p_name").alias("product_name"),
            F.col("p_brand").alias("product_brand"),
            F.col("p_type").alias("product_type"),
            F.col("s_name").alias("supplier_name"),
            F.col("l_quantity").alias("quantity"),
            F.col("l_extendedprice").alias("extended_price"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "net_price"
            ),
        )
    )


def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share (TPC-H Q8 shape): for orders by ASIA-region
    customers, the fraction of yearly revenue supplied by CHINA-nation
    suppliers — conditional aggregation (`sum(CASE WHEN)`) forming a
    ratio of two same-group aggregates.

    Scale: the region filter prunes the broadcast customer side before
    the fact join; one grouping shuffle on year; the share divides two
    already-rounded money values (round-stable across engines).
    """
    lineitem = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    supplier = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    cust_asia = (
        customer.join(
            F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"]
        )
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .filter(F.col("r_name") == "ASIA")
        .select("c_custkey")
    )
    supp_nation = supplier.join(
        F.broadcast(nation), supplier["s_nationkey"] == nation["n_nationkey"]
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust_asia), orders["o_custkey"] == cust_asia["c_custkey"])
        .join(F.broadcast(supp_nation), lineitem["l_suppkey"] == supp_nation["s_suppkey"])
        .groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
        .agg(
            # year-level totals are coarse → exact decimal accumulation
            money_sum(
                F.when(F.col("supp_nation") == "CHINA", rev).otherwise(F.lit(0.0))
            ).alias("china_revenue"),
            money_sum(rev).alias("total_revenue"),
        )
        .select(
            "order_year",
            "china_revenue",
            "total_revenue",
            F.round(F.col("china_revenue") / F.col("total_revenue"), 6).alias(
                "market_share"
            ),
        )
    )
