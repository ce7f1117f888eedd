"""Dimension builders (gold layer).

Re-implements the reference's dimension semantics on the driver fixtures
(FIXTURES.md maps: ``customer``→dim_customers, ``nation``+``region``→
dim_address/geo chain, generated spine→dim_date):

- dim_date: ``trino_scripts/create_dim_date.sql:24-58`` — calendar + fiscal
  attributes, fiscal year starting July, ISO day-of-week/weekend flag.
- dim_customer_geo: the reference's address ⋈ state ⋈ country chain
  (``dags/address_pipeline.py:83-87``, J2) as customer ⋈ nation ⋈ region.
- dim_supplier_geo: same chain for suppliers.

Scale: the geo dims join tiny lookup tables — declared with
``F.broadcast`` so no shuffle ever happens regardless of the fact side's
size; dim_date is generated (7,305 rows), never shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_adventureworks2022_spark.functions.dialect import (
    date_key,
    fiscal_month,
    fiscal_quarter,
    fiscal_year,
    iso_day_of_week,
)
from lakehouse_adventureworks2022_spark.sources.readers import date_spine, read_table


def build_dim_date(
    spark: SparkSession,
    start: str = "2010-01-01",
    end: str = "2029-12-31",
) -> DataFrame:
    """Generated calendar dimension, 7,305 rows for the default range.

    Column-for-column port of ``create_dim_date.sql:24-58`` with the
    dialect fixes of SURVEY.md §2.8 (ISO day-of-week via ``weekday()+1``;
    JDK format patterns MMMM/MMM/EEEE/EEE for the MySQL %B/%b/%A/%a names).
    """
    d = F.col("full_date")
    iso_dow = iso_day_of_week(d)
    return date_spine(spark, start, end).select(
        date_key(d).alias("date_key"),
        # timestamp (not date): Spark dates materialize as datetime.date
        # objects in pandas while other engines produce datetime64 — a
        # cross-engine hash hazard; midnight timestamps are symmetric.
        d.cast("timestamp").alias("full_date"),
        F.year(d).cast("int").alias("year"),
        F.quarter(d).cast("int").alias("quarter"),
        F.month(d).cast("int").alias("month"),
        F.date_format(d, "MMMM").alias("month_name"),
        F.date_format(d, "MMM").alias("month_abbr"),
        F.dayofmonth(d).cast("int").alias("day_of_month"),
        F.dayofyear(d).cast("int").alias("day_of_year"),
        F.weekofyear(d).cast("int").alias("week_of_year"),
        iso_dow.alias("day_of_week"),
        F.date_format(d, "EEEE").alias("day_name"),
        F.date_format(d, "EEE").alias("day_abbr"),
        iso_dow.isin(6, 7).alias("is_weekend"),
        fiscal_year(d).alias("fiscal_year"),
        fiscal_quarter(d).alias("fiscal_quarter"),
        fiscal_month(d).alias("fiscal_month"),
    )


def build_dim_customer_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer enriched with its geography snowflake (J2/J3 + P1 renames).

    Mirrors ``silver.dim_address``'s address ⋈ state_province ⋈
    country_region chain (``dags/address_pipeline.py:65-127``) and the
    rename-projection style of ``dags/customer_pipeline.py:117-137``.
    """
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    return (
        customer.join(
            F.broadcast(nation),
            customer["c_nationkey"] == nation["n_nationkey"],
            "inner",
        )
        .join(
            F.broadcast(region),
            nation["n_regionkey"] == region["r_regionkey"],
            "inner",
        )
        .select(
            F.col("c_custkey").alias("customer_key"),
            F.col("c_name").alias("customer_name"),
            F.col("c_mktsegment").alias("market_segment"),
            F.col("c_acctbal").alias("account_balance"),
            F.col("n_nationkey").alias("nation_key"),
            F.col("n_name").alias("nation_name"),
            F.col("r_regionkey").alias("region_key"),
            F.col("r_name").alias("region_name"),
        )
    )


def build_dim_supplier_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier ⋈ nation ⋈ region (same J2 chain, supplier side)."""
    supplier = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    return (
        supplier.join(
            F.broadcast(nation),
            supplier["s_nationkey"] == nation["n_nationkey"],
            "inner",
        )
        .join(
            F.broadcast(region),
            nation["n_regionkey"] == region["r_regionkey"],
            "inner",
        )
        .select(
            F.col("s_suppkey").alias("supplier_key"),
            F.col("s_name").alias("supplier_name"),
            F.col("s_acctbal").alias("account_balance"),
            F.col("n_name").alias("nation_name"),
            F.col("r_name").alias("region_name"),
        )
    )
