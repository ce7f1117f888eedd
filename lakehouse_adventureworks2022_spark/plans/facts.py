"""Fact builders (gold layer).

``build_fact_sales`` re-implements the reference's gold.fact_sales
(``dags/sales.py:65-106``): order detail LEFT JOIN header (J4), integer
yyyyMMdd date keys (F3), measure projection, line-total computation. On the
fixtures the grain maps lineitem (detail) ⋈ orders (header).

Scale notes (SURVEY.md §4 / 100 TB posture):
- the detail⋈header join is an equi-join on the order key — at 100 TB both
  sides are large, so this is a shuffle (sort-merge) join; AQE handles
  skewed order keys. If the tables are bucketed by order key on write
  (``storage/tables.py``) the shuffle disappears entirely.
- the date-key derivation is a scalar projection, fully codegen'd; no
  Python.
- unlike the reference we do NOT re-append history per run (its
  non-idempotent W3 anti-pattern, SURVEY.md §4.4) — the pipeline writes
  with ``replace_where`` on the ingestion partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_adventureworks2022_spark.functions.dialect import date_key
from lakehouse_adventureworks2022_spark.sources.readers import read_table


def build_fact_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per order line, header attributes joined on, date keys as
    integer yyyyMMdd surrogates (reference ``dags/sales.py:65-106``)."""
    lineitem = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    return (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"], "left")
        .select(
            F.col("l_orderkey").alias("order_key"),
            F.col("l_linenumber").alias("line_number"),
            F.col("l_partkey").alias("product_key"),
            F.col("l_suppkey").alias("supplier_key"),
            F.col("o_custkey").alias("customer_key"),
            F.col("o_orderstatus").alias("order_status"),
            F.col("o_orderpriority").alias("order_priority"),
            date_key(F.col("o_orderdate")).alias("order_date_key"),
            date_key(F.col("l_shipdate")).alias("ship_date_key"),
            F.col("l_quantity").alias("order_qty"),
            F.col("l_extendedprice").alias("unit_price_ext"),
            F.col("l_discount").alias("discount"),
            F.col("l_tax").alias("tax"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("line_total"),
            F.col("l_returnflag").alias("return_flag"),
            F.col("l_linestatus").alias("line_status"),
        )
    )
