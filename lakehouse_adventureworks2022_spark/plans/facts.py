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


def cdc_upsert_dir_for(sf_dir: str) -> str:
    """Per-fixture-version warehouse dir for the CDC merge bench (same
    size+mtime fingerprint trick as the ANN index dirs — a regenerated
    fixture gets a fresh target table, and bench reps overwrite the same
    paths instead of accreting /tmp garbage)."""
    import hashlib
    import os
    import tempfile

    st = os.stat(os.path.join(sf_dir, "customer.parquet"))
    tag = hashlib.md5(
        f"{sf_dir}|{st.st_size}|{st.st_mtime_ns}|cdc-v1".encode()
    ).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"cdc_upsert_{tag}")


def q_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end CDC merge (r9 — benches ``TableManager.merge_upsert``,
    the Delta ``MERGE INTO`` analog, which was tested but unbenched):
    seed a customer dimension, apply one deterministic CDC batch
    (updates: ``key % 10 = 3`` gets +100 balance; inserts: ``key % 50 =
    7`` re-keyed +1_000_000 at zero balance; deletes: tombstones for
    ``key % 25 = 11`` — the three mod classes are pairwise disjoint), and
    return the post-merge table. EXACT: the merge result is plain
    relational algebra (untouched ∪ updated ∪ inserted minus deleted), so
    a swept DuckDB twin hash-checks it.

    Scale shape: ONE key anti-join (broadcast for a small CDC batch —
    left to AQE) + union + atomic staged overwrite; at Delta/Iceberg the
    same call becomes file-level copy-on-write (``storage/tables.py``
    docstring, reference ``dags/sales.py:102-106``'s non-idempotent
    append is the anti-pattern this replaces)."""
    from lakehouse_adventureworks2022_spark.storage.tables import TableManager

    tm = TableManager(spark, cdc_upsert_dir_for(sf_dir))
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    tm.overwrite(cust, "dim_customer")
    upd = cust.filter(F.col("c_custkey") % 10 == 3).withColumn(
        "c_acctbal", F.col("c_acctbal") + F.lit(100.0)
    )
    ins = cust.filter(F.col("c_custkey") % 50 == 7).select(
        (F.col("c_custkey") + F.lit(1_000_000)).alias("c_custkey"),
        "c_name",
        F.lit(0.0).alias("c_acctbal"),
    )
    dels = cust.filter(F.col("c_custkey") % 25 == 11)
    batch = (
        upd.withColumn("__deleted", F.lit(False))
        .unionByName(ins.withColumn("__deleted", F.lit(False)))
        .unionByName(dels.withColumn("__deleted", F.lit(True)))
    )
    tm.merge_upsert(batch, "dim_customer", keys="c_custkey", delete_col="__deleted")
    return tm.read("dim_customer").orderBy("c_custkey")


#: DuckDB twin of q_cdc_upsert: the merge result expressed as plain
#: relational algebra over the same disjoint mod classes. The +100.0 /
#: 0.0 literals are DOUBLE in both engines (IEEE add — bit-identical).
ORACLE_CDC_UPSERT = """
    WITH t AS (SELECT c_custkey, c_name, c_acctbal FROM customer)
    SELECT c_custkey, c_name, c_acctbal FROM t
    WHERE c_custkey % 10 != 3 AND c_custkey % 25 != 11
    UNION ALL
    SELECT c_custkey, c_name, c_acctbal + CAST(100.0 AS DOUBLE) AS c_acctbal
    FROM t WHERE c_custkey % 10 = 3
    UNION ALL
    SELECT c_custkey + 1000000 AS c_custkey, c_name,
           CAST(0.0 AS DOUBLE) AS c_acctbal
    FROM t WHERE c_custkey % 50 = 7
    ORDER BY c_custkey
"""
