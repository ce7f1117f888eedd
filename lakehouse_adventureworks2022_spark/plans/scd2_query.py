"""Oracle-checkable SCD2 scenario (SURVEY.md §5 test strategy / FIXTURES.md
"SCD2 delta batches").

Two deterministic batches derived from the immutable ``part`` fixture so a
SQL oracle can reproduce the expected snapshot exactly:

- batch 1 (effective 2024-01-01): all parts except ``p_partkey % 13 == 0``
  (those play the role of keys that don't exist yet);
- batch 2 (effective 2024-02-01): every part, with
  ``p_retailprice + 1.0`` for ``p_partkey % 7 == 0`` (changed
  attributes; +1.0 is exactly representable, so no cross-engine rounding
  concern).

Expected outcome — the full new/changed/unchanged key matrix
(``dags/product.py:153-378`` semantics):
- unchanged keys: one current row, effective 2024-01-01;
- changed keys: expired row (2024-01-01 → 2024-02-01) + current row;
- new keys (%13): one current row, effective 2024-02-01.

Engine-specific columns (surrogate_key, attribute_hash) are excluded from
the comparison surface; invariants on them are covered by unit tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_adventureworks2022_spark.operators.scd2 import scd2_apply
from lakehouse_adventureworks2022_spark.sources.readers import read_table

TRACKED = ["p_name", "p_brand", "p_retailprice"]


def scd2_part_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, sf_dir, "part")
    batch1 = part.filter(F.col("p_partkey") % 13 != 0).select("p_partkey", *TRACKED)
    batch2 = part.select(
        "p_partkey",
        "p_name",
        "p_brand",
        F.when(
            F.col("p_partkey") % 7 == 0, F.col("p_retailprice") + F.lit(1.0)
        )
        .otherwise(F.col("p_retailprice"))
        .alias("p_retailprice"),
    )
    snap1 = scd2_apply(None, batch1, "p_partkey", TRACKED, "2024-01-01")
    snap2 = scd2_apply(snap1, batch2, "p_partkey", TRACKED, "2024-02-01")
    return snap2.select(
        "p_partkey", *TRACKED, "effective_date", "expiration_date", "is_current"
    )


ORACLE = """
    WITH b1 AS (
      SELECT p_partkey, p_name, p_brand, p_retailprice
      FROM part WHERE p_partkey % 13 <> 0
    ),
    b2 AS (
      SELECT p_partkey, p_name, p_brand,
             CASE WHEN p_partkey % 7 = 0 THEN p_retailprice + 1.0
                  ELSE p_retailprice END AS p_retailprice
      FROM part
    )
    SELECT p_partkey, p_name, p_brand, p_retailprice,
           TIMESTAMP '2024-01-01 00:00:00' AS effective_date,
           CAST(NULL AS TIMESTAMP) AS expiration_date,
           TRUE AS is_current
    FROM b1 WHERE p_partkey % 7 <> 0
    UNION ALL
    SELECT p_partkey, p_name, p_brand, p_retailprice,
           TIMESTAMP '2024-01-01 00:00:00',
           TIMESTAMP '2024-02-01 00:00:00',
           FALSE
    FROM b1 WHERE p_partkey % 7 = 0
    UNION ALL
    SELECT p_partkey, p_name, p_brand, p_retailprice,
           TIMESTAMP '2024-02-01 00:00:00',
           CAST(NULL AS TIMESTAMP),
           TRUE
    FROM b2 WHERE p_partkey % 7 = 0 OR p_partkey % 13 = 0
"""


def scd2_part_price_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time fact enrichment: each lineitem's audit timestamp
    (synthetic 2024 window spanning both dimension versions —
    ``2024-01-01 + (l_orderkey % 60) days``) joined to the part price
    VERSION valid at that instant via
    ``operators.scd2.scd2_point_in_time_join`` (union + running-last —
    one business-key shuffle, no inequality join). Exact; DuckDB
    BETWEEN-join differential at fixture scale in
    tests/test_scd2_pit.py (oracle window full)."""
    dim = scd2_part_dimension(spark, sf_dir)
    from lakehouse_adventureworks2022_spark.operators.scd2 import (
        scd2_point_in_time_join,
    )

    li = read_table(spark, sf_dir, "lineitem")
    facts = li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_partkey").alias("p_partkey"),
        (
            F.to_timestamp(F.lit("2024-01-01"))
            + F.make_interval(days=(F.col("l_orderkey") % 60).cast("int"))
        ).alias("audit_ts"),
    )
    return scd2_point_in_time_join(
        facts, dim, "p_partkey", "audit_ts", payload_cols=["p_retailprice"]
    ).select(
        "l_orderkey",
        "l_linenumber",
        "p_partkey",
        F.col("audit_ts").cast("string").alias("audit_ts"),
        "p_retailprice",
    )
