"""SCD2 point-in-time lookup (operators/scd2.scd2_point_in_time_join):
DuckDB BETWEEN-join differential over a real built history, hand-built
chain semantics, and a no-inequality-join plan guard."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from lakehouse_adventureworks2022_spark.operators.scd2 import (
    scd2_apply,
    scd2_point_in_time_join,
)

KEY, TRACKED = "part_id", ["price"]


def _build_history(spark):
    """Three-day SCD2 history via the real merge operator."""
    snap = None
    for day, rows in [
        ("2024-01-01", [(1, 10.0), (2, 20.0)]),
        ("2024-01-05", [(1, 11.0), (2, 20.0)]),  # part 1 changes
        ("2024-01-09", [(1, 12.0), (3, 30.0)]),  # part 1 again; part 3 new
    ]:
        df = spark.createDataFrame(rows, "part_id long, price double")
        snap = scd2_apply(snap, df, KEY, TRACKED, effective_date=day)
    return snap


def _facts(spark):
    rows = [
        (100, 1, "2023-12-25 00:00:00"),  # before any version → null
        (101, 1, "2024-01-01 00:00:00"),  # exactly at v1 start → 10.0
        (102, 1, "2024-01-04 23:59:59"),  # just before v2 → 10.0
        (103, 1, "2024-01-05 00:00:00"),  # at v2 start → 11.0
        (104, 1, "2024-02-01 00:00:00"),  # current → 12.0
        (105, 2, "2024-01-07 00:00:00"),  # unchanged key → 20.0
        (106, 3, "2024-01-08 00:00:00"),  # before part 3 existed → null
        (107, 3, "2024-01-10 00:00:00"),  # part 3 current → 30.0
    ]
    return (
        spark.createDataFrame(rows, "fact_id long, part_id long, ts string")
        .withColumn("ts", F.to_timestamp("ts"))
    )


def test_pit_hand_built_semantics(spark):
    got = {
        r["fact_id"]: r["price"]
        for r in scd2_point_in_time_join(
            _facts(spark), _build_history(spark), KEY, "ts"
        ).collect()
    }
    assert got == {
        100: None,
        101: 10.0,
        102: 10.0,
        103: 11.0,
        104: 12.0,
        105: 20.0,
        106: None,
        107: 30.0,
    }


def test_pit_matches_duckdb_between_join(spark):
    dim = _build_history(spark)
    facts = _facts(spark)
    got = {
        r["fact_id"]: r["price"]
        for r in scd2_point_in_time_join(facts, dim, KEY, "ts").collect()
    }
    con = duckdb.connect()
    con.register("dim", dim.toPandas())
    fpdf = facts.toPandas()
    fpdf["ts"] = pd.to_datetime(fpdf["ts"])
    con.register("facts", fpdf)
    want = dict(
        con.sql(
            """
            SELECT f.fact_id, d.price
            FROM facts f LEFT JOIN dim d
              ON f.part_id = d.part_id
             AND f.ts >= d.effective_date
             AND (d.expiration_date IS NULL OR f.ts < d.expiration_date)
            """
        ).fetchall()
    )
    assert got == want


def test_pit_plan_single_shuffle_no_inequality_join(spark, tmp_path):
    # materialize both inputs so the measured plan is the JOIN's, not
    # the three-merge history build's lineage
    _build_history(spark).write.mode("overwrite").parquet(str(tmp_path / "d"))
    _facts(spark).write.mode("overwrite").parquet(str(tmp_path / "f"))
    dim = spark.read.parquet(str(tmp_path / "d"))
    facts = spark.read.parquet(str(tmp_path / "f"))
    plan = (
        scd2_point_in_time_join(facts, dim, KEY, "ts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan  # no join operator at all: union+window
    # both union legs hash-partition into ONE window shuffle
    assert plan.count("Exchange") <= 2


def test_pit_query_matches_duckdb_at_fixture_scale(spark):
    from lakehouse_adventureworks2022_spark.plans.scd2_query import (
        scd2_part_price_asof,
    )

    SF = "/root/testdata/sf0.001"
    # (l_orderkey, l_linenumber) is NOT unique in the fixture (the
    # dq_lineitem_pk gate exists because of that) — compare MULTISETS
    got = sorted(
        (r["l_orderkey"], r["l_linenumber"], r["p_partkey"], r["p_retailprice"])
        for r in scd2_part_price_asof(spark, SF).collect()
    )
    con = duckdb.connect()
    for t in ("part", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    want = sorted(
        (
            (r[0], r[1], r[2], r[3])
            for r in con.sql(
                """
        WITH b1 AS (
          SELECT p_partkey, p_retailprice FROM part WHERE p_partkey % 13 <> 0
        ), b2 AS (
          SELECT p_partkey,
                 CASE WHEN p_partkey % 7 = 0 THEN p_retailprice + 1.0
                      ELSE p_retailprice END AS p_retailprice
          FROM part
        ), dim AS (
          -- version 1: expires at 2024-02-01 when the attrs changed,
          -- open otherwise (matching scd2_apply's contiguity)
          SELECT b1.p_partkey, b1.p_retailprice,
                 TIMESTAMP '2024-01-01' AS eff,
                 CASE WHEN b2.p_retailprice <> b1.p_retailprice
                      THEN TIMESTAMP '2024-02-01' END AS exp
          FROM b1 JOIN b2 USING (p_partkey)
          UNION ALL
          SELECT b2.p_partkey, b2.p_retailprice, TIMESTAMP '2024-02-01', NULL
          FROM b2 JOIN b1 USING (p_partkey)
          WHERE b2.p_retailprice <> b1.p_retailprice
          UNION ALL
          SELECT b2.p_partkey, b2.p_retailprice, TIMESTAMP '2024-02-01', NULL
          FROM b2 WHERE b2.p_partkey % 13 = 0
        ), facts AS (
          SELECT l_orderkey, l_linenumber, l_partkey AS p_partkey,
                 TIMESTAMP '2024-01-01'
                   + INTERVAL 1 DAY * (l_orderkey % 60) AS audit_ts
          FROM lineitem
        )
        SELECT f.l_orderkey, f.l_linenumber, f.p_partkey, d.p_retailprice
        FROM facts f LEFT JOIN dim d
          ON f.p_partkey = d.p_partkey
         AND f.audit_ts >= d.eff
         AND (d.exp IS NULL OR f.audit_ts < d.exp)
        """
            ).fetchall()
        )
    )
    assert got == want
    # both versions actually appear in the result (non-vacuous window)
    assert len({r[3] for r in got if r[3] is not None}) > 1
