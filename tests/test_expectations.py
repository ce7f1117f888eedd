"""Declarative expectations (operators/expectations.py): planted
violations per constraint kind, the single-pass plan shape, the gate
form's loud failure, and the catalog twin's hash parity."""

from __future__ import annotations

import duckdb
import pytest

from lakehouse_adventureworks2022_spark.operators.expectations import (
    assert_expectations,
    expect_accepted_values,
    expect_in_range,
    expect_matches,
    expect_not_null,
    expect_row_count_between,
    expect_unique,
    run_expectations,
)

SUITE = [
    expect_not_null("a"),
    expect_accepted_values("b", ["x", "y"]),
    expect_in_range("v", 0, 100),
    expect_matches("code", "^[A-Z]{2}-"),
    expect_unique(["a"]),
    expect_row_count_between(1, 10),
]


@pytest.fixture()
def dirty(spark):
    rows = [
        (1, "x", 50.0, "AB-1"),
        (2, "y", -5.0, "AB-2"),     # v out of range
        (2, "z", 120.0, "ab-3"),    # dup a, bad b, v out of range, bad code
        (None, "x", 10.0, "CD-4"),  # null a
    ]
    return spark.createDataFrame(rows, "a int, b string, v double, code string")


def test_counts_per_kind(spark, dirty):
    got = {
        (r["expectation"], r["column"]): (r["violations"], r["total"], r["passed"])
        for r in run_expectations(dirty, SUITE).collect()
    }
    assert got[("not_null", "a")] == (1, 4, False)
    assert got[("accepted_values", "b")] == (1, 4, False)
    assert got[("in_range", "v")] == (2, 4, False)
    assert got[("matches", "code")] == (1, 4, False)
    # dup group a=2 has 2 rows -> 2 violating rows
    assert got[("unique", "a")] == (2, 4, False)
    assert got[("row_count_between", "*")] == (0, 4, True)


def test_clean_frame_passes_and_gate_raises_on_dirty(spark, dirty):
    clean = spark.createDataFrame(
        [(1, "x", 5.0, "AB-1"), (2, "y", 6.0, "CD-2")],
        "a int, b string, v double, code string",
    )
    res = assert_expectations(clean, SUITE)
    assert all(r["passed"] for r in res.collect())
    with pytest.raises(ValueError, match=r"not_null\(a\): 1"):
        assert_expectations(dirty, SUITE)


def test_row_level_suite_is_one_aggregation_pass(spark, dirty):
    """However many row-level constraints, the plan must hold exactly
    ONE aggregate over the input (plus the per-unique groupBys)."""
    row_only = [e for e in SUITE if e[0] != "unique"]
    plan = (
        run_expectations(dirty, row_only)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("Aggregate") == 1, plan


def test_catalog_twin_hash_parity(spark):
    from lakehouse_adventureworks2022_spark.plans.catalog import ORACLES
    from lakehouse_adventureworks2022_spark.plans.relational import (
        dq_expectations_orders,
    )
    from tools.check_oracles import TABLES, canonical_hash, normalize_pandas

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
            )
        s = normalize_pandas(dq_expectations_orders(spark, sf).toPandas())
        d = normalize_pandas(
            con.sql(ORACLES["dq_expectations_orders"]).df()
        )
        con.close()
        assert canonical_hash(s) == canonical_hash(d)
        assert len(s) == 7 and s["passed"].all()
