"""Extra TPC-H-shaped queries vs DuckDB — same row/schema/hash
comparison the driver applies to the main catalog (these shapes sit
outside the full 50-slot oracle window)."""

from __future__ import annotations

import duckdb
import pytest

from lakehouse_adventureworks2022_spark.plans.tpch_extra import (
    EXTRA_ORACLES,
    EXTRA_QUERIES,
)
from tools.check_oracles import TABLES, canonical_hash, normalize_pandas

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    yield con
    con.close()


def test_every_extra_query_has_an_oracle():
    assert set(EXTRA_QUERIES) == set(EXTRA_ORACLES)


@pytest.mark.parametrize("name", sorted(EXTRA_QUERIES))
def test_extra_query_matches_oracle(spark, duck, name):
    df = EXTRA_QUERIES[name](spark, SF)
    spark_pdf = normalize_pandas(df.toPandas())
    duck_pdf = normalize_pandas(duck.sql(EXTRA_ORACLES[name]).df())
    assert canonical_hash(spark_pdf) == canonical_hash(duck_pdf)
    assert len(spark_pdf) > 0, f"{name} returned no rows — vacuous check"


def test_q19_disjunction_plans_equi_join_not_nested_loop(spark):
    plan = (
        EXTRA_QUERIES["tpch_q19_disjunctive"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
