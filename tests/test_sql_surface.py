"""SQL entry point parity: the Spark-SQL twins must produce exactly the
DataFrame catalog's results (the reference's Trino scripts re-target to
spark.sql with dialect translation only — SURVEY.md §3.3)."""

from __future__ import annotations

import pytest

from lakehouse_adventureworks2022_spark.plans.catalog import QUERIES
from lakehouse_adventureworks2022_spark.plans.sql_surface import SQL_CATALOG, run_sql


@pytest.mark.parametrize("name", sorted(SQL_CATALOG))
def test_sql_twin_equals_dataframe_version(spark, sf_dir, name):
    df_version = QUERIES[name](spark, sf_dir)
    sql_version = run_sql(spark, sf_dir, name)
    assert sql_version.columns == df_version.columns or sorted(
        sql_version.columns
    ) == sorted(df_version.columns)
    def canon(v):
        # NaN != NaN would fail set equality; stddev_samp over a 1-row
        # frame legitimately yields NaN in both surfaces
        return "NaN" if isinstance(v, float) and v != v else v

    a = {tuple(canon(v) for v in r) for r in df_version.collect()}
    b = {
        tuple(canon(r[c]) for c in df_version.columns)
        for r in sql_version.collect()
    }
    assert a == b
