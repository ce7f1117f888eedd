"""Metastore DDL surface (W7-W10): CREATE SCHEMA / explicit DDL +
INSERT / CTAS through spark.sql over the session catalog, asserting
catalog visibility and equality with the DataFrame-built tables."""

from __future__ import annotations

import pytest

from lakehouse_adventureworks2022_spark.plans import dims, marts
from lakehouse_adventureworks2022_spark.storage.ddl import (
    MEDALLION_SCHEMAS,
    build_marts_ddl,
)


@pytest.fixture(scope="module")
def ddl(spark, sf_dir, tmp_path_factory):
    root = tmp_path_factory.mktemp("ddl_warehouse")
    handle = build_marts_ddl(spark, sf_dir, str(root))
    yield handle
    for schema in MEDALLION_SCHEMAS:
        handle.drop_schema(schema)


def test_schemas_visible_in_catalog(ddl, spark):
    dbs = {d.name for d in spark.catalog.listDatabases()}
    assert set(MEDALLION_SCHEMAS) <= dbs


def test_ctas_mart_visible_and_equal_to_dataframe_build(ddl, spark, sf_dir):
    assert "business_top_products" in ddl.tables_in("mart")
    got = [tuple(r) for r in ddl.table("mart.business_top_products").collect()]
    want = [tuple(r) for r in marts.top_products(spark, sf_dir).collect()]
    assert sorted(got) == sorted(want) and len(want) == 10


def test_insert_select_dim_date_equals_generator(ddl, spark):
    named = ddl.table("gold.dim_date")
    built = dims.build_dim_date(spark)
    assert named.columns == built.columns
    assert named.count() == built.count() == 7305
    a = {tuple(r) for r in named.collect()}
    b = {tuple(r) for r in built.collect()}
    assert a == b


def test_ctas_sales_summary_rowcount_matches(ddl, spark, sf_dir):
    assert ddl.table("mart.business_sales_summary").count() == (
        marts.sales_summary(spark, sf_dir).count()
    )


def test_ctas_replace_is_idempotent(ddl, spark):
    from lakehouse_adventureworks2022_spark.storage.ddl import (
        MART_TOP_PRODUCTS_SQL,
    )

    before = ddl.table("mart.business_top_products").count()
    ddl.ctas("mart.business_top_products", MART_TOP_PRODUCTS_SQL)
    assert ddl.table("mart.business_top_products").count() == before
