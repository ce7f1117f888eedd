"""Metastore DDL surface (SURVEY.md §2.2 W7-W10): schemas, CTAS,
explicit-schema CREATE TABLE, and INSERT INTO ... SELECT executed as
``spark.sql`` statements against the *session catalog*, so tables are
addressable by name (``mart.business_top_products``) exactly as the
reference's Trino scripts address them through the Hive metastore.

Reference parity map:

- :meth:`CatalogDDL.create_medallion_schemas` ←
  ``trino_scripts/create_schema.sql:1-11`` (CREATE SCHEMA delta.bronze
  WITH (location = 's3a://lake/bronze') × bronze/silver/gold/mart);
- :meth:`CatalogDDL.ctas` ← ``trino_scripts/top_product.sql:1`` /
  ``business_sales_summary.sql:1`` (CREATE TABLE delta.mart.x AS SELECT);
- :meth:`CatalogDDL.create_table` ← ``trino_scripts/dim_product.sql:3-36``
  / ``create_dim_date.sql:1-22`` (explicit column DDL + LOCATION);
- :meth:`CatalogDDL.insert_into` ← ``create_dim_date.sql:24-58``
  (INSERT INTO ... SELECT over a generated spine).

Engine notes: this container runs the in-memory session catalog (no Hive
metastore service, no Delta jars), so ``USING PARQUET`` stands in for
``USING DELTA`` — on a cluster the same statements run unchanged against
``spark.sql.catalogImplementation=hive`` with Delta extensions (the
reference's ``spark-defaults.conf:9-12``). Catalog state is
session-scoped here; table *data* lands under each schema's LOCATION and
survives. All statements are plain SQL text: nothing below touches
DataFrames, proving the DDL path needs no engine code beyond Spark.

Scale: CTAS/INSERT execute as normal distributed writes (same writer as
TableManager); a partitioned CTAS carries ``PARTITIONED BY`` so pruning
works on the named table exactly as on path tables.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

MEDALLION_SCHEMAS = ("bronze", "silver", "gold", "mart")


def _q(ident: str) -> str:
    """Backtick-quote a (possibly dotted) identifier."""
    return ".".join(f"`{part}`" for part in ident.split("."))


class CatalogDDL:
    """Named-table DDL over a warehouse root directory."""

    def __init__(self, spark: SparkSession, root: str, fmt: str = "parquet"):
        self.spark = spark
        self.root = Path(root)
        self.fmt = fmt

    # ---- W10: CREATE SCHEMA ... LOCATION ----------------------------
    def create_medallion_schemas(self) -> None:
        """The four medallion layers, each with an explicit LOCATION
        (mirrors ``create_schema.sql:1-11``)."""
        for schema in MEDALLION_SCHEMAS:
            self.create_schema(schema)

    def create_schema(self, schema: str) -> None:
        loc = (self.root / schema).as_posix()
        self.spark.sql(
            f"CREATE SCHEMA IF NOT EXISTS {_q(schema)} LOCATION '{loc}'"
        )

    # ---- W8: CREATE TABLE with explicit schema ----------------------
    def create_table(
        self,
        table: str,
        columns_ddl: str,
        partition_by: list[str] | None = None,
        comment: str | None = None,
    ) -> None:
        """Explicit-column DDL (``dim_product.sql:3-36`` shape):
        ``columns_ddl`` is the parenthesized body, e.g.
        ``"date_key INT, full_date TIMESTAMP"``."""
        parts = [f"CREATE TABLE IF NOT EXISTS {_q(table)} ({columns_ddl})"]
        parts.append(f"USING {self.fmt.upper()}")
        if partition_by:
            parts.append(f"PARTITIONED BY ({', '.join(partition_by)})")
        if comment:
            parts.append(f"COMMENT '{comment}'")
        self.spark.sql(" ".join(parts))

    # ---- W7: CTAS ---------------------------------------------------
    def ctas(
        self,
        table: str,
        select_sql: str,
        partition_by: list[str] | None = None,
        replace: bool = True,
    ) -> None:
        """``CREATE TABLE mart.x AS SELECT ...``
        (``top_product.sql:1``, ``business_sales_summary.sql:1``).

        ``replace`` drops first: the v1 session catalog has no atomic
        ``CREATE OR REPLACE TABLE AS SELECT`` (a v2/Delta catalog does —
        swap the two statements for the one atomic form there).
        """
        if replace:
            self.spark.sql(f"DROP TABLE IF EXISTS {_q(table)}")
        part = (
            f"PARTITIONED BY ({', '.join(partition_by)}) " if partition_by else ""
        )
        self.spark.sql(
            f"CREATE TABLE {_q(table)} USING {self.fmt.upper()} {part}AS {select_sql}"
        )

    # ---- W9: INSERT INTO ... SELECT ---------------------------------
    def insert_into(self, table: str, select_sql: str, overwrite: bool = False) -> None:
        mode = "OVERWRITE" if overwrite else "INTO"
        self.spark.sql(f"INSERT {mode} {_q(table)} {select_sql}")

    # ---- reads / maintenance ----------------------------------------
    def table(self, table: str) -> DataFrame:
        return self.spark.table(_q(table))

    def tables_in(self, schema: str) -> list[str]:
        # temp views are session-global and show up under every schema;
        # this surface is about the persistent catalog
        return [
            t.name
            for t in self.spark.catalog.listTables(schema)
            if t.tableType != "TEMPORARY"
        ]

    def drop_schema(self, schema: str) -> None:
        self.spark.sql(f"DROP SCHEMA IF EXISTS {_q(schema)} CASCADE")


#: Spark-SQL mart DDL, dialect-translated from the Trino scripts with the
#: corrected measures (SURVEY.md §2.5 quirks: per-row SUM(x*y), COUNT of
#: the key not of a boolean) — same aliases as plans/marts.py so the
#: named tables are drop-in replacements for the path tables.
MART_TOP_PRODUCTS_SQL = """
    SELECT p.p_partkey, p.p_name, p.p_brand,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS total_revenue,
           ROUND(SUM(l.l_quantity), 4) AS total_qty,
           COUNT(DISTINCT l.l_orderkey) AS order_count
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_partkey, p.p_name, p.p_brand
    ORDER BY total_revenue DESC, p.p_partkey ASC
    LIMIT 10
"""

DIM_DATE_COLUMNS_DDL = """
    date_key INT, full_date TIMESTAMP, year INT, quarter INT, month INT,
    month_name STRING, month_abbr STRING, day_of_month INT, day_of_year INT,
    week_of_year INT, day_of_week INT, day_name STRING, day_abbr STRING,
    is_weekend BOOLEAN, fiscal_year INT, fiscal_quarter INT, fiscal_month INT
"""


def build_marts_ddl(spark: SparkSession, sf_dir: str, root: str) -> CatalogDDL:
    """Run the reference's Trino DDL flow end-to-end on Spark SQL:
    schemas → explicit-DDL dim_date + INSERT ... SELECT → CTAS marts.
    Returns the CatalogDDL handle for reads/assertions."""
    from lakehouse_adventureworks2022_spark.plans.sql_surface import (
        SQL_CATALOG,
        register_views,
    )

    ddl = CatalogDDL(spark, root)
    register_views(spark, sf_dir)
    ddl.create_medallion_schemas()

    # W8 + W9: dim_date as declared DDL + INSERT INTO ... SELECT over the
    # generated spine (create_dim_date.sql:1-58)
    ddl.create_table("gold.dim_date", DIM_DATE_COLUMNS_DDL)
    if not ddl.table("gold.dim_date").head(1):
        ddl.insert_into("gold.dim_date", SQL_CATALOG["dim_date"])

    # W7: CTAS marts (top_product.sql, business_sales_summary.sql)
    ddl.ctas("mart.business_top_products", MART_TOP_PRODUCTS_SQL)
    ddl.ctas("mart.business_sales_summary", SQL_CATALOG["sales_summary"])
    return ddl
