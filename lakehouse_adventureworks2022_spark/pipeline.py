"""Medallion pipeline runner: bronze → silver → gold → mart as plain
sequential stages over one shared SparkSession (SURVEY.md §2.11 — the
library replacement for the reference's Airflow DAG fan-out/barriers O1-O2).

Stage semantics (fixtures standing in for the OLTP source, FIXTURES.md):

- **bronze**: watermark-incremental ingest of ``events`` (S2-S4) plus
  full snapshots of the star tables, each appended with ``ingestion_date``
  partitioning and metadata columns (W1/P6,
  ``extract_load_template.py:168-175``); the run-guard O3 (skip empty
  batches) checks the *written* batch, not a pre-write count — the
  reference's double-execution anti-pattern §4.1 is avoided by counting
  the cached batch once.
- **silver**: conformed geo dims (J1-J3 joins, P1 renames).
- **gold**: ``fact_sales`` written with ``replace_where`` on the
  ingestion partition (idempotent re-runs — fixes §4.4), SCD2
  ``dim_part`` via :func:`scd2_apply`, generated ``dim_date``.
- **mart**: sales summary + top products (CTAS W7 analog).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from lakehouse_adventureworks2022_spark.operators.scd2 import scd2_apply
from lakehouse_adventureworks2022_spark.plans import dims, facts, marts
from lakehouse_adventureworks2022_spark.sources.readers import read_table
from lakehouse_adventureworks2022_spark.sources.watermark import (
    WatermarkStore,
    compute_watermark,
    incremental_filter,
)
from lakehouse_adventureworks2022_spark.storage.tables import TableManager


@dataclass
class PipelineResult:
    ingested: dict[str, int] = field(default_factory=dict)


class MedallionPipeline:
    def __init__(self, spark: SparkSession, warehouse: str, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir
        self.tables = TableManager(spark, warehouse)
        self.watermarks = WatermarkStore(warehouse)

    # ---- bronze -----------------------------------------------------
    def ingest_events_incremental(self) -> int:
        """Watermark-incremental append of the events stream (S2-S4 + W1).

        Re-running with no new source rows appends nothing and leaves the
        watermark unchanged (the reference's intended-but-buggy
        idempotency property, SURVEY.md §5.5).
        """
        source = read_table(self.spark, self.sf_dir, "events")
        wm = self.watermarks.get("bronze.events")
        batch = incremental_filter(source, "ts", wm)
        batch = batch.withColumn(
            "ingestion_date", F.to_date(F.current_timestamp())
        ).withColumn("processed_at", F.current_timestamp())
        batch = batch.cache()
        n = batch.count()  # one count on the cached batch (O3 run guard)
        if n > 0:
            self.tables.append(batch, "bronze.events", partition_by="ingestion_date")
            self.watermarks.put(
                compute_watermark(batch, "bronze.events", "event_id", "ts")
            )
        batch.unpersist()
        return n

    def ingest_snapshots(self) -> dict[str, int]:
        counts = {}
        for name in ("lineitem", "orders", "customer", "nation", "region", "part"):
            df = read_table(self.spark, self.sf_dir, name).withColumn(
                "ingestion_date", F.to_date(F.current_timestamp())
            )
            self.tables.overwrite(df, f"bronze.{name}", partition_by="ingestion_date")
            counts[name] = -1  # no pre-write count: Delta log metrics at scale
        return counts

    # ---- silver -----------------------------------------------------
    def build_silver(self) -> None:
        self.tables.overwrite(
            dims.build_dim_customer_geo(self.spark, self.sf_dir), "silver.customer_geo"
        )
        self.tables.overwrite(
            dims.build_dim_supplier_geo(self.spark, self.sf_dir), "silver.supplier_geo"
        )

    # ---- gold -------------------------------------------------------
    def build_gold(self, effective_date: str = "2024-01-01") -> None:
        fact = facts.build_fact_sales(self.spark, self.sf_dir).withColumn(
            "ingestion_date", F.to_date(F.current_timestamp())
        )
        self.tables.replace_where(fact, "gold.fact_sales", "ingestion_date")
        self.tables.overwrite(dims.build_dim_date(self.spark), "gold.dim_date")

        batch = read_table(self.spark, self.sf_dir, "part").select(
            "p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"
        )
        tracked = ["p_name", "p_brand", "p_type", "p_size", "p_retailprice"]
        current = (
            self.tables.read("gold.dim_part")
            if self.tables.exists("gold.dim_part")
            else None
        )
        snapshot = scd2_apply(current, batch, "p_partkey", tracked, effective_date)
        self.tables.overwrite(snapshot, "gold.dim_part")

    # ---- mart -------------------------------------------------------
    def build_mart(self, via_sql_ddl: bool = False) -> None:
        """Path-table marts (default), optionally ALSO through the
        metastore DDL surface (W7/W10: CREATE SCHEMA + CTAS as spark.sql,
        the reference's Trino flow — ``storage/ddl.py``) so the marts are
        addressable by catalog name."""
        self.tables.overwrite(
            marts.sales_summary(self.spark, self.sf_dir), "mart.sales_summary"
        )
        self.tables.overwrite(
            marts.top_products(self.spark, self.sf_dir), "mart.top_products"
        )
        if via_sql_ddl:
            from lakehouse_adventureworks2022_spark.storage.ddl import (
                build_marts_ddl,
            )

            build_marts_ddl(self.spark, self.sf_dir, str(self.tables.root / "_catalog"))

    def run(self) -> PipelineResult:
        res = PipelineResult()
        res.ingested["events"] = self.ingest_events_incremental()
        self.ingest_snapshots()
        self.build_silver()
        self.build_gold()
        self.build_mart()
        return res


def main() -> None:
    """CLI: ``python -m lakehouse_adventureworks2022_spark.pipeline
    <warehouse_dir> [sf_dir]`` — run the full medallion pipeline."""
    import sys

    from lakehouse_adventureworks2022_spark.session import get_spark

    warehouse = sys.argv[1] if len(sys.argv) > 1 else "/tmp/lakehouse_warehouse"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = get_spark("medallion-pipeline")
    res = MedallionPipeline(spark, warehouse, sf_dir).run()
    print(f"pipeline complete: warehouse={warehouse} ingested={res.ingested}")
    spark.stop()


if __name__ == "__main__":
    main()
