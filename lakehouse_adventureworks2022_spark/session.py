"""SparkSession factory with the engine's standard configuration.

Mirrors the reference's engine config surface
(``spark/conf/spark-defaults.conf`` in the reference repo: UTC session
timezone, Delta-on-object-store, FAIR scheduling) re-expressed for stock
PySpark:

- session timezone pinned to UTC (reference:
  ``dags/utils/extract_load_template.py:18``) — engine-wide so timestamp
  hashing/comparison is stable;
- AQE on (runtime re-plan, skew-join splitting, partition coalescing) —
  the 100 TB posture of SURVEY.md §4;
- ``spark.sql.legacy.parquet.nanosAsLong=true`` so nanosecond parquet
  timestamps (the ``events`` fixture) are readable; the readers convert
  ns→µs with truncation (see ``sources/readers.py``);
- Arrow enabled for any pandas-UDF operators (similarity/text paths).

On a real cluster the same builder accepts Delta/Iceberg catalog extensions
via ``extra_conf`` (jars are not available in this test container).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "lakehouse-aw2022-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    A single shared session per pipeline run — the reference wastefully
    created one session per Airflow task (``dags/product.py:53,66,76`` …);
    we keep one (SURVEY.md §2.11 O4).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # static conf — must be set at build; catalog tables (bucketing)
        # land here instead of polluting the cwd with spark-warehouse/
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get(
                "SPARK_WAREHOUSE_DIR",
                os.path.join(tempfile.gettempdir(), "spark-warehouse"),
            ),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
