"""lakehouse_adventureworks2022_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-implementation of the query and
data-processing capabilities of the reference lakehouse
(racenak/lakehouse-adventureworks2022): medallion ELT (bronze/silver/gold/
mart), watermark-incremental ingestion, SCD Type 2 dimensions, a generated
date dimension, star-schema marts — plus large-scale training-data
operators (dedup, similarity search, text analysis, multimodal plumbing)
designed for 100 TB operation.

Everything is declarative DataFrame / Spark SQL so Catalyst + Tungsten pick
the physical plan; the only imperative code is the thin table-state layer
(watermarks, SCD2 merge) that the reference implemented by hand on Delta.
"""

__version__ = "0.1.0"

from lakehouse_adventureworks2022_spark.session import get_spark  # noqa: F401
