"""Additional file-format surface: CSV ingestion with corrupt-record
quarantine (the ``sources/jsonl.py`` contract over the other ubiquitous
interchange format) and ORC / zstd-parquet round-trips through the
managed-table layer.

Why these exist in a 100 TB engine:

- CSV is still how relational exports arrive; the PERMISSIVE +
  quarantine split is identical to JSONL's (one scan, two filters) and
  the parser handles quoting/multiline via Spark's native reader — a
  hand-rolled ``split(",")`` is the classic data-corruption bug.
- ORC is the other columnar format Spark ships natively;
  ``TableManager(fmt="orc")`` already works — the round-trip test here
  pins it so the claim isn't theoretical.
- zstd parquet: the modern storage default (better ratio than snappy at
  similar read speed) — at 100 TB the codec choice is a double-digit
  storage-cost lever. Exposed as a write option, pinned by test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_adventureworks2022_spark.sources.jsonl import DOCS_SCHEMA

_CORRUPT = "_corrupt_record"


def read_csv_corpus(
    spark: SparkSession,
    path: str,
    schema: str = DOCS_SCHEMA,
    header: bool = True,
    **reader_options: str,
) -> tuple[DataFrame, DataFrame]:
    """Read a CSV dump into ``(good, quarantine)`` — same contract and
    same single-scan split as ``read_jsonl_corpus``: rows that parse
    against ``schema`` land in ``good``; malformed rows (wrong arity,
    type mismatches, broken quoting) land in ``quarantine`` as the raw
    offending line."""
    raw = (
        spark.read.schema(f"{schema}, {_CORRUPT} string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .option("header", str(header).lower())
        .options(**reader_options)
        .csv(path)
        .cache()  # shared physical scan for both sides (SPARK-21610)
    )
    good = raw.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    quarantine = raw.filter(F.col(_CORRUPT).isNotNull()).select(
        F.col(_CORRUPT).alias("raw_line")
    )
    return good, quarantine


def write_parquet_zstd(
    df: DataFrame, path: str, level: int | None = None
) -> None:
    """Parquet with zstd compression (per-write option — the session
    default stays snappy so existing tables are unaffected)."""
    w = df.write.mode("overwrite").option("compression", "zstd")
    if level is not None:
        w = w.option("parquet.compression.codec.zstd.level", str(level))
    w.parquet(path)
