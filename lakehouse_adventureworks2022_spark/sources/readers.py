"""Source readers: parquet scans (the engine's batch sources) + the
generated date-spine source.

Reference parity (SURVEY.md §2.1):

- S1 full scan — the reference reads whole OLTP tables over JDBC
  (``dags/utils/extract_load_template.py:121-124``); our batch source is a
  parquet/Delta scan with Catalyst predicate pushdown and column pruning
  doing the same job declaratively.
- S2 incremental scan — watermark predicate pushed into the source; see
  ``sources/watermark.py``.
- S5 catalog scan — ``spark.table`` over saved tables (``storage/``).
- S6 generated sequence source — the 7,305-day date spine
  (``trino_scripts/create_dim_date.sql:55-58``) via
  ``explode(sequence(...))`` (:func:`date_spine`).

Scale notes: a parquet scan of a 100 TB table stays efficient because every
query in ``plans/`` selects explicit columns (column pruning reaches the
footer) and filters early (predicate/partition pruning). Nothing here ever
collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: All driver-fixture tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _ensure_session_confs(spark: SparkSession) -> None:
    """Runtime-settable confs every reader depends on.

    The driver may hand us a session built elsewhere, so set these
    defensively (they are SQL confs, settable per-session at runtime):

    - UTC session timezone — reference pins UTC
      (``extract_load_template.py:18``); required so timestamp→date/string
      derivations hash-match the (naive-UTC) DuckDB oracle.
    - ``nanosAsLong`` — the events fixture stores TIMESTAMP(NANOS), which
      Spark's vectorized parquet reader otherwise rejects.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table, normalizing physical quirks to engine types.

    The engine-facing contract is ``events.ts: timestamp`` (TIMESTAMP_LTZ,
    session TZ pinned UTC) regardless of how the fixture stores it; the
    physical encoding has drifted across fixture generations, so every
    known case is normalized HERE — downstream plans may rely on
    ``ts.cast("long")`` etc. being legal:

    - ``bigint`` — nanoseconds-since-epoch (read via ``nanosAsLong``);
      truncate to µs (``div 1000`` — integer division, no double
      rounding) to match µs-native engines (DuckDB, TimestampType).
    - ``timestamp_ntz`` — plain ``timestamp[us]`` parquet, which Spark 4
      reads as TIMESTAMP_NTZ; with the session TZ pinned UTC the
      NTZ→LTZ cast is value-preserving.
    - ``timestamp`` — already the engine type; pass through.

    ``tests/test_fixture_contract.py`` pins the post-read dtypes of every
    fixture table so the NEXT physical drift fails one readable test
    instead of scattering failures downstream.
    """
    _ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Scan several tables at once (lazy — no jobs run here)."""
    return {name: read_table(spark, sf_dir, name) for name in names}


def date_spine(
    spark: SparkSession,
    start: str = "2010-01-01",
    end: str = "2029-12-31",
) -> DataFrame:
    """Generated calendar source: one row per day, ``full_date`` column.

    Re-expresses the reference's Trino spine
    ``UNNEST(sequence(0, 7304)) → DATE '2010-01-01' + INTERVAL '1' DAY * n``
    (``create_dim_date.sql:55-58``) as Spark's native
    ``explode(sequence(start, end))`` — same 7,305 rows, no driver loop.

    The sequence is generated inside one task then exploded; for a spine
    this is < 10k rows so no repartition is needed at any scale.
    """
    _ensure_session_confs(spark)
    return spark.range(1).select(
        F.explode(
            F.sequence(
                F.to_date(F.lit(start)),
                F.to_date(F.lit(end)),
            )
        ).alias("full_date")
    )
