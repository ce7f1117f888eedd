"""JDBC-shaped source: the reference's extraction path (S1/S2,
``dags/utils/extract_load_template.py:20-100``) as a typed interface.

The reference builds SQL strings by hand — inlining the watermark
predicate into a subquery so SQL Server evaluates it
(``extract_load_template.py:126-159``) — and reads through a single JDBC
cursor. This interface keeps the same *capability* but lets Catalyst do
the pushdown: ``spark.read.jdbc(...).filter(...)`` ships the WHERE clause
to the source automatically, and ``partition_column/num_partitions``
parallelize the cursor (the reference's single-partition read is its
extraction bottleneck — SURVEY.md §3.2).

No database exists in this container, so ``read_full``/``read_incremental``
are exercised against any DataFrame-producing ``reader`` callable in
tests (the predicate/config logic is engine code; the JDBC transport is
Spark's). On a real cluster, construct with the driver-class defaults and
go.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from lakehouse_adventureworks2022_spark.sources.watermark import (
    Watermark,
    incremental_filter,
)


@dataclass
class JdbcSourceConfig:
    """Connection + parallelism settings (credentials via options, not
    inline strings — fixes SURVEY.md §4.6)."""

    url: str
    table: str
    options: dict[str, str] = field(default_factory=dict)
    partition_column: str | None = None
    num_partitions: int = 8
    fetch_size: int = 10_000


class JdbcSource:
    def __init__(self, spark: SparkSession, config: JdbcSourceConfig):
        self.spark = spark
        self.config = config

    def _bounds(self) -> tuple | None:
        """One MIN/MAX roundtrip for the partition-column bounds Spark's
        partitioned JDBC read requires (r9 — the live-Derby integration
        test exposed that setting partitionColumn without lower/upper
        bounds is rejected by Spark; the mocked-reader tests could not
        see it). Returns None for an empty table (fall back to a single
        cursor)."""
        pc = self.config.partition_column
        # identifier quoting is dialect-specific AND depends on how the
        # table was created (Spark's JDBC writer quotes column names, so
        # a case-folding database like Derby stores them case-SENSITIVE
        # lowercase — unquoted MIN(col) then fails to resolve). Try the
        # unquoted form first (matches hand-created tables), fall back
        # to ANSI double quotes (matches Spark-written tables).
        last_err: Exception | None = None
        for col in (pc, f'"{pc}"'):
            q = (
                self.spark.read.format("jdbc")
                .option("url", self.config.url)
                .option(
                    "query",
                    f"SELECT MIN({col}) AS mn, MAX({col}) AS mx "
                    f"FROM {self.config.table}",
                )
            )
            for k, v in self.config.options.items():
                q = q.option(k, v)
            try:
                row = q.load().first()
            except Exception as e:  # noqa: BLE001 - dialect probe
                last_err = e
                continue
            # positional access: case-folding dialects may return the
            # unquoted aliases upper-cased (Derby: mn -> MN)
            if row is None or row[0] is None:
                return None
            return row[0], row[1]
        raise last_err

    def _reader(self):
        r = (
            self.spark.read.format("jdbc")
            .option("url", self.config.url)
            .option("dbtable", self.config.table)
            .option("fetchsize", str(self.config.fetch_size))
        )
        for k, v in self.config.options.items():
            r = r.option(k, v)
        if self.config.partition_column:
            # parallel cursors instead of the reference's
            # single-partition read; bounds from one MIN/MAX roundtrip
            bounds = self._bounds()
            if bounds is not None:
                r = (
                    r.option("partitionColumn", self.config.partition_column)
                    .option("lowerBound", str(bounds[0]))
                    .option("upperBound", str(bounds[1]))
                    .option("numPartitions", str(self.config.num_partitions))
                )
        return r

    def read_full(self) -> DataFrame:
        """S1: full snapshot scan."""
        return self._reader().load()

    def read_incremental(
        self, event_col: str, wm: Watermark | None, ms_precision: bool = True
    ) -> DataFrame:
        """S2+S3: watermark-filtered scan; the filter is declarative and
        Catalyst pushes it into the remote query (no string building).
        ``ms_precision`` applies the DATETIME2(3) truncation rule."""
        return incremental_filter(
            self.read_full(), event_col, wm, truncate_to_ms=ms_precision
        )


def apply_incremental(
    source_df: DataFrame, event_col: str, wm: Watermark | None, ms_precision: bool
) -> DataFrame:
    """Transport-independent core of :meth:`JdbcSource.read_incremental`
    (testable against any DataFrame source)."""
    return incremental_filter(source_df, event_col, wm, truncate_to_ms=ms_precision)


def jdbc_pushdown_predicate(event_col: str, wm: Watermark | None) -> str | None:
    """The WHERE clause the reference inlined by hand
    (``extract_load_template.py:158``) — exposed for engines/tests that
    need the literal predicate (e.g. ``dbtable`` subquery pushdown for
    sources whose JDBC dialect defeats filter pushdown)."""
    if wm is None or wm.last_event_time is None:
        return None
    from lakehouse_adventureworks2022_spark.sources.watermark import (
        normalize_event_time,
    )

    ts = normalize_event_time(wm.last_event_time)
    return f"{event_col} > CAST('{ts}' AS TIMESTAMP)"


__all__ = [
    "JdbcSource",
    "JdbcSourceConfig",
    "apply_incremental",
    "jdbc_pushdown_predicate",
]
