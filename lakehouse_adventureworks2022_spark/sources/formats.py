"""Interchange formats: typed CSV / JSON / ORC (+ parquet) read/write
with schema enforcement — the "every source format a user actually
shows up with" layer (S1 breadth beyond the reference's JDBC+parquet:
``spark/conf/spark-defaults.conf`` ships only parquet/delta paths, but
a real migration lands CSV exports and JSON event dumps on day one).

Design rules, each encoding a production failure mode:

- **Schema is explicit for text formats.** CSV and JSON carry no types;
  Spark's inference samples the data and guesses — which silently turns
  an all-null column into STRING, a zip code into INT, a timestamp
  column into STRING on one dump and TIMESTAMP on the next.
  :func:`read_interchange` therefore REQUIRES a schema for csv/json
  (pass ``infer=True`` to opt into inference loudly). ORC/parquet are
  self-describing — schema optional, but enforced when given.
- **Lossy round-trips refuse loudly.** CSV cannot represent
  arrays/maps/structs; writing the embeddings table to CSV silently
  stringifies it in vanilla Spark. :func:`write_interchange` raises
  ``UnsupportedOperationError`` instead (the honesty contract every
  engine stub keeps).
- **Corrupt rows are a dataset, not a side effect.** Text reads default
  to PERMISSIVE with a ``_corrupt_record`` rescue column the caller can
  route to a quarantine table; ``strict=True`` switches to FAILFAST for
  pipelines that must stop on bad bytes.
- **Session invariants apply**: UTC session timezone (same contract as
  ``readers.read_table``), so timestamp round-trips hash-match across
  engines and formats.

Scale: these are Spark's native vectorized sources — the format choice
changes bytes and parse cost, never the plan shape; a 100 TB CSV ingest
parallelizes per file split exactly like parquet (minus footer pruning,
which is the documented cost of text formats — land them into parquet
via ``TableManager`` as the first hop, which is what the round-trip
tests pin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: Formats this layer speaks. TableManager(fmt=...) accepts the binary
#: two for full table management; csv/json are interchange-only (no
#: partitioned-overwrite semantics worth pretending at).
INTERCHANGE_FORMATS = ("parquet", "orc", "json", "csv")

#: Spark's rescue column name for malformed text rows.
CORRUPT_COL = "_corrupt_record"

_CSV_DEFAULTS = {
    "header": "true",
    # ISO-8601 with microseconds: round-trips the engine's µs
    # timestamps exactly (the default pattern drops sub-seconds)
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    "nullValue": "\\N",  # distinguish NULL from empty string
    "escape": '"',
}
_JSON_DEFAULTS = {
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
}


class UnsupportedOperationError(RuntimeError):
    """A format cannot represent the data faithfully — refuse, never
    silently coerce."""


def _complex_cols(schema: T.StructType) -> list[str]:
    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]


def _check(fmt: str) -> None:
    if fmt not in INTERCHANGE_FORMATS:
        raise ValueError(
            f"unknown interchange format {fmt!r}; "
            f"supported: {INTERCHANGE_FORMATS}"
        )


def write_interchange(
    df: DataFrame, path: str, fmt: str, mode: str = "overwrite", **options
) -> None:
    """Write ``df`` at ``path`` in ``fmt``. CSV refuses complex columns
    (arrays/maps/structs do not round-trip — export them as JSON or a
    binary format instead of silently stringifying)."""
    _check(fmt)
    if fmt == "csv":
        bad = _complex_cols(df.schema)
        if bad:
            raise UnsupportedOperationError(
                f"CSV cannot faithfully round-trip complex columns {bad}; "
                f"use fmt='json' / 'orc' / 'parquet'"
            )
        options = {**_CSV_DEFAULTS, **options}
    elif fmt == "json":
        options = {**_JSON_DEFAULTS, **options}
    df.write.format(fmt).mode(mode).options(**options).save(path)


def read_interchange(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: T.StructType | str | None = None,
    infer: bool = False,
    strict: bool = False,
    **options,
) -> DataFrame:
    """Typed read of ``path`` in ``fmt``.

    - csv/json: ``schema`` REQUIRED unless ``infer=True`` (loud opt-in
      to sampling inference). PERMISSIVE by default with a
      ``_corrupt_record`` rescue column appended to the schema so bad
      rows surface as data (route them to quarantine); ``strict=True``
      = FAILFAST.
    - orc/parquet: self-describing; a supplied ``schema`` is enforced
      (mismatches fail at analysis instead of producing nulls
      downstream).
    """
    _check(fmt)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    text = fmt in ("csv", "json")
    if text and schema is None and not infer:
        raise ValueError(
            f"{fmt} carries no types: pass schema=... (or infer=True to "
            f"accept sampling inference, which can differ between dumps)"
        )
    if fmt == "csv":
        options = {**_CSV_DEFAULTS, **options}
    elif fmt == "json":
        options = {**_JSON_DEFAULTS, **options}
    r = spark.read.format(fmt).options(**options)
    rescue = False
    if schema is not None:
        if isinstance(schema, str):
            schema = T.StructType.fromDDL(schema)
        if text and not strict:
            # rescue column must be IN the schema for PERMISSIVE mode to
            # populate it (Spark contract). Build a COPY — StructType.add
            # mutates the receiver, and the schema object belongs to the
            # caller (often another DataFrame's cached .schema).
            if CORRUPT_COL not in [f.name for f in schema.fields]:
                schema = T.StructType(
                    list(schema.fields)
                    + [T.StructField(CORRUPT_COL, T.StringType())]
                )
            rescue = True
            r = r.option("mode", "PERMISSIVE").option(
                "columnNameOfCorruptRecord", CORRUPT_COL
            )
        elif text:
            r = r.option("mode", "FAILFAST")
        r = r.schema(schema)
    df = r.load(path)
    if rescue:
        # callers get clean columns; quarantine rows via
        # corrupt_records() before this projection if needed
        return df
    return df


def corrupt_records(df: DataFrame) -> DataFrame:
    """The quarantine split of a PERMISSIVE text read: rows whose raw
    bytes failed the schema (``_corrupt_record`` non-null).

    Spark disallows queries over raw text files that reference ONLY the
    corrupt-record column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_
    RECORD_COLUMN) — the parsed frame must be materialized first. The
    split therefore persists the input for the duration of the plan
    under the engine's cache-ownership contract: release with
    ``dedup.release_cached_inputs(result)`` after writing the
    quarantine table (GC as last resort) — same lifecycle as every
    other cache-carrying operator."""
    from lakehouse_adventureworks2022_spark.operators.dedup import (
        _attach_cached_input,
    )

    if CORRUPT_COL not in df.columns:
        raise ValueError(
            f"no {CORRUPT_COL} column — read with read_interchange("
            f"strict=False) to capture malformed rows"
        )
    df = df.persist()
    return _attach_cached_input(df.filter(df[CORRUPT_COL].isNotNull()), df)


def clean_records(df: DataFrame) -> DataFrame:
    """The complement of :func:`corrupt_records`, with the rescue
    column dropped — the frame downstream operators should see.

    Same Spark raw-text restriction (and the same persist + ownership
    contract) as :func:`corrupt_records`: a pruned plan over the clean
    split can reference only the corrupt column, which Spark refuses on
    unmaterialized text scans. ``persist()`` on an already-persisted
    frame is a no-op, so calling both splits costs one cache entry."""
    from lakehouse_adventureworks2022_spark.operators.dedup import (
        _attach_cached_input,
    )

    if CORRUPT_COL not in df.columns:
        return df
    df = df.persist()
    return _attach_cached_input(
        df.filter(df[CORRUPT_COL].isNull()).drop(CORRUPT_COL), df
    )


__all__ = [
    "CORRUPT_COL",
    "INTERCHANGE_FORMATS",
    "UnsupportedOperationError",
    "clean_records",
    "corrupt_records",
    "read_interchange",
    "write_interchange",
]
