"""JSONL corpus source/sink: how raw training text actually arrives
(newline-delimited JSON dumps from crawlers/exports) and how trainers
consume it — with the malformed-record handling a 100 TB ingest needs
(a raw dump ALWAYS contains broken lines; dropping them silently skews
the corpus, failing the job on one bad line is worse).

Scale shape: the JSON reader is Spark's native line-splittable text
source (parallel at file-split granularity, no gzip-single-stream trap
as long as dumps are chunked); quarantining is one filter each way off
the same scan — no extra pass. The writer shards by uniform hash so
every output file lands ~equal row counts for loader striping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Default corpus schema for JSONL document dumps.
DOCS_SCHEMA = "doc_id long, text string, lang string, source string"

_CORRUPT = "_corrupt_record"


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: str = DOCS_SCHEMA,
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL dump into ``(good, quarantine)``.

    ``good`` carries exactly ``schema``'s columns for rows that parsed;
    ``quarantine`` carries the raw offending line (plus nothing else —
    the line IS the diagnostic) for rows that did not: malformed JSON,
    or type mismatches against the schema. PERMISSIVE mode keeps the
    scan going; the split is two filters off one scan.

    The quarantine frame is the audit trail: a production ingest writes
    it next to the landed table and alerts on its growth rate (a
    quarantine spike means the producer changed format — the earlier
    the catch, the less corpus to re-ingest).
    """
    raw = (
        spark.read.schema(f"{schema}, {_CORRUPT} string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
        # Spark disallows queries referencing ONLY the internal corrupt
        # column against the raw file relation (SPARK-21610) — the
        # documented pattern is to cache the parsed scan, which also
        # means good+quarantine share one physical read. LRU-evicted;
        # an ingest materializes both sides immediately anyway.
        .cache()
    )
    # PERMISSIVE quirk: a corrupt row still materializes nulls for the
    # data columns, and a VALID row has _corrupt_record null — the flag
    # column is the only reliable discriminator.
    good = raw.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    quarantine = raw.filter(F.col(_CORRUPT).isNotNull()).select(
        F.col(_CORRUPT).alias("raw_line")
    )
    return good, quarantine


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_col: str = "doc_id",
) -> None:
    """Write a corpus as ``n_shards`` JSONL shard DIRECTORIES
    (``shard=0..n-1``) with ~equal row counts (uniform hash of
    ``key_col`` → one shuffle), the striped layout training data
    loaders consume. Deterministic: a rewrite assigns every row to the
    same shard (pure function of the key — NOT of partitioning).

    Shard balance is hash-uniform (±CLT noise) — token-budget-exact
    grouping is :func:`~lakehouse_adventureworks2022_spark.operators.
    curation.pack_documents`'s job upstream of this writer.
    """
    shard = F.pmod(F.xxhash64(key_col), F.lit(n_shards)).cast("int")
    (
        df.withColumn("shard", shard)
        .repartition(n_shards, "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .json(path)
    )
