"""Streaming corpus ingestion: the Structured-Streaming member of the
corpus-cleaning family (``operators/dedup.clean_corpus`` is the batch
composite) — documents arrive as a stream, pass the SAME quality gate
(``textops.token_stats`` thresholds, stateless projection), and exact
duplicates within the watermark horizon are dropped on the normalized
content hash.

Semantics vs the batch composite: the quality gate is identical (pure
per-row expressions stream unchanged); dedup state is bounded by the
watermark (a duplicate arriving after the horizon passes — at 100 TB/day
unbounded exact-dedup state is not an option; the periodic batch
``clean_corpus`` over the landed table is the backstop, the standard
lambda split). Near-dup (MinHash) stays batch-only: LSH banding needs
corpus-level candidate joins that have no bounded-state streaming form.

Documents carry no event time, so ingestion time is stamped at the
source (``ingest_ts``) — watermarking on arrival time is the standard
choice for replay-dedup of an append-only feed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakehouse_adventureworks2022_spark.operators.textops import (
    QUALITY_MAX_PUNCT_RATIO,
    QUALITY_MIN_TOKENS,
    QUALITY_MIN_TTR,
    tokens_col,
)


def quality_gate(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The ``token_stats`` trainability gate as a streaming-safe filter
    (same threshold constants — one source of truth)."""
    toks = tokens_col(F.col(text_col))
    n_tokens = F.size(toks)
    ttr = F.size(F.array_distinct(toks)).cast("double") / n_tokens
    punct_ratio = (
        F.length(F.regexp_replace(F.col(text_col), r"[^.,;:!?]", "")).cast(
            "double"
        )
        / F.length(F.col(text_col))
    )
    return docs.filter(
        (n_tokens >= QUALITY_MIN_TOKENS)
        & (ttr > QUALITY_MIN_TTR)
        & (punct_ratio < QUALITY_MAX_PUNCT_RATIO)
    )


def content_hash_col(text_col: str = "text"):
    """Normalized content hash — same normalization as
    ``dedup.dedup_exact`` so stream and batch agree on what counts as a
    duplicate."""
    return F.md5(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    )


def stream_clean_corpus(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ingest_ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """quality gate → content-hash exact dedup within the watermark.

    ``docs`` must carry ``ts_col`` (stamp it at the source with
    ``current_timestamp()`` for arrival-time semantics). State is keyed
    on the 32-char hash and evicted at the horizon.
    """
    gated = quality_gate(docs, text_col)
    hashed = gated.withColumn("content_hash", content_hash_col(text_col))
    return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["content_hash"]
    )
