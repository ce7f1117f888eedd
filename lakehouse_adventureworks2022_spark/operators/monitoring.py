"""Corpus monitoring operators: distribution drift between snapshots
(beyond-reference scope — the observability a training-data pipeline
runs between ingests to catch source mix shifts, truncation bugs, and
upstream regressions before they reach a training run).

Scale shape: drift profiles are per-source aggregations (low-cardinality
uniform key — one small shuffle per snapshot) joined on source; nothing
is quadratic and nothing depends on corpus order. The exact percentile
holds per-group values in the aggregation buffer — fine up to very large
groups; pass ``exact=False`` at 100 TB to switch to
``approx_percentile`` (t-digest, bounded memory) for the same columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakehouse_adventureworks2022_spark.operators.textops import tokens_col


def corpus_profile(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    exact: bool = True,
) -> DataFrame:
    """Per-source snapshot profile: doc count, corpus share, token-count
    mean and median — the summary a drift check compares."""
    toks = F.size(tokens_col(F.col(text_col))).cast("double")
    p50 = (
        F.percentile(toks, F.lit(0.5))
        if exact
        else F.percentile_approx(toks, F.lit(0.5))
    )
    prof = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(toks).alias("mean_tokens"),
        p50.cast("double").alias("p50_tokens"),
    )
    total = prof.agg(F.sum("n_docs").alias("__total__"))
    return prof.crossJoin(F.broadcast(total)).select(
        "source",
        "n_docs",
        (F.col("n_docs") / F.col("__total__")).alias("share"),
        "mean_tokens",
        "p50_tokens",
    )


def corpus_drift(
    a: DataFrame,
    b: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    exact: bool = True,
) -> DataFrame:
    """Per-source drift between snapshot ``a`` (before) and ``b``
    (after): count/share/mean/median deltas, full-outer so sources that
    appeared or vanished still surface (their missing side reads as 0
    docs / null token stats — a vanished source IS the signal).

    Output: one row per source —
    ``(source, n_docs_a, n_docs_b, share_a, share_b, share_delta,
    mean_tokens_a, mean_tokens_b, mean_tokens_delta, p50_tokens_a,
    p50_tokens_b, p50_tokens_delta)``.
    """
    pa = corpus_profile(a, text_col, source_col, exact)
    pb = corpus_profile(b, text_col, source_col, exact)
    ra = pa.select(
        "source",
        F.col("n_docs").alias("n_docs_a"),
        F.col("share").alias("share_a"),
        F.col("mean_tokens").alias("mean_tokens_a"),
        F.col("p50_tokens").alias("p50_tokens_a"),
    )
    rb = pb.select(
        "source",
        F.col("n_docs").alias("n_docs_b"),
        F.col("share").alias("share_b"),
        F.col("mean_tokens").alias("mean_tokens_b"),
        F.col("p50_tokens").alias("p50_tokens_b"),
    )
    joined = ra.join(rb, "source", "full_outer")
    zero = lambda c: F.coalesce(F.col(c), F.lit(0.0))  # noqa: E731
    return joined.select(
        "source",
        F.coalesce("n_docs_a", F.lit(0)).alias("n_docs_a"),
        F.coalesce("n_docs_b", F.lit(0)).alias("n_docs_b"),
        zero("share_a").alias("share_a"),
        zero("share_b").alias("share_b"),
        (zero("share_b") - zero("share_a")).alias("share_delta"),
        "mean_tokens_a",
        "mean_tokens_b",
        (F.col("mean_tokens_b") - F.col("mean_tokens_a")).alias(
            "mean_tokens_delta"
        ),
        "p50_tokens_a",
        "p50_tokens_b",
        (F.col("p50_tokens_b") - F.col("p50_tokens_a")).alias(
            "p50_tokens_delta"
        ),
    )
