"""Mergeable distinct-count sketches (Apache DataSketches HLL, built
into Spark ≥3.5): the incremental form of the marts' COUNT(DISTINCT).

Why this matters at 100 TB: an exact distinct count cannot be rolled up
from pre-aggregates (distinct is not summable), so every mart refresh
re-scans history. A per-partition HLL **sketch column is mergeable** —
store one sketch per (day, group), then any rollup (week, month, all
time, any group subset) is ``hll_union_agg`` over the stored sketches:
the daily job reads ONLY its day, the rollup reads only kilobyte
sketches. Error ~2% at the default lgk=12, tested against exact counts.

This is the proper scale path behind ``top_products_approx``'s
query-time ``approx_count_distinct`` — same estimator family, but
persisted and incrementally maintainable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_sketches(
    df: DataFrame, keys: list[str], value_col: str, lgk: int = 12
) -> DataFrame:
    """One HLL sketch of ``value_col`` per key group (binary column —
    write it to the mart like any other column)."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias("distinct_sketch"),
        F.count(F.lit(1)).alias("row_count"),
    )


def merge_distinct(
    sketches: DataFrame, keys: list[str] | None = None
) -> DataFrame:
    """Roll stored sketches up to ``keys`` (None ⇒ grand total):
    union-merge then estimate — never re-reads the base table."""
    agg = [
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col("distinct_sketch"))
        ).alias("distinct_estimate"),
        F.sum("row_count").alias("row_count"),
    ]
    if keys:
        return sketches.groupBy(*keys).agg(*agg)
    return sketches.agg(*agg)
