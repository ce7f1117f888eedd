"""Data-quality gates: declarative validation over tables — the
operational layer the reference runs implicitly via its count guards
(O3) and not at all for integrity (SURVEY.md §5 "no tests").

All checks are single-pass aggregates or anti joins (no collect; a
violations DataFrame is the result, so gates compose into pipelines and
scale like any other query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def null_profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One row per column: null count + null ratio (single scan — all
    counts computed in one aggregate, then unpivoted)."""
    cols = cols or df.columns
    agg = df.agg(
        F.count(F.lit(1)).alias("__n__"),
        *[
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nulls_{c}")
            for c in cols
        ],
    )
    stack_expr = ", ".join(f"'{c}', __nulls_{c}" for c in cols)
    return agg.selectExpr(
        "__n__", f"stack({len(cols)}, {stack_expr}) as (column_name, null_count)"
    ).select(
        "column_name",
        F.col("null_count").cast("bigint").alias("null_count"),
        (F.col("null_count") / F.col("__n__")).alias("null_ratio"),
    )


def fk_violations(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str
) -> DataFrame:
    """Referential-integrity check: child keys with no parent (left-anti
    join — one shuffle, or zero with co-bucketed tables)."""
    return (
        child.select(F.col(child_key).alias("orphan_key"))
        .distinct()
        .join(
            parent.select(F.col(parent_key).alias("__pk")),
            F.col("orphan_key") == F.col("__pk"),
            "left_anti",
        )
    )


def range_violations(
    df: DataFrame, col: str, lo: float | None = None, hi: float | None = None
) -> DataFrame:
    """Rows whose ``col`` falls outside [lo, hi] (either bound optional)."""
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (F.col(col) < lo)
    if hi is not None:
        cond = cond | (F.col(col) > hi)
    return df.filter(cond)


def uniqueness_violations(df: DataFrame, keys: list[str]) -> DataFrame:
    """Key groups appearing more than once (primary-key check)."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )
