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


def accepted_values_violations(
    df: DataFrame, col: str, allowed: list[str]
) -> DataFrame:
    """Rows whose ``col`` holds a value outside the accepted set (the
    dbt-style accepted_values test). NULL is reported too — use
    ``null_profile`` to budget nulls separately, then allow them here by
    including None in ``allowed``."""
    allow_null = any(v is None for v in allowed)
    vals = [v for v in allowed if v is not None]
    cond = ~F.col(col).isin(*vals) if vals else F.lit(True)
    if allow_null:
        cond = cond & F.col(col).isNotNull()
    else:
        cond = cond | F.col(col).isNull()
    return df.filter(cond)


def freshness_check(
    df: DataFrame, ts_col: str, max_age: str, now: str | None = None
) -> DataFrame:
    """One-row freshness gate: is the latest ``ts_col`` within the age
    budget? ``max_age`` is an INTERVAL body (e.g. ``'2 hours'``).

    Single global-max aggregate — the same one-row shape as the
    watermark read, no collect. ``now`` (an ISO timestamp string) pins
    the reference clock for deterministic tests; defaults to
    ``current_timestamp()``.
    """
    now_col = (
        F.to_timestamp(F.lit(now)) if now is not None else F.current_timestamp()
    )
    return df.agg(F.max(ts_col).alias("latest_ts")).select(
        "latest_ts",
        now_col.alias("checked_at"),
        (F.col("latest_ts") >= now_col - F.expr(f"INTERVAL {max_age}")).alias(
            "is_fresh"
        ),
        (
            F.unix_timestamp(now_col) - F.unix_timestamp(F.col("latest_ts"))
        ).alias("age_seconds"),
    )
