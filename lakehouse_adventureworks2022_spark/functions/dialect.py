"""Scalar-function layer: the reference's Trino/MySQL-dialect functions
re-expressed as Catalyst built-ins (zero UDFs — SURVEY.md §2.8, §2.10).

The dialect traps handled here (SURVEY.md §7 "hard parts" 2-3):

- **ISO day-of-week**: Trino ``day_of_week`` is ISO (Mon=1…Sun=7,
  weekend={6,7} — reference ``create_dim_date.sql:38``) while Spark's
  ``dayofweek`` is Sun=1…Sat=7. :func:`iso_day_of_week` uses
  ``weekday()+1`` to preserve the reference's semantics.
- **Date-format patterns**: the reference uses MySQL-style ``%B/%b/%A/%a``
  (``create_dim_date.sql:31-37``); Spark uses JDK patterns
  ``MMMM/MMM/EEEE/EEE`` — translated at the call sites in ``plans/dims.py``.
- **Money/decimal fidelity**: the reference downcasts money to REAL
  (``dim_product.sql:19-20``); our aggregates keep doubles and apply an
  explicit rounding policy (:func:`money`) so cross-engine hash comparison
  is stable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def date_key(col: Column) -> Column:
    """Integer yyyyMMdd surrogate date key.

    Reference: ``date_format(c,'yyyyMMdd').cast('int')`` for
    orderdatekey/duedatekey/shipdatekey (``dags/sales.py:92-94``) and
    dim_date's ``CAST(date_format(d,'%Y%m%d') AS INT)``
    (``create_dim_date.sql:26``).
    """
    return F.date_format(col, "yyyyMMdd").cast("int")


def iso_day_of_week(col: Column) -> Column:
    """ISO day-of-week: Mon=1 … Sun=7 (Trino ``day_of_week`` semantics,
    reference ``create_dim_date.sql:35,38``)."""
    return (F.weekday(col) + F.lit(1)).cast("int")


def fiscal_year(date_col: Column) -> Column:
    """Fiscal year starting July 1 (reference ``create_dim_date.sql:40-43``):
    Jul..Dec belong to the *next* fiscal year."""
    return (
        F.year(date_col) + F.when(F.month(date_col) >= 7, 1).otherwise(0)
    ).cast("int")


def fiscal_month(date_col: Column) -> Column:
    """Fiscal month 1..12 with July = 1 (July fiscal start)."""
    return (((F.month(date_col) + 5) % 12) + 1).cast("int")


def fiscal_quarter(date_col: Column) -> Column:
    """Fiscal quarter 1..4 with Jul-Sep = Q1 (reference
    ``create_dim_date.sql:44-54`` CASE buckets)."""
    return (F.floor(((F.month(date_col) + 5) % 12) / 3) + 1).cast("int")


def change_hash(*cols: Column | str) -> Column:
    """MD5 change-detection hash over N attributes.

    Reference F1: ``md5(concat_ws('|', coalesce(cast(c as string),'')))``
    over 21 tracked columns (``dags/product.py:182-186``). NULL-safe via
    coalesce-to-empty-string, pipe-separated, identical semantics.
    """
    parts = [
        F.coalesce(F.col(c).cast("string") if isinstance(c, str) else c.cast("string"), F.lit(""))
        for c in cols
    ]
    return F.md5(F.concat_ws("|", *parts))


def money(col: Column, scale: int = 4) -> Column:
    """Engine-wide rounding policy for monetary aggregates (HALF_UP to
    ``scale`` decimals, kept as double) — makes double-precision sums
    hash-identical across engines (SURVEY.md §7 hard part 2).

    Scale defaults to 4 because the fixture's monetary values are exact at
    ≤4 decimal places (price 2dp × discount 2dp), so the true sum is an
    exact 4dp decimal: rounding to 4dp recovers it deterministically in
    every engine, whereas rounding to 2dp can land exactly on a half-way
    boundary where accumulation-order noise flips the last digit (observed
    cross-engine on ~0.1% of 20k groups).
    """
    return F.round(col, scale)


def money_sum(expr: Column, scale: int = 4) -> Column:
    """Exact monetary SUM for coarse/unbounded groups: each double term
    converts to its nearest 6-dp decimal (deterministic and tie-free —
    fixture monetary products are exact at ≤6dp, so this recovers the
    true term), the decimals sum EXACTLY, and the result rounds to
    ``scale`` and returns as double.

    Why not ``money(F.sum(...))``: double accumulation error grows with
    group size — at sf0.1 a grand-total sum (~6e9 over 600k terms)
    drifts past the 4dp half-boundary and the rounded digit flips with
    accumulation order (observed cross-engine on rollup totals and
    TPC-H Q1). Decimal accumulation is order-independent at ANY data
    scale — the 100 TB-safe form for rollup/grand-total measures. SQL
    twin: ``CAST(ROUND(SUM(CAST(x AS DECIMAL(28,6))), s) AS DOUBLE)``.
    """
    return F.round(F.sum(expr.cast("decimal(28,6)")), scale).cast("double")
