"""Declarative data-quality expectations — the Deequ / dbt-tests /
Great-Expectations analog: a constraint suite evaluated against a
DataFrame in as few jobs as the constraint types allow, returning one
tidy results table ``(expectation, column, violations, total, passed)``
a pipeline can gate on (compose with ``pipeline`` barriers or alert
from monitoring).

Supported constraints (each a tiny spec tuple, see :func:`expect_*`):

- ``not_null(col)`` / ``accepted_values(col, values)`` /
  ``in_range(col, lo, hi)`` / ``matches(col, regex)`` — ROW-level:
  ALL of these fold into ONE conditional-count aggregation pass over
  the frame, however many there are (the scan cost is paid once).
- ``unique(cols)`` — one groupBy on the key: violations = rows in
  groups with count > 1 (the PK check `quality.uniqueness_violations`
  runs row-wise; this reports the aggregate).
- ``row_count_between(lo, hi)`` — piggybacks on the row-level pass.

Foreign-key checks stay in ``operators/quality.fk_violations`` (they
need a second frame; compose the result rows manually if a suite
should include them).

Scale: row-level suite = one scan, zero shuffles; each ``unique``
adds one uniform-key aggregation. Nothing driver-side beyond the
|expectations|-row result.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_RESULT_COLS = ["expectation", "column", "violations", "total", "passed"]


def expect_not_null(col: str) -> tuple:
    return ("not_null", col, None)


def expect_accepted_values(col: str, values: list) -> tuple:
    return ("accepted_values", col, list(values))


def expect_in_range(col: str, lo, hi) -> tuple:
    return ("in_range", col, (lo, hi))


def expect_matches(col: str, regex: str) -> tuple:
    return ("matches", col, regex)


def expect_unique(cols: list | str) -> tuple:
    cols = [cols] if isinstance(cols, str) else list(cols)
    return ("unique", ",".join(cols), cols)


def expect_row_count_between(lo: int, hi: int) -> tuple:
    return ("row_count_between", "*", (int(lo), int(hi)))


def _violation_expr(kind: str, col: str, arg) -> Column:
    c = F.col(col)
    if kind == "not_null":
        return c.isNull()
    if kind == "accepted_values":
        # a NULL is not a value violation — not_null covers presence
        return c.isNotNull() & ~c.isin(*arg)
    if kind == "in_range":
        lo, hi = arg
        return c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi)))
    if kind == "matches":
        return c.isNotNull() & ~c.rlike(arg)
    raise ValueError(f"unknown row-level expectation: {kind}")


def run_expectations(df: DataFrame, expectations: list) -> DataFrame:
    """Evaluate the suite; returns the results frame sorted by
    (expectation, column) for deterministic comparison. Row-level
    checks share ONE aggregation; each ``unique`` adds one groupBy."""
    spark = df.sparkSession
    row_level = [e for e in expectations if e[0] not in ("unique",)]
    uniques = [e for e in expectations if e[0] == "unique"]

    pieces = []
    if row_level:
        aggs = [F.count(F.lit(1)).alias("__total__")]
        for i, (kind, col, arg) in enumerate(row_level):
            if kind == "row_count_between":
                continue  # needs only __total__
            aggs.append(
                F.sum(
                    F.when(_violation_expr(kind, col, arg), 1).otherwise(0)
                ).alias(f"__v{i}__")
            )
        row = df.agg(*aggs)
        sel = []
        for i, (kind, col, arg) in enumerate(row_level):
            if kind == "row_count_between":
                lo, hi = arg
                viol = F.when(
                    F.col("__total__").between(lo, hi), F.lit(0)
                ).otherwise(F.lit(1))
            else:
                viol = F.col(f"__v{i}__")
            sel.append(
                F.struct(
                    F.lit(kind).alias("expectation"),
                    F.lit(col).alias("column"),
                    viol.cast("long").alias("violations"),
                    F.col("__total__").cast("long").alias("total"),
                    (viol == 0).alias("passed"),
                ).alias(f"__e{i}__")
            )
        pieces.append(
            row.select(
                F.explode(F.array(*sel)).alias("r")
            ).select("r.*")
        )
    for kind, label, cols in uniques:
        dup = (
            df.groupBy(*cols)
            .agg(F.count(F.lit(1)).alias("__c__"))
            .agg(
                F.coalesce(
                    F.sum(F.when(F.col("__c__") > 1, F.col("__c__"))), F.lit(0)
                ).alias("violations"),
                F.coalesce(F.sum("__c__"), F.lit(0)).alias("total"),
            )
            .select(
                F.lit("unique").alias("expectation"),
                F.lit(label).alias("column"),
                F.col("violations").cast("long"),
                F.col("total").cast("long"),
                (F.col("violations") == 0).alias("passed"),
            )
        )
        pieces.append(dup)
    if not pieces:
        return spark.createDataFrame(
            [],
            "expectation string, column string, violations long, "
            "total long, passed boolean",
        )
    from functools import reduce

    out = reduce(lambda a, b: a.unionByName(b), pieces)
    return out.orderBy("expectation", "column")


def assert_expectations(df: DataFrame, expectations: list) -> DataFrame:
    """Gate form: raise ``ValueError`` naming every failed expectation
    (the fail-the-pipeline deployment mode); returns the results frame
    when everything passes."""
    results = run_expectations(df, expectations)
    failed = [
        f"{r['expectation']}({r['column']}): {r['violations']} violations"
        for r in results.collect()
        if not r["passed"]
    ]
    if failed:
        raise ValueError("expectations failed: " + "; ".join(failed))
    return results
