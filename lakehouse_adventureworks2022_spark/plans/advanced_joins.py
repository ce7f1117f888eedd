"""Advanced join shapes absent from the reference (SURVEY.md §2.4 notes
"theta/range/as-of joins ... not present"): supplied here as first-class,
scale-designed compositions of built-in DataFrame operators — no UDFs.

- :func:`asof_click_attribution` — **as-of join** (each purchase matched to
  the latest click by the same user at or before it) via the union +
  ``last(ignorenulls)`` running-window composition. One shuffle on
  ``user_id``, per-partition sort, O(n) state — the classic distributed
  as-of plan (vs. the naive inequality join which is quadratic).
- :func:`error_burst_context` — **banded range join** (events within a
  bounded time interval of each other) via time-bucket equi-keys: each
  probe row joins at most 2 bucket keys, so the range predicate rides an
  equi-shuffle; the exact bound is a post-join filter. No cross product at
  any scale.
- :func:`late_shipment_priority` — correlated **EXISTS** (TPC-H Q4 shape)
  as a left-semi join with a composite equi + theta condition.
- :func:`small_quantity_part_revenue` — correlated **aggregate subquery**
  (TPC-H Q17 shape) decorrelated into aggregate-then-join, the same
  rewrite Catalyst's decorrelation performs; the per-part average is
  aggregated BEFORE the join so the big fact joins a reduced build side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_adventureworks2022_spark.functions.dialect import money, money_sum
from lakehouse_adventureworks2022_spark.sources.readers import read_table


def asof_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase event, the latest click by the same user with
    ``click.ts <= purchase.ts`` (as-of backward join), plus the gap in
    seconds; purchases with no prior click keep NULLs (left as-of).

    Plan: filter to the two event kinds → single hash shuffle on
    ``user_id`` → per-partition sort on (ts, kind, event_id) → running
    ``last(ignorenulls)`` carries the most recent click forward. Ties:
    a click at the same timestamp as the purchase is visible (sorted
    first); among same-timestamp clicks the highest event_id wins.
    """
    events = read_table(spark, sf_dir, "events")
    tagged = events.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.when(F.col("event_type") == "click", F.col("event_id")).alias("click_id"),
        F.when(F.col("event_type") == "click", F.col("ts")).alias("click_ts"),
        F.when(F.col("event_type") == "purchase", F.lit(1)).otherwise(F.lit(0)).alias(
            "is_purchase"
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_purchase", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn("last_click_id", F.last("click_id", ignorenulls=True).over(w))
        .withColumn("last_click_ts", F.last("click_ts", ignorenulls=True).over(w))
        .filter(F.col("is_purchase") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
            "last_click_id",
            "last_click_ts",
            (F.col("ts").cast("long") - F.col("last_click_ts").cast("long")).alias(
                "seconds_since_click"
            ),
        )
    )


#: Band width for :func:`error_burst_context`.
_BURST_MINUTES = 5


def error_burst_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every ``error`` event with at least one click/view by the same
    user in the preceding 5 minutes, how much of that activity there was
    (banded range self-join). Errors with zero prior activity do not
    appear — the join is inner; oracle and property test encode this.

    Scale plan: both sides get a 5-minute bucket key; activity joins on
    (user, bucket) for bucket offsets {0, 1} — i.e. each activity row is
    duplicated twice, NOT once per band second — then the exact
    ``(err.ts - 5min) < act.ts <= err.ts`` bound filters post-join. The
    shuffle key (user_id, bucket) is fine-grained and skew-resistant; AQE
    splits residual hot buckets.
    """
    events = read_table(spark, sf_dir, "events")
    bucket = lambda c: (F.col(c).cast("long") / (60 * _BURST_MINUTES)).cast("long")  # noqa: E731
    errors = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id"),
        F.col("ts").alias("error_ts"),
        bucket("ts").alias("bucket"),
    )
    activity = (
        events.filter(F.col("event_type").isin("click", "view"))
        .select(
            F.col("user_id").alias("a_user_id"),
            F.col("ts").alias("a_ts"),
            F.col("value").alias("a_value"),
            bucket("ts").alias("a_bucket"),
        )
        # probe buckets: an activity row can serve errors in its own bucket
        # or the next one (band = one bucket width)
        .withColumn("probe", F.explode(F.array(F.col("a_bucket"), F.col("a_bucket") + 1)))
    )
    joined = errors.join(
        activity,
        (errors["user_id"] == activity["a_user_id"])
        & (errors["bucket"] == activity["probe"])
        & (activity["a_ts"] > errors["error_ts"] - F.expr(f"INTERVAL {_BURST_MINUTES} MINUTES"))
        & (activity["a_ts"] <= errors["error_ts"]),
        "inner",
    )
    return joined.groupBy("error_id", "user_id", "error_ts").agg(
        F.count(F.lit(1)).alias("prior_activity_count"),
        money(F.sum("a_value")).alias("prior_activity_value"),
    )


def late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders with at least one line shipped > 60 days after the order
    date, counted per priority (TPC-H Q4 shape: correlated EXISTS →
    left-semi join with equi + theta condition)."""
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")
    late = orders.join(
        lineitem,
        (orders["o_orderkey"] == lineitem["l_orderkey"])
        & (lineitem["l_shipdate"] > orders["o_orderdate"] + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy(F.col("o_orderpriority").alias("order_priority")).agg(
        F.count(F.lit(1)).alias("late_order_count")
    )


def small_quantity_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue locked in small orders: lines whose quantity is below half
    the part's average quantity, totalled per brand (TPC-H Q17 shape:
    correlated aggregate subquery, decorrelated to aggregate-then-join).

    Determinism note: ``l_quantity`` is integral in the fixtures, so
    ``avg = exact-integer-sum / count`` is the same IEEE double in every
    engine and the `<` threshold cannot straddle engines.
    """
    lineitem = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    half_avg = lineitem.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg_qty")
    )
    small = lineitem.join(
        half_avg, lineitem["l_partkey"] == half_avg["avg_partkey"], "inner"
    ).filter(F.col("l_quantity") < F.col("half_avg_qty"))
    return (
        small.join(F.broadcast(part), small["l_partkey"] == part["p_partkey"], "inner")
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            # brand-level totals are coarse → exact decimal accumulation
            money_sum(F.col("l_extendedprice")).alias("small_qty_revenue"),
            F.count(F.lit(1)).alias("small_qty_lines"),
        )
    )
