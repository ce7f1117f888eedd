"""Edge semantics + plan shape for the advanced join operators and the
window-function suite (plans/advanced_joins.py, plans/windowed.py).

Fixture-level value correctness is covered by the DuckDB oracles
(tools/check_oracles.py); these tests pin the semantics the oracles can't
see (tie handling, band boundaries) and the physical plans at scale (no
cartesian products from the range join)."""

from __future__ import annotations

import pytest

import datetime

from pyspark.sql import functions as F

from lakehouse_adventureworks2022_spark.plans import advanced_joins, windowed


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


@pytest.mark.slow
def test_asof_tie_and_missing_semantics(spark, tmp_path):
    """A click at the purchase's exact timestamp IS attributed; among
    same-ts clicks the highest event_id wins; a purchase with no prior
    click keeps NULLs."""
    df = _events(
        spark,
        [
            # user 1: two clicks at the same ts as the purchase -> id 3 wins
            (2, _ts("2024-01-01 10:00:00"), 1, "click", 1.0, "{}"),
            (3, _ts("2024-01-01 10:00:00"), 1, "click", 1.0, "{}"),
            (4, _ts("2024-01-01 10:00:00"), 1, "purchase", 9.0, "{}"),
            # user 1: later click must not affect the earlier purchase
            (5, _ts("2024-01-01 11:00:00"), 1, "click", 1.0, "{}"),
            # user 2: purchase with no click at all
            (6, _ts("2024-01-02 00:00:00"), 2, "purchase", 5.0, "{}"),
        ],
    )
    out_dir = str(tmp_path / "events.parquet")
    df.write.parquet(out_dir)
    # point the query at a dir shaped like a fixture
    (tmp_path / "marker").write_text("")
    res = {
        r["purchase_id"]: r
        for r in advanced_joins.asof_click_attribution(spark, str(tmp_path)).collect()
    }
    assert res[4]["last_click_id"] == 3
    assert res[4]["seconds_since_click"] == 0
    assert res[6]["last_click_id"] is None
    assert res[6]["seconds_since_click"] is None


def test_band_join_boundaries_and_bucket_crossing(spark, tmp_path):
    """Exact-bound semantics: activity at err.ts counts, at err.ts-5min
    does not; activity in the previous time bucket is still found (the
    offset-explode must cover bucket crossings)."""
    err_t = _ts("2024-01-01 10:05:00")
    df = _events(
        spark,
        [
            (1, err_t, 7, "error", 0.0, "{}"),
            (2, err_t, 7, "view", 1.0, "{}"),  # at err.ts -> in
            (3, _ts("2024-01-01 10:00:00"), 7, "click", 2.0, "{}"),  # -5min -> OUT (strict >)
            (4, _ts("2024-01-01 10:00:01"), 7, "click", 4.0, "{}"),  # prev bucket -> in
            (5, _ts("2024-01-01 10:04:00"), 8, "view", 8.0, "{}"),  # other user -> out
        ],
    )
    df.write.parquet(str(tmp_path / "events.parquet"))
    rows = advanced_joins.error_burst_context(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert rows[0]["prior_activity_count"] == 2
    assert float(rows[0]["prior_activity_value"]) == 5.0


def test_band_join_plan_has_no_cartesian(spark, sf_dir):
    """The bucketed band join must ride an equi-shuffle — a naive theta
    join would plan BroadcastNestedLoopJoin/CartesianProduct."""
    plan = advanced_joins.error_burst_context(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_late_shipment_is_semi_join(spark, sf_dir):
    """EXISTS must not duplicate orders with several late lines: the count
    per priority equals distinct qualifying orders."""
    df = advanced_joins.late_shipment_priority(spark, sf_dir)
    total = df.agg(F.sum("late_order_count")).collect()[0][0]
    from lakehouse_adventureworks2022_spark.sources.readers import read_table

    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")
    expected = (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("o_orderkey")
        .distinct()
        .count()
    )
    assert total == expected


def test_running_revenue_first_order_has_null_gap(spark, sf_dir):
    df = windowed.customer_running_revenue(spark, sf_dir)
    firsts = df.filter(F.col("order_seq") == 1)
    assert firsts.filter(F.col("days_since_prev").isNotNull()).count() == 0
    # cum_spend of the first order equals that order's total (rounded)
    bad = firsts.filter(
        F.abs(F.col("cum_spend") - F.round(F.col("order_total"), 4)) > 1e-9
    )
    assert bad.count() == 0


def test_revenue_share_sums_to_one_per_year(spark, sf_dir):
    per_year = (
        windowed.priority_revenue_share(spark, sf_dir)
        .groupBy("order_year")
        .agg(F.sum("revenue_share").alias("s"))
        .collect()
    )
    assert per_year
    for r in per_year:
        assert abs(r["s"] - 1.0) < 1e-4


def test_nation_top_customers_rank_bounded(spark, sf_dir):
    rows = windowed.nation_top_customers(spark, sf_dir).collect()
    by_nation: dict[str, list] = {}
    for r in rows:
        by_nation.setdefault(r["nation_name"], []).append(r)
    for nation, members in by_nation.items():
        ranks = sorted(m["revenue_rank"] for m in members)
        assert ranks[0] == 1 and ranks[-1] <= 3
        revs = [m["revenue"] for m in sorted(members, key=lambda m: m["revenue_rank"])]
        assert revs == sorted(revs, reverse=True)


def test_asof_plans_single_shuffle(spark, sf_dir):
    """The as-of composition must cost exactly ONE hash exchange (on
    user_id) — the point of the union+window formulation."""
    plan = (
        advanced_joins.asof_click_attribution(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    exchanges = len(re.findall(r"Exchange hashpartitioning", plan))
    assert exchanges == 1, plan
