"""Property-based as-of join check (hypothesis): for ANY event set, the
single-shuffle window composition must equal the naive quadratic
definition — "the latest click of the same user with click.ts <=
purchase.ts; highest event_id on timestamp ties"."""

from __future__ import annotations

import datetime

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lakehouse_adventureworks2022_spark.plans import advanced_joins

BASE = datetime.datetime(2024, 1, 1)

# events: (event_id unique by index, second offset 0..30, user 0..2, kind)
event_strategy = st.tuples(
    st.integers(min_value=0, max_value=30),
    st.integers(min_value=0, max_value=2),
    st.sampled_from(["click", "purchase"]),
)
events_strategy = st.lists(event_strategy, min_size=1, max_size=25)


def naive_asof(rows):
    """Quadratic reference: for each purchase scan all clicks."""
    out = {}
    for pid, pts, puser, pkind in rows:
        if pkind != "purchase":
            continue
        best = None
        for cid, cts, cuser, ckind in rows:
            if ckind != "click" or cuser != puser or cts > pts:
                continue
            if best is None or (cts, cid) > (best[1], best[0]):
                best = (cid, cts)
        out[pid] = best
    return out


@pytest.fixture(scope="module")
def sparkref(spark):
    return spark


@pytest.mark.slow
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=events_strategy)
def test_asof_equals_naive_quadratic(sparkref, tmp_path_factory, events):
    spark = sparkref
    rows = [
        (i, BASE + datetime.timedelta(seconds=sec), user, kind)
        for i, (sec, user, kind) in enumerate(events)
    ]
    df = spark.createDataFrame(
        [(i, ts, u, k, 1.0, "{}") for i, ts, u, k in rows],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    d = tmp_path_factory.mktemp("asof")
    df.write.mode("overwrite").parquet(str(d / "events.parquet"))
    got = {
        r["purchase_id"]: (r["last_click_id"], r["last_click_ts"])
        for r in advanced_joins.asof_click_attribution(spark, str(d)).collect()
    }
    want = naive_asof(rows)
    assert set(got) == set(want)
    for pid, best in want.items():
        if best is None:
            assert got[pid] == (None, None), pid
        else:
            assert got[pid] == (best[0], best[1]), pid


def naive_burst(rows):
    """Quadratic reference for the banded range join."""
    out = {}
    for eid, ets, euser, ekind in rows:
        if ekind != "error":
            continue
        hits = [
            1
            for aid, ats, auser, akind in rows
            if akind in ("click", "view")
            and auser == euser
            and ats <= ets
            and (ets - ats).total_seconds() < 300
        ]
        if hits:
            out[eid] = len(hits)
    return out


burst_event_strategy = st.tuples(
    st.integers(min_value=0, max_value=700),  # second offsets spanning buckets
    st.integers(min_value=0, max_value=2),
    st.sampled_from(["click", "view", "error"]),
)


@pytest.mark.slow
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=st.lists(burst_event_strategy, min_size=1, max_size=25))
def test_band_join_equals_naive_quadratic(sparkref, tmp_path_factory, events):
    spark = sparkref
    rows = [
        (i, BASE + datetime.timedelta(seconds=sec), user, kind)
        for i, (sec, user, kind) in enumerate(events)
    ]
    df = spark.createDataFrame(
        [(i, ts, u, k, 1.0, "{}") for i, ts, u, k in rows],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    d = tmp_path_factory.mktemp("burst")
    df.write.mode("overwrite").parquet(str(d / "events.parquet"))
    got = {
        r["error_id"]: r["prior_activity_count"]
        for r in advanced_joins.error_burst_context(spark, str(d)).collect()
    }
    assert got == naive_burst(rows)
