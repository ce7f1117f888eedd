"""Property-based SCD2 invariants (hypothesis): for ANY sequence of
batches, the snapshot must keep exactly one current version per key,
contiguous non-overlapping validity ranges, version counts equal to the
number of actual attribute changes, and current attributes equal to the
latest batch value."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lakehouse_adventureworks2022_spark.operators.scd2 import scd2_apply

KEYS = list(range(6))
DATES = ["2024-01-01", "2024-02-01", "2024-03-01", "2024-04-01"]

# a batch: subset of keys, each with a small-int attribute value
batch_strategy = st.dictionaries(
    st.sampled_from(KEYS), st.integers(min_value=0, max_value=3), max_size=6
)
run_strategy = st.lists(batch_strategy, min_size=1, max_size=4)


@pytest.fixture(scope="module")
def sparkref(spark):
    return spark


@pytest.mark.slow
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(run=run_strategy)
def test_scd2_invariants_hold_for_any_batch_sequence(sparkref, run):
    spark = sparkref
    snap = None
    expected: dict[int, list[int]] = {}  # key -> change history of attr
    for i, batch in enumerate(run):
        if not batch:
            continue
        rows = [(k, v) for k, v in batch.items()]
        df = spark.createDataFrame(rows, ["key", "attr"])
        snap = scd2_apply(snap, df, "key", ["attr"], DATES[i])
        for k, v in batch.items():
            hist = expected.setdefault(k, [])
            if not hist or hist[-1] != v:
                hist.append(v)
    if snap is None:
        return

    rows = snap.collect()
    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r["key"], []).append(r)

    assert set(by_key) == set(expected)
    for k, versions in by_key.items():
        versions.sort(key=lambda r: r["effective_date"])
        # version count == number of actual changes
        assert len(versions) == len(expected[k]), (k, versions)
        # exactly one current, and it is the last version
        currents = [r for r in versions if r["is_current"]]
        assert len(currents) == 1 and currents[0] is versions[-1]
        # current attribute equals latest changed value
        assert currents[0]["attr"] == expected[k][-1]
        # contiguous, non-overlapping ranges; only the last is open
        for a, b in zip(versions, versions[1:]):
            assert a["expiration_date"] == b["effective_date"]
            assert not a["is_current"]
        assert versions[-1]["expiration_date"] is None
        # attribute history preserved in order
        assert [r["attr"] for r in versions] == expected[k]
