"""Mergeable HLL distinct sketches: error bounds vs exact, and the
mergeability property (rollup of stored sketches == sketch of the whole,
without re-reading the base data)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_adventureworks2022_spark.operators import sketches
from lakehouse_adventureworks2022_spark.sources.readers import read_table

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def events(spark):
    return read_table(spark, SF, "events").withColumn(
        "day", F.to_date("ts")
    ).cache()


def test_sketch_estimate_within_error(spark, events):
    daily = sketches.distinct_sketches(events, ["day"], "user_id")
    merged = sketches.merge_distinct(daily).collect()[0]
    exact = events.select("user_id").distinct().count()
    assert abs(merged["distinct_estimate"] - exact) / exact < 0.05
    assert merged["row_count"] == events.count()


def test_sketches_are_mergeable_across_groupings(spark, events):
    """Storing per-(day, type) sketches must let ANY rollup (per type,
    per day, grand total) come out of the stored sketches alone, each
    within error of its exact count."""
    stored = sketches.distinct_sketches(events, ["day", "event_type"], "user_id")
    per_type = {
        r["event_type"]: r["distinct_estimate"]
        for r in sketches.merge_distinct(stored, ["event_type"]).collect()
    }
    exact_per_type = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for t, exact in exact_per_type.items():
        assert abs(per_type[t] - exact) / exact < 0.05, t

    total = sketches.merge_distinct(stored).collect()[0]["distinct_estimate"]
    exact_total = events.select("user_id").distinct().count()
    assert abs(total - exact_total) / exact_total < 0.05


def test_sketch_column_survives_a_table_roundtrip(spark, events, tmp_path):
    """The binary sketch column persists like any mart column and merges
    after reload — the incremental-mart property."""
    from lakehouse_adventureworks2022_spark.storage.tables import TableManager

    tm = TableManager(spark, str(tmp_path))
    tm.overwrite(
        sketches.distinct_sketches(events, ["day"], "user_id"), "mart.daily_users"
    )
    reloaded = tm.read("mart.daily_users")
    est = sketches.merge_distinct(reloaded).collect()[0]["distinct_estimate"]
    exact = events.select("user_id").distinct().count()
    assert abs(est - exact) / exact < 0.05


# ---- count-min sketch (round 5) --------------------------------------

def test_cms_never_undercounts_and_bounds_overcount(spark):
    from pyspark.sql import functions as F

    from lakehouse_adventureworks2022_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )
    from lakehouse_adventureworks2022_spark.sources.readers import read_table

    events = read_table(spark, "/root/testdata/sf0.001", "events")
    truth = {
        r["user_id"]: r["c"]
        for r in events.groupBy("user_id").agg(F.count("*").alias("c")).collect()
    }
    n = sum(truth.values())
    sketch = cms_build(events, "user_id", depth=5, width=1024)
    est = {
        r["key"]: r["estimate"]
        for r in cms_estimate(
            sketch, events.select("user_id"), "user_id", depth=5, width=1024
        ).collect()
    }
    assert set(est) == set(truth)
    overs = 0
    for k, t in truth.items():
        assert est[k] >= t  # NEVER undercounts
        if est[k] > t + (2.718 / 1024) * n:
            overs += 1
    # ε-bound holds for the overwhelming majority (δ = e^-5 per query)
    assert overs <= max(1, len(truth) // 50)


def test_cms_merge_equals_union_build(spark):
    from pyspark.sql import functions as F

    from lakehouse_adventureworks2022_spark.operators.sketches import (
        cms_build,
        cms_estimate,
        cms_merge,
    )
    from lakehouse_adventureworks2022_spark.sources.readers import read_table

    events = read_table(spark, "/root/testdata/sf0.001", "events")
    a = events.filter("event_id % 2 = 0")
    b = events.filter("event_id % 2 = 1")
    merged = cms_merge(
        cms_build(a, "user_id"), cms_build(b, "user_id")
    )
    direct = cms_build(events, "user_id")
    sm = {(r["row"], r["bucket"]): r["count"] for r in merged.collect()}
    sd = {(r["row"], r["bucket"]): r["count"] for r in direct.collect()}
    assert sm == sd  # sketch of union == merge of sketches, cell-exact


def test_cms_weighted_and_unknown_key(spark):
    from lakehouse_adventureworks2022_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    df = spark.createDataFrame(
        [("a", 3), ("a", 2), ("b", 10)], "k string, w int"
    )
    sketch = cms_build(df, "k", depth=3, width=64, weight_col="w")
    keys = spark.createDataFrame([("a",), ("b",), ("zzz",)], "k string")
    est = {
        r["key"]: r["estimate"]
        for r in cms_estimate(sketch, keys, "k", depth=3, width=64).collect()
    }
    assert est["a"] >= 5 and est["b"] >= 10
    # an unseen key can only collide upward from 0
    assert est["zzz"] >= 0


def test_heavy_hitters_matches_exact_topk(spark):
    """heavy_hitters (MG candidates + exact verify) must equal DuckDB's
    exact top-k on a skewed fixture column, including tie order."""
    import duckdb

    from lakehouse_adventureworks2022_spark.operators.sketches import (
        heavy_hitters,
    )
    from lakehouse_adventureworks2022_spark.sources.readers import read_table

    SF = "/root/testdata/sf0.001"
    events = read_table(spark, SF, "events")
    got = [
        (r["value"], r["freq"])
        for r in heavy_hitters(events, "event_type", k=3).collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    want = con.sql(
        """SELECT event_type, COUNT(*) AS freq FROM events
           GROUP BY 1 ORDER BY freq DESC, event_type LIMIT 3"""
    ).fetchall()
    assert got == [tuple(r) for r in want]


def test_heavy_hitters_planted_and_partition_invariant(spark):
    """A planted hot key must surface regardless of physical layout,
    and the exact verify pass reports its TRUE count (MG alone only
    lower-bounds it)."""
    from pyspark.sql import functions as F

    from lakehouse_adventureworks2022_spark.operators.sketches import (
        heavy_hitters,
    )

    # 5000 hot + 2000 spread over 1000 distinct cold keys
    df = (
        spark.range(5000).selectExpr("'hot' AS k")
        .unionAll(spark.range(2000).selectExpr("concat('c', id % 1000) AS k"))
    )
    for frame in (df, df.repartition(13), df.coalesce(1)):
        rows = heavy_hitters(frame, "k", k=1).collect()
        assert [(r["value"], r["freq"]) for r in rows] == [("hot", 5000)]
    # k beyond the head: cold keys tie at 2 each; deterministic tie order
    top3 = heavy_hitters(df, "k", k=3, candidates_per_partition=4096).collect()
    assert top3[0]["value"] == "hot"
    assert [r["freq"] for r in top3[1:]] == [2, 2]
    assert [r["value"] for r in top3[1:]] == ["c0", "c1"]


def test_heavy_hitters_shuffles_candidates_not_corpus(spark):
    """The exchange ahead of the exact count must follow the semi-join
    against broadcast candidates — i.e. the corpus is filtered to
    candidate rows BEFORE any shuffle (the whole point vs a
    full-cardinality groupBy)."""
    from lakehouse_adventureworks2022_spark.operators.sketches import (
        heavy_hitters,
    )
    from lakehouse_adventureworks2022_spark.sources.readers import read_table

    df = read_table(spark, "/root/testdata/sf0.001", "events")
    plan = (
        heavy_hitters(df, "event_type", k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "TakeOrderedAndProject" in plan


def test_heavy_hitters_property_random_streams(spark):
    """Property check: on random skewed streams, heavy_hitters equals
    collections.Counter's exact top-k (same tie rule) whenever the
    candidate budget covers the distinct-value count — the regime the
    operator documents as exact."""
    import random
    from collections import Counter

    from lakehouse_adventureworks2022_spark.operators.sketches import (
        heavy_hitters,
    )

    rng = random.Random(42)
    for trial in range(4):
        n_distinct = rng.randint(3, 40)
        # zipf-ish skew: value i drawn with weight 1/(i+1)
        vals = [f"v{i}" for i in range(n_distinct)]
        weights = [1.0 / (i + 1) for i in range(n_distinct)]
        stream = rng.choices(vals, weights=weights, k=rng.randint(200, 2000))
        k = rng.randint(1, 6)
        exact = sorted(
            Counter(stream).items(), key=lambda kv: (-kv[1], kv[0])
        )[:k]
        df = spark.createDataFrame([(v,) for v in stream], "k string")
        got = [
            (r["value"], r["freq"])
            for r in heavy_hitters(
                df.repartition(rng.randint(1, 8)), "k", k=k,
                candidates_per_partition=64,
            ).collect()
        ]
        assert got == exact, f"trial {trial}: {got} != {exact}"


# ---- KLL quantile sketch ---------------------------------------------

def _rank_interval_err(sorted_vals, est, q):
    """Distance from q to est's rank interval — duplicates give a value
    a rank RANGE, so point-rank error would penalize correct answers."""
    import numpy as np

    n = len(sorted_vals)
    lo = np.searchsorted(sorted_vals, est, side="left") / n
    hi = np.searchsorted(sorted_vals, est, side="right") / n
    return max(0.0, lo - q, q - hi)


QS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def test_kll_rank_error_vs_exact_per_group(spark, events):
    """Per-event-type sketches: every quantile estimate lands within
    2.5% rank of the exact distribution (k=200 ⇒ ~1% typical)."""
    import numpy as np

    sk = sketches.kll_sketches(events, ["event_type"], "value", k=200)
    est = sketches.kll_quantiles(sk, QS, keys=["event_type"]).collect()
    exact = {
        t: np.sort(np.array(vs, dtype=float))
        for t, vs in (
            (r["event_type"], r["vals"])
            for r in events.groupBy("event_type")
            .agg(F.collect_list("value").alias("vals"))
            .collect()
        )
    }
    assert {r["event_type"] for r in est} == set(exact)
    for r in est:
        err = _rank_interval_err(exact[r["event_type"]], r["value"], r["q"])
        assert err < 0.025, (r["event_type"], r["q"], err)
        assert r["n"] == len(exact[r["event_type"]])


def test_kll_min_max_exact_and_global_sketch(spark, events):
    """q=0 / q=1 are EXACT (tracked outside the compactors); empty keys
    builds one global sketch."""
    sk = sketches.kll_sketches(events, [], "value", k=200)
    rows = sketches.kll_quantiles(sk, [0.0, 1.0], keys=[]).collect()
    got = {r["q"]: r["value"] for r in rows}
    lo, hi = events.agg(F.min("value"), F.max("value")).collect()[0]
    assert got[0.0] == pytest.approx(float(lo))
    assert got[1.0] == pytest.approx(float(hi))


def test_kll_merge_equals_whole_and_parquet_roundtrip(spark, events, tmp_path):
    """Per-day sketches stored to parquet, reloaded and merged must
    answer within the same bound as a sketch of the whole corpus — the
    no-base-rescan rollup contract."""
    import numpy as np

    daily = sketches.kll_sketches(events, ["day", "event_type"], "value", k=200)
    path = str(tmp_path / "kll_daily")
    daily.write.mode("overwrite").parquet(path)
    reloaded = spark.read.parquet(path)

    # drop the day column to merge across days
    rolled = sketches.kll_merge(
        reloaded.drop("day"), keys=["event_type"], k=200
    )
    est = sketches.kll_quantiles(rolled, QS, keys=["event_type"]).collect()
    exact = {
        r["event_type"]: np.sort(np.array(r["vals"], dtype=float))
        for r in events.groupBy("event_type")
        .agg(F.collect_list("value").alias("vals"))
        .collect()
    }
    for r in est:
        err = _rank_interval_err(exact[r["event_type"]], r["value"], r["q"])
        assert err < 0.025, (r["event_type"], r["q"], err)
        assert r["n"] == len(exact[r["event_type"]])


def test_kll_merge_of_disjoint_frames_equals_union(spark):
    """merge(sketch(A), sketch(B)) answers for A ∪ B — two frames with
    disjoint value ranges so a merge bug is unmissable."""
    import numpy as np

    rng = np.random.default_rng(11)
    a = [(float(v),) for v in rng.uniform(0, 1, 20000)]
    b = [(float(v),) for v in rng.uniform(100, 101, 20000)]
    fa = spark.createDataFrame(a, "value double")
    fb = spark.createDataFrame(b, "value double")
    ska = sketches.kll_sketches(fa, [], "value", k=200)
    skb = sketches.kll_sketches(fb, [], "value", k=200)
    merged = sketches.kll_merge(ska, skb, keys=[], k=200)
    est = {
        r["q"]: r["value"]
        for r in sketches.kll_quantiles(merged, [0.25, 0.5, 0.75], keys=[]).collect()
    }
    both = np.sort(np.array([v for v, in a + b]))
    for q, v in est.items():
        assert _rank_interval_err(both, v, q) < 0.025, (q, v)
    # the median of the union sits at the gap between the two ranges
    assert 0.9 <= est[0.5] <= 100.1


def test_kll_sketch_is_kilobytes_not_corpus(spark, events):
    """Stored size is O(k log n), independent of corpus size — the
    whole point versus persisting values."""
    sk = sketches.kll_sketches(events, ["event_type"], "value", k=200).collect()
    for r in sk:
        items = sum(len(lvl) for lvl in r["levels"])
        assert items < 3 * 200, (r["event_type"], items)
        assert r["n"] > items  # genuinely compressed


def test_kll_property_random_streams_and_merge_orders():
    """Hypothesis: for random value streams split into random pieces and
    merged in arbitrary order, every decile answer stays within rank
    bound and n/min/max are conserved exactly. Driver-side ops only —
    the distributed path wraps these closures verbatim."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    ops = sketches._build_kll_ops()

    @settings(max_examples=25, deadline=None)
    @given(
        seed=st.integers(0, 2**31 - 1),
        n=st.integers(100, 8000),
        pieces=st.integers(1, 7),
        heavy_dup=st.booleans(),
    )
    def check(seed, n, pieces, heavy_dup):
        rng = np.random.default_rng(seed)
        vals = (
            rng.integers(0, 10, n).astype(float)
            if heavy_dup
            else rng.normal(0, 100, n)
        )
        cuts = sorted(rng.integers(0, n, pieces - 1).tolist()) + [n]
        parts, prev = [], 0
        for c in cuts:
            parts.append(vals[prev:c])
            prev = c
        sks = []
        for p in parts:
            sk = ops["new"](128)
            ops["update"](sk, p.tolist())
            sks.append(sk)
        rng.shuffle(sks)
        merged = sks[0]
        for sk in sks[1:]:
            merged = ops["merge"](merged, sk)
        assert merged["n"] == n
        assert merged["min"] == vals.min()
        assert merged["max"] == vals.max()
        srt = np.sort(vals)
        for q in (0.1, 0.3, 0.5, 0.7, 0.9):
            est = ops["quantile"](merged, q)
            assert _rank_interval_err(srt, est, q) < 0.05, (q, est)

    check()


def test_mg_skips_numeric_nulls(spark):
    """Nulls in a NUMERIC key column reach the Arrow batches as float
    NaN; NaN != NaN, so an `is None` guard would allocate a fresh MG
    counter per null row — flooding the m-bounded summary and leaking
    NaN value rows into persisted state (r6 ADVICE). Nulls of every
    representation must be skipped, leaving real keys' counts intact."""
    import math

    from lakehouse_adventureworks2022_spark.operators.sketches import (
        mg_summarize,
    )

    rows = [(float(v),) for v in [1, 1, 1, 2, 2, 3]] + [(None,)] * 50
    df = spark.createDataFrame(rows, "v double").repartition(4)
    got = {r["value"]: r["weight"] for r in mg_summarize(df, "v", m=8).collect()}
    assert not any(v is None or math.isnan(v) for v in got), got
    # m=8 > 3 distinct real keys and no null flood ⇒ weights are exact
    assert got == {1.0: 3, 2.0: 2, 3.0: 1}
