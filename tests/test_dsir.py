"""DSIR importance weighting/resampling (operators/dsir.py): worked
examples against a literal Python re-statement of the math, selection
properties, and plan shape."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from lakehouse_adventureworks2022_spark.operators.dsir import (
    dsir_select,
    dsir_weights,
    fit_hashed_lm,
    hashed_ngram_buckets,
)

B = 64  # small bucket count so fixture-sized tests collide realistically
K = 0.5


def _py_bucket(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16) % B


def _py_feats(text: str) -> dict[int, int]:
    toks = [t for t in text.strip().lower().split() if t]
    grams = toks + [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
    out: dict[int, int] = {}
    for g in grams:
        b = _py_bucket(g)
        out[b] = out.get(b, 0) + 1
    return out


def _py_log_weight(text: str, p: dict[int, int], q: dict[int, int]) -> float:
    pn, qn = float(sum(p.values())), float(sum(q.values()))
    lw = 0.0
    for b, n in _py_feats(text).items():
        lp = math.log((p.get(b, 0) + K) / (pn + K * B))
        lq = math.log((q.get(b, 0) + K) / (qn + K * B))
        lw += n * (lp - lq)
    return round(lw, 6)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


TARGET_ROWS = [
    (100, "spark catalyst optimizer plans joins"),
    (101, "catalyst pushes filters into the parquet scan"),
    (102, "adaptive query execution replans joins at runtime"),
]
RAW_ROWS = [
    (1, "spark catalyst optimizer plans joins at runtime"),  # target-like
    (2, "grandma's secret lasagna recipe with extra cheese"),  # off-domain
    (3, "catalyst optimizer"),  # short target-like
    (4, "   "),  # whitespace-only: zero features
]


def test_bag_semantics_counts_multiplicity(spark):
    feats = {
        (r["bucket"]): r["n"]
        for r in hashed_ngram_buckets(
            _df(spark, [(1, "a a a")]), buckets=B
        ).collect()
    }
    # 3 unigrams ("a" ×3 share one bucket) + 2 bigrams ("a a" ×2)
    assert sum(feats.values()) == 5
    assert feats[_py_bucket("a")] >= 3


def test_log_weights_match_python_reference(spark):
    got = {
        r["doc_id"]: (r["n_features"], r["log_weight"])
        for r in dsir_weights(
            _df(spark, RAW_ROWS), _df(spark, TARGET_ROWS), buckets=B, k=K
        ).collect()
    }
    p: dict[int, int] = {}
    for _, t in TARGET_ROWS:
        for b, n in _py_feats(t).items():
            p[b] = p.get(b, 0) + n
    q: dict[int, int] = {}
    for _, t in RAW_ROWS:
        for b, n in _py_feats(t).items():
            q[b] = q.get(b, 0) + n
    for doc_id, text in RAW_ROWS:
        n_feats = sum(_py_feats(text).values())
        assert got[doc_id][0] == n_feats
        assert abs(got[doc_id][1] - _py_log_weight(text, p, q)) <= 1e-6
    # empty doc: kept, zero evidence
    assert got[4] == (0, 0.0)


def test_target_like_docs_outweigh_off_domain(spark):
    got = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_weights(
            _df(spark, RAW_ROWS), _df(spark, TARGET_ROWS), buckets=B, k=K
        ).collect()
    }
    assert got[1] > got[2]  # target-phrased doc beats the lasagna recipe
    assert got[3] > got[2]


def test_select_is_deterministic_and_respects_n(spark):
    raw, target = _df(spark, RAW_ROWS), _df(spark, TARGET_ROWS)
    a = dsir_select(raw, target, n_select=2, buckets=B, k=K).collect()
    b = dsir_select(raw, target, n_select=2, buckets=B, k=K).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    assert len(a) == 2
    # keys strictly ordered, and the selection is weight+noise driven —
    # the heaviest-weighted doc family should dominate the sample
    assert a[0]["sample_key"] >= a[1]["sample_key"]


def test_select_plan_is_topk_not_full_sort(spark):
    raw, target = _df(spark, RAW_ROWS), _df(spark, TARGET_ROWS)
    plan = (
        dsir_select(raw, target, n_select=2, buckets=B, k=K)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_models_are_bounded_and_mergeable(spark):
    lm = fit_hashed_lm(_df(spark, TARGET_ROWS), buckets=B)
    assert lm.count() <= B  # by construction
    # counts are plain tables: two half-corpus fits sum to the full fit
    half1 = fit_hashed_lm(_df(spark, TARGET_ROWS[:2]), buckets=B)
    half2 = fit_hashed_lm(_df(spark, TARGET_ROWS[2:]), buckets=B)
    merged = {
        r["bucket"]: r["c"]
        for r in half1.unionByName(half2)
        .groupBy("bucket")
        .agg(F.sum("c").alias("c"))
        .collect()
    }
    full = {r["bucket"]: r["c"] for r in lm.collect()}
    assert merged == full
