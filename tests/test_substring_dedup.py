"""Exact repeated-substring removal (operators/substring_dedup.py):
Python-reference differential on planted data + the real fixture, plus
policy/edge-case semantics and a plan-shape guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_adventureworks2022_spark.operators import substring_dedup as sd
from lakehouse_adventureworks2022_spark.sources.readers import read_table

SF_SMOKE = "/root/testdata/sf0.001"


# ---- independent Python reference (same semantics, no Spark) ---------

def _ref_remove(docs: dict[int, str], window: int, keep: str = "first"):
    """Reference implementation: dict-based window counting + span
    removal. Returns {doc_id: (clean_text, removed, span_count)}."""
    toks = {d: [t for t in text.split() if t] for d, text in docs.items()}
    norm = {d: [t.lower() for t in ts] for d, ts in toks.items()}
    occ: dict[tuple, list[tuple[int, int]]] = {}
    for d in sorted(norm):
        ts = norm[d]
        for p in range(len(ts) - window + 1):
            occ.setdefault(tuple(ts[p : p + window]), []).append((d, p))
    flagged: dict[int, list[int]] = {d: [] for d in docs}
    for sites in occ.values():
        if len(sites) < 2:
            continue
        start = 1 if keep == "first" else 0
        for d, p in sorted(sites)[start:]:
            flagged[d].append(p)
    out = {}
    for d, text in docs.items():
        spans: list[list[int]] = []
        for p in sorted(flagged[d]):
            if spans and p <= spans[-1][1]:
                spans[-1][1] = p + window
            else:
                spans.append([p, p + window])
        dropped = {i for s, e in spans for i in range(s, e)}
        kept = [t for i, t in enumerate(toks[d]) if i not in dropped]
        out[d] = (" ".join(kept), len(dropped), len(spans))
    return out


def _spark_remove(spark, docs: dict[int, str], window: int, keep="first"):
    df = spark.createDataFrame(
        [(d, t) for d, t in docs.items()], "doc_id long, text string"
    )
    rows = sd.remove_duplicate_spans(df, window=window, keep=keep).collect()
    return {
        r["doc_id"]: (r["text"], r["removed_tokens"], r["span_count"])
        for r in rows
    }


PLANTED = {
    1: "alpha beta gamma delta epsilon zeta eta theta unique one tail",
    # same 8-token run as doc 1, different tail → only the run dedups
    2: "prefix alpha beta gamma delta epsilon zeta eta theta other end",
    # the run again, capitalized (case-insensitive match contract)
    3: "ALPHA BETA GAMMA DELTA EPSILON ZETA ETA THETA yet another tail",
    4: "completely different words with no repeated runs at all here now",
    # internal self-repeat: the run appears twice within one doc
    5: "alpha beta gamma delta epsilon zeta eta theta pad alpha beta gamma delta epsilon zeta eta theta",
    6: "short doc",
}


@pytest.mark.parametrize("keep", ["first", "none"])
def test_matches_python_reference_on_planted(spark, keep):
    assert _spark_remove(spark, PLANTED, 8, keep) == _ref_remove(
        PLANTED, 8, keep
    )


def test_keep_first_preserves_exactly_one_copy(spark):
    out = _spark_remove(spark, PLANTED, 8)
    # doc 1 holds the canonical (min doc_id, pos) occurrence — untouched
    assert out[1][0] == PLANTED[1]
    # docs 2/3/5 lose the duplicated run but keep their unique tokens
    assert "alpha" not in out[2][0] and out[2][0].startswith("prefix")
    assert out[3][0] == "yet another tail"
    assert out[4][0] == PLANTED[4]  # untouched doc passes through
    # corpus-wide: the run survives exactly once (lowercased compare)
    survivors = sum(
        1
        for t, _, _ in out.values()
        if "alpha beta gamma delta epsilon zeta eta theta" in t.lower()
    )
    assert survivors == 1


def test_keep_none_removes_every_copy(spark):
    out = _spark_remove(spark, PLANTED, 8, keep="none")
    for t, _, _ in out.values():
        assert "alpha beta gamma" not in t.lower()


def test_fully_duplicated_doc_empties(spark):
    docs = {1: "a b c d e f", 2: "a b c d e f"}
    out = _spark_remove(spark, docs, 6)
    assert out[1] == ("a b c d e f", 0, 0)
    assert out[2] == ("", 6, 1)


def test_overlapping_windows_merge_to_one_span(spark):
    # a 10-token duplicated region with window=8 → 3 overlapping flagged
    # windows that must merge into ONE maximal span
    region = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    docs = {1: region + " first", 2: "x y " + region + " z"}
    rows = (
        sd.duplicate_spans(
            spark.createDataFrame(
                [(d, t) for d, t in docs.items()], "doc_id long, text string"
            ),
            window=8,
        )
        .collect()
    )
    assert [(r["doc_id"], r["start"], r["end"]) for r in rows] == [(2, 2, 12)]


def test_fixture_differential(spark):
    docs_df = read_table(spark, SF_SMOKE, "documents")
    docs = {
        r["doc_id"]: r["text"]
        for r in docs_df.select("doc_id", "text").collect()
    }
    assert _spark_remove(spark, docs, 12) == _ref_remove(docs, 12)


def test_stride_reduces_volume_but_keeps_aligned_hits(spark):
    df = spark.createDataFrame(
        [(d, t) for d, t in PLANTED.items()], "doc_id long, text string"
    )
    full = sd.window_fingerprints(df, window=8, stride=1).count()
    strided = sd.window_fingerprints(df, window=8, stride=2).count()
    assert strided < full
    # doc 1 vs doc 5's first copy start at pos 0 — aligned mod 2, so the
    # duplicate is still caught at stride 2
    spans = sd.duplicate_spans(df, window=8, stride=2)
    assert spans.filter(F.col("doc_id") == 5).count() >= 1


def test_plan_no_cartesian_and_single_fp_shuffle(spark):
    df = spark.createDataFrame(
        [(d, t) for d, t in PLANTED.items()], "doc_id long, text string"
    )
    plan = sd.remove_duplicate_spans(df, window=8)._jdf.queryExecution().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
