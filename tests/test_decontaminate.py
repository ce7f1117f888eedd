"""Eval-set decontamination (operators/decontaminate.py): planted
13-gram leaks at the production default, boundary at n, hash/string
join equivalence, the decontaminate anti-join, and the catalog twin's
DuckDB hash parity at two SFs (same rigor as the other swept twins)."""

from __future__ import annotations

import duckdb
import pytest

from lakehouse_adventureworks2022_spark.operators.decontaminate import (
    contamination_report,
    decontaminate,
    word_ngrams,
)

LEAK = (
    "the quick brown fox jumps over the lazy dog while "
    "seven wizards watch quietly"
)  # 14 words: contains exactly two 13-grams


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_13gram_leak_flagged_and_near_miss_not(spark):
    eval_doc = _docs(spark, [(1000, LEAK)])
    words = LEAK.split()
    train = _docs(
        spark,
        [
            # full 14-word span copied verbatim -> shares both 13-grams
            (1, "prefix words then " + LEAK + " and a suffix"),
            # only the first 12 words -> longest shared run is 12 < 13
            (2, "unrelated start " + " ".join(words[:12]) + " tail here"),
            # no overlap at all
            (3, "completely different content about spark plans"),
        ],
    )
    got = {
        r["doc_id"]: r["n_contaminated_ngrams"]
        for r in contamination_report(train, eval_doc, n=13).collect()
    }
    assert got == {1: 2}
    clean = decontaminate(train, eval_doc, n=13)
    assert sorted(r["doc_id"] for r in clean.collect()) == [2, 3]
    assert clean.columns == train.columns  # passthrough schema


def test_short_docs_and_case_whitespace_normalization(spark):
    # a doc shorter than n contributes nothing and must not error
    # (sequence() would otherwise run DESCENDING and fabricate grams)
    df = _docs(spark, [(1, "only four words here"), (2, "  The   QUICK\tbrown  ")])
    grams = word_ngrams(df, 3).collect()
    by_id = {}
    for r in grams:
        by_id.setdefault(r["doc_id"], []).append(r["gram"])
    assert by_id[1] == ["only four words", "four words here"]
    # lowercased, whitespace runs collapse to single-space grams
    assert by_id[2] == ["the quick brown"]
    assert word_ngrams(_docs(spark, [(3, "too short")]), 3).count() == 0
    with pytest.raises(ValueError, match="n must be"):
        word_ngrams(df, 0)


def test_hash_join_equals_string_join_and_shuffle_fallback(spark):
    rows = [
        (i, f"shared words alpha beta gamma delta doc{i} filler tokens")
        for i in range(40)
    ]
    train = _docs(spark, rows[:30])
    ev = _docs(spark, rows[30:])
    a = contamination_report(train, ev, n=4, hash_grams=True)
    b = contamination_report(train, ev, n=4, hash_grams=False)
    c = contamination_report(train, ev, n=4, broadcast_eval=False)
    want = {(r["doc_id"], r["n_contaminated_ngrams"]) for r in b.collect()}
    assert {(r["doc_id"], r["n_contaminated_ngrams"]) for r in a.collect()} == want
    assert {(r["doc_id"], r["n_contaminated_ngrams"]) for r in c.collect()} == want
    assert want  # the shared 4-grams actually flag something


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_catalog_twin_hash_parity(spark, sf):
    from lakehouse_adventureworks2022_spark.plans.catalog import (
        PYTEST_ORACLES,
        QUERIES,
    )
    from tools.check_oracles import TABLES, canonical_hash, normalize_pandas

    got = normalize_pandas(
        QUERIES["eval_decontamination"](spark, sf).toPandas()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    want = normalize_pandas(con.sql(PYTEST_ORACLES["eval_decontamination"]).df())
    con.close()
    assert len(got) == len(want) > 0
    assert list(got.columns) == list(want.columns)
    assert canonical_hash(got) == canonical_hash(want)
