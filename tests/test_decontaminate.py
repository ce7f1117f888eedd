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
        ORACLES,
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
    want = normalize_pandas(con.sql({**PYTEST_ORACLES, **ORACLES}["eval_decontamination"]).df())
    con.close()
    assert len(got) == len(want) > 0
    assert list(got.columns) == list(want.columns)
    assert canonical_hash(got) == canonical_hash(want)


# ---- fuzzy (MinHash cross-corpus) tier --------------------------------

from lakehouse_adventureworks2022_spark.operators.decontaminate import (  # noqa: E402
    fuzzy_contamination_pairs,
    fuzzy_decontaminate,
)

BASE = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango "
    "uniform victor whiskey xray yankee zulu one two three four"
)  # 30 words


def test_fuzzy_catches_the_paraphrase_exact_13gram_misses(spark):
    # eval item = the train doc with every 10th word swapped out: no 13
    # consecutive words survive, so the exact tier at n=13 sees nothing
    words = BASE.split()
    edited = [
        (f"EDIT{i}" if i % 10 == 9 else w) for i, w in enumerate(words)
    ]
    train = _docs(spark, [(1, BASE), (2, "totally unrelated text " * 8)])
    ev = _docs(spark, [(100, " ".join(edited))])
    assert contamination_report(train, ev, n=13).count() == 0  # exact: blind
    # band_rows=2 = the high-recall banding (6 bands of 2 rows): at
    # J≈0.6 the default 4×3 banding only catches the pair with ~0.5
    # probability per md5 draw — the knob IS the recall/cost trade
    pairs = fuzzy_contamination_pairs(
        train, ev, n=3, threshold=0.3, band_rows=2
    ).collect()
    assert [(p["train_id"], p["eval_id"]) for p in pairs] == [(1, 100)]
    assert 0.3 <= pairs[0]["jaccard"] < 1.0
    clean = fuzzy_decontaminate(train, ev, n=3, threshold=0.3, band_rows=2)
    assert [r["doc_id"] for r in clean.collect()] == [2]


def test_fuzzy_pairs_only_cross_corpus_and_deterministic(spark):
    # two near-identical TRAIN docs must NOT pair with each other here —
    # the operator's contract is train×eval only
    train = _docs(spark, [(1, BASE), (2, BASE + " extra")])
    ev = _docs(spark, [(9, "completely different words everywhere now")])
    assert fuzzy_contamination_pairs(train, ev, n=3, threshold=0.2).count() == 0
    # determinism: same inputs -> identical pair set twice
    ev2 = _docs(spark, [(9, BASE + " tail")])
    a = {(r["train_id"], r["eval_id"], r["n_common"])
         for r in fuzzy_contamination_pairs(train, ev2, n=3, threshold=0.2).collect()}
    b = {(r["train_id"], r["eval_id"], r["n_common"])
         for r in fuzzy_contamination_pairs(train, ev2, n=3, threshold=0.2).collect()}
    assert a == b and {t for t, _, _ in a} == {1, 2}


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_fuzzy_catalog_twin_hash_parity(spark, sf):
    from lakehouse_adventureworks2022_spark.plans.catalog import (
        ORACLES,
        PYTEST_ORACLES,
        QUERIES,
    )
    from tools.check_oracles import TABLES, canonical_hash, normalize_pandas

    got = normalize_pandas(
        QUERIES["eval_decontamination_fuzzy"](spark, sf).toPandas()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    want = normalize_pandas(
        con.sql({**PYTEST_ORACLES, **ORACLES}["eval_decontamination_fuzzy"]).df()
    )
    con.close()
    assert len(got) == len(want) > 0
    assert canonical_hash(got) == canonical_hash(want)


def test_stop_gram_pruning_drops_boilerplate_keeps_leaks(spark):
    """max_eval_gram_df: a gram in EVERY eval doc (boilerplate header)
    stops matching; a genuinely leaked rare gram still flags."""
    header = "standard benchmark header text"
    ev = _docs(
        spark,
        [
            (100, header + " question one about alpha beta gamma delta"),
            (101, header + " question two about epsilon zeta eta theta"),
            (102, header + " question three about iota kappa lam mu"),
        ],
    )
    train = _docs(
        spark,
        [
            (1, "prefix " + header + " suffix"),  # shares ONLY boilerplate
            (2, "copied alpha beta gamma delta verbatim"),  # real leak
        ],
    )
    no_prune = {
        r["doc_id"]
        for r in contamination_report(train, ev, n=4).collect()
    }
    pruned = {
        r["doc_id"]
        for r in contamination_report(
            train, ev, n=4, max_eval_gram_df=1
        ).collect()
    }
    assert no_prune == {1, 2}
    assert pruned == {2}  # boilerplate-only doc 1 no longer flags


# ---- r10: cross-source overlap matrix --------------------------------


def test_source_overlap_worked_example(spark):
    from lakehouse_adventureworks2022_spark.operators.decontaminate import (
        source_overlap_matrix,
    )

    rows = [
        # src A: grams {a b, b c} ; src B: {a b, b c, c d} (A ⊂ B)
        (1, "A", "a b c"),
        (2, "B", "a b c d"),
        # src C shares nothing
        (3, "C", "x y z"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        (r["source_a"], r["source_b"]): r
        for r in source_overlap_matrix(df, n=2).collect()
    }
    ab = got[("A", "B")]
    assert ab["n_shared_grams"] == 2
    assert (ab["n_grams_a"], ab["n_grams_b"]) == (2, 3)
    assert ab["jaccard"] == round(2 / 3, 6)
    assert ab["containment"] == 1.0  # A fully swallowed by B
    # disjoint pairs produce NO row (count over an inner gram join)
    assert ("A", "C") not in got and ("B", "C") not in got


def test_source_overlap_distinct_semantics(spark):
    """Repeated grams inside a source count once (set, not bag)."""
    from lakehouse_adventureworks2022_spark.operators.decontaminate import (
        source_overlap_matrix,
    )

    df = spark.createDataFrame(
        [(1, "A", "a b a b a b"), (2, "B", "a b")],
        "doc_id long, source string, text string",
    )
    row = source_overlap_matrix(df, n=2).collect()[0]
    # A's distinct bigrams: {a b, b a}; B's: {a b}
    assert (row["n_grams_a"], row["n_grams_b"]) == (2, 1)
    assert row["n_shared_grams"] == 1
    assert row["containment"] == 1.0
