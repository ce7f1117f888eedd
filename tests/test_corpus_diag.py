"""Corpus diagnostics: Zipf rank-frequency fit + Flesch readability.

Worked examples against Python/numpy references, planted-distribution
behavior (a perfect power law fits r2≈1; a uniform head flattens the
slope), and the two-SF hash parity with the DuckDB twins."""

from __future__ import annotations

import math

import duckdb
import pytest

from lakehouse_adventureworks2022_spark.operators.textops import (
    readability,
    zipf_fit,
)

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


def _docs_from_counts(spark, counts: dict[str, int]):
    text = " ".join(
        " ".join([term] * n) for term, n in counts.items()
    )
    return spark.createDataFrame([(1, text)], "doc_id long, text string")


def test_zipf_perfect_power_law(spark):
    """freq(rank) = C / rank ⇒ slope −1, r² ≈ 1."""
    counts = {f"w{r:02d}": round(840 / r) for r in range(1, 9)}
    row = zipf_fit(_docs_from_counts(spark, counts), top_n=8).head()
    assert row["n_terms"] == 8
    assert abs(row["slope"] + 1.0) < 0.02
    assert row["r2"] > 0.999


def test_zipf_uniform_head_is_flat(spark):
    counts = {f"w{r:02d}": 100 for r in range(1, 9)}
    row = zipf_fit(_docs_from_counts(spark, counts), top_n=8).head()
    assert row["slope"] == 0.0 and row["n_terms"] == 8


def test_zipf_matches_numpy_reference(spark):
    import numpy as np

    counts = {"a": 50, "b": 31, "c": 17, "d": 9, "e": 4}
    row = zipf_fit(_docs_from_counts(spark, counts), top_n=5).head()
    y = np.log(sorted(counts.values(), reverse=True))
    x = np.log(np.arange(1, 6))
    slope, intercept = np.polyfit(x, y, 1)
    assert abs(row["slope"] - slope) < 1e-6
    assert abs(row["intercept"] - intercept) < 1e-6


def test_readability_worked_example(spark):
    text = "The cat sat on the mat. It was happy! Was it?"
    row = readability(
        spark.createDataFrame([(1, text)], "doc_id long, text string")
    ).head()
    # words: 11; sentences: 3; vowel groups: the(1) cat(1) sat(1) on(1)
    # the(1) mat(1) it(1) was(1) happy(2) was(1) it(1) = 12
    assert row["n_words"] == 11
    assert row["n_sentences"] == 3
    assert row["n_syllables"] == 12
    want = (
        math.floor((206.835 - 1.015 * (11 / 3) - 84.6 * (12 / 11)) * 100 + 0.5)
        / 100
    )
    assert row["flesch"] == pytest.approx(want)


def test_readability_empty_doc_null_score(spark):
    row = readability(
        spark.createDataFrame([(1, "  ")], "doc_id long, text string")
    ).head()
    assert row["n_words"] == 0 and row["flesch"] is None


def test_readability_no_punctuation_floors_sentences(spark):
    row = readability(
        spark.createDataFrame(
            [(1, "just words no stops")], "doc_id long, text string"
        )
    ).head()
    assert row["n_sentences"] == 1


@pytest.mark.parametrize("name", ["corpus_zipf", "doc_readability"])
@pytest.mark.parametrize("sf", [SF_SMALL, SF_ORACLE])
def test_catalog_twin_hash_parity(spark, name, sf):
    from lakehouse_adventureworks2022_spark.plans.catalog import (
        ORACLES,
        PYTEST_ORACLES,
        QUERIES,
    )
    from tools.check_oracles import TABLES, canonical_hash, normalize_pandas

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    spark_pdf = normalize_pandas(QUERIES[name](spark, sf).toPandas())
    duck_pdf = normalize_pandas(
        con.sql({**PYTEST_ORACLES, **ORACLES}[name]).df()
    )
    con.close()
    assert canonical_hash(spark_pdf) == canonical_hash(duck_pdf)
    assert len(spark_pdf) > 0


def test_zipf_plan_is_bounded_topn_window(spark):
    """The single-partition window must sit ABOVE a TakeOrderedAndProject
    — the bounded-frame shape GLOBAL_WINDOW_OK whitelists."""
    from lakehouse_adventureworks2022_spark.plans.catalog import QUERIES

    plan = (
        QUERIES["corpus_zipf"](spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
