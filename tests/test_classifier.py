"""Learned quality classifier — distributed training/scoring semantics
(pytest-only; model-based scores are not SQL-oracle territory)."""

from __future__ import annotations

import pytest

from lakehouse_adventureworks2022_spark.operators import classifier
from lakehouse_adventureworks2022_spark.sources.readers import read_table

SF = "/root/testdata/sf0.001"


def _labeled_corpus(spark):
    """Separable seed set: fluent prose (label 1) vs degenerate junk
    (label 0) — the signal every heuristic feature carries."""
    good = [
        (
            i,
            "the quick brown fox jumps over the lazy dog and then "
            f"runs through field number {i} with steady easy grace, "
            "while the farmer watches from the old wooden fence.",
            1,
        )
        for i in range(40)
    ]
    bad_runs = [
        (100 + i, "zz" * 200 + f"#{i}", 0) for i in range(20)
    ]
    bad_spam = [
        (200 + i, ("BUY NOW!!! " * 30) + f"offer {i}", 0) for i in range(20)
    ]
    return spark.createDataFrame(
        good + bad_runs + bad_spam, "doc_id int, text string, label int"
    )


@pytest.fixture(scope="module")
def fitted(spark):
    labeled = _labeled_corpus(spark)
    return labeled, classifier.train_quality_classifier(labeled)


def test_features_are_null_free_and_per_doc(spark):
    docs = read_table(spark, SF, "documents")
    feats = classifier.quality_features(docs)
    assert feats.count() == docs.count()
    nulls = feats.filter(
        " OR ".join(f"{c} IS NULL OR isnan({c})" for c in classifier.FEATURE_COLS)
    ).count()
    assert nulls == 0


def test_classifier_separates_seed_set(spark, fitted):
    labeled, model = fitted
    scored = classifier.score_quality(labeled, model)
    joined = scored.join(labeled.select("doc_id", "label"), "doc_id")
    acc = joined.filter(
        "(is_quality_pred AND label = 1) OR (NOT is_quality_pred AND label = 0)"
    ).count() / joined.count()
    assert acc >= 0.95  # linearly separable by construction


def test_scores_are_probabilities(spark, fitted):
    labeled, model = fitted
    out = classifier.score_quality(labeled, model)
    assert out.filter("quality_prob < 0 OR quality_prob > 1").count() == 0
    assert set(out.columns) == {"doc_id", "quality_prob", "is_quality_pred"}


def test_generalizes_to_unseen_docs(spark, fitted):
    _, model = fitted
    unseen = spark.createDataFrame(
        [
            (1, "a calm clear morning walk along the river with friends "
                "talking quietly about the coming harvest and the weather"),
            (2, "qq" * 300),
        ],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r for r in classifier.score_quality(unseen, model).collect()}
    assert got[1]["quality_prob"] > got[2]["quality_prob"]


def test_model_save_load_roundtrip(spark, fitted, tmp_path):
    from pyspark.ml import PipelineModel

    labeled, model = fitted
    path = str(tmp_path / "quality_model")
    model.save(path)
    reloaded = PipelineModel.load(path)
    a = {r["doc_id"]: r["quality_prob"]
         for r in classifier.score_quality(labeled, model).collect()}
    b = {r["doc_id"]: r["quality_prob"]
         for r in classifier.score_quality(labeled, reloaded).collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert b[k] == pytest.approx(a[k], rel=1e-12)


def test_scoring_fixture_corpus_is_total(spark, fitted):
    _, model = fitted
    docs = read_table(spark, SF, "documents")
    out = classifier.score_quality(docs, model)
    assert out.count() == docs.count()
