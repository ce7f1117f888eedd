"""Model-based quality classification (beyond-reference scope — the
FineWeb / CCNet-family learned quality gate: train a lightweight linear
classifier that generalizes from a labeled seed set, then score the
whole corpus with it).

The published pipelines use fasttext (a C++ binary not in this
container); the Spark-first analog is ``pyspark.ml`` logistic
regression over the engine's own heuristic text features — training is
distributed L-BFGS over the corpus (no driver-side matrix), scoring is
a JVM-side model transform, and the fitted model saves/loads through
``PipelineModel.save`` like any Spark artifact.

Feature contract (:func:`quality_features`): the length / diversity /
stopword / punctuation / repetition signals already computed by
``operators.textops`` — all Catalyst projections, so the feature build
adds no shuffle beyond the one ``doc_id`` join between the two stat
frames. Labels come from whatever seed the pipeline trusts: a curated
gold subset vs crawl sample (the CCNet shape), LLM-graded docs (the
FineWeb-edu shape), or — the self-supervised fallback used by the demo
query — the engine's own heuristic gate, which the classifier smooths
into a calibrated probability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakehouse_adventureworks2022_spark.operators import textops

#: Numeric feature columns fed to the classifier, in vector order.
FEATURE_COLS = (
    "n_chars",
    "n_tokens",
    "type_token_ratio",
    "avg_token_len",
    "stopword_ratio",
    "punct_density",
    "dup_line_ratio",
    "char_run_flag",
)


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc numeric feature frame ``(doc_id, *FEATURE_COLS)`` built
    from the heuristic text signals — zero-shuffle projections joined
    once on ``doc_id``; null-free (empty docs get 0.0 ratios) because
    L-BFGS rejects NaN rows."""
    stats = textops.token_stats(df, text_col).select(
        "doc_id",
        "n_chars",
        "n_tokens",
        "type_token_ratio",
        "avg_token_len",
        "stopword_ratio",
        (
            F.col("punct_count").cast("double")
            / F.greatest(F.col("n_chars"), F.lit(1))
        ).alias("punct_density"),
    )
    rep = textops.repetition_stats(df, text_col).select(
        "doc_id",
        "dup_line_ratio",
        F.col("has_char_run").cast("double").alias("char_run_flag"),
    )
    out = stats.join(rep, "doc_id")
    return out.fillna(0.0, subset=[c for c in FEATURE_COLS])


def train_quality_classifier(
    labeled: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    max_iter: int = 50,
    reg_param: float = 0.01,
    features: DataFrame | None = None,
):
    """Fit the linear quality model on a labeled seed frame
    (``doc_id``, ``text_col``, binary ``label_col``); returns a
    ``pyspark.ml.PipelineModel`` (assembler → scaler → logistic
    regression) ready for :func:`score_quality` or ``.save(path)``.

    Distributed end-to-end: feature build is Catalyst, standardization
    and L-BFGS are ``pyspark.ml`` aggregations over executors — the
    driver holds only the (8-dim) coefficient vector.

    Pass ``features`` (a :func:`quality_features` frame) to reuse an
    already-built feature frame — e.g. when the same docs are scored
    right after training, build features once and hand them to both.
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    if features is None:
        features = quality_features(labeled, text_col)
    feats = features.join(
        labeled.select("doc_id", F.col(label_col).cast("double").alias("label")),
        "doc_id",
    )
    pipeline = Pipeline(
        stages=[
            VectorAssembler(
                inputCols=list(FEATURE_COLS), outputCol="__raw__"
            ),
            StandardScaler(
                inputCol="__raw__", outputCol="__features__", withMean=True
            ),
            LogisticRegression(
                featuresCol="__features__",
                labelCol="label",
                maxIter=max_iter,
                regParam=reg_param,
            ),
        ]
    )
    return pipeline.fit(feats)


def score_quality(
    df: DataFrame,
    model,
    text_col: str = "text",
    threshold: float = 0.5,
    features: DataFrame | None = None,
) -> DataFrame:
    """Score every doc under a fitted model:
    ``(doc_id, quality_prob, is_quality_pred)`` — the probability is the
    calibrated gate a pipeline thresholds or buckets on (FineWeb keeps
    score tiers rather than a hard gate; both come from this frame).

    ``features`` reuses a prebuilt :func:`quality_features` frame (skip
    the rebuild when training and scoring share one corpus)."""
    from pyspark.ml.functions import vector_to_array

    if features is None:
        features = quality_features(df, text_col)
    scored = model.transform(features)
    prob = F.element_at(vector_to_array(F.col("probability")), 2)
    return scored.select(
        "doc_id",
        prob.alias("quality_prob"),
        (prob >= threshold).alias("is_quality_pred"),
    )
