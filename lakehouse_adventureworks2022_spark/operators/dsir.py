"""DSIR-style data selection: importance resampling of a raw corpus
toward a target domain (beyond-reference scope — the reference
lakehouse, racenak/lakehouse-adventureworks2022, is pure warehouse ELT
and has nothing like this; in an LLM-data pipeline this is the standard
cheap domain-selection method next to the perplexity gate).

Method (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling", public paper): represent each document as a bag
of HASHED n-grams (unigrams + bigrams folded into B buckets — the
hashing trick, same rationale as ``vectorize.hashing_vectorizer``), fit
two bag-of-buckets unigram models — p̂ on the small TARGET (domain)
corpus and q̂ on the RAW corpus — and weight each raw document by its
log importance ratio

    log w(doc) = Σ_b n_b(doc) · (log p̂_b − log q̂_b)

then sample the training subset with Gumbel-top-k on the log weights
(importance resampling without replacement). Everything here is plain
Catalyst:

- featurization: one explode per doc over its n-grams, bucketed by the
  first 8 md5 hex digits mod B (md5 — NOT xxhash64 — so the DuckDB
  oracle twin computes the identical buckets; same convention as
  ``dedup.simhash_docs``);
- model fit: ONE uniform-key aggregation per corpus → ``(bucket, c)``,
  add-k smoothed over the B-bucket simplex: p̂_b = (c_b + k)/(N + k·B).
  A model is ≤ B rows by construction (config-time constant) —
  broadcastable at any corpus size;
- weighting: the doc's bucket counts equi-join BOTH bounded models
  (broadcast), one per-doc aggregation. Linear in corpus tokens, two
  map-side-combinable shuffles (doc buckets, per-doc sum), no
  all-pairs anything;
- selection: deterministic Gumbel keys from md5(doc_id) — seedless,
  replayable, and rank-k selection is one ``TakeOrderedAndProject``
  (or a threshold filter for streaming-sized batches).

100 TB posture: the target corpus is small by definition (a domain
sample); the raw corpus is the 100 TB side and is touched exactly
twice, each time by a linear explode+aggregate. The models and the
bucket count B are the only state — kilobytes to a few MB, broadcast.

Determinism: no RNG anywhere — md5 drives both the bucketing and the
Gumbel noise, so re-runs (and the DuckDB twin) agree bit-for-bit after
the engine's 6dp display rounding of the float fold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lakehouse_adventureworks2022_spark.operators.textops import tokens_col

#: 2^32 as a double — the md5-prefix space the uniform draw divides by.
_HASH_SPACE = float(1 << 32)


def _bucket(col: Column, buckets: int) -> Column:
    """First 8 md5 hex digits of ``col`` as an integer, mod ``buckets``
    — identical in DuckDB as
    ``CAST('0x' || substr(md5(x), 1, 8) AS BIGINT) % B``."""
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")
        % F.lit(buckets)
    )


def hashed_ngram_buckets(
    docs: DataFrame,
    text_col: str = "text",
    buckets: int = 10_000,
    max_n: int = 2,
) -> DataFrame:
    """``(doc_id, bucket, n)`` — per-doc hashed n-gram bag counts for
    n ∈ 1..max_n (DSIR's unigram+bigram default). One tokenize
    projection, one explode, one uniform-key aggregation."""
    toks = F.filter(tokens_col(F.col(text_col)), lambda t: F.length(t) > 0)
    grams = []
    for n in range(1, max_n + 1):
        if n == 1:
            grams.append(F.col("__toks__"))
        else:
            grams.append(
                F.expr(
                    f"CASE WHEN size(__toks__) >= {n} THEN"
                    f" transform(sequence(0, size(__toks__) - {n}),"
                    f"   i -> concat_ws(' ', "
                    f"{', '.join(f'__toks__[i+{j}]' for j in range(n))}))"
                    f" ELSE array() END"
                )
            )
        # NOTE: grams are NOT deduplicated — DSIR counts occurrences
        # (a bag, not a set), unlike the dedup family's shingle sets.
    return (
        docs.withColumn("__toks__", toks)
        .select("doc_id", F.explode(F.concat(*grams)).alias("gram"))
        .select("doc_id", _bucket(F.col("gram"), buckets).alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def fit_hashed_lm(
    docs: DataFrame,
    text_col: str = "text",
    buckets: int = 10_000,
    max_n: int = 2,
) -> DataFrame:
    """Bag-of-buckets count model ``(bucket, c)`` over a corpus — ≤
    ``buckets`` rows by construction. Smoothing happens at weighting
    time (the raw counts persist/merge like any table)."""
    return (
        hashed_ngram_buckets(docs, text_col, buckets, max_n)
        .groupBy("bucket")
        .agg(F.sum("n").alias("c"))
    )


def dsir_log_weights(
    raw: DataFrame,
    target_lm: DataFrame,
    raw_lm: DataFrame,
    text_col: str = "text",
    buckets: int = 10_000,
    max_n: int = 2,
    k: float = 0.5,
) -> DataFrame:
    """``(doc_id, n_features, log_weight)`` — each raw doc's log
    importance ratio under add-k smoothed target/raw bucket models.

    ``log_weight = Σ_b n_b · (log p̂_b − log q̂_b)`` with
    ``p̂_b = (c_b + k)/(N + k·B)`` per model; buckets unseen in a model
    fall into the additive mass via the left-join coalesce. Docs with
    zero features (empty/whitespace text) keep ``log_weight = 0``
    (weight 1 — no evidence either way) via the right join back to the
    corpus. The fold is display-rounded to 6dp (engine float policy —
    Spark's sum order differs from DuckDB's segment tree at ~1e-12).

    Both model frames are bounded (≤ ``buckets`` rows) and explicitly
    broadcast; the per-doc totals N fold in as broadcast one-row
    subplans, so the whole plan is lazy with no driver collects."""
    feats = hashed_ngram_buckets(raw, text_col, buckets, max_n)
    b = float(buckets)

    def _model(lm: DataFrame, cname: str, tname: str):
        tot = F.broadcast(
            lm.agg(F.sum("c").cast("double").alias(tname))
        )
        return F.broadcast(lm.withColumnRenamed("c", cname)), tot

    p, p_tot = _model(target_lm, "__pc__", "__pn__")
    q, q_tot = _model(raw_lm, "__qc__", "__qn__")
    logp = F.log(
        (F.coalesce(F.col("__pc__"), F.lit(0)).cast("double") + F.lit(k))
        / (F.col("__pn__") + F.lit(k * b))
    )
    logq = F.log(
        (F.coalesce(F.col("__qc__"), F.lit(0)).cast("double") + F.lit(k))
        / (F.col("__qn__") + F.lit(k * b))
    )
    per_doc = (
        feats.join(p, "bucket", "left")
        .join(q, "bucket", "left")
        .crossJoin(p_tot)
        .crossJoin(q_tot)
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_features"),
            F.sum(F.col("n") * (logp - logq)).alias("__lw__"),
        )
    )
    return (
        raw.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_features", F.lit(0)).alias("n_features"),
            F.round(F.coalesce("__lw__", F.lit(0.0)), 6).alias("log_weight"),
        )
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    buckets: int = 10_000,
    max_n: int = 2,
    k: float = 0.5,
) -> DataFrame:
    """Convenience composite: fit both bucket models and weight the raw
    corpus — ``(doc_id, n_features, log_weight)``. The raw corpus is
    scanned twice (model fit + featurization), both linear passes; for
    repeated selection rounds persist ``fit_hashed_lm`` outputs and
    call :func:`dsir_log_weights` directly."""
    return dsir_log_weights(
        raw,
        fit_hashed_lm(target, text_col, buckets, max_n),
        fit_hashed_lm(raw, text_col, buckets, max_n),
        text_col,
        buckets,
        max_n,
        k,
    )


def _gumbel_key(doc_id: Column) -> Column:
    """Deterministic Gumbel(0,1) noise from md5(doc_id): u uniform in
    (0,1) from the first 8 md5 hex digits, g = −ln(−ln(u)). Seedless
    and replayable — the same doc always draws the same noise, so a
    re-run (or a resumed job) selects the identical subset."""
    u = (
        F.conv(F.substring(F.md5(doc_id.cast("string")), 1, 8), 16, 10)
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(_HASH_SPACE)
    return -F.log(-F.log(u))


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    n_select: int,
    text_col: str = "text",
    buckets: int = 10_000,
    max_n: int = 2,
    k: float = 0.5,
) -> DataFrame:
    """Gumbel-top-k importance resampling: the ``n_select`` raw docs
    with the largest ``log_weight + Gumbel(md5(doc_id))`` — a
    without-replacement sample ∝ the importance weights (the Gumbel-max
    trick), deterministic end-to-end.

    Plan shape: the weighting passes above + ONE global top-k
    (``TakeOrderedAndProject`` — never a full sort) on a key that is a
    pure projection. Returns ``(doc_id, n_features, log_weight,
    sample_key)`` ordered by ``sample_key`` desc."""
    w = dsir_weights(raw, target, text_col, buckets, max_n, k)
    keyed = w.withColumn(
        "sample_key", F.round(F.col("log_weight") + _gumbel_key(F.col("doc_id")), 6)
    )
    return keyed.orderBy(F.desc("sample_key"), F.asc("doc_id")).limit(n_select)


__all__ = [
    "dsir_log_weights",
    "dsir_select",
    "dsir_weights",
    "fit_hashed_lm",
    "hashed_ngram_buckets",
]
