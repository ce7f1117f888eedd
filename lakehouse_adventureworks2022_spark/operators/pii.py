"""PII detection and scrubbing for training-data curation — the
redaction stage every public-corpus pipeline runs before training
(C4/Dolma-style classes: emails, IPv4 addresses, phone numbers,
SSN-shaped ids).

Relationship to ``textops.redact_pii`` (the other scrubber in this
engine, and the one the ``prepare_training_corpus`` composites call):
that one trades portability for PRECISION — its phone pattern uses
Java-regex lookarounds to leave ISO dates and dotted identifiers
intact, which RE2/DuckDB cannot express, so its evidence is
pytest-only. THIS module is the cross-engine-verifiable core: every
pattern is written in the common Java-regex ∩ RE2 subset (no
lookaround, no possessive quantifiers) so the EXACT same pattern
string runs in the DuckDB differential twin
(`plans/text_queries.ORACLE_PII_SCRUB`, generated from this table),
and adds the per-class census (:func:`detect_pii`), class selection
and an idempotence guarantee. Patterns whose semantics coincide
(email) are shared, not duplicated.

Design: pure Catalyst ``regexp_count`` / ``regexp_replace`` chains —
zero shuffle, zero UDFs, whole-stage codegen.

Scale: a linear projection over the corpus; at 100 TB this is the
cheapest kind of operator there is — it pushes column pruning to the
scan and adds no exchange. Redaction order is fixed (ip → email → ssn
→ phone) so class patterns never see another class's placeholder
token; the order is part of the semantics and mirrored in the SQL
twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: class → (pattern, replacement token), in SCRUB ORDER. Patterns use
#: the Java-regex ∩ RE2 subset; ip precedes phone so dotted quads are
#: never half-eaten by the phone matcher, and ssn precedes phone so a
#: 3-2-4 id isn't misread as a 3-3-4 phone tail.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "ipv4": (
        r"\b(?:(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}"
        r"(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\b",
        "<IP>",
    ),
    "email": (
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    "ssn": (r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    "phone": (
        r"(?:\+?[0-9]{1,3}[-. ]?)?\(?[0-9]{3}\)?[-. ]?[0-9]{3}[-. ]?[0-9]{4}\b",
        "<PHONE>",
    ),
}


def _count(col: Column, pattern: str) -> Column:
    return F.regexp_count(col, F.lit(pattern))


def detect_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII census: ``(id, n_<class>..., n_pii, has_pii)``.

    Counts are non-overlapping left-to-right matches per class on the
    RAW text (detection is independent per class; scrubbing — where
    earlier classes consume characters — is :func:`scrub_pii`).
    One zero-shuffle projection."""
    counts = {
        name: _count(F.col(text_col), pat).alias(f"n_{name}")
        for name, (pat, _) in PII_PATTERNS.items()
    }
    total = sum(F.col(f"n_{name}") for name in PII_PATTERNS)
    return (
        df.select(F.col(id_col), *counts.values())
        .withColumn("n_pii", total.cast("int"))
        .withColumn("has_pii", F.col("n_pii") > 0)
    )


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    classes: list[str] | None = None,
) -> DataFrame:
    """Replace each PII span with its class placeholder token, in the
    fixed :data:`PII_PATTERNS` order. Idempotent (placeholders contain
    no digits or ``@``, so no pattern re-matches them — tested).
    Adds ``n_redactions`` (count of spans consumed, measured per class
    on the text AS EACH CLASS SEES IT, matching what was actually
    replaced). Returns all input columns with ``out_col`` (default:
    overwrite ``text_col``) scrubbed."""
    names = list(PII_PATTERNS) if classes is None else list(classes)
    unknown = [n for n in names if n not in PII_PATTERNS]
    if unknown:
        raise ValueError(f"unknown PII classes: {unknown}")
    target = out_col or text_col
    cur: Column = F.col(text_col)
    redacted: Column = F.lit(0)
    for name in names:
        pat, token = PII_PATTERNS[name]
        redacted = redacted + _count(cur, pat)
        cur = F.regexp_replace(cur, pat, token)
    keep = [c for c in df.columns if c != target]
    return df.select(
        *keep,
        cur.alias(target),
        redacted.cast("int").alias("n_redactions"),
    )
