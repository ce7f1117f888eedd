"""Exact repeated-substring removal (the ExactSubstr dedup family —
Lee et al. 2022, "Deduplicating Training Data Makes Language Models
Better"): find every run of ``window`` consecutive tokens that occurs
more than once across the whole corpus and cut the duplicated spans out
of the documents, keeping one canonical occurrence.

Beyond-reference scope — the reference lakehouse
(racenak/lakehouse-adventureworks2022) has no text operators at all; in
an LLM-training pipeline this is the standard *substring-level* dedup
that document-level dedup (``operators/dedup.py``: exact hash,
MinHash-LSH, SimHash) cannot express: two documents that each embed the
same boilerplate paragraph are NOT near-duplicates as wholes, yet the
paragraph itself must not be trained on twice.

Spark-first re-expression of the suffix-array algorithm
-------------------------------------------------------
The published implementation builds one giant suffix array over the
concatenated corpus — inherently single-machine (the array must be
globally sorted and is bigger than the corpus). The distributed
re-expression used here detects the SAME spans via windowed rolling
fingerprints, which is embarrassingly parallel:

1. tokenize each doc (positions preserved), fingerprint every
   ``window``-token run with ``xxhash64`` — one row per (doc, pos),
   map-side only, linear in corpus tokens (the same explode volume as
   the MinHash shingle pass, the engine's proven scale shape);
2. ONE uniform-key aggregation on the 64-bit fingerprint → global
   occurrence count (+ the canonical first occurrence per fingerprint);
3. equi-join the window frame back to the duplicated fingerprints
   (AQE broadcasts the dup side when small) — touches candidates only;
4. per-doc interval merge of the flagged windows (positions are sorted,
   all intervals are ``window`` long, so a single ``F.aggregate`` fold
   merges overlaps — no UDF), then rebuild the text by dropping the
   covered token positions.

Exactness: with ``stride=1`` every duplicated ``window``-token run is
detected (two equal runs produce equal fingerprints at every alignment;
xxhash64 collisions at corpus scale are ~N²/2⁶⁴ — the same accepted
risk as the exact-dedup md5). ``stride>1`` is the documented
scale trade-off: fingerprint volume drops ×stride, but two copies of a
run are only guaranteed to share an aligned window when their start
positions agree mod stride, so recall < 1.

Reconstruction policy (shared with ``remove_boilerplate_lines``):
rebuilt text is the surviving tokens joined with single spaces —
whitespace is normalized, token *content* and order are untouched.
Fingerprints are computed over lowercased tokens (the engine's
case-insensitive match contract) while reconstruction uses the original
tokens, position-aligned.

Keep policy: ``keep="first"`` (default) preserves the globally first
occurrence of each duplicated window — min ``(doc_id, pos)``, a
deterministic, partitioning-independent choice — so one copy of every
span survives for training; ``keep="none"`` removes every occurrence
(the policy of the published ExactSubstr tool).

100 TB posture: nothing is all-pairs and nothing collects. The window
frame is O(corpus tokens / stride) rows of (long, int, long); both
shuffles (fingerprint agg, fingerprint join) key on a uniform 64-bit
hash; a pathological hot fingerprint (a phrase repeated millions of
times) skews the join — AQE skew-split covers it, and the canonical-
occurrence agg is a plain min, never a collect_list of occurrences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakehouse_adventureworks2022_spark.operators.textops import WS_PLUS

#: Unit-separator joint for window fingerprints — cannot appear inside a
#: whitespace-split token, so distinct token runs never concatenate to
#: equal strings.
_SEP = "\x1f"


def _with_tokens(df: DataFrame, text_col: str) -> DataFrame:
    """Original-case tokens (positions are indexes into this array) and
    their lowercased twins (the fingerprint alphabet)."""
    raw = F.filter(
        F.split(F.trim(F.col(text_col)), WS_PLUS), lambda t: F.length(t) > 0
    )
    return df.withColumn("__toks__", raw).withColumn(
        "__norm__", F.transform(F.col("__toks__"), F.lower)
    )


def window_fingerprints(
    df: DataFrame,
    window: int = 15,
    stride: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per ``window``-token run: ``(doc_id, pos, fp)``.

    ``pos`` is the 0-based token index of the run's first token; ``fp``
    is ``xxhash64`` of the lowercased run. Docs shorter than ``window``
    tokens contribute nothing (they are document-level dedup's job).
    Map-side only — no shuffle.
    """
    if window < 2:
        raise ValueError(f"window must be ≥ 2 tokens, got {window}")
    if stride < 1:
        raise ValueError(f"stride must be ≥ 1, got {stride}")
    toks = _with_tokens(df, text_col)
    n = F.size("__norm__")
    starts = F.when(
        n >= window,
        F.sequence(F.lit(0), n - window, F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    return (
        toks.select(
            F.col(id_col).alias("doc_id"),
            F.explode(starts).alias("pos"),
            F.col("__norm__"),
        )
        # slice is 1-based; fingerprint the lowercased run
        .select(
            "doc_id",
            "pos",
            F.xxhash64(
                F.concat_ws(
                    _SEP, F.slice("__norm__", F.col("pos") + 1, window)
                )
            ).alias("fp"),
        )
    )


def duplicate_spans(
    df: DataFrame,
    window: int = 15,
    stride: int = 1,
    min_count: int = 2,
    keep: str = "first",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Merged duplicated spans per document: ``(doc_id, start, end)``
    with ``end`` exclusive, in token positions.

    A window is *flagged* when its fingerprint occurs ``min_count``+
    times corpus-wide — minus, under ``keep="first"``, the canonical
    first occurrence (global min ``(doc_id, pos)`` per fingerprint),
    which stays unflagged so one copy of every duplicated run survives.
    Overlapping/adjacent flagged windows merge into maximal spans.
    """
    if keep not in ("first", "none"):
        raise ValueError(f"keep must be 'first' or 'none', got {keep!r}")
    wins = window_fingerprints(df, window, stride, text_col, id_col)
    freq = wins.groupBy("fp").agg(
        F.count(F.lit(1)).alias("occ"),
        F.min(F.struct("doc_id", "pos")).alias("keeper"),
    )
    flagged = wins.join(
        freq.filter(F.col("occ") >= min_count), "fp", "inner"
    )
    if keep == "first":
        flagged = flagged.filter(
            ~(
                (F.col("doc_id") == F.col("keeper.doc_id"))
                & (F.col("pos") == F.col("keeper.pos"))
            )
        )
    # positions sorted ascending and every interval is `window` long, so
    # the merge fold only ever extends the LAST interval: a new interval
    # starts iff pos > last.end.
    merged = F.aggregate(
        F.sort_array(F.collect_list("pos")),
        F.expr("CAST(array() AS array<struct<start:int, end:int>>)"),
        lambda acc, p: F.when(
            (F.size(acc) == 0) | (p > F.element_at(acc, -1)["end"]),
            F.concat(
                acc,
                F.array(
                    F.struct(
                        p.alias("start"), (p + window).alias("end")
                    )
                ),
            ),
        ).otherwise(
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.struct(
                        F.element_at(acc, -1)["start"].alias("start"),
                        (p + window).alias("end"),
                    )
                ),
            )
        ),
    )
    return (
        flagged.groupBy("doc_id")
        .agg(merged.alias("spans"))
        .select("doc_id", F.explode("spans").alias("span"))
        .select(
            "doc_id",
            F.col("span.start").alias("start"),
            F.col("span.end").alias("end"),
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    window: int = 15,
    stride: int = 1,
    min_count: int = 2,
    keep: str = "first",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus with duplicated spans cut out: ``(doc_id, text,
    removed_tokens, span_count)``.

    Documents without duplicated spans pass through with whitespace-
    normalized text (single-space joins — same policy as
    ``remove_boilerplate_lines``) so the output column is uniformly
    normalized. A doc whose every token sits in duplicated spans comes
    back with empty text (``removed_tokens`` = its length) — the
    downstream quality gate drops empties.
    """
    spans = (
        duplicate_spans(
            df, window, stride, min_count, keep, text_col, id_col
        )
        .groupBy("doc_id")
        .agg(
            F.collect_list(F.struct("start", "end")).alias("spans"),
        )
    )
    toks = _with_tokens(df, text_col).withColumnRenamed(id_col, "doc_id")
    joined = toks.join(spans, "doc_id", "left")
    drop = F.when(
        F.col("spans").isNotNull(),
        F.array_distinct(
            F.flatten(
                F.transform(
                    "spans",
                    lambda s: F.sequence(s["start"], s["end"] - 1),
                )
            )
        ),
    ).otherwise(F.array().cast("array<int>"))
    kept = F.filter(
        F.col("__toks__"),
        lambda t, i: ~F.array_contains(F.col("__drop__"), i),
    )
    return (
        joined.withColumn("__drop__", drop)
        .select(
            "doc_id",
            F.array_join(kept, " ").alias(text_col),
            F.size("__drop__").alias("removed_tokens"),
            F.coalesce(F.size("spans"), F.lit(0)).alias("span_count"),
        )
    )
