"""Text-analysis operators for training-data pipelines (beyond-reference
scope, BASELINE.json north star): token statistics, quality scoring,
language-ID heuristic, document fingerprinting.

All pure Catalyst (split/filter/transform/aggregate higher-order
functions) — zero Python UDFs, so the hot path stays in whole-stage
codegen and scales linearly with executors over a 100 TB corpus: these are
embarrassingly parallel per-row projections with no shuffle at all.

Tokenization contract (shared with the DuckDB oracles): lowercase, trim,
split on :data:`WS_PLUS`. Keep this in sync with
``plans/text_queries.py`` (the twins interpolate the same constant).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Explicit whitespace class for EVERY oracle-shared regex (the DuckDB
#: twins interpolate this same constant): Java's ``\s`` includes
#: ``\x0b`` (vertical tab), RE2's does not, so a bare ``\s`` on either
#: side silently diverges the engines on \x0b input. The class is the
#: RE2-visible set — a vertical tab is an ordinary token character in
#: BOTH engines. Never use ``\s`` in a regex an oracle shares.
WS_CLASS = r"[ \t\n\r\f]"
WS_PLUS = WS_CLASS + "+"

#: Tiny per-language stopword lists for the n-gram/stopword language-ID
#: heuristic. Deliberately small + deterministic (an oracle-checkable
#: heuristic, not a trained model — swap in fastText/CLD3 on a real
#: cluster via the pandas-UDF seam in multimodal.py).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "los"),
    "de": ("der", "die", "und", "das", "ist", "ein", "nicht", "mit"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "est"),
}

STOPWORDS_ALL: tuple[str, ...] = tuple(
    dict.fromkeys(w for ws in LANG_STOPWORDS.values() for w in ws)
)

#: Trainability-gate thresholds. Single source of truth: the SQL twin in
#: ``plans/text_queries.py`` builds its quality predicate from these same
#: constants, so an edit here cannot desynchronize the oracles.
QUALITY_MIN_TOKENS = 5
QUALITY_MIN_TTR = 0.05
QUALITY_MAX_PUNCT_RATIO = 0.2


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization of lowercased text (the engine's shared
    tokenizer contract)."""
    return F.split(F.trim(F.lower(text)), WS_PLUS)


def _count_in(tokens: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(tokens, lambda t: t.isin(*words)))


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document token statistics + quality score.

    Ratios are integer/integer divisions — bit-identical across engines,
    no rounding policy needed.
    """
    toks = tokens_col(F.col(text_col))
    out = df.withColumn("__toks__", toks)
    n_tokens = F.size(F.col("__toks__"))
    n_distinct = F.size(F.array_distinct(F.col("__toks__")))
    token_chars = F.aggregate(
        F.transform(F.col("__toks__"), lambda t: F.length(t)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    stop_hits = _count_in(F.col("__toks__"), STOPWORDS_ALL)
    punct = F.length(
        F.regexp_replace(F.col(text_col), r"[^.,;:!?]", "")
    )
    out = out.select(
        "doc_id",
        F.length(F.col(text_col)).alias("n_chars"),
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct_tokens"),
        (n_distinct.cast("double") / n_tokens).alias("type_token_ratio"),
        (token_chars.cast("double") / n_tokens).alias("avg_token_len"),
        stop_hits.alias("stopword_hits"),
        (stop_hits.cast("double") / n_tokens).alias("stopword_ratio"),
        punct.alias("punct_count"),
    )
    # simple trainability gate: enough tokens, lexical diversity, bounded
    # punctuation density (the length/punct/stopword quality heuristics)
    return out.withColumn(
        "is_quality",
        (F.col("n_tokens") >= QUALITY_MIN_TOKENS)
        & (F.col("type_token_ratio") > QUALITY_MIN_TTR)
        & (
            F.col("punct_count").cast("double") / F.col("n_chars")
            < QUALITY_MAX_PUNCT_RATIO
        ),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit language identification with a deterministic argmax
    (ties resolved in fixed language order, 0 hits ⇒ 'und')."""
    out = df.withColumn("__toks__", tokens_col(F.col(text_col)))
    for lang, words in LANG_STOPWORDS.items():
        out = out.withColumn(f"hits_{lang}", _count_in(F.col("__toks__"), words))
    langs = list(LANG_STOPWORDS)
    best = F.greatest(*[F.col(f"hits_{lg}") for lg in langs])
    pred = F.lit("und")
    for lg in reversed(langs):  # earlier langs win ties ⇒ apply in reverse
        pred = F.when(F.col(f"hits_{lg}") == best, F.lit(lg)).otherwise(pred)
    pred = F.when(best > 0, pred).otherwise(F.lit("und"))
    return out.select(
        "doc_id",
        *[F.col(f"hits_{lg}") for lg in langs],
        pred.alias("predicted_lang"),
    )


def lang_id_col(text: Column) -> Column:
    """Column form of :func:`lang_id`'s verdict — the stopword-hit
    argmax as ONE expression, for call sites that attach a language to
    a projection without the hits columns (the crawl front door's
    ``detect_lang``). The token array is bound ONCE inside a
    higher-order ``transform`` over a 1-element array (Spark has no
    let-binding; without the HOF each language's filter would inline
    its own copy of the tokenizer split). Agrees with
    ``lang_id().predicted_lang`` by construction — differential-tested
    in ``test_textops_extended.py``."""

    def _pred(toks: Column) -> Column:
        hits = {
            lg: F.size(F.filter(toks, lambda t: t.isin(*ws)))
            for lg, ws in LANG_STOPWORDS.items()
        }
        best = F.greatest(*hits.values())
        pred = F.lit("und")
        for lg in reversed(list(LANG_STOPWORDS)):
            pred = F.when(hits[lg] == best, F.lit(lg)).otherwise(pred)
        return F.when(best > 0, pred).otherwise(F.lit("und"))

    return F.transform(F.array(tokens_col(text)), _pred)[0]


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprints: md5 of whitespace-normalized text (exact
    content identity) + min-shingle fingerprint (minhash with k=1 over
    3-token shingles — stable under local edits)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), WS_PLUS, " ")
    out = df.withColumn("__toks__", tokens_col(F.col(text_col)))
    # i ranges 0..L-3 (guarded: sequence(0, negative) would DESCEND)
    shingles = F.expr(
        "CASE WHEN size(__toks__) >= 3 THEN"
        " transform(sequence(0, size(__toks__) - 3),"
        "   i -> concat_ws(' ', __toks__[i], __toks__[i+1], __toks__[i+2]))"
        " ELSE array() END"
    )
    min_shingle_hash = F.array_min(
        F.transform(shingles, lambda s: F.md5(s))
    )
    return out.select(
        "doc_id",
        F.md5(norm).alias("content_hash"),
        min_shingle_hash.alias("min_shingle_hash"),
    )


#: BPE-ish pre-tokenizer: letter runs, single digits, single
#: non-alphanumeric marks (the GPT-2-style split shape, ASCII classes
#: only so Java and RE2 regex engines agree byte-for-byte).
BPE_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9 \t\n\r\f]"


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting at both granularities a training pipeline budgets
    with: whitespace tokens and BPE-ish subword pieces (letter runs /
    digits / marks). ``chars_per_subword`` approximates the
    chars-per-token compression ratio used for corpus sizing."""
    ws = F.size(tokens_col(F.col(text_col)))
    sub = F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_PATTERN), 0))
    return df.select(
        "doc_id",
        ws.alias("n_ws_tokens"),
        sub.alias("n_subword_tokens"),
        F.when(
            sub > 0, F.length(F.col(text_col)).cast("double") / sub
        ).alias("chars_per_subword"),
    )


#: Phone pattern, built up for readability. Requirements (precision over
#: recall — this is a conservative first-pass scrub):
#: - word boundaries: not glued to letters/digits/dots/hyphens on either side;
#: - total digit budget 7-15 (ITU E.164 max is 15; <7 is not a dialable
#:   number) — enforced by one greedy lookahead that backtracks 15→7;
#: - phone-like GROUP structure: 1-4-digit groups joined by space/dot/
#:   dash (at least one separator, so bare numeric IDs never match);
#: - ISO dates are excluded, bare (dddd-dd-dd with no further digits) or
#:   with a time tail (dddd-dd-dd[ T]hh: …) — otherwise a timestamp like
#:   "2024-01-15 12:30" would be half-eaten as "<PHONE>:30";
#: - dotted-identifier-shaped runs (version strings "1.2.3.4000",
#:   European dates "15.01.2024") are excluded by rejecting a LEADING
#:   1-2-digit dot-group; dotted phones keep matching because their
#:   leading group is a 3+-digit area/country code (or starts with "+").
_PHONE = (
    r"(?<![0-9A-Za-z.-])"  # left boundary
    r"(?!\d{4}-\d{2}-\d{2}(?:[ T]\d{1,2}:|(?![\s().-]{0,2}\d)))"  # not ISO date/datetime
    r"(?!\d{1,2}\.\d)"  # not a dotted identifier / d.m.yyyy date
    r"(?=\+?\(?(?:[\s().-]{0,3}\d){7,15}(?![\s().-]{0,2}\d))"  # 7-15 digits total
    r"\+?\(?\d{1,4}\)?(?:[\s.-]{1,2}\(?\d{1,4}\)?){1,6}"  # grouped digits
    r"(?![0-9A-Za-z])(?![\s.-]{1,2}\d)"  # right boundary: whole run or nothing
)

#: PII-shaped patterns for corpus scrubbing. Deliberately conservative
#: (high-precision regexes a training pipeline runs before anything else;
#: entity-model scrubbing plugs in via the same projection seam). Order
#: matters: e-mail before phone so the local-part digits aren't eaten,
#: and ipv4 before phone so dotted quads are counted once as IPs.
def _email_pattern() -> str:
    # shared with the portable scrubber — one source of truth where the
    # two modules' semantics coincide (see operators/pii.py module doc
    # for the precision-vs-portability split)
    from lakehouse_adventureworks2022_spark.operators.pii import (
        PII_PATTERNS as _PORTABLE,
    )

    return _PORTABLE["email"][0]


PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", _email_pattern(), "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", _PHONE, "<PHONE>"),
)


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Scrub PII-shaped spans and count what was removed.

    One chained ``regexp_replace`` projection per pattern — zero-shuffle,
    codegen'd, linear over a 100 TB corpus. ``<name>_hits`` is counted on
    the text AFTER the earlier patterns were redacted (exactly what this
    pattern's replace sees), so a dotted quad counts once as an IP and
    never doubles as a phone hit. Replaces ``text`` with the redacted
    form, so downstream dedup/quality stages see the scrubbed corpus and
    auditors see what left.

    This is the PRECISION scrubber (lookaround-based phone
    disambiguation — Java-regex only, pytest-evidenced). The
    cross-engine-verifiable portable variant, with per-class census and
    a generated DuckDB twin, is ``operators/pii.py`` (see its module
    doc for the split).
    """
    out = df
    running = F.col(text_col)
    for name, pat, tag in PII_PATTERNS:
        out = out.withColumn(
            f"{name}_hits",
            F.size(F.regexp_extract_all(running, F.lit(pat), F.lit(0))),
        )
        running = F.regexp_replace(running, pat, tag)
    return out.withColumn(text_col, running)


def tf_idf(
    df: DataFrame, text_col: str = "text", min_df: int = 1, top_k: int = 5
) -> DataFrame:
    """Per-document top-k TF-IDF terms — the rare-term profile a curation
    pipeline uses for topic skew and boilerplate detection.

    Shape: explode distinct-per-doc tokens → document frequency per term
    (one shuffle on the uniform token key) → broadcast-join idf back to
    the (doc, term, tf) rows keyed on token — the DF table is vocabulary-
    sized (≪ corpus; at 100 TB cap it with ``min_df`` so the join side
    stays broadcastable or falls back to a shuffle join AQE picks) →
    per-doc top-k via window rank on the doc-keyed shuffle.

    idf = ln((N + 1) / (df + 1)) + 1 (smoothed, sklearn-style);
    tf = term count / doc token count.
    """
    from pyspark.sql import Window

    toks = df.select(
        "doc_id", F.explode(tokens_col(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("n"))
    doc_len = tf.groupBy("doc_id").agg(F.sum("n").alias("doc_len"))
    n_docs = df.select(F.countDistinct("doc_id").alias("n_docs"))
    doc_freq = (
        tf.groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= min_df)
    )
    idf = doc_freq.crossJoin(F.broadcast(n_docs)).select(
        "term",
        "df",
        (
            F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + F.lit(1.0)
        ).alias("idf"),
    )
    scored = (
        tf.join(doc_len, "doc_id")
        .join(F.broadcast(idf), "term")
        .select(
            "doc_id",
            "term",
            (
                (F.col("n") / F.col("doc_len")) * F.col("idf")
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= top_k)
        .select("doc_id", "term", "tfidf", "rank")
    )


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Within-document repetition profile (the Gopher/RefinedWeb-style
    boilerplate signals): line counts, distinct-line ratio, and the
    repeated-character-run flag — zero-shuffle projections.

    ``dup_line_ratio`` near 1 means heavy boilerplate (headers, nav,
    templated text); a training pipeline gates or de-boilerplates such
    docs before tokenization.
    """
    lines = F.filter(
        F.split(F.col(text_col), r"\n"), lambda x: F.length(F.trim(x)) > 0
    )
    n_lines = F.size(lines)
    n_distinct = F.size(F.array_distinct(lines))
    return df.select(
        "doc_id",
        n_lines.alias("n_lines"),
        n_distinct.alias("n_distinct_lines"),
        F.when(n_lines > 0, 1.0 - n_distinct.cast("double") / n_lines)
        .otherwise(F.lit(0.0))
        .alias("dup_line_ratio"),
        F.col(text_col).rlike(r"(.)\1{19,}").alias("has_char_run"),
    )


def ngram_repetition_stats(
    df: DataFrame, text_col: str = "text", ns: tuple[int, ...] = (2, 3, 4)
) -> DataFrame:
    """Repeated-n-gram character fractions per document — the published
    repetition filters (Gopher / MassiveText / RefinedWeb family) that
    catch templated spam :func:`repetition_stats`' line signals miss
    (repetition WITHIN a line, no newlines to split on).

    For each n in ``ns``:

    - ``dup_{n}gram_frac`` — characters in occurrences BEYOND the first
      of each repeated word n-gram, over the document's non-space char
      count: ``Σ_g (c_g − 1)·len(g) / n_chars``;
    - ``top_{n}gram_frac`` — characters covered by the single
      highest-coverage n-gram: ``max_g c_g·len(g) / n_chars`` (a pure
      max over values — deterministic with no tie-break needed).

    Sliding-window n-grams overlap, so raw sums can exceed the doc's
    char count; both fractions are clamped to 1.0 (an upper bound of
    the union-coverage form, which would need interval merging — a
    clamped score ≥ the published thresholds still gates correctly).

    Shape: one explode + one (doc_id, gram) aggregation + one doc_id
    aggregation PER n — uniform keys, no quadratic step; docs shorter
    than n tokens report 0.0. Entirely Catalyst (no UDFs).
    """
    toks = tokens_col(F.col(text_col))
    base = df.select(
        "doc_id",
        F.col(text_col).alias("__text__"),
        toks.alias("__toks__"),
        F.length(F.regexp_replace(F.col(text_col), WS_PLUS, "")).cast(
            "double"
        ).alias("__chars__"),
    )
    out = df.select("doc_id")
    for n in ns:
        grams = F.expr(
            f"CASE WHEN size(__toks__) >= {n} THEN"
            f" transform(sequence(0, size(__toks__) - {n}),"
            f"   i -> concat_ws(' ', {', '.join(f'__toks__[i+{j}]' for j in range(n))}))"
            f" ELSE array() END"
        )
        counts = (
            base.select(
                "doc_id", "__chars__", F.explode(grams).alias("gram")
            )
            .groupBy("doc_id", "gram")
            .agg(
                F.first("__chars__").alias("__chars__"),
                F.count(F.lit(1)).alias("c"),
            )
        )
        glen = F.length(F.regexp_replace(F.col("gram"), WS_PLUS, ""))
        per_doc = counts.groupBy("doc_id").agg(
            F.least(
                F.lit(1.0),
                F.sum((F.col("c") - 1) * glen) / F.first("__chars__"),
            ).alias(f"dup_{n}gram_frac"),
            F.least(
                F.lit(1.0),
                F.max(F.col("c") * glen) / F.first("__chars__"),
            ).alias(f"top_{n}gram_frac"),
        )
        out = out.join(per_doc, "doc_id", "left")
    fill = {f"dup_{n}gram_frac": 0.0 for n in ns}
    fill.update({f"top_{n}gram_frac": 0.0 for n in ns})
    return out.fillna(fill)


def dedup_lines_within_doc(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Remove repeated lines inside each document, keeping first
    occurrences in order (``array_distinct`` preserves encounter order)
    — the cheap declarative de-boilerplate pass. Empty/whitespace lines
    collapse away with the duplicates."""
    lines = F.filter(
        F.split(F.col(text_col), r"\n"), lambda x: F.length(F.trim(x)) > 0
    )
    return df.withColumn(
        text_col, F.concat_ws("\n", F.array_distinct(lines))
    )


def boilerplate_lines(
    df: DataFrame,
    text_col: str = "text",
    min_docs: int = 3,
    min_line_chars: int = 6,
) -> DataFrame:
    """Corpus-wide boilerplate inventory: ``(bp_line, doc_count)`` for
    every trimmed line appearing in ≥ ``min_docs`` DISTINCT documents
    (the C4 / RefinedWeb corpus-level line filter — nav bars, cookie
    banners, templated footers repeat across pages, not within one).

    Lines shorter than ``min_line_chars`` after trimming are never
    counted (protects blank lines, list bullets, code indentation).

    Shape: per-doc ``array_distinct`` of trimmed lines BEFORE the
    explode makes ``count(1)`` an exact distinct-doc count with no
    ``count(distinct)`` expansion — one explode + one uniform-key
    aggregation, linear at any corpus size.
    """
    keys = df.select(
        F.explode(
            F.array_distinct(
                F.transform(F.split(F.col(text_col), r"\n"), F.trim)
            )
        ).alias("bp_line")
    ).where(F.length("bp_line") >= min_line_chars)
    return (
        keys.groupBy("bp_line")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .where(F.col("doc_count") >= min_docs)
    )


def remove_boilerplate_lines(
    df: DataFrame,
    text_col: str = "text",
    min_docs: int = 3,
    min_line_chars: int = 6,
) -> DataFrame:
    """Strip corpus-wide boilerplate lines from every document (the
    cross-document companion of :func:`dedup_lines_within_doc`): any
    line whose trimmed form appears in ≥ ``min_docs`` distinct docs is
    removed from all of them, surviving lines keep their original order,
    and ``n_boilerplate_removed`` counts the lines dropped per doc.

    Docs whose every line is boilerplate come back with empty text (the
    caller's quality gate drops them — this operator never drops rows).

    Shape: the line inventory (:func:`boilerplate_lines`) is one
    aggregation; removal is a ``left`` equi-join of exploded lines
    against it (the inventory side is one row per key — a matched line
    is marked, never fanned out), then one per-doc rebuild aggregation
    (``sort_array(collect_list(when(not bp, struct(pos, line))))``
    restores order — no window, no global sort; ``collect_list`` skips
    the NULLs the boilerplate rows become). Popular boilerplate lines
    skew the join's shuffle keys; AQE skew-split handles the rest. All
    other columns of ``df`` pass through untouched.

    r14 shape note: the per-doc TOTAL line count rides through the
    exploded side (``count(*)`` of the rebuild aggregation — every doc
    keeps at least one exploded row, so the marked left join preserves
    all docs, including all-boilerplate ones), so the final join's
    ``df`` side no longer references ``text_col`` at all. When the text
    column is an expensive derived chain (the web-corpus pipeline:
    extraction + PII scrub), that side's chain is column-pruned away —
    one full pass of the strip chain saved per consumer — and over a
    plain table it saves re-reading the text bytes. Values are
    unchanged: the old ``size(split(text))`` on the df side equals the
    exploded row count per doc by construction.
    """
    bp = boilerplate_lines(df, text_col, min_docs, min_line_chars).withColumn(
        "__bp__", F.lit(True)
    )
    parts = df.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), r"\n")).alias("pos", "line"),
    )
    marked = parts.join(
        bp, F.trim(parts["line"]) == bp["bp_line"], "left"
    )
    keep_row = F.col("__bp__").isNull()
    rebuilt = marked.groupBy("doc_id").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.when(keep_row, F.struct("pos", "line"))
                    )
                ),
                lambda s: s["line"],
            ),
        ).alias("__clean__"),
        F.count(F.when(keep_row, F.lit(1))).alias("__kept__"),
        F.count(F.lit(1)).alias("__nl__"),
    )
    return (
        df.join(rebuilt, "doc_id", "left")
        .withColumn(
            "n_boilerplate_removed",
            (
                F.coalesce(F.col("__nl__"), F.lit(0))
                - F.coalesce(F.col("__kept__"), F.lit(0))
            ).cast("int"),
        )
        .withColumn(text_col, F.coalesce(F.col("__clean__"), F.lit("")))
        .drop("__clean__", "__kept__", "__nl__")
    )


def vocabulary(
    df: DataFrame, text_col: str = "text", top_n: int = 1000
) -> DataFrame:
    """Corpus vocabulary: the ``top_n`` terms by total frequency with
    ``(term, term_freq, doc_freq)`` — the vocab-building / stopword-
    discovery pass a tokenizer pipeline runs first (terms in nearly
    every doc are stopword candidates; the tail sets the OOV budget).

    Shape: one explode + a (doc_id, term) pre-aggregation (map-side
    combine collapses within-doc repeats before the shuffle), then a
    term aggregation where ``count(1)`` over the pre-agg IS the exact
    distinct-doc count — no ``count(distinct)`` expand. Top-n compiles
    to TakeOrderedAndProject. Ties break on the term string so the cut
    is deterministic.
    """
    toks = F.filter(
        tokens_col(F.col(text_col)), lambda t: F.length(t) > 0
    )
    per_doc = (
        df.select("doc_id", F.explode(toks).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return (
        per_doc.groupBy("term")
        .agg(
            F.sum("tf").alias("term_freq"),
            F.count(F.lit(1)).alias("doc_freq"),
        )
        .orderBy(F.desc("term_freq"), F.asc("term"))
        .limit(top_n)
    )


# ---- unicode normalization + URL/domain census (r7) ------------------

#: one-to-one char translation the normalizer applies BEFORE case
#: folding: curly quotes → straight, en/em dash → hyphen, NBSP → space.
#: Kept to 1:1 pairs so the same `translate()` call runs verbatim in
#: the DuckDB twin.
NORMALIZE_FROM = "‘’“”–— "
NORMALIZE_TO = "''\"\"-- "

#: control chars stripped to spaces (common Java-regex ∩ RE2 class).
_CONTROL_CLASS = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"


def normalize_text(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Canonical text normalization for dedup/tokenizer front-ends:
    typographic chars unified (:data:`NORMALIZE_FROM`), control chars
    stripped, case folded, whitespace collapsed + trimmed. Exact-dup
    detection over normalized text catches the copies that differ only
    by smart quotes or stray NBSPs — run this BEFORE hashing.

    One zero-shuffle codegen projection; every step is a function both
    engines share, so the catalog twin (`ORACLE_NORMALIZE_TEXT`) is
    exact. Order matters and is part of the contract:
    translate → control-strip → lower → collapse → trim."""
    target = out_col or text_col
    cur = F.translate(F.col(text_col), NORMALIZE_FROM, NORMALIZE_TO)
    cur = F.regexp_replace(cur, _CONTROL_CLASS, " ")
    cur = F.lower(cur)
    cur = F.trim(F.regexp_replace(cur, WS_PLUS, " "))
    keep = [c for c in df.columns if c != target]
    return df.select(*keep, cur.alias(target))


#: capture group 1 = the host part of an http(s) URL (RE2-safe).
URL_DOMAIN_PATTERN = r"https?://([A-Za-z0-9.-]+)"


def extract_domains(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """``(id, domain)`` per URL mention (lowercased host, duplicates
    kept — one row per reference). Zero shuffle: extract-all + explode
    projection."""
    return df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(URL_DOMAIN_PATTERN), 1)
        ).alias("domain"),
    ).withColumn("domain", F.lower(F.col("domain")))


def domain_census(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-domain corpus census: ``(domain, n_docs, n_refs)`` — the
    table a blocklist/allowlist policy is applied against (and the
    first artifact a corpus audit asks for). One uniform-key
    aggregation over the exploded mentions; distinct-doc counting is a
    per-doc pre-dedup (``distinct`` on (id, domain)) joined as a count,
    never a ``count(distinct)`` expansion."""
    mentions = extract_domains(df, text_col, id_col)
    refs = mentions.groupBy("domain").agg(F.count("*").alias("n_refs"))
    docs = (
        mentions.distinct()
        .groupBy("domain")
        .agg(F.count("*").alias("n_docs"))
    )
    return docs.join(refs, "domain").select("domain", "n_docs", "n_refs")


def filter_blocked_domains(
    df: DataFrame,
    blocked: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop every document that mentions ANY blocked domain (the
    C4-style blocklist gate). ``blocked`` is a 1-column ``domain``
    frame — broadcast (blocklists are small); the doc side never
    shuffles: extract → broadcast semi-join to find offenders →
    broadcast anti-join back on the id."""
    offenders = (
        extract_domains(df, text_col, id_col)
        .join(F.broadcast(blocked.select("domain")), "domain", "left_semi")
        .select(id_col)
        .distinct()
    )
    return df.join(F.broadcast(offenders), id_col, "left_anti")


# ---- URL canonicalization (r11) ---------------------------------------

#: scheme capture (group 1) — generic RFC-3986 scheme chars, anchored.
URL_SCHEME_PATTERN = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
#: host[:port] capture (group 1): everything between :// and the first
#: path/query/fragment delimiter.
URL_HOSTPORT_PATTERN = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
#: path+query capture (group 1): everything after the authority, up to
#: (and excluding) any fragment.
URL_REST_PATTERN = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)"

#: tracking query parameters stripped by :func:`canonicalize_url_col`,
#: matched as a WHOLE param (name before ``=``, anchored both ends).
#: The standard crawl-hygiene list: analytics campaign tags and click
#: identifiers that vary per visit without changing the resource.
#: Java∩RE2 subset (alternation + anchors, no lookaround) — the DuckDB
#: twin interpolates this same constant.
TRACKING_PARAM_PATTERN = (
    r"^(utm_[a-zA-Z0-9_]*|gclid|dclid|fbclid|msclkid|igshid|twclid|"
    r"mc_eid|mc_cid|yclid|_ga|_gl|ref|ref_src|ref_url|spm)(=.*)?$"
)


def canonicalize_url_col(url: Column) -> Column:
    """Canonical form of a URL column — the crawl-dedup key that runs
    BEFORE fetch/extract in a web pipeline (two raw URLs with the same
    canonical form are the same resource; fetching both wastes the
    crawl budget and plants exact dups downstream).

    Contract (each step a pure Catalyst expression, zero UDF):

    1. surrounding whitespace stripped (explicit class — never ``\\s``);
    2. fragment (``#...``) dropped — fragments are client-side only;
    3. scheme and host lowercased (path/query case is significant per
       RFC 3986 and preserved);
    4. default ports stripped (``http://h:80`` ≡ ``http://h``,
       ``https://h:443`` ≡ ``https://h``);
    5. tracking params (:data:`TRACKING_PARAM_PATTERN`) and empty
       params dropped; survivors sorted bytewise so param order can't
       split a group;
    6. empty path → ``/`` (``http://h`` ≡ ``http://h/``).

    Non-URLs (no ``scheme://``) come back NULL — the caller decides
    whether that row is droppable or an upstream bug. Percent-encoding
    and dot-segment resolution are deliberately out of scope (both
    need a spec-complete parser; this is the high-throughput regex
    tier, same posture as :func:`extract_html_text`)."""
    u = F.regexp_replace(url, f"^{WS_CLASS}+|{WS_CLASS}+$", "")
    u = F.regexp_replace(u, r"#.*", "")
    scheme = F.lower(F.regexp_extract(u, URL_SCHEME_PATTERN, 1))
    hostport = F.lower(F.regexp_extract(u, URL_HOSTPORT_PATTERN, 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, r":443$", ""))
        .otherwise(hostport)
    )
    rest = F.regexp_extract(u, URL_REST_PATTERN, 1)
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (F.length(p) > 0)
            & ~p.rlike(TRACKING_PARAM_PATTERN),
        )
    )
    qs = F.concat_ws("&", kept)
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(F.length(qs) > 0, F.concat(F.lit("?"), qs)).otherwise(
            F.lit("")
        ),
    )
    return F.when(scheme != "", canon)


def canonical_host_col(url: Column) -> Column:
    """The URL's canonical host key (lowercase host[:port], default
    :80/:443 stripped per scheme) — the grouping key
    :func:`~operators.curation.split_by_host` and the robots gate share
    with the full canonicalizer. Empty string for non-URLs."""
    scheme = F.lower(F.regexp_extract(url, URL_SCHEME_PATTERN, 1))
    hostport = F.lower(F.regexp_extract(url, URL_HOSTPORT_PATTERN, 1))
    return (
        F.when(scheme == "http", F.regexp_replace(hostport, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, r":443$", ""))
        .otherwise(hostport)
    )


def canonicalize_urls(
    df: DataFrame, url_col: str = "url", out_col: str = "url_canonical"
) -> DataFrame:
    """Append the canonical-URL column (:func:`canonicalize_url_col`).
    Zero shuffle — one codegen projection, pipelined into whatever
    dedup or census stage consumes it."""
    return df.withColumn(out_col, canonicalize_url_col(F.col(url_col)))


def url_census(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """URL-exact dedup census: one row per canonical URL with
    ``keeper_doc_id`` (the deterministic survivor — min id),
    ``n_docs`` (rows collapsing onto this resource) and ``n_variants``
    (distinct raw spellings observed) — the URL-level companion of
    ``dedup.dedup_exact``, run before fetch/extract so the crawl never
    pays for the same resource twice. One uniform-key aggregation on
    the canonical string; non-URL rows (NULL canonical) are excluded.
    """
    canon = canonicalize_urls(df, url_col).filter(
        F.col("url_canonical").isNotNull()
    )
    return canon.groupBy("url_canonical").agg(
        F.min(id_col).alias("keeper_doc_id"),
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct(F.col(url_col)).alias("n_variants"),
    )


def dedup_urls(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Keep exactly one row per canonical URL (min ``id_col`` — same
    deterministic-keeper rule as ``dedup.dedup_exact``); rows whose
    ``url_col`` is not a URL pass through untouched (content dedup
    downstream still covers them). Shape: one groupBy on the canonical
    string + a semi join back on the id — no row ever carries its
    payload through the shuffle, only (canonical, id)."""
    canon = canonicalize_urls(df, url_col)
    keepers = (
        canon.filter(F.col("url_canonical").isNotNull())
        .groupBy("url_canonical")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    non_urls = canon.filter(F.col("url_canonical").isNull()).select(id_col)
    return df.join(keepers.unionByName(non_urls), id_col, "left_semi")


# ---- sitemap.xml ingestion (r11) ---------------------------------------

#: ``<loc>`` capture for sitemap/sitemap-index documents
#: (sitemaps.org protocol). Machine-generated XML, so the regex tier is
#: the right cost point (the :data:`HTML_STRIP_STEPS` posture);
#: whitespace inside the element is insignificant per the protocol.
#: Java∩RE2 so the DuckDB twin interpolates the same constant.
SITEMAP_LOC_PATTERN = (
    r"<loc>[ \t\n\r\f]*([^<>]+?)[ \t\n\r\f]*</loc>"
)

#: XML entity decode for extracted locs, in order (``&amp;`` LAST — the
#: double-decode hazard, same rule as the HTML step table).
SITEMAP_ENTITY_STEPS: tuple[tuple[str, str], ...] = (
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", '"'),
    (r"&apos;", "'"),
    (r"&#39;", "'"),
    (r"&amp;", "&"),
)


def sitemap_urls(
    df: DataFrame, xml_col: str = "sitemap_xml", id_col: str = "site_id"
) -> DataFrame:
    """Explode a frame of sitemap / sitemap-index XML bodies into
    ``(id, url, is_index)`` — the crawl-frontier seeding step
    (sitemaps.org): each ``<loc>`` is a page to fetch, or, when the
    document is a ``<sitemapindex>``, ANOTHER sitemap to expand
    (``is_index`` tells the crawl loop which). Extracted locs are
    XML-entity-decoded (``&amp;`` in query strings is mandatory sitemap
    escaping) and feed straight into the URL tier
    (:func:`canonicalize_urls` / :func:`dedup_urls` /
    :func:`filter_robots_disallowed`).

    Zero shuffle, zero UDF: one extract-all + explode projection —
    sitemap files are ≤50k URLs by protocol, so per-row work is
    bounded by spec."""
    loc = F.explode(
        F.regexp_extract_all(F.col(xml_col), F.lit(SITEMAP_LOC_PATTERN), 1)
    ).alias("url")
    out = df.select(
        F.col(id_col),
        loc,
        F.col(xml_col).contains("<sitemapindex").alias("is_index"),
    )
    url = F.col("url")
    for pat, repl in SITEMAP_ENTITY_STEPS:
        url = F.regexp_replace(url, pat, repl)
    return out.select(id_col, url.alias("url"), "is_index")


#: one ``<url>``/``<sitemap>`` element, so ``<loc>`` and its OWN
#: ``<lastmod>`` sibling stay paired (a global lastmod extract would
#: misalign when only some entries carry one). Java∩RE2 (inline flags,
#: non-greedy) — same subset discipline as :data:`HTML_STRIP_STEPS`.
SITEMAP_ENTRY_PATTERN = (
    r"(?is)<(?:url|sitemap)[ \t\n\r\f]*>.*?</(?:url|sitemap)[ \t\n\r\f]*>"
)

#: ``<lastmod>`` capture within one entry block (W3C datetime per the
#: protocol; surfaced verbatim — parsing to a timestamp is the
#: caller's watermark policy).
SITEMAP_LASTMOD_PATTERN = (
    r"<lastmod>[ \t\n\r\f]*([^<>]+?)[ \t\n\r\f]*</lastmod>"
)


def sitemap_entries(
    df: DataFrame, xml_col: str = "sitemap_xml", id_col: str = "site_id"
) -> DataFrame:
    """:func:`sitemap_urls` plus the protocol's ``<lastmod>`` sibling:
    ``(id, url, lastmod, is_index)``, one row per ``<url>``/
    ``<sitemap>`` entry, ``lastmod`` NULL when the optional element is
    absent. This is what makes RE-crawling incremental — the fetch loop
    keeps only entries whose ``lastmod`` exceeds the last ingest
    watermark (the crawl-tier analog of the warehouse sources'
    incremental scan) instead of re-fetching the whole frontier.

    Same shape as :func:`sitemap_urls`: zero shuffle, zero UDF — one
    extract-all on whole entry blocks (so each loc pairs with its OWN
    lastmod) + explode + per-entry extracts. Entries without a
    ``<loc>`` are protocol-invalid and dropped."""
    entry = F.explode(
        F.regexp_extract_all(
            F.col(xml_col), F.lit(SITEMAP_ENTRY_PATTERN), 0
        )
    ).alias("entry")
    out = df.select(
        F.col(id_col),
        entry,
        F.col(xml_col).contains("<sitemapindex").alias("is_index"),
    )
    url = F.regexp_extract("entry", SITEMAP_LOC_PATTERN, 1)
    for pat, repl in SITEMAP_ENTITY_STEPS:
        url = F.regexp_replace(url, pat, repl)
    lastmod = F.regexp_extract("entry", SITEMAP_LASTMOD_PATTERN, 1)
    return (
        out.select(
            id_col,
            url.alias("url"),
            F.when(lastmod != "", lastmod).alias("lastmod"),
            "is_index",
        )
        .filter(F.col("url") != "")
    )


def surt_key_col(url: Column, canonical: bool = False) -> Column:
    """SURT url key (Sort-friendly URI Reordering Transform — the
    CDX-index key every web archive sorts and binary-searches on):
    scheme dropped, host labels reversed comma-joined, non-default port
    kept, then ``)`` + path?query — so one host's captures, and one
    registrable domain's subdomains, sort adjacent
    (``http://sub.Example.com:80/P?b=2&a=1`` →
    ``com,example,sub)/P?a=1&b=2``).

    Builds on :func:`canonicalize_url_col` (case/port/tracking-param/
    fragment/order noise already folded — the same equivalence class,
    reordered for sorting); pass ``canonical=True`` when the column
    already holds canonical URLs to skip re-canonicalizing (and to keep
    the expression small — the janino 64 KB rule: stage the canonical
    form as its own column when a plan uses it more than once).
    Non-URLs → NULL."""
    canon = url if canonical else canonicalize_url_col(url)
    hostport = F.regexp_extract(canon, URL_HOSTPORT_PATTERN, 1)
    host = F.regexp_extract(hostport, r"^([^:]*)", 1)
    port = F.regexp_extract(hostport, r"(:.*)$", 1)
    rev = F.array_join(F.reverse(F.split(host, r"[.]")), ",")
    rest = F.regexp_extract(canon, URL_REST_PATTERN, 1)
    return F.when(
        canon.isNotNull(), F.concat(rev, port, F.lit(")"), rest)
    )


# ---- outlink extraction + host link graph (r12) -----------------------

#: ``<a ... href="...">`` capture, double- and single-quoted attribute
#: forms (two passes because extract-all returns one group). Explicit
#: whitespace class around ``=`` — the oracle-shared-regex rule.
OUTLINK_HREF_DQ_PATTERN = (
    r'(?is)<a\b[^>]*\bhref[ \t\n\r\f]*=[ \t\n\r\f]*"([^"]*)"'
)
OUTLINK_HREF_SQ_PATTERN = (
    r"(?is)<a\b[^>]*\bhref[ \t\n\r\f]*=[ \t\n\r\f]*'([^']*)'"
)


def extract_outlinks(
    df: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    out_col: str = "link",
) -> DataFrame:
    """Anchor-outlink extraction — the crawl-frontier feeder and the
    edge source for the host link graph: every ``<a href>`` in the
    page, entity-decoded (hrefs are HTML-attribute-encoded: ``&amp;``
    in query strings is standard) and resolved against the page URL by
    the bounded RFC 3986 subset a regex tier can do exactly:

    - absolute (``scheme://...``) kept as-is;
    - protocol-relative (``//host/...``) gets the page's scheme;
    - root-relative (``/path``) gets the page's scheme + authority;
    - everything else (path-relative needing dot-segment resolution,
      ``#fragment``, ``javascript:``, ``mailto:``) is DROPPED — the
      documented precision/throughput trade of this tier (the
      canonicalizer's posture on percent-encoding).

    Returns ``(url_col, out_col)`` — one row per kept link; the page
    payload deliberately does NOT ride through the explode. Zero
    shuffle, zero UDF."""
    scheme = F.lower(F.regexp_extract(F.col(url_col), URL_SCHEME_PATTERN, 1))
    hostport = F.regexp_extract(F.col(url_col), URL_HOSTPORT_PATTERN, 1)

    # Codegen-size discipline: the WHOLE trim→decode→classify→resolve
    # pipeline lives INSIDE the generator expression (array transform +
    # filter feeding one explode), so the emitted column is an opaque
    # Generate output. Downstream predicates (a consumer's
    # host != '' gate, a dedup's null check) stop at the Generate
    # boundary instead of substituting the resolution CASE — with the
    # earlier projection form, a pushed-down filter re-inlined the
    # entity chain per reference and blew janino's 64 KB method limit
    # (observed: the composed link-graph plan fell back to interpreted
    # execution).
    def _resolve(h):  # Column -> Column, one raw href -> resolved|NULL
        t = F.regexp_replace(h, f"^{WS_CLASS}+|{WS_CLASS}+$", "")
        dec = t
        for pat, repl in SITEMAP_ENTITY_STEPS:
            dec = F.regexp_replace(dec, pat, repl)
        return (
            F.when(F.regexp_like(t, F.lit(URL_SCHEME_PATTERN)), dec)
            .when(t.startswith("//"), F.concat(scheme, F.lit(":"), dec))
            .when(
                t.startswith("/"),
                F.concat(scheme, F.lit("://"), hostport, dec),
            )
        )

    links_arr = F.filter(
        F.transform(
            F.concat(
                F.regexp_extract_all(
                    F.col(html_col), F.lit(OUTLINK_HREF_DQ_PATTERN), 1
                ),
                F.regexp_extract_all(
                    F.col(html_col), F.lit(OUTLINK_HREF_SQ_PATTERN), 1
                ),
            ),
            _resolve,
        ),
        lambda x: x.isNotNull(),
    )
    return df.select(F.col(url_col), F.explode(links_arr).alias(out_col))


def host_link_graph(
    links: DataFrame, url_col: str = "url", link_col: str = "link"
) -> DataFrame:
    """Collapse page-level outlinks to the host link graph
    ``(src_host, dst_host, n_links)`` — the PageRank/authority-signal
    feedstock and the cheapest whole-crawl structure summary. Hosts via
    :func:`canonical_host_col` (case/port noise can't split a node);
    rows whose either side is not a URL drop. ONE uniform-key
    aggregation on two short strings.

    The host derivation is staged in two projections (scheme/hostport
    extracts first, port-strip second): the port-strip branches
    reference the hostport three times, and when ``links`` arrives as
    an unmaterialized extraction plan the inlined tree otherwise blows
    janino's 64 KB method limit — staged multi-referenced aliases stay
    their own codegen-splittable projections."""
    parts = links.select(
        F.lower(
            F.regexp_extract(F.col(url_col), URL_SCHEME_PATTERN, 1)
        ).alias("__ss__"),
        F.lower(
            F.regexp_extract(F.col(url_col), URL_HOSTPORT_PATTERN, 1)
        ).alias("__sh__"),
        F.lower(
            F.regexp_extract(F.col(link_col), URL_SCHEME_PATTERN, 1)
        ).alias("__ds__"),
        F.lower(
            F.regexp_extract(F.col(link_col), URL_HOSTPORT_PATTERN, 1)
        ).alias("__dh__"),
    )

    def _strip_port(scheme: Column, hostport: Column) -> Column:
        return (
            F.when(
                scheme == "http", F.regexp_replace(hostport, r":80$", "")
            )
            .when(
                scheme == "https",
                F.regexp_replace(hostport, r":443$", ""),
            )
            .otherwise(hostport)
        )

    return (
        parts.select(
            _strip_port(F.col("__ss__"), F.col("__sh__")).alias(
                "src_host"
            ),
            _strip_port(F.col("__ds__"), F.col("__dh__")).alias(
                "dst_host"
            ),
        )
        .filter((F.col("src_host") != "") & (F.col("dst_host") != ""))
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )


# ---- robots.txt (RFC 9309) parsing + URL gating (r11) -----------------


def _robots_directive_lines(
    df: DataFrame, host_col: str, body_col: str
) -> DataFrame:
    """Shared robots.txt line scanner: split → posexplode → comment
    strip (``#...``) → ``key: value`` extraction with explicit-class
    whitespace trim. Returns ``(host, ln, key, val)`` with the key
    lowercased; callers filter the directive kinds they own."""
    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), r"\n")).alias("ln", "line"),
    ).select(
        "host",
        "ln",
        F.regexp_replace(
            F.regexp_replace(F.col("line"), "#.*", ""),
            f"^{WS_CLASS}+|{WS_CLASS}+$",
            "",
        ).alias("line"),
    )
    key = F.lower(F.regexp_extract("line", f"^([A-Za-z-]+){WS_CLASS}*:", 1))
    val = F.regexp_replace(
        F.regexp_extract("line", f":{WS_CLASS}*(.*)$", 1),
        f"{WS_CLASS}+$",
        "",
    )
    return lines.select("host", "ln", key.alias("key"), val.alias("val"))


def _robots_applicable_groups(parsed, user_agent: str):
    """Shared RFC 9309 group machinery: running group ids over the
    parsed ``(host, ln, key, val)`` directive lines (consecutive
    ``User-agent`` lines share a group) and the APPLICABLE group set
    for ``user_agent`` (exact token match or ``*``; a named-agent
    group SHADOWS the ``*`` group when both exist). Returns
    ``(grouped, applicable)``; callers semi-join their directive kind
    against ``applicable``. The per-host window frame is trivially
    bounded — robots files are a few KB."""
    from pyspark.sql import Window

    w = Window.partitionBy("host").orderBy("ln")
    prev_key = F.lag("key").over(w)
    starts = F.when(
        (F.col("key") == "user-agent")
        & (F.coalesce(prev_key, F.lit("")) != "user-agent"),
        1,
    ).otherwise(0)
    grouped = parsed.withColumn("grp", F.sum(starts).over(w))
    agents = (
        grouped.filter(F.col("key") == "user-agent")
        .groupBy("host", "grp")
        .agg(
            F.max(
                (F.lower("val") == user_agent.lower()).cast("int")
            ).alias("named"),
            F.max((F.col("val") == "*").cast("int")).alias("star"),
        )
        .filter((F.col("named") == 1) | (F.col("star") == 1))
    )
    # named group shadows '*': keep only the most specific tier present
    best = agents.groupBy("host").agg(F.max("named").alias("has_named"))
    applicable = agents.join(best, "host").filter(
        (F.col("named") == 1) | (F.col("has_named") == 0)
    )
    return grouped, applicable


def parse_robots(
    df: DataFrame,
    host_col: str = "host",
    body_col: str = "robots_txt",
    user_agent: str = "*",
) -> DataFrame:
    """Parse per-host ``robots.txt`` bodies (RFC 9309) into a flat rules
    table ``(host, allow boolean, path_prefix, rule_len int)`` keeping
    only the groups that apply to ``user_agent`` (exact token match or
    ``*``; per the RFC, the most specific matching group wins, so a
    named-agent group SHADOWS the ``*`` group when both exist).

    Pure Catalyst: split into lines → explode → running group id
    (a window over the line ordinal per host — robots files are a few
    KB, so the per-host window frame is trivially bounded) → directive
    parse. ``rule_len`` (prefix length) rides along because RFC 9309
    precedence is longest-match, allow-wins-ties — exactly what
    :func:`filter_robots_disallowed` sorts by. Comments (``#...``) and
    unknown directives are dropped; an empty Disallow means allow-all
    (kept as an allow rule of length 0 so it participates in
    precedence)."""
    parsed = _robots_directive_lines(df, host_col, body_col).filter(
        F.col("key").isin("user-agent", "allow", "disallow")
    )
    grouped, applicable = _robots_applicable_groups(parsed, user_agent)
    return (
        grouped.filter(F.col("key").isin("allow", "disallow"))
        .join(applicable.select("host", "grp"), ["host", "grp"], "left_semi")
        .select(
            "host",
            # RFC 9309: a directive with an EMPTY value means allow-all
            # (the canonical "User-agent: *\nDisallow:" robots file) —
            # emit it as an allow rule regardless of the directive name,
            # or the zero-length '^' regex would block every path
            # (r11 ADVICE: empty Disallow inverted to deny-all)
            ((F.col("key") == "allow") | (F.col("val") == "")).alias(
                "allow"
            ),
            F.col("val").alias("path_prefix"),
            F.length("val").alias("rule_len"),
        )
    )


def robots_sitemaps(
    df: DataFrame, host_col: str = "host", body_col: str = "robots_txt"
) -> DataFrame:
    """Extract ``Sitemap:`` directives from per-host robots.txt bodies
    — the standard discovery channel tying the compliance tier to the
    frontier tier (sitemaps.org: the directive is host-wide, lives
    OUTSIDE user-agent groups, key case-insensitive, value an absolute
    sitemap URL). Returns ``(host, sitemap_url)``, one row per
    directive, ready for :func:`sitemap_urls` /
    :func:`sitemap_entries` expansion.

    Zero shuffle, zero UDF: split → explode → key/value extract — no
    group bookkeeping needed because the directive is group-independent
    by spec (unlike allow/disallow in :func:`parse_robots`)."""
    lines = df.select(
        F.col(host_col).alias("host"),
        F.explode(F.split(F.col(body_col), r"\n")).alias("line"),
    ).select(
        "host",
        F.regexp_replace(
            F.regexp_replace(F.col("line"), "#.*", ""),
            f"^{WS_CLASS}+|{WS_CLASS}+$",
            "",
        ).alias("line"),
    )
    key = F.lower(F.regexp_extract("line", f"^([A-Za-z-]+){WS_CLASS}*:", 1))
    val = F.regexp_replace(
        F.regexp_extract("line", f":{WS_CLASS}*(.*)$", 1),
        f"{WS_CLASS}+$",
        "",
    )
    return (
        lines.select("host", key.alias("key"), val.alias("sitemap_url"))
        .filter((F.col("key") == "sitemap") & (F.col("sitemap_url") != ""))
        .select("host", "sitemap_url")
    )


def robots_crawl_delay(
    df: DataFrame,
    host_col: str = "host",
    body_col: str = "robots_txt",
    user_agent: str = "*",
) -> DataFrame:
    """Extract per-host ``Crawl-delay`` (seconds) from robots.txt
    bodies — the politeness knob :func:`~operators.curation.
    politeness_shards` schedules fetches around. Not in RFC 9309 but
    honored by Bing/Yandex and emitted by a large share of real robots
    files; it is GROUP-scoped like allow/disallow (the applicable
    group's value wins, named agent shadowing ``*`` — the same
    machinery as :func:`parse_robots`). Returns ``(host,
    crawl_delay double)``, one row per host that declares one; absent
    or non-numeric values yield no row (callers fall back to their own
    default). Multiple applicable declarations keep the MAX — the most
    conservative (politest) reading."""
    # keep allow/disallow lines in the grouping context even though
    # only crawl-delay is extracted: the consecutive-user-agent run
    # detection must see the rule lines that SEPARATE two groups, or
    # "UA: a / Disallow: x / UA: b / Crawl-delay: 5" would fuse a and
    # b into one group and leak b's delay to a
    parsed = _robots_directive_lines(df, host_col, body_col).filter(
        F.col("key").isin("user-agent", "allow", "disallow", "crawl-delay")
    )
    grouped, applicable = _robots_applicable_groups(parsed, user_agent)
    # try_cast: a non-numeric value ("soon") must yield NULL (no row),
    # never an ANSI CAST_INVALID_INPUT that aborts the whole parse
    delay = F.col("val").try_cast("double")
    return (
        grouped.filter(F.col("key") == "crawl-delay")
        .join(applicable.select("host", "grp"), ["host", "grp"], "left_semi")
        .filter(delay.isNotNull() & (delay >= 0))
        .groupBy("host")
        .agg(F.max(delay).alias("crawl_delay"))
    )


def _robots_rule_regex(prefix: Column) -> Column:
    """RFC 9309 path pattern → anchored regex (Java∩RE2): every regex
    metachar escaped, then ``*`` → ``.*`` and a trailing ``$`` (escaped
    by the first step) restored as the end anchor."""
    esc = F.regexp_replace(prefix, r"([.\[\]{}()+?^$\\|*])", r"\\$1")
    esc = F.regexp_replace(esc, r"\\\*", ".*")
    # Java replacement strings treat a bare $ as a group ref — escape it
    esc = F.regexp_replace(esc, r"\\\$$", r"\$")
    return F.concat(F.lit("^"), esc)


def filter_robots_disallowed(
    pages: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Drop pages a host's robots rules disallow (RFC 9309 precedence:
    the LONGEST matching rule decides; allow wins ties; no matching
    rule or no rules for the host ⇒ allowed — the RFC default). The
    compliance gate a crawl corpus runs before extraction, beside the
    domain blocklist.

    Shape: rules tables are small by construction (robots files are
    KB-sized per host), so they collapse to ONE row per host (an array
    of (len, allow, prefix) structs — one uniform-key agg on the tiny
    rules side) and broadcast-join onto the pages. The verdict is a
    per-row expression over that array (filter rules whose derived
    regex matches the path, take the struct-max — longest rule wins,
    allow breaks length ties), so the pages relation genuinely never
    shuffles: one broadcast hash join plus a codegen projection. Rows
    whose ``url_col`` is NULL or not a URL key to no host, match no
    rules, and pass through (the RFC default-allow)."""
    path = F.regexp_extract(F.col(url_col), URL_REST_PATTERN, 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    per_host = rules.groupBy(F.col("host").alias("__rules_host__")).agg(
        F.collect_list(
            # field order is the precedence order: struct-max compares
            # rule_len first, then allow (1 ranks above 0), so the
            # longest matching rule wins and allow wins length ties
            F.struct(
                F.col("rule_len").alias("rule_len"),
                F.col("allow").cast("int").alias("allow"),
                F.col("path_prefix").alias("path_prefix"),
            )
        ).alias("__rules__")
    )
    joined = pages.withColumn(
        "__host__", canonical_host_col(F.col(url_col))
    ).join(
        F.broadcast(per_host),
        F.col("__host__") == F.col("__rules_host__"),
        "left",
    )
    best = F.array_max(
        F.filter(
            F.col("__rules__"),
            lambda r: F.regexp_like(
                path, _robots_rule_regex(r["path_prefix"])
            ),
        )
    )
    # no rules for the host (NULL array) or no matching rule (empty
    # filter result) both yield a NULL max -> allowed, the RFC default
    allowed = best.isNull() | (best["allow"] == 1)
    return joined.filter(allowed).drop(
        "__host__", "__rules_host__", "__rules__"
    )


# ---- HTML -> training text extraction (r10) ---------------------------

#: the ordered regexp_replace pipeline of :func:`extract_html_text`.
#: Order is load-bearing and part of the contract: payload-bearing
#: containers (script/style/comments — whose CONTENT may contain ``<``,
#: ``&&``, or even tag-lookalikes) are removed before any generic tag
#: handling; block-closing tags become newlines BEFORE the generic tag
#: strip eats them; entities decode only AFTER tags are gone (a decoded
#: ``&lt;p&gt;`` must never be re-parsed as markup), with ``&amp;``
#: decoded last (the classic double-decode hazard); whitespace
#: normalization runs at the end. Every pattern stays in the
#: Java-regex ∩ RE2 subset (inline ``(?is)`` flags, non-greedy ``.*?``,
#: alternation, anchors — no lookaround, no backreferences) so the
#: DuckDB catalog twin (`ORACLE_HTML_EXTRACT`) is GENERATED from this
#: same table and stays exact by construction.
HTML_STRIP_STEPS: tuple[tuple[str, str], ...] = (
    # [ \t\r\n\f]* instead of \s* EVERYWHERE (pattern side too): Java's
    # \s includes \x0b, RE2's does not — any \s would diverge the twins
    # on vertical-tab input (adversarial-corpus differential)
    (r"(?is)<script\b[^>]*>.*?</script[ \t\r\n\f]*>", " "),
    (r"(?is)<style\b[^>]*>.*?</style[ \t\r\n\f]*>", " "),
    (r"(?is)<!--.*?-->", " "),
    (r"(?i)<br[ \t\r\n\f]*/?[ \t\r\n\f]*>", "\n"),
    (
        r"(?i)</(p|div|li|tr|td|th|h1|h2|h3|h4|h5|h6|title|blockquote)"
        r"[ \t\r\n\f]*>",
        "\n",
    ),
    (r"<[^>]*>", " "),
    (r"&nbsp;", " "),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", '"'),
    (r"&#39;", "'"),
    (r"&amp;", "&"),
    (r"[ \t\r\f]+", " "),
    (r" ?\n ?", "\n"),
    (r"\n{2,}", "\n"),
    (r"^[ \t\r\f\n]+|[ \t\r\f\n]+$", ""),
)


def extract_html_text(
    df: DataFrame, html_col: str = "html", out_col: str = "text_plain"
) -> DataFrame:
    """WET-style plain-text extraction from raw HTML — the front door of
    every web-corpus training pipeline (raw crawl pages in, one line per
    block element out, script/style payloads and markup gone, entities
    decoded). A full DOM parse is deliberately out of scope (boilerplate
    REMOVAL is the separate, structural :func:`remove_boilerplate_lines`
    pass this feeds); this is the high-throughput regex tier the WET
    extractors of CommonCrawl-scale pipelines use.

    Zero shuffle, zero UDF: one codegen projection chaining
    :data:`HTML_STRIP_STEPS` — at 100 TB this runs at scan speed,
    pipelined into whatever gate or dedup stage consumes it.
    """
    cur = F.col(html_col)
    for pat, repl in HTML_STRIP_STEPS:
        cur = F.regexp_replace(cur, pat, repl)
    keep = [c for c in df.columns if c != out_col]
    return df.select(*keep, cur.alias(out_col))


# ---- corpus diagnostics: Zipf fit + readability (r10) -----------------


def zipf_fit(df: DataFrame, text_col: str = "text", top_n: int = 100) -> DataFrame:
    """Zipf rank-frequency diagnostic: least-squares fit of
    ``ln(term_freq)`` on ``ln(rank)`` over the ``top_n`` vocabulary —
    natural text sits near slope −1 with high r²; templated/synthetic
    spam shows a flat head or a cliff. One corpus number a curation run
    tracks per snapshot (drift in the slope = the mixture changed).

    Shape: the :func:`vocabulary` aggregation (one explode + two
    uniform-key aggs + TakeOrderedAndProject) feeding a window + regr
    aggregate over ≤ ``top_n`` rows — the single-partition window runs
    on a BOUNDED frame (the documented global-window-ok class), then
    one scalar row comes out. Returns
    ``(n_terms, slope, intercept, r2)`` display-rounded to 6dp (the
    cross-engine float policy: regr sums associate differently per
    engine at ~1e-12)."""
    from pyspark.sql import Window

    ranked = vocabulary(df, text_col, top_n).select(
        "term_freq",
        F.row_number()
        .over(Window.orderBy(F.desc("term_freq"), F.asc("term")))
        .alias("rank"),
    )
    y = F.log(F.col("term_freq").cast("double"))
    x = F.log(F.col("rank").cast("double"))
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.round(F.regr_slope(y, x), 6).alias("slope"),
        F.round(F.regr_intercept(y, x), 6).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
    )


def readability(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Flesch reading-ease per document from engine-shared counts:
    words (the tokenizer contract), sentences (runs of ``[.!?]+``,
    floored at 1), syllables approximated as vowel-group runs
    (``[aeiouy]+`` — the standard cheap proxy; both engines run the
    LITERAL same regex, so the twin is exact). The score is a quality
    FEATURE beside token_stats' trainability gates: recognizable prose
    lands ~30–80, templated word salad drifts out of band. Zero
    shuffle, zero UDF; empty docs yield NULL score."""
    words = F.size(
        F.filter(tokens_col(F.col(text_col)), lambda t: F.length(t) > 0)
    ).cast("long")
    sentences = F.greatest(
        F.lit(1).cast("long"),
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(r"[.!?]+"), 0)
        ).cast("long"),
    )
    syllables = F.size(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(r"[aeiouy]+"), 0)
    ).cast("long")
    # floor-based 2dp rounding instead of ROUND: Spark rounds doubles
    # via BigDecimal(Double.toString) HALF_UP while DuckDB rounds the
    # binary value — they disagree at half-epsilon boundaries
    # (85.16499999999999 → 85.16 vs 85.17). floor(x*100+0.5)/100 is the
    # SAME IEEE op sequence in both engines, so the twin stays exact.
    raw = (
        F.lit(206.835)
        - F.lit(1.015) * (words / sentences)
        - F.lit(84.6) * (syllables / words)
    )
    flesch = F.when(words > 0, F.floor(raw * 100 + F.lit(0.5)) / 100)
    return df.select(
        "doc_id",
        words.alias("n_words"),
        sentences.alias("n_sentences"),
        syllables.alias("n_syllables"),
        flesch.alias("flesch"),
    )
