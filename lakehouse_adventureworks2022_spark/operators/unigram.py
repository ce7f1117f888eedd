"""Unigram-LM subword tokenizer (Kudo 2018, the SentencePiece ``unigram``
algorithm behind T5/ALBERT/XLNet vocabularies) — the second of the two
dominant subword schemes beside ``operators/bpe.py``.

Beyond-reference scope; same architecture split as the BPE trainer (and
every production tokenizer trainer): the corpus-sized work is ONE
aggregated word-frequency table, training runs driver-side over that
bounded table, and encoding is an embarrassingly-parallel Arrow pass.

1. **Corpus scan** — reuses :func:`operators.bpe.word_counts` (one
   explode + one uniform-key agg + deterministic top-``max_words``
   cut). O(vocabulary) output at any corpus size.
2. **Training is driver-side over the bounded table** —
   :func:`train_unigram` seeds with the highest-frequency substrings
   (every single character is mandatory, guaranteeing full coverage),
   then alternates full EM with probability-ranked pruning down to
   ``vocab_size``. The E-step is the real SentencePiece lattice
   forward-backward (posterior expected counts over ALL segmentations
   of each word — shared sub-pieces accrue mass from every word that
   contains them, which hard Viterbi EM would starve), so corpus
   log-likelihood is nondecreasing across rounds by the EM guarantee
   (pinned by tests).
3. **Encoding** — :func:`unigram_segment` ships the piece table by
   value inside a ``mapInPandas`` closure and Viterbi-decodes with a
   per-batch word cache (Zipf: amortized dict lookup per word).

Determinism: seed cut and pruning order by (weight desc, piece asc);
Viterbi ties prefer the LONGER first piece, then lexicographic — the
whole pipeline is a pure function of the word-frequency table, so
training twice (any partitioning) yields byte-identical piece tables.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame

from lakehouse_adventureworks2022_spark.operators.bpe import word_counts

__all__ = [
    "word_counts",
    "train_unigram",
    "viterbi_segment",
    "train_and_segment",
    "unigram_segment",
    "save_pieces",
    "load_pieces",
]

#: Longest candidate piece considered during seeding (SentencePiece's
#: ``max_sentencepiece_length`` is 16; 8 covers the fixtures' words).
MAX_PIECE_LEN = 8


def viterbi_segment(
    word: str, logp: dict[str, float], max_len: int = MAX_PIECE_LEN
) -> list[str] | None:
    """Best segmentation of ``word`` under piece log-probs (max-sum DP).
    Ties prefer the longer first piece, then lexicographic — fully
    deterministic. Returns None when some prefix is uncoverable (cannot
    happen after training: every character is a piece)."""
    n = len(word)
    best = [-math.inf] * (n + 1)
    back: list[tuple[int, str] | None] = [None] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None or best[j] == -math.inf:
                continue
            cand = best[j] + lp
            prev = back[i]
            # longer-first-piece then lexicographic tie-break: a tie on
            # score keeps the candidate with smaller j (longer piece);
            # equal j cannot recur for distinct pieces
            if cand > best[i] or (
                cand == best[i] and prev is not None and j < prev[0]
            ):
                best[i] = cand
                back[i] = (j, piece)
    if back[n] is None:
        return None
    out: list[str] = []
    i = n
    while i > 0:
        j, piece = back[i]  # type: ignore[misc]
        out.append(piece)
        i = j
    return out[::-1]


def _seed_pieces(
    words: list[tuple[str, int]], seed_size: int, max_len: int
) -> dict[str, float]:
    """Seed vocabulary: all substrings ≤ ``max_len`` weighted by word
    count; top ``seed_size`` by (weight desc, piece asc); every single
    character kept unconditionally (coverage guarantee)."""
    weight: dict[str, int] = {}
    for word, count in words:
        n = len(word)
        for a in range(n):
            for b in range(a + 1, min(a + max_len, n) + 1):
                piece = word[a:b]
                weight[piece] = weight.get(piece, 0) + count
    chars = {p for p in weight if len(p) == 1}
    multi = sorted(
        (p for p in weight if len(p) > 1),
        key=lambda p: (-weight[p], p),
    )[: max(0, seed_size - len(chars))]
    seed = {p: float(weight[p]) for p in chars}
    seed.update((p, float(weight[p])) for p in multi)
    total = sum(seed.values())
    return {p: math.log(w / total) for p, w in seed.items()}


def _e_step(
    words: list[tuple[str, int]], logp: dict[str, float], max_len: int
) -> tuple[dict[str, float], float]:
    """Lattice forward-backward E-step (Kudo 2018 §3.2): posterior
    expected count of every piece occurrence over ALL segmentations of
    each word — mass is SHARED across segmentations, which is what lets
    a sub-piece common to many words survive beside whole-word pieces
    (a hard Viterbi E-step starves it). Returns (expected counts,
    corpus log-likelihood Σ count·log Z under ``logp``)."""
    counts: dict[str, float] = {}
    ll = 0.0
    for word, count in words:
        n = len(word)
        spans: list[tuple[int, int, str, float]] = []
        for i in range(1, n + 1):
            for j in range(max(0, i - max_len), i):
                lp = logp.get(word[j:i])
                if lp is not None:
                    spans.append((j, i, word[j:i], lp))
        fwd = [-math.inf] * (n + 1)
        bwd = [-math.inf] * (n + 1)
        fwd[0] = 0.0
        bwd[n] = 0.0
        for j, i, _, lp in spans:  # spans are i-ascending
            cand = fwd[j] + lp
            if cand > -math.inf:
                m = max(fwd[i], cand)
                fwd[i] = m + math.log(
                    math.exp(fwd[i] - m) + math.exp(cand - m)
                )
        for j, i, _, lp in reversed(spans):
            cand = lp + bwd[i]
            if cand > -math.inf:
                m = max(bwd[j], cand)
                bwd[j] = m + math.log(
                    math.exp(bwd[j] - m) + math.exp(cand - m)
                )
        z = fwd[n]
        if z == -math.inf:  # uncoverable under a pruned seed: chars
            for c in word:
                counts[c] = counts.get(c, 0.0) + count
            ll += count * (-100.0) * n
            continue
        ll += count * z
        for j, i, piece, lp in spans:
            post = math.exp(fwd[j] + lp + bwd[i] - z)
            if post > 0.0:
                counts[piece] = counts.get(piece, 0.0) + count * post
    # keep every character alive even when no posterior mass reaches it
    # (the coverage floor); epsilon weight so probs stay finite
    for p in logp:
        if len(p) == 1 and p not in counts:
            counts[p] = 1e-6
    return counts, ll


def _em_round(
    words: list[tuple[str, int]], logp: dict[str, float], max_len: int
) -> tuple[dict[str, float], float]:
    """One full EM round: E-step expected counts, count-normalized
    M-step. Corpus log-likelihood is nondecreasing across rounds by the
    EM guarantee (tested)."""
    counts, ll = _e_step(words, logp, max_len)
    total = sum(counts.values())
    return {p: math.log(c / total) for p, c in counts.items()}, ll


def train_unigram(
    wc: DataFrame | list[tuple[str, int]],
    vocab_size: int = 2000,
    seed_size: int = 20_000,
    shrink: float = 0.75,
    em_rounds: int = 2,
    max_len: int = MAX_PIECE_LEN,
) -> dict[str, float]:
    """Train a unigram piece table ``{piece: logprob}`` from a word-count
    frame (or pre-collected rows). Driver cost is bounded by the word
    table (the BPE/IVF ``train_cap`` pattern — constant in corpus size):
    seed → EM → prune the lowest-probability multi-char pieces by the
    ``shrink`` factor → EM again, until ``vocab_size`` (single
    characters are never pruned)."""
    rows = (
        [(r["word"], int(r["count"])) for r in wc.collect()]
        if isinstance(wc, DataFrame)
        else list(wc)
    )
    # canonical processing order: float accumulation in the E-step is
    # order-sensitive in the last bits, so training must be a pure
    # function of the word-count MULTISET, not its arrival order
    rows.sort(key=lambda r: (-r[1], r[0]))
    logp = _seed_pieces(rows, seed_size, max_len)
    for _ in range(em_rounds):
        logp, _ = _em_round(rows, logp, max_len)
    while len(logp) > vocab_size:
        keep = max(vocab_size, int(len(logp) * shrink))
        old = logp
        # Kudo §3.2 step 3, the loss criterion: removing piece p costs
        # (expected count of p) × (log θ_p − score of p's own best
        # ALTERNATIVE segmentation without p). A piece whose text is
        # cheaply re-coverable (abababcc → ababab·c·c) prunes before a
        # piece only chars can replace (ababab → 6 factors), even when
        # the former carries more raw probability — prob-ranked pruning
        # gets exactly this case wrong.
        counts, _ = _e_step(rows, old, max_len)
        loss: dict[str, float] = {}
        for p in old:
            if len(p) == 1:
                continue
            without = dict(old)
            del without[p]
            alt = viterbi_segment(p, without, max_len)
            alt_score = (
                sum(without[q] for q in alt)
                if alt is not None
                else -100.0 * len(p)
            )
            loss[p] = counts.get(p, 0.0) * (old[p] - alt_score)
        multi = sorted(loss, key=lambda p: (-loss[p], p))
        n_chars = len(old) - len(multi)
        logp = {p: lp for p, lp in old.items() if len(p) == 1}
        for p in multi[: max(0, keep - n_chars)]:
            logp[p] = old[p]  # survivors keep their probabilities
        for _ in range(em_rounds):
            logp, _ = _em_round(rows, logp, max_len)
    return logp


def _segment_batch_fn(pieces: dict[str, float], text_col: str, max_len: int):
    """Self-contained mapInPandas closure (worker portability: ships the
    piece table by value; references no module globals)."""

    def fn(batches):
        import math as _math

        import pandas as pd

        logp = dict(pieces)

        def viterbi(word):
            n = len(word)
            best = [-_math.inf] * (n + 1)
            back = [None] * (n + 1)
            best[0] = 0.0
            for i in range(1, n + 1):
                for j in range(max(0, i - max_len), i):
                    lp = logp.get(word[j:i])
                    if lp is None or best[j] == -_math.inf:
                        continue
                    cand = best[j] + lp
                    prev = back[i]
                    if cand > best[i] or (
                        cand == best[i] and prev is not None and j < prev[0]
                    ):
                        best[i] = cand
                        back[i] = (j, word[j:i])
            if back[n] is None:
                return list(word)  # uncoverable chars: per-char fallback
            out = []
            i = n
            while i > 0:
                j, piece = back[i]
                out.append(piece)
                i = j
            return out[::-1]

        cache: dict = {}
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                toks = []
                for w in (text or "").lower().split():
                    seg = cache.get(w)
                    if seg is None:
                        seg = cache[w] = viterbi(w)
                    toks.extend(seg)
                rows.append(
                    {"doc_id": doc_id, "pieces": toks, "n_pieces": len(toks)}
                )
            yield pd.DataFrame(rows)

    return fn


def unigram_segment(
    df: DataFrame,
    pieces: dict[str, float],
    text_col: str = "text",
    max_len: int = MAX_PIECE_LEN,
) -> DataFrame:
    """Tokenize a corpus with a trained piece table: ``(doc_id, pieces
    array<string>, n_pieces)``. Zero shuffle — one Arrow projection with
    a per-batch word cache."""
    return df.select("doc_id", text_col).mapInPandas(
        _segment_batch_fn(pieces, text_col, max_len),
        schema="doc_id long, pieces array<string>, n_pieces int",
    )


def save_pieces(spark, pieces: dict[str, float], path: str) -> None:
    """Persist the piece table as an ordinary parquet table
    ``(piece, logprob)`` — the tokenizer is a corpus artifact like any
    mart."""
    rows = sorted(pieces.items())
    spark.createDataFrame(rows, "piece string, logprob double").coalesce(
        1
    ).write.mode("overwrite").parquet(path)


def load_pieces(spark, path: str) -> dict[str, float]:
    return {
        r["piece"]: r["logprob"] for r in spark.read.parquet(path).collect()
    }


def train_and_segment(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 2000,
    max_words: int = 50_000,
) -> DataFrame:
    """End-to-end composite: word counts → driver training → distributed
    encode (the unigram twin of ``bpe.train_and_segment``)."""
    pieces = train_unigram(
        word_counts(df, text_col, max_words), vocab_size=vocab_size
    )
    return unigram_segment(df, pieces, text_col)
