"""Byte-pair-encoding tokenizer: distributed training corpus statistics
+ driver-side merge learning + distributed encoding (Sennrich et al.
2016, the subword algorithm behind GPT-2/RoBERTa-family vocabularies).

Beyond-reference scope — the reference lakehouse has no text stack; for
an LLM-training pipeline the tokenizer itself is a corpus-derived
artifact, and this module makes it one of the engine's tables.

Architecture (the same split every production tokenizer trainer uses —
HF ``tokenizers``/SentencePiece train from an aggregated word-frequency
table, not from the raw stream):

1. **Corpus scan is the distributed part** — :func:`word_counts` is one
   explode + one uniform-key aggregation over the whole corpus, then a
   deterministic top-``max_words`` cut. At 100 TB this is the only
   corpus-sized job; its output is O(vocabulary), not O(corpus).
2. **Merge learning is driver-side over that bounded table** —
   :func:`train_bpe` collects ≤ ``max_words`` (word, count) rows (the
   engine's IVF ``train_cap`` pattern: a documented bounded collect,
   constant in corpus size) and runs the classic merge loop. Zipf says
   the dropped tail contributes ~nothing to pair statistics.
3. **Encoding is embarrassingly parallel** — :func:`bpe_segment`
   broadcasts the merge ranks inside an Arrow-batched ``mapInPandas``
   closure with a per-batch word→tokens cache (Zipf again: the cache
   hit-rate approaches 1, so the amortized cost per token is a dict
   lookup, not a merge loop).

Determinism: ties in pair frequency break on the lexicographically
smallest pair, so the merge sequence is a pure function of the word-
frequency table; the top-``max_words`` cut orders by (count desc, word
asc). Training twice on the same corpus yields byte-identical merges.

Encode/replay equivalence (the property pinned in tests): greedily
applying the lowest-*rank* merge present in a word reproduces exactly
the segmentation obtained by replaying the merges in training order —
the standard BPE invariant the rank-based fast path relies on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakehouse_adventureworks2022_spark.operators.textops import tokens_col

#: End-of-word sentinel (Sennrich's ``</w>``): keeps merges from
#: crossing word boundaries and makes detokenization unambiguous.
EOW = "</w>"


def word_counts(
    df: DataFrame, text_col: str = "text", max_words: int = 50_000
) -> DataFrame:
    """Distributed word-frequency table: ``(word, count)``, the top
    ``max_words`` by (count desc, word asc).

    One map-side explode + one aggregation keyed on the word (uniform
    after lowercasing) + a top-k — the corpus-sized job of tokenizer
    training. The deterministic ordering makes the downstream merge
    sequence reproducible across partitionings.
    """
    toks = F.filter(tokens_col(F.col(text_col)), lambda t: F.length(t) > 0)
    return (
        df.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.col("count").desc(), F.col("word").asc())
        .limit(max_words)
    )


def train_bpe(
    counts: DataFrame | list[tuple[str, int]],
    num_merges: int = 256,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from a word-frequency table.

    ``counts`` is the :func:`word_counts` frame (collected here — the
    bounded driver-side step, ≤ ``max_words`` rows by construction) or
    an already-materialized list. Returns the ordered merge list; the
    vocabulary is ``base_symbols(merges) ∪ merged symbols``.

    The loop is the textbook algorithm with an incremental pair-count
    update (only words containing the merged pair are re-counted), so
    training 1-2k merges over a 50k-word table stays sub-second.
    """
    if isinstance(counts, DataFrame):
        counts = [(r["word"], r["count"]) for r in counts.collect()]
    # word → (symbol tuple, freq); identical words already aggregated
    words: list[tuple[list[str], int]] = [
        (list(w) + [EOW], int(c)) for w, c in counts if w
    ]
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}

    def _index(wi: int, sign: int) -> None:
        syms, freq = words[wi]
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + sign * freq
            if sign > 0:
                pair_words.setdefault((a, b), set()).add(wi)

    for wi in range(len(words)):
        _index(wi, +1)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best, best_c = None, 0
        for pair, c in pair_counts.items():
            if c < min_pair_count:
                continue
            if best is None or c > best_c or (c == best_c and pair < best):
                best, best_c = pair, c
        if best is None:
            break
        merges.append(best)
        joined = best[0] + best[1]
        for wi in list(pair_words.get(best, ())):
            syms, freq = words[wi]
            _index(wi, -1)
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wi] = (out, freq)
            _index(wi, +1)
        # drop exhausted entries so the argmax scan stays tight
        pair_counts = {p: c for p, c in pair_counts.items() if c > 0}
        pair_words = {
            p: ws for p, ws in pair_words.items() if p in pair_counts
        }
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Segment one (already-lowercased) word with the rank-greedy BPE
    encode: repeatedly merge the lowest-rank adjacent pair present.
    Pure function — shared by the driver tests and the worker closure.
    """
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def _segment_batch_fn(
    text_field: str, keep_fields: list[str], ranks: dict
):
    """Portable mapInPandas closure (self-contained imports; captures
    only the plain-dict merge ranks — see tests/test_worker_portability)."""

    def segment(batches):
        import pandas as pd  # noqa: F401 - Arrow batch contract

        cache: dict[str, list[str]] = {}
        eow = EOW

        def enc(word):
            got = cache.get(word)
            if got is None:
                syms = list(word) + [eow]
                while len(syms) > 1:
                    best_rank, best_i = None, -1
                    for i in range(len(syms) - 1):
                        r = ranks.get((syms[i], syms[i + 1]))
                        if r is not None and (
                            best_rank is None or r < best_rank
                        ):
                            best_rank, best_i = r, i
                    if best_rank is None:
                        break
                    syms[best_i : best_i + 2] = [
                        syms[best_i] + syms[best_i + 1]
                    ]
                got = cache[word] = syms
            return got

        for pdf in batches:
            toks_col, n_col = [], []
            for text in pdf[text_field].astype(str):
                toks: list[str] = []
                for w in text.strip().lower().split():
                    toks.extend(enc(w))
                toks_col.append(toks)
                n_col.append(len(toks))
            res = pdf[keep_fields].copy()
            res["bpe_tokens"] = toks_col
            res["n_bpe_tokens"] = n_col
            yield res

    return segment


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    keep_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Distributed BPE encode: ``keep_cols + (bpe_tokens, n_bpe_tokens)``.

    Zero shuffle — one Arrow-batched projection with the merge ranks
    shipped in the closure (a ranks dict of 2k merges is ~100 KB;
    far below broadcast-variable territory) and a per-batch word cache.
    """
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    keep = list(keep_cols)
    schema = ", ".join(f"{c} {t}" for c, t in df.select(*keep).dtypes) + (
        ", bpe_tokens array<string>, n_bpe_tokens int"
    )
    return df.select(*keep, text_col).mapInPandas(
        _segment_batch_fn(text_col, keep, ranks), schema
    )


def save_tokenizer(spark, merges: list[tuple[str, str]], path: str) -> None:
    """Persist learned merges as a table artifact ``(rank, left,
    right)`` — the tokenizer is corpus-derived state and versions like
    any other table (key ``path`` to the corpus version, same contract
    as the IVF index dirs). One kilobyte-scale coalesced file."""
    spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, left string, right string",
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_tokenizer(spark, path: str) -> list[tuple[str, str]]:
    """Merges back from :func:`save_tokenizer`, training order restored."""
    rows = spark.read.parquet(path).orderBy("rank").collect()
    return [(r["left"], r["right"]) for r in rows]


def train_and_segment(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 256,
    max_words: int = 50_000,
    keep_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Corpus → learned tokenizer → tokenized corpus, end to end."""
    merges = train_bpe(
        word_counts(df, text_col, max_words), num_merges=num_merges
    )
    return bpe_segment(df, merges, text_col, keep_cols)
