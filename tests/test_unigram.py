"""Unigram-LM tokenizer (operators/unigram.py): Viterbi DP vs
brute-force, hard-EM monotonicity, deterministic training across word
order and partition layout, coverage round-trip, persistence."""

from __future__ import annotations

import itertools
import math

import pytest

from lakehouse_adventureworks2022_spark.operators import unigram
from lakehouse_adventureworks2022_spark.sources.readers import read_table

SF = "/root/testdata/sf0.001"


def _brute_best(word, logp):
    """Enumerate every segmentation; return the max score (tie set)."""
    n = len(word)
    best_score, best_segs = -math.inf, []
    for cuts in itertools.product([0, 1], repeat=n - 1):
        pieces, start = [], 0
        for i, c in enumerate(cuts, 1):
            if c:
                pieces.append(word[start:i])
                start = i
        pieces.append(word[start:])
        if any(p not in logp for p in pieces):
            continue
        score = sum(logp[p] for p in pieces)
        if score > best_score + 1e-12:
            best_score, best_segs = score, [pieces]
        elif abs(score - best_score) <= 1e-12:
            best_segs.append(pieces)
    return best_score, best_segs


def test_viterbi_matches_bruteforce_over_random_vocabs():
    import random

    rng = random.Random(7)
    for _ in range(40):
        chars = "abcd"
        word = "".join(rng.choice(chars) for _ in range(rng.randint(2, 9)))
        vocab = {c: rng.uniform(-5, -1) for c in chars}
        for _ in range(6):
            a = rng.randint(0, len(word) - 1)
            b = rng.randint(a + 1, len(word))
            vocab[word[a:b]] = rng.uniform(-5, -1)
        seg = unigram.viterbi_segment(word, vocab)
        assert seg is not None and "".join(seg) == word
        score = sum(vocab[p] for p in seg)
        best, segs = _brute_best(word, vocab)
        assert score == pytest.approx(best)
        assert seg in segs  # a maximal segmentation, deterministically


def test_shared_core_survives_when_whole_words_cannot_be_pieces():
    """Words longer than MAX_PIECE_LEN force composition; the surviving
    multi-char pieces must all be built around the 'ababab' core every
    word shares, the trained vocabulary must beat the chars-only
    baseline in corpus likelihood, and a fresh combination must
    segment through a multi-char piece."""
    words = [(p * 2 + "ababab" + s * 2, 20) for p in "cdef" for s in "cdef"]
    assert all(len(w) > unigram.MAX_PIECE_LEN for w, _ in words)
    chars = {c for w, _ in words for c in w}
    pieces = unigram.train_unigram(
        words, vocab_size=len(chars) + 2, seed_size=400, em_rounds=3
    )
    kept_multi = [p for p in pieces if len(p) > 1]
    assert kept_multi and all("ababab" in p for p in kept_multi), kept_multi
    # trained vocab beats the chars-only baseline in corpus likelihood
    n_chars = sum(len(w) * c for w, c in words)
    char_counts: dict[str, int] = {}
    for w, c in words:
        for ch in w:
            char_counts[ch] = char_counts.get(ch, 0) + c
    char_logp = {
        ch: math.log(cnt / n_chars) for ch, cnt in char_counts.items()
    }
    _, ll_chars = unigram._e_step(words, char_logp, unigram.MAX_PIECE_LEN)
    _, ll_trained = unigram._e_step(words, pieces, unigram.MAX_PIECE_LEN)
    assert ll_trained > ll_chars
    seg = unigram.viterbi_segment("ccabababdd", pieces)
    assert seg is not None and "".join(seg) == "ccabababdd"
    assert any(len(p) > 1 for p in seg)


def test_loss_pruning_keeps_hard_to_replace_pieces():
    """The Kudo loss criterion in action: 'cd' stays a whole piece
    (its alternative c·d is expensive — both chars are rare), while
    'ababab' is dropped in favor of composition through 'ab' (its
    alternative ab·ab·ab costs almost nothing) — prob-ranked pruning
    would get the first case wrong."""
    words = [("ababab", 50), ("abab", 30), ("cd", 10), ("abcd", 5)]
    pieces = unigram.train_unigram(words, vocab_size=12, seed_size=40)
    assert unigram.viterbi_segment("cd", pieces) == ["cd"]
    assert unigram.viterbi_segment("ababab", pieces) == ["ab", "ab", "ab"]
    assert "ab" in pieces and "ababab" not in pieces


def test_em_is_monotone_in_viterbi_likelihood():
    words = [("ababab", 50), ("abab", 30), ("cd", 10), ("abcd", 5)]
    logp = unigram._seed_pieces(words, 40, 8)
    lls = []
    for _ in range(4):
        logp, ll = unigram._em_round(words, logp, 8)
        lls.append(ll)
    assert all(b >= a - 1e-9 for a, b in zip(lls, lls[1:])), lls


def test_training_is_deterministic_across_order_and_layout(spark):
    docs = read_table(spark, SF, "documents")
    wc_a = unigram.word_counts(docs, max_words=2000)
    wc_b = unigram.word_counts(docs.repartition(13), max_words=2000)
    pa = unigram.train_unigram(wc_a, vocab_size=300, em_rounds=1)
    pb = unigram.train_unigram(wc_b, vocab_size=300, em_rounds=1)
    assert pa == pb
    rows = [(r["word"], int(r["count"])) for r in wc_a.collect()]
    pc = unigram.train_unigram(list(reversed(rows)), vocab_size=300, em_rounds=1)
    assert pa == pc


def test_segment_roundtrip_and_batch_invariance(spark):
    docs = read_table(spark, SF, "documents").limit(60)
    pieces = unigram.train_unigram(
        unigram.word_counts(docs, max_words=2000), vocab_size=300, em_rounds=1
    )
    out = {
        r["doc_id"]: r["pieces"]
        for r in unigram.unigram_segment(docs, pieces).collect()
    }
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for doc_id, text in texts.items():
        assert "".join(out[doc_id]) == "".join((text or "").lower().split())
    shuffled = {
        r["doc_id"]: r["pieces"]
        for r in unigram.unigram_segment(docs.repartition(7), pieces).collect()
    }
    assert shuffled == out


def test_unseen_characters_fall_back_per_char(spark):
    df = spark.createDataFrame([(1, "qqq zz")], "doc_id long, text string")
    pieces = {"a": -1.0, "b": -1.0}  # vocabulary that never saw q/z
    rows = unigram.unigram_segment(df, pieces).collect()
    assert rows[0]["pieces"] == ["q", "q", "q", "z", "z"]


def test_piece_table_roundtrips_through_parquet(spark, tmp_path):
    docs = read_table(spark, SF, "documents").limit(40)
    pieces = unigram.train_unigram(
        unigram.word_counts(docs, max_words=1000), vocab_size=200, em_rounds=1
    )
    path = str(tmp_path / "pieces")
    unigram.save_pieces(spark, pieces, path)
    reloaded = unigram.load_pieces(spark, path)
    assert reloaded == pieces
    a = unigram.unigram_segment(docs, pieces).collect()
    b = unigram.unigram_segment(docs, reloaded).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))


def test_composite_runs_end_to_end(spark):
    docs = read_table(spark, SF, "documents").limit(50)
    out = unigram.train_and_segment(docs, vocab_size=300)
    rows = out.collect()
    assert len(rows) == 50
    assert all(r["n_pieces"] == len(r["pieces"]) for r in rows)
