"""Hypothesis property tests for the round-5 text operators: ExactSubstr
span removal (arbitrary corpora vs the Python reference) and BPE
(arbitrary word-frequency tables: rank-greedy encode ≡ merge replay,
round-trip reconstruction)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lakehouse_adventureworks2022_spark.operators import bpe
from tests.test_substring_dedup import _ref_remove, _spark_remove

# small alphabet so duplicated runs actually occur in generated corpora
word = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "Fx", "gy"])
doc = st.lists(word, min_size=0, max_size=30).map(" ".join)
corpus = st.dictionaries(
    st.integers(min_value=1, max_value=40), doc, min_size=1, max_size=8
)


@pytest.fixture(scope="module")
def sparkref(spark):
    return spark


@pytest.mark.slow
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=corpus, window=st.integers(min_value=2, max_value=6),
       keep=st.sampled_from(["first", "none"]))
def test_span_removal_matches_reference_for_any_corpus(
    sparkref, docs, window, keep
):
    assert _spark_remove(sparkref, docs, window, keep) == _ref_remove(
        docs, window, keep
    )


# ---- BPE: pure-Python properties (no Spark session needed) ----------

wordfreq = st.dictionaries(
    st.text(alphabet="abcdef", min_size=1, max_size=8),
    st.integers(min_value=1, max_value=9),
    min_size=1,
    max_size=12,
)


def _replay(word: str, merges) -> list[str]:
    syms = list(word) + [bpe.EOW]
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


@settings(max_examples=60, deadline=None)
@given(freqs=wordfreq, probe=st.text(alphabet="abcdefgh", max_size=10))
def test_bpe_encode_equals_replay_and_roundtrips(freqs, probe):
    merges = bpe.train_bpe(list(freqs.items()), num_merges=40)
    ranks = {p: i for i, p in enumerate(merges)}
    got = bpe.encode_word(probe, ranks)
    assert got == _replay(probe, merges)
    # round-trip: concatenating tokens reconstructs word + EOW
    assert "".join(got) == probe + bpe.EOW


@settings(max_examples=30, deadline=None)
@given(freqs=wordfreq)
def test_bpe_training_is_input_order_independent(freqs):
    items = list(freqs.items())
    assert bpe.train_bpe(items, num_merges=30) == bpe.train_bpe(
        list(reversed(items)), num_merges=30
    )
