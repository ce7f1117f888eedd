"""BPE tokenizer (operators/bpe.py): textbook-example merges, the
rank-greedy == merge-replay equivalence property, round-trip
reconstruction, DuckDB differential for the distributed word counts,
and determinism across partitionings."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from lakehouse_adventureworks2022_spark.operators import bpe
from lakehouse_adventureworks2022_spark.operators.textops import WS_PLUS
from lakehouse_adventureworks2022_spark.sources.readers import read_table

SF_SMOKE = "/root/testdata/sf0.001"


# ---- training: the Sennrich et al. (2016) worked example -------------

SENNRICH = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def test_sennrich_first_merges():
    merges = bpe.train_bpe(SENNRICH, num_merges=4)
    # pair counts: (e,s)=(s,t)=(t,</w>)=9 — lexicographic tie-break
    # picks (e,s); then (es,t)=9 and (t,</w>)=9 tie → ("es","t") < ("t",…)
    assert merges[:3] == [("e", "s"), ("es", "t"), ("est", "</w>")]
    # next round: (l,o)=(o,w)=7 > (n,e)=6 → lexicographic ("l","o")
    assert merges[3] == ("l", "o")


def test_merges_deterministic_and_bounded():
    m1 = bpe.train_bpe(SENNRICH, num_merges=100)
    m2 = bpe.train_bpe(list(reversed(SENNRICH)), num_merges=100)
    assert m1 == m2  # input order cannot matter
    assert len(m1) < 100  # loop stops when no pair reaches min_count


def test_min_pair_count_floor():
    # every pair occurs once → nothing to merge
    assert bpe.train_bpe([("ab", 1), ("cd", 1)], num_merges=8) == []


# ---- encode: equivalence, round-trip, compression --------------------

def _replay_encode(word: str, merges) -> list[str]:
    """Independent reference: apply merges sequentially in training
    order (the definitionally-correct segmentation)."""
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


@pytest.mark.parametrize(
    "word", ["low", "lowest", "newer", "widow", "unseen", "x", ""]
)
def test_rank_greedy_equals_merge_replay(word):
    merges = bpe.train_bpe(SENNRICH, num_merges=50)
    ranks = {p: i for i, p in enumerate(merges)}
    assert bpe.encode_word(word, ranks) == _replay_encode(word, merges)


def test_roundtrip_on_fixture_corpus(spark):
    docs = read_table(spark, SF_SMOKE, "documents")
    merges = bpe.train_bpe(bpe.word_counts(docs), num_merges=200)
    seg = bpe.bpe_segment(docs, merges)
    joined = seg.join(docs.select("doc_id", "text"), "doc_id")
    bad = joined.filter(
        F.array_join(F.col("bpe_tokens"), "")
        != F.concat_ws(
            "",
            F.transform(
                F.filter(
                    F.split(F.trim(F.lower("text")), WS_PLUS),
                    lambda t: F.length(t) > 0,
                ),
                lambda w: F.concat(w, F.lit(bpe.EOW)),
            ),
        )
    )
    assert bad.count() == 0  # token concat reconstructs every document


def test_trained_vocab_compresses_vs_chars(spark):
    docs = read_table(spark, SF_SMOKE, "documents")
    merges = bpe.train_bpe(bpe.word_counts(docs), num_merges=200)
    seg = bpe.bpe_segment(docs, merges)
    stats = seg.join(docs.select("doc_id", "text"), "doc_id").select(
        F.sum("n_bpe_tokens").alias("toks"),
        F.sum(F.length(F.regexp_replace(F.lower("text"), WS_PLUS, ""))).alias(
            "chars"
        ),
    ).collect()[0]
    # merges must actually compress: far fewer tokens than characters
    assert stats["toks"] < stats["chars"] / 2
    # frequent fixture words should encode to a single symbol
    ranks = {p: i for i, p in enumerate(merges)}
    assert bpe.encode_word("the", ranks) == ["the" + bpe.EOW]


def test_encode_distributed_matches_driver(spark):
    docs = read_table(spark, SF_SMOKE, "documents").limit(50)
    merges = bpe.train_bpe(bpe.word_counts(docs), num_merges=64)
    ranks = {p: i for i, p in enumerate(merges)}
    got = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe.bpe_segment(docs, merges).collect()
    }
    for r in docs.select("doc_id", "text").collect():
        want = []
        for w in r["text"].strip().lower().split():
            want.extend(bpe.encode_word(w, ranks))
        assert got[r["doc_id"]] == want


# ---- distributed word counts: DuckDB differential --------------------

def test_word_counts_match_duckdb(spark):
    wc = bpe.word_counts(
        read_table(spark, SF_SMOKE, "documents"), max_words=100
    ).collect()
    oracle = duckdb.sql(
        f"""
        SELECT word, COUNT(*) AS c
        FROM (SELECT unnest(string_split_regex(trim(lower(text)), '[ \\t\\n\\r\\f]+'))
                  AS word
              FROM '{SF_SMOKE}/documents.parquet')
        WHERE word <> ''
        GROUP BY word ORDER BY c DESC, word ASC LIMIT 100
        """
    ).fetchall()
    assert [(r["word"], r["count"]) for r in wc] == oracle


def test_word_counts_partitioning_independent(spark):
    docs = read_table(spark, SF_SMOKE, "documents")
    a = bpe.word_counts(docs, max_words=50).collect()
    b = bpe.word_counts(docs.repartition(17), max_words=50).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


# ---- tokenizer artifact + downstream packing composition -------------

def test_tokenizer_save_load_roundtrip(spark, tmp_path):
    merges = bpe.train_bpe(SENNRICH, num_merges=50)
    path = str(tmp_path / "tok")
    bpe.save_tokenizer(spark, merges, path)
    assert bpe.load_tokenizer(spark, path) == merges


def test_pack_on_bpe_counts(spark):
    """The packer consumes real subword counts: budget respected against
    n_bpe_tokens (not whitespace words), every doc packed exactly once."""
    from lakehouse_adventureworks2022_spark.operators.curation import (
        pack_documents,
    )

    docs = read_table(spark, SF_SMOKE, "documents").limit(100)
    merges = bpe.train_bpe(bpe.word_counts(docs), num_merges=100)
    seg = bpe.bpe_segment(docs, merges)
    packed = pack_documents(
        seg, budget=4096, n_tokens_col="n_bpe_tokens"
    ).collect()
    assert {r["doc_id"] for r in packed} == {
        r["doc_id"] for r in docs.select("doc_id").collect()
    }
    by_pack: dict[str, int] = {}
    n_by_doc = {r["doc_id"]: r["n_bpe_tokens"] for r in seg.collect()}
    for r in packed:
        assert r["n_tokens"] == n_by_doc[r["doc_id"]]  # real BPE counts
        by_pack.setdefault(r["pack_id"], 0)
        by_pack[r["pack_id"]] += r["n_tokens"]
    for pid, tot in by_pack.items():
        assert tot <= 4096 or len(
            [r for r in packed if r["pack_id"] == pid]
        ) == 1  # only over-budget singletons may exceed
