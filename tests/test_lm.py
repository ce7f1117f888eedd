"""n-gram LM perplexity scoring — exact-math differential against a
pure-Python reference plus the ranking/determinism properties a quality
gate depends on (pytest-only: the driver's 50-slot oracle window is
full, and the mean-log-prob fold is float-order-dependent anyway)."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from lakehouse_adventureworks2022_spark.operators import lm
from lakehouse_adventureworks2022_spark.sources.readers import read_table

SF = "/root/testdata/sf0.001"


def _ref_perplexity(texts: dict[int, str], n: int = 2, k: float = 0.5):
    """Driver-side reference: identical tokenizer (lower/split-ws),
    identical padding and add-k smoothing, Kahan-free sequential sums
    (math.fsum for exactness)."""
    def toks(t):
        return [w for w in t.lower().strip().split() if w]

    def grams(t):
        padded = [lm.BOS] * (n - 1) + toks(t) + [lm.EOS]
        return [
            (" ".join(padded[i : i + n - 1]), padded[i + n - 1])
            for i in range(len(padded) - n + 1)
        ]

    counts = Counter(g for t in texts.values() for g in grams(t))
    ctx_totals = Counter()
    for (ctx, _), c in counts.items():
        ctx_totals[ctx] += c
    vocab = {w for (_, w) in counts}
    v = float(len(vocab))

    out = {}
    for doc_id, t in texts.items():
        logps = [
            math.log(
                (counts.get(g, 0) + k) / (ctx_totals.get(g[0], 0) + k * v)
            )
            for g in grams(t)
        ]
        nll = -math.fsum(logps) / len(logps)
        out[doc_id] = (len(logps), nll, math.exp(nll))
    return out


@pytest.fixture(scope="module")
def tiny_corpus(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the hat"),
        (3, "the dog ran in the park"),
        (4, "zxqv glorp fnord wibble"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string"), dict(rows)


@pytest.mark.parametrize("n", [1, 2, 3])
def test_matches_python_reference(spark, tiny_corpus, n):
    docs, texts = tiny_corpus
    got = {
        r["doc_id"]: (r["n_transitions"], r["avg_nll"], r["ppl"])
        for r in lm.doc_perplexity(docs, n=n).collect()
    }
    want = _ref_perplexity(texts, n=n)
    assert set(got) == set(want)
    for doc_id in want:
        assert got[doc_id][0] == want[doc_id][0], doc_id
        assert got[doc_id][1] == pytest.approx(want[doc_id][1], rel=1e-9)
        assert got[doc_id][2] == pytest.approx(want[doc_id][2], rel=1e-9)


def test_garbage_scores_above_fluent(spark, tiny_corpus):
    docs, _ = tiny_corpus
    ppl = {r["doc_id"]: r["ppl"] for r in lm.doc_perplexity(docs).collect()}
    # doc 4 shares no vocabulary with the rest — worst score by far
    assert ppl[4] > max(ppl[1], ppl[2], ppl[3])


def test_empty_doc_scores_finite(spark, tiny_corpus):
    docs, _ = tiny_corpus
    row = {
        r["doc_id"]: r for r in lm.doc_perplexity(docs).collect()
    }[5]
    # one <s>→</s> transition; finite, positive
    assert row["n_transitions"] == 1
    assert math.isfinite(row["ppl"]) and row["ppl"] > 0


def test_score_under_persisted_model_and_vocab_shortcut(spark, tiny_corpus):
    """Deployment shape: train once, score a different batch; passing a
    precomputed vocab_size must not change results."""
    docs, _ = tiny_corpus
    model = lm.train_ngram_lm(docs)
    v = lm.lm_vocab_size(model)
    batch = spark.createDataFrame(
        [(10, "the cat sat on the mat"), (11, "entirely novel words here")],
        "doc_id int, text string",
    )
    a = {r["doc_id"]: r["ppl"] for r in lm.score_perplexity(batch, model).collect()}
    b = {
        r["doc_id"]: r["ppl"]
        for r in lm.score_perplexity(batch, model, vocab_size=v).collect()
    }
    # same tolerance as test_partitioning_invariance: the log-prob sum's
    # fold order varies with runtime partitioning (observed once under
    # heavy host contention), and float fold order is not contractual —
    # the catalog query's 6dp display rounding is
    assert set(a) == set(b)
    for doc_id, p in a.items():
        assert b[doc_id] == pytest.approx(p, rel=1e-9)
    assert a[11] > a[10]  # unseen text scores worse under the model


def test_partitioning_invariance(spark, tiny_corpus):
    """Perplexity must not depend on the physical layout (tolerance for
    the float fold order)."""
    docs, _ = tiny_corpus
    base = {r["doc_id"]: r["ppl"] for r in lm.doc_perplexity(docs).collect()}
    shuffled = {
        r["doc_id"]: r["ppl"]
        for r in lm.doc_perplexity(docs.repartition(7)).collect()
    }
    for doc_id, p in base.items():
        assert shuffled[doc_id] == pytest.approx(p, rel=1e-9)


def test_fixture_corpus_scores_every_doc(spark):
    docs = read_table(spark, SF, "documents")
    out = lm.doc_perplexity(docs)
    assert out.count() == docs.count()
    bad = out.filter("ppl <= 0 OR isnan(ppl) OR ppl IS NULL").count()
    assert bad == 0


def test_no_python_udfs_in_plan(spark, tiny_corpus):
    docs, _ = tiny_corpus
    plan = (
        lm.doc_perplexity(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_interpolated_matches_python_reference(spark, tiny_corpus):
    docs, texts = tiny_corpus
    n, k, lam = 2, 0.5, 0.7

    def toks(t):
        return [w for w in t.lower().strip().split() if w]

    def grams(t):
        padded = [lm.BOS] * (n - 1) + toks(t) + [lm.EOS]
        return [
            (" ".join(padded[i : i + n - 1]), padded[i + n - 1])
            for i in range(len(padded) - n + 1)
        ]

    from collections import Counter

    counts = Counter(g for t in texts.values() for g in grams(t))
    ctx_totals = Counter()
    uni = Counter()
    for (ctx, w), c in counts.items():
        ctx_totals[ctx] += c
        uni[w] += c
    v = float(len({w for (_, w) in counts}))
    total = float(sum(counts.values()))

    model = lm.train_ngram_lm(docs, n=n)
    got = {
        r["doc_id"]: r["ppl"]
        for r in lm.score_perplexity_interpolated(
            docs, model, n=n, k=k, lam=lam
        ).collect()
    }
    for doc_id, t in texts.items():
        logps = [
            math.log(
                lam
                * (counts.get(g, 0) + k)
                / (ctx_totals.get(g[0], 0) + k * v)
                + (1 - lam) * (uni.get(g[1], 0) + k) / (total + k * v)
            )
            for g in grams(t)
        ]
        want = math.exp(-math.fsum(logps) / len(logps))
        assert got[doc_id] == pytest.approx(want, rel=1e-9), doc_id


def test_interpolated_softens_rare_context_penalty(spark, tiny_corpus):
    """A fluent doc with unseen CONTEXTS but common WORDS must score
    better interpolated than pure-bigram (the backoff's whole point)."""
    docs, _ = tiny_corpus
    model = lm.train_ngram_lm(docs)
    probe = docs.sparkSession.createDataFrame(
        # words all seen in training, bigram contexts mostly novel
        [(50, "dog the mat cat the sat on")],
        "doc_id int, text string",
    )
    pure = lm.score_perplexity(probe, model).collect()[0]["ppl"]
    interp = lm.score_perplexity_interpolated(probe, model).collect()[0]["ppl"]
    assert interp < pure


def test_kn_matches_python_reference(spark, tiny_corpus):
    """Interpolated Kneser-Ney (r7): exact-math differential — absolute
    discounting + continuation probability + unseen-context backoff,
    replicated transition-by-transition in pure Python."""
    docs, texts = tiny_corpus
    n, d, k = 2, 0.75, 0.5

    def toks(t):
        return [w for w in t.lower().strip().split() if w]

    def grams(t):
        padded = [lm.BOS] * (n - 1) + toks(t) + [lm.EOS]
        return [
            (" ".join(padded[i : i + n - 1]), padded[i + n - 1])
            for i in range(len(padded) - n + 1)
        ]

    from collections import Counter

    counts = Counter(g for t in texts.values() for g in grams(t))
    ctx_totals = Counter()
    ctx_types = Counter()
    cont = Counter()
    for (ctx, w), c in counts.items():
        ctx_totals[ctx] += c
        ctx_types[ctx] += 1
        cont[w] += 1
    v = float(len({w for (_, w) in counts}))
    total_types = float(len(counts))

    def p_cont(w):
        return (cont.get(w, 0) + k) / (total_types + k * v)

    def p_kn(ctx, w):
        cc = ctx_totals.get(ctx, 0)
        if cc == 0:
            return p_cont(w)
        return (
            max(counts.get((ctx, w), 0) - d, 0.0) / cc
            + d * ctx_types[ctx] / cc * p_cont(w)
        )

    model = lm.train_ngram_lm(docs, n=n)
    got = {
        r["doc_id"]: (r["n_transitions"], r["ppl"])
        for r in lm.score_perplexity_kn(
            docs, model, n=n, discount=d, k=k
        ).collect()
    }
    for doc_id, t in texts.items():
        logps = [math.log(p_kn(*g)) for g in grams(t)]
        want = math.exp(-math.fsum(logps) / len(logps))
        assert got[doc_id][0] == len(logps)
        assert got[doc_id][1] == pytest.approx(want, rel=1e-9), doc_id


def test_kn_continuation_beats_raw_frequency(spark):
    """The 'San Francisco' property: a word frequent in ONE context
    only ('francisco', always after 'san') must get LESS unseen-context
    mass than an equally frequent word seen after many contexts."""
    rows = [
        (1, "san francisco san francisco san francisco san francisco"),
        (2, "a nice day a good day a long day a short day"),
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    model = lm.train_ngram_lm(docs, n=2)
    # both probes place the word after an UNSEEN context -> pure P_cont
    probe = spark.createDataFrame(
        [(10, "zzz francisco"), (11, "zzz day")], "doc_id int, text string"
    )
    got = {
        r["doc_id"]: r["ppl"]
        for r in lm.score_perplexity_kn(docs=probe, lm=model).collect()
    }
    # 'day' follows 4 distinct contexts, 'francisco' only 1 -> the
    # 'day' probe must be judged more plausible (lower perplexity)
    assert got[11] < got[10]


def test_kn_finite_on_oov_and_empty(spark, tiny_corpus):
    docs, _ = tiny_corpus
    model = lm.train_ngram_lm(docs)
    probe = docs.sparkSession.createDataFrame(
        [(20, "totally unseen wordsoup here"), (21, "")],
        "doc_id int, text string",
    )
    rows = {r["doc_id"]: r for r in lm.score_perplexity_kn(probe, model).collect()}
    for r in rows.values():
        assert math.isfinite(r["ppl"]) and r["ppl"] > 0


def test_perplexity_buckets_ntile_semantics(spark, tiny_corpus):
    """CCNet split: per-source bucket sizes differ by at most one, head
    never scores worse than tail within a source, labels map 1/2/3 ->
    head/middle/tail, and k_buckets guards."""
    docs, _ = tiny_corpus
    labeled = docs.withColumn(
        "source", (F.col("doc_id") % 2).cast("string")
    )
    out = lm.perplexity_buckets(labeled, 3).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    for src, rows in by_src.items():
        sizes = {}
        for r in rows:
            sizes[r["bucket"]] = sizes.get(r["bucket"], 0) + 1
        assert max(sizes.values()) - min(sizes.values()) <= 1, (src, sizes)
        heads = [r["ppl"] for r in rows if r["bucket_label"] == "head"]
        tails = [r["ppl"] for r in rows if r["bucket_label"] == "tail"]
        if heads and tails:
            assert max(heads) <= min(tails)
        assert {r["bucket_label"] for r in rows} <= {"head", "middle", "tail"}
    k4 = lm.perplexity_buckets(labeled, 4).collect()
    assert {r["bucket_label"] for r in k4} <= {"b1", "b2", "b3", "b4"}
    with pytest.raises(ValueError, match="k_buckets"):
        lm.perplexity_buckets(labeled, 1)
