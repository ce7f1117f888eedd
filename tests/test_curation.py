"""Curation operators: deterministic splitting, contamination detection,
token-budget packing (pytest-only: driver's 50-slot oracle window is
full — see plans/catalog.py guard)."""

from __future__ import annotations

import pytest

from lakehouse_adventureworks2022_spark.operators import curation
from lakehouse_adventureworks2022_spark.sources.readers import read_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return read_table(spark, SF, "documents").cache()


def test_split_deterministic_disjoint_exhaustive(docs):
    out = curation.split_by_hash(docs)
    rows = {r["doc_id"]: r["split"] for r in out.select("doc_id", "split").collect()}
    assert len(rows) == docs.count()  # exhaustive, one split per doc
    assert set(rows.values()) <= {"train", "val", "test"}
    # deterministic: recompute on a differently-partitioned frame
    again = {
        r["doc_id"]: r["split"]
        for r in curation.split_by_hash(docs.repartition(7))
        .select("doc_id", "split")
        .collect()
    }
    assert again == rows
    # 98/1/1 weights: train dominates on 500 docs
    n_train = sum(1 for s in rows.values() if s == "train")
    assert n_train / len(rows) > 0.9


def test_split_custom_weights_balance(spark):
    df = spark.range(20_000).withColumnRenamed("id", "doc_id")
    out = curation.split_by_hash(df, weights={"a": 0.5, "b": 0.5}, seed="w")
    counts = {
        r["split"]: r["n"]
        for r in out.groupBy("split").count().withColumnRenamed("count", "n").collect()
    }
    assert abs(counts["a"] - counts["b"]) / 20_000 < 0.05
    # a different seed re-rolls the assignment
    other = curation.split_by_hash(df, weights={"a": 0.5, "b": 0.5}, seed="x")
    moved = (
        out.withColumnRenamed("split", "s1")
        .join(other.withColumnRenamed("split", "s2"), "doc_id")
        .filter("s1 <> s2")
        .count()
    )
    assert moved > 1000


def test_contamination_finds_copied_doc(spark, docs):
    bench_rows = [
        (9001, "totally novel benchmark question with unique phrasing here"),
    ]
    # plant one training doc's text as a benchmark item
    leaked = docs.limit(1).collect()[0]
    bench = spark.createDataFrame(
        bench_rows + [(9002, leaked["text"])], "doc_id long, text string"
    )
    hits = curation.contamination_check(docs, bench, min_overlap=2).collect()
    pairs = {(r["train_doc_id"], r["bench_doc_id"]) for r in hits}
    assert (leaked["doc_id"], 9002) in pairs
    full = {r["bench_doc_id"]: r for r in hits if r["train_doc_id"] == leaked["doc_id"]}
    assert full[9002]["bench_overlap_ratio"] == 1.0  # exact copy: every shingle shared
    assert all(r["bench_doc_id"] != 9001 for r in hits)  # novel text is clean


def test_packing_respects_budget_and_partitions_docs(docs):
    budget = 400
    out = curation.pack_documents(docs, budget=budget).collect()
    assert len(out) == docs.count()  # every doc packed exactly once
    by_pack: dict[str, list] = {}
    for r in out:
        by_pack.setdefault(r["pack_id"], []).append(r)
    for pid, members in by_pack.items():
        tot = sum(r["n_tokens"] for r in members)
        assert all(r["pack_tokens"] == tot for r in members)
        assert all(r["pack_docs"] == len(members) for r in members)
        # budget holds unless the pack is a single over-budget doc
        assert tot <= budget or len(members) == 1
    # packing is effective: fewer packs than docs, high fill on multi-doc packs
    assert len(by_pack) < len(out)
    fills = [
        sum(r["n_tokens"] for r in m) / budget
        for m in by_pack.values()
        if len(m) > 1
    ]
    assert fills and sum(fills) / len(fills) > 0.5


def test_packing_deterministic(docs):
    a = {(r["doc_id"], r["pack_id"]) for r in curation.pack_documents(docs, 400).collect()}
    b = {
        (r["doc_id"], r["pack_id"])
        for r in curation.pack_documents(docs.repartition(11), 400).collect()
    }
    assert a == b


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lengths=st.lists(st.integers(min_value=1, max_value=50), min_size=1, max_size=40),
    budget=st.integers(min_value=10, max_value=120),
)
def test_packing_invariants_property(spark, lengths, budget):
    """For ANY corpus and budget: every doc packed exactly once, pack
    totals consistent, budget respected except singleton over-budget
    docs, and assignment deterministic."""
    rows = [(i, "w " * n) for i, n in enumerate(lengths)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = curation.pack_documents(docs, budget=budget, n_bins=4).collect()
    assert sorted(r["doc_id"] for r in out) == sorted(range(len(lengths)))
    packs: dict[str, list] = {}
    for r in out:
        packs.setdefault(r["pack_id"], []).append(r)
    for members in packs.values():
        tot = sum(r["n_tokens"] for r in members)
        assert all(r["pack_tokens"] == tot for r in members)
        assert tot <= budget or len(members) == 1


def test_sample_mixture_rates_and_determinism(spark):
    from pyspark.sql import functions as F

    df = (
        spark.range(30_000)
        .withColumnRenamed("id", "doc_id")
        .withColumn(
            "source",
            F.when(F.col("doc_id") % 3 == 0, "web")
            .when(F.col("doc_id") % 3 == 1, "books")
            .otherwise("code"),
        )
    )
    out = curation.sample_mixture(df, {"web": 0.1, "code": 0.5})
    counts = {
        r["source"]: r["count"]
        for r in out.groupBy("source").count().collect()
    }
    assert counts["books"] == 10_000  # unlisted group kept whole
    assert abs(counts["web"] - 1_000) < 150  # ~10% of 10k
    assert abs(counts["code"] - 5_000) < 350  # ~50% of 10k
    # deterministic and subset-stable across partitionings
    a = {r["doc_id"] for r in out.select("doc_id").collect()}
    b = {
        r["doc_id"]
        for r in curation.sample_mixture(
            df.repartition(13), {"web": 0.1, "code": 0.5}
        ).select("doc_id").collect()
    }
    assert a == b
    # lowering a rate yields a strict subset (nested samples)
    smaller = {
        r["doc_id"]
        for r in curation.sample_mixture(df, {"web": 0.05, "code": 0.5})
        .filter("source = 'web'")
        .select("doc_id")
        .collect()
    }
    web_a = {r["doc_id"] for r in out.filter("source = 'web'").select("doc_id").collect()}
    assert smaller < web_a


@pytest.mark.slow
def test_prepare_training_corpus_composite(spark, docs):
    out = curation.prepare_training_corpus(
        docs, mixture_rates={"web": 0.5}, split_weights={"train": 0.9, "val": 0.1}
    )
    rows = out.collect()
    assert rows and set(out.columns) == {"doc_id", "source", "lang", "n_chars", "split"}
    assert {r["split"] for r in rows} <= {"train", "val"}
    # composite only shrinks: survivors are a subset of clean_corpus alone
    from lakehouse_adventureworks2022_spark.operators import dedup, textops

    base = {
        r["doc_id"]
        for r in dedup.clean_corpus(
            textops.dedup_lines_within_doc(textops.redact_pii(docs))
        ).collect()
    }
    assert {r["doc_id"] for r in rows} <= base
    # deterministic end-to-end
    again = {(r["doc_id"], r["split"]) for r in
             curation.prepare_training_corpus(
                 docs, mixture_rates={"web": 0.5},
                 split_weights={"train": 0.9, "val": 0.1},
             ).collect()}
    assert again == {(r["doc_id"], r["split"]) for r in rows}


def test_prepare_training_corpus_takes_no_cache(spark, docs):
    """r13 opt: clean_corpus no longer persists its shingle frame (the
    consumers share exchanges via ReuseExchange within the one action;
    the persist was measured as a net pessimization — see
    OPTIMIZATION_r13.md). The composite must register no cache entry
    and release_cached_inputs must stay a harmless no-op on it."""
    import gc

    from lakehouse_adventureworks2022_spark.operators import dedup

    spark.catalog.clearCache()
    out = curation.prepare_training_corpus(docs)
    gc.collect()
    assert not list(getattr(out, "_cached_inputs", ())), (
        "a persist crept back into the single-action curation path"
    )
    assert out.count() > 0
    dedup.release_cached_inputs(out)  # still safe to call


def test_pack_documents_with_precomputed_counts(spark):
    docs = spark.createDataFrame(
        [(1, "ignored text", 100), (2, "x", 250), (3, "y", 260)],
        "doc_id long, text string, bpe_count int",
    )
    out = curation.pack_documents(
        docs, budget=360, n_bins=1, n_tokens_col="bpe_count"
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["n_tokens"] == 100  # uses the provided counts
    assert rows[2]["pack_tokens"] + rows[3]["pack_tokens"] >= 510


def test_contamination_df_cap_prunes_common_shingles(spark):
    """With a benchmark-side document-frequency cap, shingles shared by
    every benchmark doc stop generating hits, while unique leak evidence
    survives."""
    common = "the quick brown fox jumps over the lazy dog"
    bench = spark.createDataFrame(
        [
            (1, common + " alpha beta gamma delta epsilon"),
            (2, common + " zeta eta theta iota kappa"),
            (3, common + " lam mu nu xi omicron"),
        ],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (100, common + " totally different ending one two three"),
            (200, "unrelated text alpha beta gamma delta epsilon payload"),
        ],
        "doc_id long, text string",
    )
    uncapped = {
        (r["train_doc_id"], r["bench_doc_id"])
        for r in curation.contamination_check(train, bench, min_overlap=2).collect()
    }
    # the boilerplate prefix matches every bench doc for train 100
    assert {(100, 1), (100, 2), (100, 3)} <= uncapped
    capped = {
        (r["train_doc_id"], r["bench_doc_id"])
        for r in curation.contamination_check(
            train, bench, min_overlap=2, max_shingle_df=1
        ).collect()
    }
    # boilerplate (df=3) pruned; the real unique-tail leak remains
    assert (200, 1) in capped
    assert not any(t == 100 for t, _ in capped)


def _ref_chunks(text: str, chunk: int, overlap: int):
    toks = [t for t in text.strip().lower().split() if t]
    n, step, out, s = len(toks), chunk - overlap, [], 0
    while s == 0 or s < n - overlap:
        if n == 0:
            break
        out.append((" ".join(toks[s : s + chunk]), min(chunk, n - s)))
        s += step
    return out


def test_chunk_documents_matches_python_reference(spark, docs):
    got = {}
    for r in curation.chunk_documents(docs, chunk_tokens=64, overlap_tokens=16).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["chunk_text"], r["n_tokens"])
        )
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for doc_id, text in texts.items():
        want = [
            (i, t, n) for i, (t, n) in enumerate(_ref_chunks(text, 64, 16))
        ]
        have = sorted(got.get(doc_id, []))
        assert have == want, f"doc {doc_id}: {have[:2]} != {want[:2]}"


def test_chunk_documents_edges(spark):
    rows = [
        (1, ""),  # empty: no chunks
        (2, "   "),  # whitespace only: no chunks
        (3, "a b c"),  # shorter than one chunk: single chunk
        (4, " ".join(f"t{i}" for i in range(8))),  # exact two windows
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {}
    for r in curation.chunk_documents(df, chunk_tokens=5, overlap_tokens=2).collect():
        out.setdefault(r["doc_id"], []).append(r)
    assert 1 not in out and 2 not in out
    assert len(out[3]) == 1 and out[3][0]["n_tokens"] == 3
    [c0, c1] = sorted(out[4], key=lambda r: r["chunk_id"])
    assert c0["chunk_text"] == "t0 t1 t2 t3 t4" and c0["n_tokens"] == 5
    assert c1["chunk_text"] == "t3 t4 t5 t6 t7" and c1["n_tokens"] == 5
    # overlap contract: last 2 tokens of chunk k = first 2 of chunk k+1
    assert c0["chunk_text"].split()[-2:] == c1["chunk_text"].split()[:2]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="overlap_tokens"):
        curation.chunk_documents(df, chunk_tokens=5, overlap_tokens=5)


def test_chunk_documents_zero_shuffle(spark, docs):
    plan = (
        curation.chunk_documents(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # projection + generate only


def test_chunk_then_pack_composite(spark, docs):
    """The pipeline chain the ops are built for: chunk long docs into
    context windows, then pack chunks to a token budget using the
    chunk-level counts."""
    from pyspark.sql import functions as F

    chunks = curation.chunk_documents(docs, chunk_tokens=64, overlap_tokens=8)
    keyed = chunks.select(
        (F.col("doc_id") * 10_000 + F.col("chunk_id")).alias("doc_id"),
        "n_tokens",
    )
    packed = curation.pack_documents(keyed, budget=256, n_tokens_col="n_tokens")
    rows = packed.collect()
    assert len(rows) == chunks.count()  # every chunk packed exactly once
    by_pack: dict[str, int] = {}
    for r in rows:
        by_pack[r["pack_id"]] = by_pack.get(r["pack_id"], 0) + r["n_tokens"]
    assert all(tot <= 256 for tot in by_pack.values())  # chunks ≤ 64 ≤ budget


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n_tokens=st.integers(min_value=0, max_value=60),
    chunk=st.integers(min_value=2, max_value=20),
    data=st.data(),
)
def test_chunk_documents_property(spark, n_tokens, chunk, data):
    """For ANY (doc length, chunk size, overlap): Spark chunking equals
    the Python reference — full coverage, overlap stitching, no phantom
    trailing windows."""
    overlap = data.draw(st.integers(min_value=0, max_value=chunk - 1))
    text = " ".join(f"w{i}" for i in range(n_tokens))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = sorted(
        (r["chunk_id"], r["chunk_text"], r["n_tokens"])
        for r in curation.chunk_documents(
            df, chunk_tokens=chunk, overlap_tokens=overlap
        ).collect()
    )
    want = [
        (i, t, n) for i, (t, n) in enumerate(_ref_chunks(text, chunk, overlap))
    ]
    assert got == want


@pytest.mark.slow
def test_prepare_packed_corpus_end_to_end(spark, docs):
    """Full chain: survivors' chunks packed once each, packs never mix
    splits, budget respected, chunk identity decodes, deterministic."""
    out = curation.prepare_packed_corpus(
        docs, budget=512, chunk_tokens=64, overlap_tokens=8,
        split_weights={"train": 0.8, "val": 0.2},
    )
    rows = out.collect()
    from lakehouse_adventureworks2022_spark.operators import dedup

    dedup.release_cached_inputs(out)
    assert rows
    # pack ids are split-namespaced and packs never mix splits
    by_pack: dict[str, list] = {}
    for r in rows:
        assert r["pack_id"].startswith(r["split"] + "/")
        by_pack.setdefault(r["pack_id"], []).append(r)
    for members in by_pack.values():
        assert len({m["split"] for m in members}) == 1
        tot = sum(m["n_tokens"] for m in members)
        assert all(m["pack_tokens"] == tot for m in members)
        assert tot <= 512 or len(members) == 1

    # chunk membership equals chunking of the surviving scrubbed docs
    from lakehouse_adventureworks2022_spark.operators import textops

    scrubbed = textops.dedup_lines_within_doc(textops.redact_pii(docs))
    survivors = curation.split_by_hash(
        dedup.clean_corpus(scrubbed, threshold=0.2),
        weights={"train": 0.8, "val": 0.2},
    )
    want_chunks = {
        (r["doc_id"], r["chunk_id"])
        for r in curation.chunk_documents(
            scrubbed.join(survivors.select("doc_id"), "doc_id"),
            chunk_tokens=64,
            overlap_tokens=8,
        ).collect()
    }
    got_chunks = {(r["doc_id"], r["chunk_id"]) for r in rows}
    assert got_chunks == want_chunks  # every chunk packed exactly once
    assert len(rows) == len(got_chunks)

    again = {
        (r["doc_id"], r["chunk_id"], r["pack_id"])
        for r in curation.prepare_packed_corpus(
            docs, budget=512, chunk_tokens=64, overlap_tokens=8,
            split_weights={"train": 0.8, "val": 0.2},
        ).collect()
    }
    assert again == {(r["doc_id"], r["chunk_id"], r["pack_id"]) for r in rows}


# ---- deterministic corpus shuffle ------------------------------------

def test_shuffle_corpus_is_a_seeded_permutation(spark):
    docs = read_table(spark, SF, "documents")
    a = [r["doc_id"] for r in curation.shuffle_corpus(docs, seed="e1").collect()]
    assert sorted(a) == sorted(
        r["doc_id"] for r in docs.select("doc_id").collect()
    )  # permutation: nothing lost or duplicated
    # same seed, different physical layout → identical order
    b = [
        r["doc_id"]
        for r in curation.shuffle_corpus(docs.repartition(13), seed="e1").collect()
    ]
    assert a == b
    # new seed (next epoch) → a different permutation of the same rows
    c = [r["doc_id"] for r in curation.shuffle_corpus(docs, seed="e2").collect()]
    assert a != c and sorted(a) == sorted(c)


def test_shuffle_corpus_key_is_globally_sorted(spark):
    docs = read_table(spark, SF, "documents")
    keys = [
        r["__shuffle_key__"]
        for r in curation.shuffle_corpus(docs, seed="e1").collect()
    ]
    assert keys == sorted(keys)
    # explicit-partition form preserves the same global order
    ranged = curation.shuffle_corpus(docs, seed="e1", num_partitions=5)
    keys2 = [r["__shuffle_key__"] for r in ranged.collect()]
    assert keys2 == keys


def test_shuffle_corpus_single_exchange(spark):
    docs = read_table(spark, SF, "documents")
    plan = (
        curation.shuffle_corpus(docs, seed="e1")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange rangepartitioning") == 1
    assert "CartesianProduct" not in plan


@pytest.mark.slow
def test_prepare_training_corpus_with_model_gates(spark):
    """Extended composite: corpus-wide boilerplate pass + perplexity
    gate compose with the existing stages; default args unchanged."""
    from lakehouse_adventureworks2022_spark.operators import dedup

    base = [
        (
            i,
            "web",
            "en",
            "subscribe to our newsletter today\n"
            "the quiet river bent softly around the old stone mill "
            f"and the miller waved at boat number {i} passing by in the "
            "warm afternoon light while children played along the bank",
            200,
        )
        for i in range(12)
    ]
    garbage = [
        (100, "web", "en", "zxq " * 80, 300),  # fluency outlier
    ]
    docs = spark.createDataFrame(
        base + garbage, "doc_id long, source string, lang string, text string, n_chars long"
    )

    gated = curation.prepare_training_corpus(
        docs,
        near_dup_threshold=0.9,
        boilerplate_min_docs=3,
        max_ppl=50.0,
    )
    rows = gated.collect()
    dedup.release_cached_inputs(gated)
    ids = {r["doc_id"] for r in rows}
    assert 100 not in ids  # perplexity gate dropped the garbage doc
    assert len(ids) >= 1  # fluent docs survive
    assert {"split"} <= set(gated.columns)
