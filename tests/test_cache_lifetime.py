"""Regression tests for the r13 cache policy on single-action query paths.

History: operators used to ``persist()`` intermediates consumed by
several subtrees (LM model, LSH shingles, exact-deduped batch, asset
uniques) and tie the cache's lifetime to the RESULT frame via a GC
finalizer (``dedup._attach_cached_input``). Round-13 optimization
measured two things:

1. in every benched catalog wrapper the cache was *already dead* — the
   wrapper derived a new frame (``.select``/``.orderBy``) without
   ``transfer_cached_inputs``, so CPython GC unpersisted the cache the
   moment the wrapper returned, before anything materialized;
2. making the caches live (or keeping the persists at all) was a net
   PESSIMIZATION at bench scale: ``persist()`` eagerly physical-plans
   the subtree at call time, the cached plan loses AQE, and the
   columnar cache write costs more than the work it saves — repeated
   subtrees inside ONE action are already deduplicated by Spark's
   ReuseExchange (measured per query in OPTIMIZATION_r13.md; e.g.
   incremental_dedup 7.6 s no-op cache / 18.2 s live cache / 5.8 s no
   persist).

The persists on single-action paths were therefore REMOVED. Cross-action
persists stay (graph.pagerank's loop frames, bm25's two-job index build,
streaming's write+state-append batches). These tests pin the new
contract: building a single-action catalog query registers NO cache
entry (nothing to churn, nothing to leak), and the query still runs.
"""

from __future__ import annotations

import gc

import pytest

from lakehouse_adventureworks2022_spark.plans.catalog import QUERIES

SF_DIR = "/root/testdata/sf0.001"

#: Single-action catalog queries whose composites used to persist (and
#: regressed one way or the other — dead cache or live-cache slowdown).
PREVIOUSLY_PERSISTING_QUERIES = [
    "incremental_dedup",
    "incremental_dedup_bloom",
    "clean_assets",
    "doc_perplexity",
    "perplexity_quality_buckets",
    "eval_decontamination_fuzzy",
    "dedup_minhash_lsh",
    "clean_corpus",
]


def _cache_manager(spark):
    if not hasattr(spark, "_jsparkSession"):  # Connect: no JVM handle
        pytest.skip("cache-manager introspection needs a classic session")
    return spark._jsparkSession.sharedState().cacheManager()


@pytest.mark.parametrize("name", PREVIOUSLY_PERSISTING_QUERIES)
def test_single_action_query_registers_no_cache(spark, name):
    spark.catalog.clearCache()
    df = QUERIES[name](spark, SF_DIR)
    gc.collect()
    assert _cache_manager(spark).isEmpty(), (
        f"{name}: a persist() crept back into a single-action query "
        "path — r13 measured these as net pessimizations (ReuseExchange "
        "already dedupes repeated subtrees within one action); if the "
        "persist is deliberate, it must come with a fresh A/B "
        "measurement in the round's OPTIMIZATION notes"
    )
    assert df.count() >= 0  # still executes end-to-end
    del df
    gc.collect()
    assert _cache_manager(spark).isEmpty()
