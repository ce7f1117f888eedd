"""Benchmark harness: runs the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"top_products": sec, ...}, "errors": {...}, "sf": 0.1}

Each query is forced end-to-end with the noop sink (full materialization,
no driver collect, no disk write skew).

Robustness contract (round-4 lesson: one broken query aborted the whole
run and erased the round's bench evidence):

- every query rep runs under try/except — a failure lands in ``errors``
  (exception class + first line) and the JSON line is ALWAYS printed;
- each query runs ``$SPARK_GRAFT_BENCH_REPS`` times (default 3) and
  reports the per-query MEDIAN, so a single GC pause / host-load spike
  can't masquerade as a plan regression (the round-3 "uniform 44%
  regression" and round-4's noisy IVF number were both host noise).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from lakehouse_adventureworks2022_spark.plans.catalog import QUERIES
from lakehouse_adventureworks2022_spark.session import get_spark

#: Queries timed by the driver's per-round bench. Covers the star-join
#: marts, the fact build, window/dedup, and the generated dim.
HEADLINE = [
    "top_products",
    "sales_summary",
    "fact_sales",
    "dim_date",
    "latest_event_per_user",
    "event_windows",
    "event_sessions",
    "incremental_read",
    "flatten_props",
    "scd2_part_dimension",
    "text_stats",
    "dedup_minhash_lsh",
    "ann_cosine_topk_np",
    "tpch_q1",
    "tpch_q5",
    "tpch_q8_market_share",
    "silver_lineitem_enriched",
    "customer_running_revenue",
    "asof_click_attribution",
    "error_burst_context",
    "small_quantity_part_revenue",
    "customer_order_distribution",
    "ann_cosine_topk_ivf",
    # deployed-IVF twin: builds+persists the index on the first rep, so
    # the median-of-3 reports the amortized (search-only) cost — the
    # build/search split the one-shot form can't show
    "ann_cosine_topk_ivf_amortized",
    "sales_rollup",
    "clean_corpus",
    # round-5 additions (kept AFTER the stable r1-comparable set so
    # historical per-query comparisons stay aligned)
    "chunk_documents",
    "incremental_dedup",
    "clean_boilerplate",
    "doc_perplexity",
    "quality_classifier",
    "ann_cosine_topk_pq",
    # deployed-PQ twin: builds+persists the codes index on the first
    # rep, so the median reports the amortized (ADC+re-rank) cost
    "ann_cosine_topk_pq_amortized",
    "temperature_mixture",
    "semdedup_prune",
    "rag_retrieval",
    # deployed-retrieval twin: persisted chunk index built on the first
    # rep, median reports the steady-state (search-only) cost
    "rag_retrieval_amortized",
    "remove_repeated_spans",
    "bpe_tokenize",
    "clean_assets",
    # steady-state hard-negative mining over the persisted chunk index
    "hard_negatives",
    # two-leg hybrid retrieval over persisted BM25 + IVF indexes
    "hybrid_retrieval",
    # SCD2 point-in-time fact enrichment (600k facts × version history)
    "scd2_part_price_asof",
    # round-6 additions (after the frozen r5 baseline set — they gain
    # per-query baselines at the next deliberate re-freeze)
    "funnel_conversion",
    "retention_cohorts",
    "event_anomalies",
    "corpus_vocabulary",
    # the two hardest new TPC-H shapes: 5-join profit rollup and the
    # double-correlation planned as per-order count predicates
    "tpch_q9_product_profit",
    "tpch_q21_waiting_suppliers",
    # bounded-shuffle sketch ops: MG-candidates exact top-k and the
    # mergeable KLL quantile build (shuffles sketches, never values)
    "heavy_hitters_event_types",
    "kll_value_quantiles",
    # round-7 additions: the two ex-scale-killers (global window ->
    # 1-row-aggregate broadcast join, r6 verdict #1) now benched so a
    # plan regression would show here, plus q2 after its selective-part
    # semi-join pushdown (r6 verdict #5)
    "tpch_q22_idle_balances",
    "tpch_q11_important_parts",
    "tpch_q2_min_balance_supplier",
    # r7 curation/sketch additions (swept twins / bounded differentials)
    "pii_scrub",
    "normalize_text",
    "domain_census",
    "docs_capped_per_source",
    "audience_overlap",
    "ann_cosine_topk_sq8",
    # deployed-SQ8 twin: index built on the first rep, median reports
    # the amortized (compressed scan + re-rank) cost
    "ann_cosine_topk_sq8_amortized",
    "dq_expectations_orders",
    # real MP4 frame extraction: in-plan MJPEG mux -> ISO-BMFF
    # sample-table parse -> per-frame dHash via the real JPEG decoder
    "video_frame_harvest",
]


def _run_once(spark, sf_dir: str, name: str) -> float:
    start = time.perf_counter()
    QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - start


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(Path(sf_dir).name.replace("sf", "") or "0.1")
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    spark = get_spark("bench")
    # warm the JVM + parquet footers once so per-query numbers measure the
    # plans, not first-touch JIT/IO noise
    try:
        _run_once(spark, sf_dir, "top_products")
    except Exception:
        pass  # a broken warm-up query must not kill the run either

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        if name not in QUERIES:
            continue
        samples: list[float] = []
        for _ in range(reps):
            try:
                samples.append(_run_once(spark, sf_dir, name))
            except Exception as e:  # noqa: BLE001 - bench must always report
                first = str(e).strip().splitlines()[0] if str(e).strip() else ""
                errors[name] = f"{type(e).__name__}: {first[:200]}"
                break  # same plan fails identically; don't retry the reps
        if samples:
            timings[name] = round(statistics.median(samples), 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "errors": errors,
                "reps": reps,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
