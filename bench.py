"""Benchmark harness: runs the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE compact (~200 byte) JSON
line:

    {"metric": "...", "value": <total_sec>, "unit": "sec", "sf": 0.1,
     "reps": 3, "n_queries": 81, "n_errors": 0, "steal_run_pct": 0.6,
     "dirty_reps": 0, "detail": "<per-run sidecar path>"}

Per-query medians, errors, and per-rep min/med/max + steal telemetry
live in the sidecar file the ``detail`` field points at. The driver's
artifact keeps only the tail of the line, so the line itself must stay
tiny (BENCH_r08-r10 all recorded ``"parsed": null`` when the medians
map rode along); ``tools/bench_compare.py`` follows the pointer.

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

Contention telemetry (round-8, after the r7 phantom-regression
adjudication): this VM suffers variable hypervisor CPU steal (measured
25% under load), which made a driver bench artifact indistinguishable
from a real plan regression. Every rep now records the /proc/stat
steal%% over its own window; reps whose window exceeds
``$SPARK_GRAFT_STEAL_PCT_MAX`` (default 5.0) are re-run (up to 2 extra
attempts per query) and excluded from the median when at least one
clean rep exists. The printed line carries ``steal_run_pct`` +
``dirty_reps`` so a contaminated run is *visible in the artifact*; the
full per-query breakdown goes to the sidecar
(``$SPARK_GRAFT_BENCH_DETAIL`` when set, else a per-run-stamped
``BENCH_detail.<utcstamp>.json`` beside this script so no later run or
pytest invocation can overwrite driver evidence).

Self-adjudication (round-13, after two rounds of mid-run steal waves
producing all-dirty >2× phantom flags only out-of-band probes could
clear): after the main loop, any query whose reps were ALL dirty or
whose median exceeds ``budget × BASELINE_QUERIES.json`` re-runs
serialized behind a bounded re-quiet wait; the sidecar records both
readings (``pre_retry_med`` + ``query_stats[..]["retry"]``) and the
reported median moves to the retry only when its window was clean.
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
    # r8 combined tier: IVF probe pruning bounds the SQ8-compressed
    # scan (plain SQ8 scans every code row — the missing tier the r7
    # verdict named); one-shot + deployed twin
    "ann_cosine_topk_ivf_sq8",
    "ann_cosine_topk_ivf_sq8_amortized",
    "dq_expectations_orders",
    # real MP4 frame extraction: in-plan MJPEG mux -> ISO-BMFF
    # sample-table parse -> per-frame dHash via the real JPEG decoder
    "video_frame_harvest",
    # r8: deployed-shape twin over a persisted corpus — measures the
    # harvest operator (parse -> decode -> dHash -> agg), not the
    # fixture generation the one-shot form is dominated by
    "video_frame_harvest_amortized",
    # r8: codec-agnostic bytes-level video near-dup (keyframe payload
    # hashes out of the sample tables — no pixel decode)
    "video_keyframe_dedup",
    # r8: benchmark-hygiene n-gram decontamination (explode -> broadcast
    # gram join -> per-doc agg; exact, swept DuckDB twin) + the fuzzy
    # MinHash cross-corpus tier over planted perturbed eval twins
    "eval_decontamination",
    "eval_decontamination_fuzzy",
    # r8: CCNet perplexity terciles + weighted-epochs materialization
    "perplexity_quality_buckets",
    "docs_epoch_mixture",
    # r9: CDC merge through TableManager.merge_upsert (exact, swept
    # twin) + IVF+SQ8 replay-idempotent ingest-and-search steady state
    "cdc_upsert",
    "ivf_sq8_index_ingest",
    # r10: chunk-index daily ingest — per-batch chunk+encode+append +
    # grown-index retrieval (the incremental path that replaces the
    # full chunk-index rebuild corpus growth used to pay)
    "rag_index_ingest",
    # r10: DSIR importance weighting toward a target domain (exact,
    # swept DuckDB twin; two linear explode+agg passes + broadcast
    # bounded models)
    "docs_dsir_weights",
    # r10: cross-source n-gram overlap matrix (exact, swept twin; one
    # distinct agg + per-gram source-list pair expansion)
    "source_overlap_matrix",
    # r10: bloom-gated incremental dedup — the deployed steady state of
    # the vs-history exact stage (persisted bloom + In() pushdown);
    # first rep builds state+bloom, median reports the gated batch cost
    "incremental_dedup_bloom",
    # r10: WET-style HTML→text extraction (exact, generated swept twin;
    # zero-shuffle codegen regex pipeline)
    "html_extract",
    # r10: full raw-crawl pipeline (extract → scrub → corpus-wide
    # boilerplate strip → gate/dedup → split)
    "web_corpus_pipeline",
    # r10: corpus diagnostics (exact swept twins) — Zipf slope over the
    # vocab head, Flesch readability projection
    "corpus_zipf",
    "doc_readability",
    # r11: URL canonicalization + URL-exact dedup census (exact, swept
    # generated twin; zero-shuffle projection + one census agg)
    "url_canonicalize",
    # r11: WARC container ingestion — in-plan spec-shaped mux (gzip
    # members) through the real record parser (exact driver oracle)
    "warc_ingest",
    # r11: sitemap ingestion — in-plan plant, extract + entity decode
    # (exact driver oracle; zero-shuffle projection)
    "sitemap_extract",
    # r12: WARC revisit records + crawler-digest dedup (exact driver
    # oracle — revisit mux through the real parser, digest-keyed aggs)
    "warc_revisit_digest",
    # r12: sitemap <lastmod> extraction — per-entry loc/lastmod pairing
    # (exact driver oracle; zero-shuffle projection)
    "sitemap_lastmod",
    # late r12: WET conversion-record ingestion (exact swept twin —
    # the CommonCrawl *.warc.wet.gz layout through the real parser)
    "wet_ingest",
    # late r12: Sitemap: directive discovery from robots.txt (exact
    # swept twin; zero-shuffle split+explode projection)
    "robots_sitemap_discovery",
    # late r12: anchor-outlink extraction + host link graph (exact
    # swept twins) and 5-iteration host PageRank (rows-only; the
    # iterative join+agg loop with per-iteration lineage truncation)
    "outlink_extract",
    "host_link_graph",
    "host_pagerank",
    # late r12: SURT url keys — the CDX-index sort key (exact swept
    # twin; zero-shuffle staged projection)
    "cdx_urlkey",
    # late r12: discovery-tier composite — sitemaps + robots → gated
    # frontier (exact swept twin; the robots gate's first
    # oracle-channel evidence)
    "crawl_frontier",
    # r13: host-authority enrichment — the PageRank prior broadcast-
    # joined onto docs by canonical host (exact swept twin; zero
    # doc-side shuffle)
    "host_authority",
    # r13: politeness planning — robots Crawl-delay → md5 host shards
    # + per-URL fetch schedule (exact swept twin; one by-host window)
    "crawl_politeness",
    # r13: per-host crawl health report — in-plan mux through the real
    # parser into ONE uniform-key agg (exact swept twin)
    "crawl_health",
    # r13: amortized random-access capture fetch — persisted archive +
    # CDX index built on the first rep; the median measures the
    # byte-range lookup batch, never an archive scan (exact swept twin)
    "warc_random_access",
    # r13: archive-aware frontier pruning — frontier minus the CDX
    # index unless modified since capture (exact swept twin; one
    # uniform-short-key join)
    "frontier_refresh",
]


def _purge_amortized_state(sf_dir: str) -> list[str]:
    """Delete THIS fixture version's persisted amortized-query state
    (/tmp index/archive/state dirs keyed on the fixture fingerprint) so
    every bench run pays each one-time build exactly once, on its first
    rep (r13 verdict ask #6 — reproducible totals: a warm machine used
    to skip the builds forever, so the headline total contained entries
    whose build cost appeared in no rep). The per-query MEDIAN still
    reports the amortized steady state (reps 2..n are lookup-only); the
    build rep is visible in the sidecar's per-rep times. Default-on;
    set ``SPARK_GRAFT_PURGE_AMORTIZED=0`` to keep warm state (e.g. for
    a lookup-only probe). Returns the dirs actually removed."""
    import shutil

    from lakehouse_adventureworks2022_spark.plans import text_queries as tq

    dirs: list[str] = []
    try:
        for prefix in (
            "ivf_index_", "pq_index_", "sq8_index_",
            "ivf_sq8_index_", "ivf_sq8_ingest_",
        ):
            dirs.append(tq.ivf_index_dir_for(sf_dir, prefix))
    except OSError:
        pass  # fixture without embeddings.parquet: no vector indexes
    try:
        rag = tq.rag_index_dir_for(sf_dir)
        dirs += [rag, rag + "_bm25", tq.rag_index_dir_for(sf_dir, "rag_ingest_index_")]
        dirs.append(tq._dedup_state_dir_for(sf_dir))
        dirs.append(tq.mp4_corpus_dir_for(sf_dir))
        dirs.append(tq._warc_archive_dir_for(sf_dir))
    except OSError:
        pass  # fixture without documents.parquet
    removed = []
    for d in dirs:
        if os.path.isdir(d):
            shutil.rmtree(d, ignore_errors=True)
            removed.append(d)
    return removed


def _cpu_times() -> tuple[int, int]:
    """(steal jiffies, total jiffies) from the aggregate /proc/stat cpu
    line; (0, 0) where /proc is unavailable (bench stays portable)."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(v) for v in parts[1:]]
        steal = vals[7] if len(vals) > 7 else 0
        return steal, sum(vals)
    except (OSError, ValueError, IndexError):
        return 0, 0


def _wait_for_quiet(
    max_wait: float, quiet_pct: float, window: float = 5.0
) -> tuple[float, float]:
    """Block until one ``window``-second /proc/stat interval shows
    hypervisor steal ≤ ``quiet_pct``%, or ``max_wait`` seconds elapse
    (r11 verdict: three of three closes AND the driver run all landed
    in steal waves the per-rep re-run machinery couldn't fully absorb —
    starting inside a wave is avoidable). Returns (waited_sec,
    last_window_pct); the caller records both in the artifact so an
    exhausted wait is visible, never silent."""
    start = time.monotonic()
    while True:
        s0, t0 = _cpu_times()
        time.sleep(window)
        s1, t1 = _cpu_times()
        pct = 100.0 * (s1 - s0) / (t1 - t0) if t1 > t0 else 0.0
        waited = time.monotonic() - start
        if pct <= quiet_pct or waited >= max_wait:
            return round(waited, 1), round(pct, 2)


def _run_once(spark, sf_dir: str, name: str) -> tuple[float, float]:
    """Run one rep end-to-end; returns (elapsed_sec, steal_pct) where
    steal_pct is hypervisor CPU steal over THIS rep's window."""
    s0, t0 = _cpu_times()
    start = time.perf_counter()
    QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    elapsed = time.perf_counter() - start
    s1, t1 = _cpu_times()
    steal_pct = 100.0 * (s1 - s0) / (t1 - t0) if t1 > t0 else 0.0
    return elapsed, steal_pct


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(Path(sf_dir).name.replace("sf", "") or "0.1")
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    steal_max = float(os.environ.get("SPARK_GRAFT_STEAL_PCT_MAX", "5.0"))
    extra = 2  # extra attempts per query when a rep's window is stolen
    # bounded wait-for-quiet BEFORE any timing: don't start a run inside
    # a steal wave (r11: all four full runs did). Capped so an endlessly
    # noisy host still produces an artifact — with the exhaustion on
    # record in the line.
    quiet_wait_max = float(
        os.environ.get("SPARK_GRAFT_QUIET_WAIT_MAX_SEC", "300")
    )
    quiet_pct = float(os.environ.get("SPARK_GRAFT_QUIET_PCT", "0.5"))
    purge = os.environ.get("SPARK_GRAFT_PURGE_AMORTIZED", "1") != "0"
    purged = _purge_amortized_state(sf_dir) if purge else []
    quiet_wait, quiet_last_pct = _wait_for_quiet(quiet_wait_max, quiet_pct)
    # byte-clean artifact tail (r12 verdict #4): the driver records the
    # printed tail verbatim, and stage-progress \r frames otherwise ride
    # in front of the JSON line. Static conf — must be set at build.
    spark = get_spark(
        "bench", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    # the artifact's tail must start at the JSON line: the known-bounded
    # WindowExec warning (and any other WARN chatter) otherwise rides
    # along in the driver's captured output (r11 verdict, cosmetic #4)
    try:
        spark.sparkContext.setLogLevel("ERROR")
    except Exception:
        pass  # Connect sessions have no sparkContext; logging is server-side
    # warm the JVM + parquet footers once so per-query numbers measure the
    # plans, not first-touch JIT/IO noise
    try:
        _run_once(spark, sf_dir, "top_products")
    except Exception:
        pass  # a broken warm-up query must not kill the run either

    timings: dict[str, float] = {}
    stats: dict[str, dict] = {}
    errors: dict[str, str] = {}
    run_s0, run_t0 = _cpu_times()
    for name in HEADLINE:
        if name not in QUERIES:
            continue
        clean: list[float] = []
        dirty: list[float] = []
        steals: list[float] = []
        rep_times: list[float] = []
        attempts = 0
        while len(clean) < reps and attempts < reps + extra:
            attempts += 1
            try:
                elapsed, steal = _run_once(spark, sf_dir, name)
            except Exception as e:  # noqa: BLE001 - bench must always report
                first = str(e).strip().splitlines()[0] if str(e).strip() else ""
                errors[name] = f"{type(e).__name__}: {first[:200]}"
                break  # same plan fails identically; don't retry the reps
            steals.append(round(steal, 2))
            rep_times.append(round(elapsed, 3))
            (clean if steal <= steal_max else dirty).append(elapsed)
        samples = clean or dirty  # all-stolen: report, flagged below
        if samples:
            timings[name] = round(statistics.median(samples), 3)
            stats[name] = {
                "min": round(min(samples), 3),
                "med": timings[name],
                "max": round(max(samples), 3),
                "steal": steals,
                "dirty": len(dirty),
                # raw per-rep wall times IN ORDER: with the amortized
                # state purged at run start, rep 1 of an amortized query
                # carries its one-time build — the build/lookup split is
                # therefore on the record (r13 verdict ask #6) while the
                # median keeps reporting the steady state
                "reps_sec": rep_times,
            }
    run_s1, run_t1 = _cpu_times()
    run_steal = (
        100.0 * (run_s1 - run_s0) / (run_t1 - run_t0)
        if run_t1 > run_t0
        else 0.0
    )

    # ── end-of-run self-adjudication (r12 verdict ask #1) ─────────────
    # The pre-run quiet gate only protects the START of the run; steal
    # waves arriving mid-run produced all-dirty >2× phantom flags in
    # BENCH_r11/r12 that only out-of-band judge probes could clear. Any
    # query whose reps were ALL dirty, or whose median flags >2× vs the
    # frozen per-query baselines, re-runs HERE — serialized, after a
    # bounded re-quiet wait, on the already-warm JVM (so sub-second
    # entries read their steady codegen floor, the same reading
    # tools/quiet_probe.py adjudicates with). The artifact records BOTH
    # readings: `pre_retry_med` keeps the contaminated number, `retry`
    # carries the adjudication evidence, and the reported median moves
    # to the retry only when the retry window was genuinely clean — a
    # real regression therefore shows two agreeing readings, a phantom
    # clears itself without a human in the loop.
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "2.0"))
    retry_wait_max = float(
        os.environ.get("SPARK_GRAFT_RETRY_QUIET_WAIT_SEC", "120")
    )
    retry_cap = int(os.environ.get("SPARK_GRAFT_RETRY_MAX_QUERIES", "12"))
    try:
        baselines = json.loads(
            (Path(__file__).resolve().parent / "BASELINE_QUERIES.json")
            .read_text()
        ).get("queries", {})
    except (OSError, ValueError):
        baselines = {}
    flagged: list[tuple[str, str]] = []
    for name, med in timings.items():
        s = stats[name]
        if s["dirty"] and s["dirty"] == len(s["steal"]):
            flagged.append((name, "all_dirty"))
        elif baselines.get(name) and med / baselines[name] > budget:
            flagged.append((name, "gt_budget"))
    retried = 0
    for name, reason in flagged:
        if retried >= retry_cap:
            stats[name]["retry"] = {"skipped": "retry_cap", "reason": reason}
            continue
        retried += 1
        rq_wait, rq_pct = _wait_for_quiet(retry_wait_max, quiet_pct)
        r_clean: list[float] = []
        r_dirty: list[float] = []
        r_steals: list[float] = []
        attempts = 0
        while len(r_clean) < reps and attempts < reps + extra:
            attempts += 1
            try:
                elapsed, steal = _run_once(spark, sf_dir, name)
            except Exception as e:  # noqa: BLE001 - keep the artifact alive
                first = str(e).strip().splitlines()[0] if str(e).strip() else ""
                errors[name] = f"{type(e).__name__}: {first[:200]}"
                break
            r_steals.append(round(steal, 2))
            (r_clean if steal <= steal_max else r_dirty).append(elapsed)
        r_samples = r_clean or r_dirty
        if not r_samples:
            stats[name]["retry"] = {"reason": reason, "failed": True}
            continue
        r_med = round(statistics.median(r_samples), 3)
        stats[name]["retry"] = {
            "reason": reason,
            "med": r_med,
            "min": round(min(r_samples), 3),
            "max": round(max(r_samples), 3),
            "steal": r_steals,
            "dirty": len(r_dirty),
            "quiet_wait_sec": rq_wait,
            "quiet_gate_pct": rq_pct,
        }
        if r_clean:  # only a clean retry window may move the reading
            stats[name]["pre_retry_med"] = timings[name]
            stats[name]["med"] = r_med
            timings[name] = r_med

    total = round(sum(timings.values()), 3)
    steal_summary = {
        "run_pct": round(run_steal, 2),
        "threshold_pct": steal_max,
        "quiet_wait_sec": quiet_wait,
        "quiet_gate_pct": quiet_last_pct,
        "dirty_reps": sum(s["dirty"] for s in stats.values()),
        "all_dirty_queries": [
            n for n, s in stats.items() if s["dirty"] and n in timings
            and len(s["steal"]) == s["dirty"]
        ],
    }
    # The driver keeps only the TAIL of the printed line, and even the
    # 81-entry medians map alone overflows that window (BENCH_r08-r10
    # all landed with "parsed": null). The line is therefore ~200 bytes
    # by contract — totals + counts + a pointer — and EVERYTHING
    # per-query (medians, errors, per-rep steal) lives in the sidecar.
    # The sidecar default is stamped per run so a later pytest/bench
    # invocation can never clobber driver evidence (r10 verdict #2).
    detail_path = os.environ.get("SPARK_GRAFT_BENCH_DETAIL")
    if not detail_path:
        stamp = time.strftime("%Y%m%dT%H%M%S", time.gmtime())
        detail_path = str(
            Path(__file__).resolve().parent / f"BENCH_detail.{stamp}.json"
        )
    line: dict = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "reps": reps,
        "n_queries": len(timings),
        "n_errors": len(errors),
        "steal_run_pct": steal_summary["run_pct"],
        "dirty_reps": steal_summary["dirty_reps"],
        # how long the pre-run quiet gate waited and the steal% of the
        # window that released it (> threshold ⇒ the wait EXHAUSTED and
        # the run started noisy — on the record, not silent)
        "quiet_wait_sec": quiet_wait,
        "quiet_gate_pct": quiet_last_pct,
        # end-of-run adjudication: how many flagged (all-dirty or >2×
        # vs baseline) queries re-ran serialized after a re-quiet wait;
        # both readings live in the sidecar's query_stats[..]["retry"]
        "retried": retried,
        "detail": detail_path,
    }
    try:
        Path(detail_path).write_text(
            json.dumps(
                {"sf": sf, "reps": reps, "queries": timings,
                 "errors": errors, "query_stats": stats,
                 "steal": steal_summary,
                 # reproducibility of the amortized family (r13 verdict
                 # ask #6): which persisted per-fixture state dirs were
                 # purged before timing, so first reps include builds
                 "amortized_purge": {
                     "enabled": purge, "purged_dirs": purged,
                 }},
                indent=1,
            )
        )
    except OSError:
        # read-only checkout: no sidecar — fall back to embedding the
        # medians so the data is not lost (the line may truncate, but a
        # missing sidecar must not erase the round's evidence)
        line["detail"] = None
        line["queries"] = timings
        line["errors"] = errors
    print(json.dumps(line))
    spark.stop()


if __name__ == "__main__":
    main()
