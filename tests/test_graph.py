"""Outlink extraction, host link graph, and PageRank
(textops.extract_outlinks / host_link_graph, graph.pagerank): resolution
worked examples, graph aggregation, and the power-iteration math
differential against a pure-Python reference (rank sum, dangling
handling, hub ordering, weights, determinism)."""

from __future__ import annotations

import pytest

from lakehouse_adventureworks2022_spark.operators.graph import pagerank
from lakehouse_adventureworks2022_spark.operators.textops import (
    extract_outlinks,
    host_link_graph,
)

HTML = (
    "<html><body>"
    '<a href="http://other.io/x?a=1&amp;b=2">abs</a>'
    "<a href='//cdn.io/lib.js'>proto-rel</a>"
    '<a class="z" HREF="/root/page">root-rel</a>'
    '<a href="#frag">drop</a>'
    '<a href="javascript:void(0)">drop</a>'
    '<a href="rel/path.html">drop</a>'
    '<a href="mailto:x@y.z">drop</a>'
    "</body></html>"
)


def test_outlink_resolution_worked_examples(spark):
    pages = spark.createDataFrame(
        [("https://Site.io:443/p/1", HTML)], "url string, html string"
    )
    got = sorted(r["link"] for r in extract_outlinks(pages).collect())
    assert got == [
        "http://other.io/x?a=1&b=2",  # &amp; decoded
        "https://Site.io:443/root/page",  # scheme+authority attached
        "https://cdn.io/lib.js",  # page scheme attached
    ]


def test_outlink_zero_shuffle_plan(spark):
    pages = spark.createDataFrame(
        [("http://a.io/", HTML)], "url string, html string"
    )
    plan = (
        extract_outlinks(pages)._jdf.queryExecution().executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_host_link_graph_canonicalizes_and_counts(spark):
    links = spark.createDataFrame(
        [
            ("http://A.io:80/p1", "http://b.io/x"),
            ("http://a.io/p2", "HTTPS://B.IO:443/y"),  # same hosts
            ("http://a.io/p3", "http://c.io/"),
            ("not a url", "http://b.io/"),  # non-URL src drops
        ],
        "url string, link string",
    )
    got = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in host_link_graph(links).collect()
    }
    assert got == {("a.io", "b.io"): 2, ("a.io", "c.io"): 1}


def _ref_pagerank(edges, iterations=10, damping=0.85, extra_nodes=()):
    """Pure-Python power iteration with the operator's exact
    semantics: weighted fractions, dangling mass = 1 - redistributed,
    teleport (1-d)/n. ``extra_nodes``: nodes in the graph with no
    positive-weight edges (pure dangling participants)."""
    nodes = sorted(
        {s for s, _, _ in edges}
        | {d for _, d, _ in edges}
        | set(extra_nodes)
    )
    out: dict[str, float] = {}
    for s, _, w in edges:
        out[s] = out.get(s, 0.0) + w
    n = len(nodes)
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        contrib = {v: 0.0 for v in nodes}
        for s, d, w in edges:
            contrib[d] += r[s] * w / out[s]
        dangling = 1.0 - sum(contrib.values())
        r = {
            v: (1.0 - damping) / n + damping * (contrib[v] + dangling / n)
            for v in nodes
        }
    return r


EDGES = [
    # hub: everyone links to 'hub'; 'sink' has no out-edges (dangling)
    ("a", "hub", 1.0),
    ("b", "hub", 2.0),
    ("c", "hub", 1.0),
    ("hub", "sink", 1.0),
    ("a", "b", 1.0),
    ("b", "c", 1.0),
]


@pytest.mark.parametrize("weighted", [True, False])
def test_pagerank_matches_python_reference(spark, weighted):
    df = spark.createDataFrame(
        EDGES, "src_host string, dst_host string, n_links double"
    )
    got = {
        r["node"]: r["rank"]
        for r in pagerank(
            df,
            weight_col="n_links" if weighted else None,
            iterations=7,
        ).collect()
    }
    ref_edges = (
        EDGES if weighted else [(s, d, 1.0) for s, d, _ in EDGES]
    )
    ref = _ref_pagerank(ref_edges, iterations=7)
    assert set(got) == set(ref)
    for v in ref:
        assert got[v] == pytest.approx(ref[v], abs=1e-9), v
    # probability invariant and the structural orderings: ranks sum to
    # 1; the hub out-ranks its spokes; the dangling sink still collects
    # the hub's mass (it out-ranks the spokes too)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    assert got["hub"] > got["a"] and got["hub"] > got["c"]
    assert got["sink"] > got["a"]


def test_pagerank_deterministic_across_runs(spark):
    df = spark.createDataFrame(
        EDGES, "src_host string, dst_host string, n_links double"
    )
    r1 = sorted(
        (r["node"], r["rank"]) for r in pagerank(df, iterations=5).collect()
    )
    r2 = sorted(
        (r["node"], r["rank"]) for r in pagerank(df, iterations=5).collect()
    )
    assert r1 == r2


def test_pagerank_zero_weight_edges_treated_as_dangling(spark):
    """r12 ADVICE: a source whose edge weights sum to 0 must be treated
    as EXPLICITLY dangling — dropped at normalization, never a NULL
    0/0 fraction (non-ANSI) or a mid-loop throw (ANSI). Both endpoints
    of a dropped edge stay in the node set; ranks stay non-NULL and
    sum to 1."""
    edges = [
        ("a", "b", 1.0),
        ("b", "c", 2.0),
        # z's only out-edges carry zero weight -> z is dangling; its
        # targets still count as nodes
        ("z", "a", 0.0),
        ("z", "only_via_zero", 0.0),
    ]
    df = spark.createDataFrame(
        edges, "src_host string, dst_host string, n_links double"
    )
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=5).collect()}
    assert set(got) == {"a", "b", "c", "z", "only_via_zero"}
    assert all(v is not None and v > 0 for v in got.values())
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    # exact math: equivalent to the graph with z's zero edges REMOVED
    # but z / only_via_zero kept as pure dangling participants
    ref = _ref_pagerank(
        [("a", "b", 1.0), ("b", "c", 2.0)],
        iterations=5,
        extra_nodes=("z", "only_via_zero"),
    )
    for v in ref:
        assert got[v] == pytest.approx(ref[v], abs=1e-9), v


def test_pagerank_from_planted_crawl_chain(spark):
    """End-to-end: pages → outlinks → host graph → ranks. The shared
    cdn host (every page links to it) must out-rank any single source
    host."""
    pages = spark.createDataFrame(
        [
            (f"http://h{i}.io/p", f'<a href="//cdn.io/x"></a>'
             f'<a href="http://h{(i + 1) % 3}.io/"></a>')
            for i in range(3)
        ],
        "url string, html string",
    )
    edges = host_link_graph(extract_outlinks(pages))
    ranks = {r["node"]: r["rank"] for r in pagerank(edges, iterations=5).collect()}
    assert max(ranks, key=ranks.get) == "cdn.io"


def test_host_authority_join_and_defaults(spark):
    """host_authority attaches the per-host rank by canonical host
    (case/port noise folds onto the same node), fills unranked hosts
    with the default, and leaves them NULL under default=None so a
    gate can distinguish unranked from ranked-low."""
    from pyspark.sql import functions as F

    from lakehouse_adventureworks2022_spark.operators.graph import (
        host_authority,
    )

    ranks = spark.createDataFrame(
        [("a.io", 0.5), ("b.io", 0.001)], "node string, rank double"
    )
    docs = spark.createDataFrame(
        [
            (1, "http://A.IO:80/page"),   # canonicalizes onto a.io
            (2, "https://b.io/x"),
            (3, "http://new.io/y"),       # unranked host
            (4, "not a url"),
        ],
        "doc_id long, url string",
    )
    got = {
        r["doc_id"]: r["host_authority"]
        for r in host_authority(docs, ranks).collect()
    }
    assert got[1] == pytest.approx(0.5)
    assert got[2] == pytest.approx(0.001)
    assert got[3] == 0.0 and got[4] == 0.0
    nulls = {
        r["doc_id"]: r["host_authority"]
        for r in host_authority(docs, ranks, default=None).collect()
    }
    assert nulls[1] == pytest.approx(0.5)
    assert nulls[3] is None and nulls[4] is None
    # scale posture: broadcast join, zero doc-side shuffle (plan-pinned)
    plan = host_authority(docs, ranks)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan


@pytest.mark.slow
def test_prepare_web_corpus_host_authority_gate(spark):
    """r12 verdict ask #3: planted high/low-authority hosts shift the
    quality gate — pages from a host RANKED below min_host_authority
    drop before extraction, unranked hosts conservatively survive, and
    without a threshold the authority column rides in as a feature."""
    from lakehouse_adventureworks2022_spark.operators import dedup
    from lakehouse_adventureworks2022_spark.operators.curation import (
        prepare_web_corpus,
    )

    page = (
        "<p>tiny healthy document with enough plain words"
        " to pass the quality gate today</p>"
    )
    other = (
        "<p>another entirely different page describing oranges,"
        " bicycles and seven rainy tuesdays in quiet detail</p>"
    )
    third = (
        "<p>a third page about lighthouses, tide tables and the"
        " quiet ferry schedule of a small island town</p>"
    )
    ranks = spark.createDataFrame(
        [("good.io", 0.4), ("spam.io", 0.0001)], "node string, rank double"
    )
    df = spark.createDataFrame(
        [
            (1, "web", "en", "http://good.io/a", page),
            (2, "web", "en", "http://spam.io/b", other),   # ranked low
            (3, "web", "en", "http://fresh.io/c", third),  # unranked
        ],
        "doc_id long, source string, lang string, url string, html string",
    )
    out = prepare_web_corpus(
        df, url_col="url", host_ranks=ranks, min_host_authority=0.01
    )
    got = sorted(r["doc_id"] for r in out.collect())
    dedup.release_cached_inputs(out)
    assert got == [1, 3]  # low-authority dropped, unranked kept

    # no threshold: the authority column rides along as a feature
    feat = prepare_web_corpus(df, url_col="url", host_ranks=ranks)
    vals = {r["doc_id"]: r["host_authority"] for r in feat.collect()}
    dedup.release_cached_inputs(feat)
    assert vals[1] == pytest.approx(0.4) and vals[3] == 0.0

    with pytest.raises(ValueError, match="url_col"):
        prepare_web_corpus(df, host_ranks=ranks)
    with pytest.raises(ValueError, match="host_ranks"):
        prepare_web_corpus(df, url_col="url", min_host_authority=0.01)
