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


def _ref_pagerank(edges, iterations=10, damping=0.85):
    """Pure-Python power iteration with the operator's exact
    semantics: weighted fractions, dangling mass = 1 - redistributed,
    teleport (1-d)/n."""
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
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
