"""robots.txt parsing + URL gating (textops.parse_robots /
filter_robots_disallowed) — RFC 9309 worked examples: group selection
(named agent shadows *), longest-match precedence, allow-wins-ties,
wildcard/$ patterns, no-rules default-allow, and the crawl-chain
integration ahead of URL dedup."""

from __future__ import annotations

import pytest

from lakehouse_adventureworks2022_spark.operators.textops import (
    filter_robots_disallowed,
    parse_robots,
)

ROBOTS_A = """
# comment line
User-agent: *
Disallow: /private/
Allow: /private/public-page
Disallow: /tmp*
Disallow: /exact-file$
"""

ROBOTS_B = """
User-agent: specialbot
Disallow: /

User-agent: *
Disallow: /only-star-blocked/
"""


def _rules(spark, user_agent="*"):
    df = spark.createDataFrame(
        [("a.io", ROBOTS_A), ("b.io", ROBOTS_B)],
        "host string, robots_txt string",
    )
    return parse_robots(df, user_agent=user_agent)


def test_parse_rules_table(spark):
    got = {
        (r["host"], r["allow"], r["path_prefix"])
        for r in _rules(spark).collect()
    }
    assert got == {
        ("a.io", False, "/private/"),
        ("a.io", True, "/private/public-page"),
        ("a.io", False, "/tmp*"),
        ("a.io", False, "/exact-file$"),
        # for '*', b.io's specialbot group does NOT apply
        ("b.io", False, "/only-star-blocked/"),
    }


def test_named_agent_shadows_star(spark):
    got = {
        (r["host"], r["allow"], r["path_prefix"])
        for r in _rules(spark, user_agent="SpecialBot").collect()
    }
    # b.io: the named group wins outright; a.io has only '*' -> applies
    assert ("b.io", False, "/") in got
    assert ("b.io", False, "/only-star-blocked/") not in got
    assert ("a.io", False, "/private/") in got


@pytest.mark.parametrize(
    "url,allowed",
    [
        # longest match wins; allow beats the shorter disallow
        ("http://a.io/private/public-page", True),
        ("http://a.io/private/secret", False),
        # wildcard prefix
        ("http://a.io/tmp/x", False),
        ("http://a.io/tmpfile", False),
        # $ anchors the end: the exact file blocks, a longer path not
        ("http://a.io/exact-file", False),
        ("http://a.io/exact-file/more", True),
        # unmatched paths default-allow
        ("http://a.io/", True),
        ("http://a.io/open/page", True),
        # host with rules, path in the star-blocked tree
        ("http://b.io/only-star-blocked/x", False),
        ("http://b.io/fine", True),
        # host with NO robots at all -> allowed (RFC default)
        ("http://c.io/anything", True),
        # ports/case on the host side of the URL still key correctly
        ("HTTP://A.IO:80/private/secret", False),
    ],
)
def test_gate_worked_examples(spark, url, allowed):
    pages = spark.createDataFrame([(1, url)], "doc_id long, url string")
    out = filter_robots_disallowed(pages, _rules(spark)).count()
    assert out == (1 if allowed else 0), url


def test_non_url_rows_pass_through(spark):
    pages = spark.createDataFrame(
        [(1, "not a url"), (2, "http://a.io/private/x")],
        "doc_id long, url string",
    )
    got = [r["doc_id"] for r in
           filter_robots_disallowed(pages, _rules(spark)).collect()]
    assert got == [1]


def test_regex_metachars_in_rules_are_literal(spark):
    """A rule path containing regex metachars must match literally —
    the rule-to-regex derivation escapes everything except * and
    trailing $."""
    rules = parse_robots(
        spark.createDataFrame(
            [("m.io", "User-agent: *\nDisallow: /a(b)+c?.d/")],
            "host string, robots_txt string",
        )
    )
    pages = spark.createDataFrame(
        [(1, "http://m.io/a(b)+c?.d/page"), (2, "http://m.io/abbc.d/page")],
        "doc_id long, url string",
    )
    got = sorted(
        r["doc_id"]
        for r in filter_robots_disallowed(pages, rules).collect()
    )
    assert got == [2]  # literal match blocked; regex-ish lookalike not


def test_empty_disallow_means_allow_all(spark):
    """RFC 9309: the canonical allow-all robots file ('User-agent: *'
    + bare 'Disallow:') must keep EVERY page of that host — an empty
    value is an allow-all rule, not a zero-length deny-everything
    prefix (r11 ADVICE: the '^' regex from the empty prefix inverted
    this to deny-all)."""
    rules = parse_robots(
        spark.createDataFrame(
            [("e.io", "User-agent: *\nDisallow:")],
            "host string, robots_txt string",
        )
    )
    assert [(r["allow"], r["path_prefix"]) for r in rules.collect()] == [
        (True, "")
    ]
    pages = spark.createDataFrame(
        [(1, "http://e.io/"), (2, "http://e.io/deep/page?q=1")],
        "doc_id long, url string",
    )
    kept = sorted(
        r["doc_id"] for r in filter_robots_disallowed(pages, rules).collect()
    )
    assert kept == [1, 2]
    # ...and a real disallow beside the empty one still wins by length
    rules2 = parse_robots(
        spark.createDataFrame(
            [("e.io", "User-agent: *\nDisallow:\nDisallow: /deep/")],
            "host string, robots_txt string",
        )
    )
    kept2 = sorted(
        r["doc_id"]
        for r in filter_robots_disallowed(pages, rules2).collect()
    )
    assert kept2 == [1]


def test_null_url_rows_pass_through(spark):
    """The documented contract covers NULL urls too: a row whose url
    column is NULL keys to no host and must survive the gate (r11
    ADVICE: the old semi-join on the url string silently dropped it)."""
    pages = spark.createDataFrame(
        [(1, None), (2, "http://a.io/private/x"), (3, "http://a.io/ok")],
        "doc_id long, url string",
    )
    got = sorted(
        r["doc_id"]
        for r in filter_robots_disallowed(pages, _rules(spark)).collect()
    )
    assert got == [1, 3]


def test_pages_never_shuffle(spark):
    """The gate's scale contract, now true by construction: the pages
    relation flows through ONE broadcast hash join plus projections —
    every Exchange in the executed plan sits on the KB-sized rules side
    (under the BroadcastExchange), never on the pages side."""
    pages = spark.createDataFrame(
        [(1, "http://a.io/x")], "doc_id long, url string"
    )
    plan = (
        filter_robots_disallowed(pages, _rules(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # everything above the broadcast join must be exchange-free; the
    # rules-side agg (below the BroadcastExchange) is allowed to shuffle
    page_side = plan.split("BroadcastExchange")[0]
    assert "Exchange" not in page_side, page_side


def test_robots_sitemap_discovery(spark):
    """Sitemap: directives extract host-wide regardless of group
    position, key case-insensitive, comments stripped, whitespace
    trimmed; hosts without a directive yield no rows — and the
    discovered URLs chain straight into sitemap expansion."""
    from lakehouse_adventureworks2022_spark.operators.textops import (
        robots_sitemaps,
        sitemap_urls,
    )

    bodies = [
        ("a.io",
         "User-agent: *\nDisallow: /x\n"
         "Sitemap: http://a.io/sm.xml\n"
         "User-agent: bot\nsItEmAp:   http://a.io/sm2.xml.gz  \n"
         "# Sitemap: http://a.io/commented-out.xml\n"),
        ("b.io", "User-agent: *\nDisallow:\n"),
    ]
    df = spark.createDataFrame(bodies, "host string, robots_txt string")
    got = sorted(
        (r["host"], r["sitemap_url"])
        for r in robots_sitemaps(df).collect()
    )
    assert got == [
        ("a.io", "http://a.io/sm.xml"),
        ("a.io", "http://a.io/sm2.xml.gz"),
    ]
    # chain: discovered sitemap -> frontier extraction
    frontier = spark.createDataFrame(
        [("http://a.io/sm.xml",
          "<urlset><url><loc>http://a.io/p/1</loc></url></urlset>")],
        "site_id string, sitemap_xml string",
    )
    assert [
        r["url"] for r in sitemap_urls(frontier, id_col="site_id").collect()
    ] == ["http://a.io/p/1"]
    # zero-shuffle projection
    plan = (
        robots_sitemaps(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_crawl_chain_robots_before_dedup(spark):
    """WARC pages → robots gate → URL dedup: the compliance gate drops
    disallowed pages before any fetch-side work downstream."""
    from lakehouse_adventureworks2022_spark.operators.textops import (
        dedup_urls,
    )

    pages = spark.createDataFrame(
        [
            (1, "http://a.io/open", "x"),
            (2, "HTTP://A.IO:80/open#f", "x"),  # canonical dup of 1
            (3, "http://a.io/private/x", "x"),  # robots-blocked
        ],
        "doc_id long, url string, html string",
    )
    gated = filter_robots_disallowed(pages, _rules(spark))
    got = sorted(r["doc_id"] for r in dedup_urls(gated).collect())
    assert got == [1]


def test_web_corpus_robots_gate_integration(spark):
    """prepare_web_corpus(robots_rules=...) drops disallowed pages
    BEFORE URL dedup and extraction — a blocked page must not even be
    the dedup keeper for an allowed sibling spelling."""
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
    rows = [
        (1, "web", "en", "http://a.io/private/x", page),  # blocked
        (2, "web", "en", "http://a.io/open", other),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, source string, lang string, url string, html string",
    )
    out = prepare_web_corpus(df, url_col="url", robots_rules=_rules(spark))
    got = [r["doc_id"] for r in out.collect()]
    dedup.release_cached_inputs(out)
    assert got == [2]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="url_col"):
        prepare_web_corpus(df, robots_rules=_rules(spark))
