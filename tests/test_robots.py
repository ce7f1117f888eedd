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


@pytest.mark.slow
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


def test_robots_crawl_delay_group_scoped(spark):
    """Crawl-delay extraction honors the same group machinery as the
    rule parser: the applicable group's value wins (named agent
    shadows *), a rule line between user-agent lines separates groups
    (no delay leaking across), non-numeric/negative values drop, and
    multiple applicable declarations keep the MAX (politest)."""
    from lakehouse_adventureworks2022_spark.operators.textops import (
        robots_crawl_delay,
    )

    bodies = [
        # star group only
        ("plain.io", "User-agent: *\nCrawl-delay: 2\nDisallow: /x\n"),
        # named group shadows * for 'mybot'
        ("named.io",
         "User-agent: *\nCrawl-delay: 10\n\n"
         "User-agent: mybot\nCrawl-delay: 1\nDisallow:\n"),
        # separated groups: b's delay must NOT leak to a's group
        ("split.io",
         "User-agent: a\nDisallow: /x\n"
         "User-agent: *\nCrawl-delay: 7\n"),
        # garbage + negative values yield no row
        ("junk.io", "User-agent: *\nCrawl-delay: soon\n"),
        ("neg.io", "User-agent: *\nCrawl-delay: -5\n"),
        # two applicable declarations: max (politest) wins
        ("twice.io",
         "User-agent: *\nCrawl-delay: 3\nCrawl-delay: 8\n"),
        # no delay at all
        ("none.io", "User-agent: *\nDisallow: /y\n"),
        # fractional seconds parse
        ("frac.io", "User-agent: *\nCrawl-delay: 0.5\n"),
    ]
    df = spark.createDataFrame(bodies, "host string, robots_txt string")
    star = {
        r["host"]: r["crawl_delay"]
        for r in robots_crawl_delay(df).collect()
    }
    assert star == {
        "plain.io": 2.0, "named.io": 10.0, "split.io": 7.0,
        "twice.io": 8.0, "frac.io": 0.5,
    }
    named = {
        r["host"]: r["crawl_delay"]
        for r in robots_crawl_delay(df, user_agent="mybot").collect()
    }
    assert named["named.io"] == 1.0  # named group shadowed *
    assert named["plain.io"] == 2.0  # falls back to the * group


def test_politeness_shards_schedule(spark):
    """politeness_shards: every url of a host lands in ONE shard, the
    per-host fetch sequence is deterministic and gapless, eta grows by
    the host's delay, unranked hosts take the default, and a hostile
    delay clips to max_delay."""
    from lakehouse_adventureworks2022_spark.operators.curation import (
        politeness_shards,
    )

    urls = [
        (f"http://{h}/p{i}",)
        for h in ("a.io", "b.io", "slow.io")
        for i in range(4)
    ]
    frontier = spark.createDataFrame(urls, "url string")
    delays = spark.createDataFrame(
        [("a.io", 2.0), ("slow.io", 86400.0)],
        "host string, crawl_delay double",
    )
    out = politeness_shards(
        frontier, delays=delays, num_shards=8,
        default_delay=1.0, max_delay=30.0,
    ).collect()
    by_host: dict = {}
    for r in out:
        by_host.setdefault(r["host"], []).append(r)
    # host co-location: one shard per host, shard in range
    for h, rows in by_host.items():
        assert len({r["shard"] for r in rows}) == 1
        assert 0 <= rows[0]["shard"] < 8
    # deterministic gapless sequence + eta = seq * delay
    a = sorted(by_host["a.io"], key=lambda r: r["fetch_seq"])
    assert [r["fetch_seq"] for r in a] == [0, 1, 2, 3]
    assert [r["eta_sec"] for r in a] == [0.0, 2.0, 4.0, 6.0]
    assert [r["url"] for r in a] == sorted(r["url"] for r in a)
    # default for an undeclared host; hostile delay clipped
    assert by_host["b.io"][0]["crawl_delay"] == 1.0
    assert by_host["slow.io"][0]["crawl_delay"] == 30.0
    # determinism across runs
    again = politeness_shards(
        frontier, delays=delays, num_shards=8,
        default_delay=1.0, max_delay=30.0,
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_politeness_shards_end_to_end_from_robots(spark):
    """frontier → robots_crawl_delay → politeness_shards chain: the
    declared delay drives the schedule of that host only."""
    from lakehouse_adventureworks2022_spark.operators.curation import (
        politeness_shards,
    )
    from lakehouse_adventureworks2022_spark.operators.textops import (
        robots_crawl_delay,
    )

    robots = spark.createDataFrame(
        [
            ("fast.io", "User-agent: *\nDisallow: /private/\n"),
            ("slow.io", "User-agent: *\nCrawl-delay: 5\n"),
        ],
        "host string, robots_txt string",
    )
    frontier = spark.createDataFrame(
        [(u,) for u in (
            "http://fast.io/1", "http://fast.io/2",
            "http://slow.io/1", "http://slow.io/2",
        )],
        "url string",
    )
    out = {
        (r["host"], r["fetch_seq"]): r["eta_sec"]
        for r in politeness_shards(
            frontier, delays=robots_crawl_delay(robots)
        ).collect()
    }
    assert out[("slow.io", 1)] == 5.0
    assert out[("fast.io", 1)] == 1.0  # default_delay
