"""Sitemap ingestion (textops.sitemap_urls): worked examples
(urlset/sitemapindex, whitespace-insignificance, entity decode order),
frontier chaining into URL canonicalization/dedup, zero-shuffle plan,
and the catalog twin at two SFs."""

from __future__ import annotations

import duckdb
import pytest

from lakehouse_adventureworks2022_spark.operators.textops import (
    sitemap_urls,
)

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
 <url><loc>
   http://site.io/a?x=1&amp;y=2
 </loc><lastmod>2024-01-01</lastmod></url>
 <url><loc>http://site.io/b&apos;s</loc></url>
</urlset>"""

INDEX = """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
 <sitemap><loc>http://site.io/sitemap-1.xml.gz</loc></sitemap>
 <sitemap><loc>http://site.io/sitemap-2.xml.gz</loc></sitemap>
</sitemapindex>"""


def _extract(spark, xml):
    df = spark.createDataFrame([(1, xml)], "site_id long, sitemap_xml string")
    return sorted(
        (r["url"], r["is_index"]) for r in sitemap_urls(df).collect()
    )


def test_urlset_extraction_and_entity_decode(spark):
    got = _extract(spark, URLSET)
    # insignificant whitespace trimmed; &amp; and &apos; decoded
    assert got == [
        ("http://site.io/a?x=1&y=2", False),
        ("http://site.io/b's", False),
    ]


def test_sitemapindex_flags_children_as_indexes(spark):
    got = _extract(spark, INDEX)
    assert got == [
        ("http://site.io/sitemap-1.xml.gz", True),
        ("http://site.io/sitemap-2.xml.gz", True),
    ]


def test_amp_decodes_last(spark):
    # "&amp;lt;" means the four chars "&lt;" — never re-decoded to "<"
    xml = "<urlset><url><loc>http://s.io/?q=&amp;lt;</loc></url></urlset>"
    assert _extract(spark, xml) == [("http://s.io/?q=&lt;", False)]


def test_empty_and_locless_documents(spark):
    assert _extract(spark, "<urlset></urlset>") == []
    assert _extract(spark, "not xml at all") == []


def test_frontier_chain_sitemap_to_url_dedup(spark):
    """Sitemap locs feed the URL tier: canonical dups collapse before
    any fetch."""
    from pyspark.sql import functions as F

    from lakehouse_adventureworks2022_spark.operators.textops import (
        dedup_urls,
    )

    xml = (
        "<urlset>"
        "<url><loc>http://Site.io/a?b=2&amp;a=1</loc></url>"
        "<url><loc>HTTP://SITE.IO:80/a?a=1&amp;b=2#f</loc></url>"
        "<url><loc>http://site.io/b</loc></url>"
        "</urlset>"
    )
    df = spark.createDataFrame([(1, xml)], "site_id long, sitemap_xml string")
    frontier = sitemap_urls(df).select(
        F.monotonically_increasing_id().alias("doc_id"), "url"
    )
    assert dedup_urls(frontier).count() == 2


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame(
        [(1, URLSET)], "site_id long, sitemap_xml string"
    )
    plan = sitemap_urls(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def _entries(spark, xml):
    from lakehouse_adventureworks2022_spark.operators.textops import (
        sitemap_entries,
    )

    df = spark.createDataFrame([(1, xml)], "site_id long, sitemap_xml string")
    return sorted(
        (r["url"], r["lastmod"], r["is_index"])
        for r in sitemap_entries(df).collect()
    )


def test_entries_pair_lastmod_per_entry(spark):
    """<lastmod> pairs with its OWN entry's <loc> — the entry WITH one
    gets it (whitespace-trimmed), the entry WITHOUT gets NULL; a global
    extract would misalign exactly this mixed case (the URLSET fixture:
    first entry has lastmod, second doesn't)."""
    got = _entries(spark, URLSET)
    assert got == [
        ("http://site.io/a?x=1&y=2", "2024-01-01", False),
        ("http://site.io/b's", None, False),
    ]
    # sitemapindex children pair too (re-crawl scheduling for child
    # sitemaps is the protocol's stated use of lastmod here)
    xml = (
        "<sitemapindex>"
        "<sitemap><loc>http://s.io/m1.xml</loc>"
        "<lastmod> 2024-06-30T12:00:00Z </lastmod></sitemap>"
        "<sitemap><loc>http://s.io/m2.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    assert _entries(spark, xml) == [
        ("http://s.io/m1.xml", "2024-06-30T12:00:00Z", True),
        ("http://s.io/m2.xml", None, True),
    ]
    # entries without a <loc> are protocol-invalid and dropped
    assert _entries(
        spark, "<urlset><url><lastmod>2024-01-01</lastmod></url></urlset>"
    ) == []


def test_entries_watermark_filter_incremental_recrawl(spark):
    """The incremental re-crawl integration (the crawl-tier S2 analog):
    keep only entries whose lastmod exceeds the last ingest watermark.
    Entries with NULL lastmod stay conservative-fetch (no evidence they
    are unchanged)."""
    from pyspark.sql import functions as F

    from lakehouse_adventureworks2022_spark.operators.textops import (
        sitemap_entries,
    )

    xml = (
        "<urlset>"
        "<url><loc>http://s.io/old</loc>"
        "<lastmod>2024-01-05</lastmod></url>"
        "<url><loc>http://s.io/new</loc>"
        "<lastmod>2024-03-20</lastmod></url>"
        "<url><loc>http://s.io/unknown</loc></url>"
        "</urlset>"
    )
    df = spark.createDataFrame([(1, xml)], "site_id long, sitemap_xml string")
    entries = sitemap_entries(df)
    watermark = "2024-02-01"
    to_fetch = entries.filter(
        F.col("lastmod").isNull()
        | (F.to_date("lastmod") > F.lit(watermark).cast("date"))
    )
    assert sorted(r["url"] for r in to_fetch.collect()) == [
        "http://s.io/new", "http://s.io/unknown",
    ]


def test_build_crawl_frontier_composite(spark):
    """The discovery one-call: watermark filter, same-url collapse
    (newest lastmod wins), canonical dedup (smallest spelling
    survives), robots gate, child-sitemap rows flagged — each tier
    claims exactly its victim."""
    from lakehouse_adventureworks2022_spark.operators.curation import (
        build_crawl_frontier,
    )

    sitemaps = spark.createDataFrame(
        [
            ("http://a.io/sm1.xml",
             "<urlset>"
             "<url><loc>http://a.io/fresh</loc>"
             "<lastmod>2024-05-01</lastmod></url>"
             "<url><loc>http://a.io/fresh#frag</loc></url>"  # canon dup
             "<url><loc>http://a.io/blocked/x</loc></url>"  # robots
             "<url><loc>http://a.io/stale</loc>"
             "<lastmod>2023-02-02</lastmod></url>"  # watermark
             "<url><loc>http://a.io/twice</loc>"
             "<lastmod>2023-06-01</lastmod></url>"  # old listing...
             "</urlset>"),
            ("http://a.io/sm2.xml",
             "<urlset>"
             "<url><loc>http://a.io/twice</loc>"
             "<lastmod>2024-04-04</lastmod></url>"  # ...newer listing
             "</urlset>"),
            ("http://a.io/index.xml",
             "<sitemapindex><sitemap>"
             "<loc>http://a.io/child.xml</loc>"
             "</sitemap></sitemapindex>"),
        ],
        "sitemap_url string, sitemap_xml string",
    )
    robots = spark.createDataFrame(
        [("a.io", "User-agent: *\nDisallow: /blocked/\n")],
        "host string, robots_txt string",
    )
    got = {
        r["url"]: (r["lastmod"], r["is_index"])
        for r in build_crawl_frontier(
            robots, sitemaps, watermark="2024-01-01"
        ).collect()
    }
    assert got == {
        "http://a.io/fresh": ("2024-05-01", False),
        # same-url collapse keeps the NEWEST lastmod, which passes
        "http://a.io/twice": ("2024-04-04", False),
        # child sitemap flagged for the recursion loop, gated like any
        "http://a.io/child.xml": (None, True),
    }


def test_frontier_watermark_timestamp_granular_and_unparseable_kept(spark):
    """r12 verdict #3 + ADVICE: the watermark compares at TIMESTAMP
    granularity — an entry modified later the SAME DAY as a
    time-carrying watermark is fetched (a twice-daily re-crawl must not
    under-fetch) — and an entry whose lastmod fails to parse is KEPT
    (conservative fetch), not silently dropped by a NULL comparison."""
    from lakehouse_adventureworks2022_spark.operators.curation import (
        build_crawl_frontier,
    )

    sitemaps = spark.createDataFrame(
        [
            ("http://a.io/sm.xml",
             "<urlset>"
             # same day, AFTER the 12:00 watermark -> fetch
             "<url><loc>http://a.io/afternoon</loc>"
             "<lastmod>2024-06-15T14:30:00Z</lastmod></url>"
             # same day, BEFORE the watermark (offset form normalizes
             # to 07:30 UTC) -> skip
             "<url><loc>http://a.io/morning</loc>"
             "<lastmod>2024-06-15T09:30:00+02:00</lastmod></url>"
             # nonstandard lastmod: unparseable -> conservative fetch
             "<url><loc>http://a.io/odd</loc>"
             "<lastmod>June 15, 2024</lastmod></url>"
             # no lastmod at all -> conservative fetch
             "<url><loc>http://a.io/bare</loc></url>"
             # bare date = midnight, before the watermark -> skip
             "<url><loc>http://a.io/dateonly</loc>"
             "<lastmod>2024-06-15</lastmod></url>"
             "</urlset>"),
        ],
        "sitemap_url string, sitemap_xml string",
    )
    robots = spark.createDataFrame(
        [("a.io", "User-agent: *\n")], "host string, robots_txt string"
    )
    got = sorted(
        r["url"]
        for r in build_crawl_frontier(
            robots, sitemaps, watermark="2024-06-15 12:00:00"
        ).collect()
    )
    assert got == [
        "http://a.io/afternoon", "http://a.io/bare", "http://a.io/odd",
    ]
    # date-only watermark keeps the pre-r13 date semantics (midnight):
    # every entry dated after it passes, same-date date-only does not
    got2 = sorted(
        r["url"]
        for r in build_crawl_frontier(
            robots, sitemaps, watermark="2024-06-15"
        ).collect()
    )
    assert got2 == [
        "http://a.io/afternoon", "http://a.io/bare",
        "http://a.io/morning", "http://a.io/odd",
    ]


def test_entries_zero_shuffle_plan(spark):
    from lakehouse_adventureworks2022_spark.operators.textops import (
        sitemap_entries,
    )

    df = spark.createDataFrame(
        [(1, URLSET)], "site_id long, sitemap_xml string"
    )
    plan = (
        sitemap_entries(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


@pytest.mark.parametrize(
    "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_catalog_twin_hash_parity(spark, sf):
    from lakehouse_adventureworks2022_spark.plans.catalog import (
        ORACLES,
        PYTEST_ORACLES,
        QUERIES,
    )
    from tools.check_oracles import TABLES, canonical_hash, normalize_pandas

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    spark_pdf = normalize_pandas(
        QUERIES["sitemap_extract"](spark, sf).toPandas()
    )
    duck_pdf = normalize_pandas(
        con.sql({**PYTEST_ORACLES, **ORACLES}["sitemap_extract"]).df()
    )
    con.close()
    assert canonical_hash(spark_pdf) == canonical_hash(duck_pdf)
    assert len(spark_pdf) > 0


def _tree_provider(spark, lookup_rows):
    """bodies_provider for tests: joins pending child-sitemap urls
    against a planted (sitemap_url, sitemap_xml) lookup table — the
    no-network contract (production swaps in its fetch tier)."""
    lookup = spark.createDataFrame(
        lookup_rows, "sitemap_url string, sitemap_xml string"
    )

    def provider(pending):
        return pending.join(
            lookup, pending["url"] == lookup["sitemap_url"]
        ).select("sitemap_url", "sitemap_xml")

    return provider


def test_expand_frontier_multilevel_tree(spark):
    """r12 verdict ask #4: a multi-level sitemap tree expands fully —
    root index → child sitemaps → grandchild — with the full gate
    (robots, watermark, dedup) applied at EVERY level, a planted CYCLE
    (child2 lists the root again) converging instead of looping, and a
    page listed at two levels surviving exactly once."""
    from lakehouse_adventureworks2022_spark.operators.curation import (
        expand_frontier,
    )

    root = (
        "<sitemapindex>"
        "<sitemap><loc>http://a.io/child1.xml</loc></sitemap>"
        "<sitemap><loc>http://a.io/child2.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    child1 = (
        "<urlset>"
        "<url><loc>http://a.io/p1</loc></url>"
        "<url><loc>http://a.io/p2</loc></url>"
        "<url><loc>http://a.io/blocked/x</loc></url>"
        # pre-watermark entry: the gate applies at every level
        "<url><loc>http://a.io/old</loc>"
        "<lastmod>2020-01-01</lastmod></url>"
        "</urlset>"
    )
    child2 = (
        "<sitemapindex>"
        "<sitemap><loc>http://a.io/grandchild.xml</loc></sitemap>"
        # CYCLE: lists the root sitemap again
        "<sitemap><loc>http://a.io/root.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    grandchild = (
        "<urlset>"
        "<url><loc>http://a.io/p3</loc></url>"
        # cross-level duplicate of child1's p1 (fragment spelling)
        "<url><loc>http://a.io/p1#dup</loc></url>"
        "</urlset>"
    )
    sitemaps = spark.createDataFrame(
        [("http://a.io/root.xml", root)],
        "sitemap_url string, sitemap_xml string",
    )
    robots = spark.createDataFrame(
        [("a.io", "User-agent: *\nDisallow: /blocked/\n")],
        "host string, robots_txt string",
    )
    provider = _tree_provider(
        spark,
        [
            ("http://a.io/child1.xml", child1),
            ("http://a.io/child2.xml", child2),
            ("http://a.io/grandchild.xml", grandchild),
            ("http://a.io/root.xml", root),
        ],
    )
    out = expand_frontier(
        robots, sitemaps, provider, watermark="2024-01-01"
    ).collect()
    assert sorted(r["url"] for r in out) == [
        "http://a.io/p1", "http://a.io/p2", "http://a.io/p3",
    ]
    assert all(r["is_index"] is False for r in out)
    # the cross-level dup kept ONE row via the deterministic fold
    p1 = [r for r in out if r["url"] == "http://a.io/p1"]
    assert len(p1) == 1


def test_expand_frontier_depth_bound_loud(spark):
    """The depth bound raises instead of silently under-crawling."""
    import pytest as _pytest

    from lakehouse_adventureworks2022_spark.operators.curation import (
        expand_frontier,
    )

    root = (
        "<sitemapindex>"
        "<sitemap><loc>http://a.io/child1.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    sitemaps = spark.createDataFrame(
        [("http://a.io/root.xml", root)],
        "sitemap_url string, sitemap_xml string",
    )
    robots = spark.createDataFrame(
        [("a.io", "User-agent: *\n")], "host string, robots_txt string"
    )
    provider = _tree_provider(
        spark, [("http://a.io/child1.xml", root.replace("child1", "child2"))]
    )
    with _pytest.raises(RuntimeError, match="max_depth=0"):
        expand_frontier(robots, sitemaps, provider, max_depth=0)


def test_expand_frontier_missing_body_is_not_a_crash(spark):
    """A child the provider cannot return a body for (fetch failure)
    contributes nothing — the expansion completes on what it has."""
    from lakehouse_adventureworks2022_spark.operators.curation import (
        expand_frontier,
    )

    root = (
        "<sitemapindex>"
        "<sitemap><loc>http://a.io/child1.xml</loc></sitemap>"
        "<sitemap><loc>http://a.io/gone.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    child1 = "<urlset><url><loc>http://a.io/p1</loc></url></urlset>"
    sitemaps = spark.createDataFrame(
        [("http://a.io/root.xml", root)],
        "sitemap_url string, sitemap_xml string",
    )
    robots = spark.createDataFrame(
        [("a.io", "User-agent: *\n")], "host string, robots_txt string"
    )
    provider = _tree_provider(spark, [("http://a.io/child1.xml", child1)])
    out = expand_frontier(robots, sitemaps, provider)
    assert [r["url"] for r in out.collect()] == ["http://a.io/p1"]


def test_frontier_minus_index_capture_rules(spark):
    """frontier_minus_index: uncaptured fetches, modified-since-capture
    fetches, unchanged-since-capture skips, unknown-age skips by
    default (and fetches under refetch_unknown), canonical spellings
    match the index key, unparseable capture timestamps still prove
    existence, and non-URL rows pass through."""
    from lakehouse_adventureworks2022_spark.operators.curation import (
        frontier_minus_index,
    )
    from lakehouse_adventureworks2022_spark.operators.textops import (
        surt_key_col,
    )
    from pyspark.sql import functions as F

    frontier = spark.createDataFrame(
        [
            ("http://a.io/new", "2024-06-15"),          # uncaptured
            ("http://a.io/changed", "2024-06-15"),      # cap 2024-01-01
            ("http://a.io/stale", "2024-06-15"),        # cap 2024-06-15T12
            ("http://a.io/nolastmod", None),            # captured, unknown
            # noisy spelling of a captured resource: the canonical/SURT
            # key must still match the index (→ stale → skip)
            ("HTTP://A.IO:80/canon?utm_source=x#f", "2020-01-01"),
            ("not a url", None),                        # passes through
            # captured but the capture timestamp is garbage → exists,
            # age unknown → default skip
            ("http://a.io/badts", "2024-06-15"),
        ],
        "url string, lastmod string",
    )
    cap_urls = [
        ("http://a.io/changed", "20240101000000"),
        ("http://a.io/stale", "20240615120000"),
        ("http://a.io/nolastmod", "20240101000000"),
        ("http://a.io/canon", "20240616000000"),
        ("http://a.io/badts", "not-a-ts"),
    ]
    cdx = spark.createDataFrame(
        cap_urls, "u string, timestamp string"
    ).select(surt_key_col(F.col("u")).alias("urlkey"), "timestamp")

    kept = sorted(
        r["url"] for r in frontier_minus_index(frontier, cdx).collect()
    )
    assert kept == ["http://a.io/changed", "http://a.io/new", "not a url"]
    # freshness-critical mode refetches the unknown-age captures too
    kept2 = sorted(
        r["url"]
        for r in frontier_minus_index(
            frontier, cdx, refetch_unknown=True
        ).collect()
    )
    assert "http://a.io/nolastmod" in kept2 and "http://a.io/badts" in kept2
    assert "http://a.io/stale" not in kept2  # provably unchanged stays out
