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
