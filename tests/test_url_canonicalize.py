"""URL canonicalization (textops.canonicalize_url_col / url_census /
dedup_urls) — worked examples pinning every contract step, a seeded
adversarial both-engines fuzz through the GENERATED DuckDB twin
(build_url_canon_sql), the swept catalog oracle at two SFs, and the
prepare_web_corpus front-door integration."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from lakehouse_adventureworks2022_spark.operators.textops import (
    canonicalize_urls,
    dedup_urls,
    url_census,
)


def _canon_one(spark, url: str) -> str | None:
    df = spark.createDataFrame([(1, url)], "doc_id long, url string")
    return canonicalize_urls(df).head()["url_canonical"]


@pytest.mark.parametrize(
    "raw,want",
    [
        # scheme+host lowercase; path case preserved
        ("HTTP://WWW.Example.ORG/Path/A", "http://www.example.org/Path/A"),
        # default ports stripped per scheme
        ("http://h.io:80/x", "http://h.io/x"),
        ("https://h.io:443/x", "https://h.io/x"),
        # non-default / wrong-scheme ports kept
        ("http://h.io:8080/x", "http://h.io:8080/x"),
        ("https://h.io:80/x", "https://h.io:80/x"),
        ("ftp://Files.example.com:21/pub", "ftp://files.example.com:21/pub"),
        # fragment dropped
        ("http://h.io/x#section-2", "http://h.io/x"),
        # empty path -> /
        ("https://host.com", "https://host.com/"),
        ("https://host.com#f", "https://host.com/"),
        # tracking params stripped, survivors sorted, empty parts dropped
        (
            "http://h.io/p?b=2&utm_source=x&a=1&gclid=123",
            "http://h.io/p?a=1&b=2",
        ),
        ("http://h.io/p?z=1&&y=2", "http://h.io/p?y=2&z=1"),
        # all params tracking -> no query at all
        ("http://h.io/p?utm_campaign=c&fbclid=f", "http://h.io/p"),
        # empty-VALUED params are kept (a=  vs absent differ)
        ("http://h.io/p?x=&a=1", "http://h.io/p?a=1&x="),
        # surrounding whitespace stripped (incl. the explicit-class set)
        ("  http://h.io/x \t\n", "http://h.io/x"),
        # query case preserved (RFC 3986: only scheme/host case-fold)
        ("http://h.io/p?A=1", "http://h.io/p?A=1"),
    ],
)
def test_worked_examples(spark, raw, want):
    assert _canon_one(spark, raw) == want


def test_non_urls_yield_null(spark):
    assert _canon_one(spark, "not a url") is None
    assert _canon_one(spark, "") is None
    assert _canon_one(spark, "www.example.org/no-scheme") is None


def test_census_counts(spark):
    rows = [
        (1, "http://A.io/x?b=2&a=1"),
        (2, "HTTP://a.io:80/x?a=1&b=2#frag"),
        (3, "http://a.io/x?a=1&utm_source=s&b=2"),
        (4, "http://other.io/"),
        (5, "not a url"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r["url_canonical"]: r for r in url_census(df).collect()}
    assert set(got) == {"http://a.io/x?a=1&b=2", "http://other.io/"}
    grp = got["http://a.io/x?a=1&b=2"]
    assert grp["keeper_doc_id"] == 1
    assert grp["n_docs"] == 3 and grp["n_variants"] == 3


def test_dedup_urls_keeps_min_and_passes_non_urls(spark):
    rows = [
        (1, "http://a.io/x", "p1"),
        (2, "HTTP://A.IO:80/x#f", "p2"),  # dup of 1 -> dropped
        (3, "http://b.io/", "p3"),
        (4, "no url here", "p4"),  # non-URL passes through
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, html string")
    got = sorted(r["doc_id"] for r in dedup_urls(df).collect())
    assert got == [1, 3, 4]


def test_canonicalize_zero_shuffle_plan(spark):
    df = spark.createDataFrame([(1, "http://a.io/x")], "doc_id long, url string")
    plan = (
        canonicalize_urls(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_adversarial_url_fuzz_twin_parity(spark, tmp_path):
    """Seeded messy-URL corpus through the Spark operator AND the
    GENERATED DuckDB twin (build_url_canon_sql) — hunts Java-vs-RE2
    divergences (explicit whitespace class, anchored replaces, param
    regex) beyond the planted catalog shapes."""
    import random

    from lakehouse_adventureworks2022_spark.plans.text_queries import (
        build_url_canon_sql,
    )
    from tools.check_oracles import canonical_hash, normalize_pandas

    rng = random.Random(20260816)
    schemes = ["http://", "HTTP://", "https://", "HTTPS://", "ftp://", ""]
    hosts = ["Example.org", "a.b.c.IO", "h", "h.io:80", "h.io:443",
             "h.io:8080", "H.IO:008"]
    paths = ["", "/", "/P/x", "/a/b/", "/UPPER", "/p%20q", "/x?y"]
    queries = ["", "?a=1", "?b=2&a=1", "?utm_source=x&a=1", "?gclid=1",
               "?a=1&&b=2", "?x=", "?A=1&a=2", "?ref=r&z=9&utm_x=1",
               "??a=1", "?a=b=c"]
    frags = ["", "#f", "#a#b", "#"]
    pads = ["", " ", "\t", "\x0b", "\n"]
    rows = []
    for i in range(400):
        u = (
            rng.choice(pads) + rng.choice(schemes) + rng.choice(hosts)
            + rng.choice(paths) + rng.choice(queries) + rng.choice(frags)
            + rng.choice(pads)
        )
        rows.append((i, u))
    sf = str(tmp_path)
    spark.createDataFrame(rows, "doc_id long, url string").coalesce(
        1
    ).write.parquet(f"{sf}/urls.parquet")

    spark_pdf = normalize_pandas(
        canonicalize_urls(
            spark.read.parquet(f"{sf}/urls.parquet")
        ).toPandas()
    )
    con = duckdb.connect()
    duck_pdf = normalize_pandas(
        con.sql(
            build_url_canon_sql(
                f"SELECT doc_id, url FROM "
                f"read_parquet('{sf}/urls.parquet/*.parquet')"
            )
        ).df()
    )
    con.close()
    assert len(spark_pdf) == 400
    assert canonical_hash(spark_pdf) == canonical_hash(duck_pdf)


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
        QUERIES["url_canonicalize"](spark, sf).toPandas()
    )
    duck_pdf = normalize_pandas(
        con.sql({**PYTEST_ORACLES, **ORACLES}["url_canonicalize"]).df()
    )
    con.close()
    assert canonical_hash(spark_pdf) == canonical_hash(duck_pdf)
    assert len(spark_pdf) > 0


def test_web_corpus_url_front_door(spark):
    """prepare_web_corpus(url_col=...) drops same-resource spellings
    BEFORE extraction; non-URL rows survive into the content chain."""
    from lakehouse_adventureworks2022_spark.operators import dedup
    from lakehouse_adventureworks2022_spark.operators.curation import (
        prepare_web_corpus,
    )

    pages = {
        1: "<p>tiny healthy document with enough plain words to pass"
           " the quality gate today</p>",
        2: "<p>tiny healthy document with enough plain words to pass"
           " the quality gate today</p>",
        3: "<p>another entirely different page describing oranges,"
           " bicycles and seven rainy tuesdays in quiet detail</p>",
        4: "<p>a third unrelated article about mountain weather"
           " patterns, granite slopes and morning fog banks</p>",
    }
    rows = [
        (1, "web", "en", "http://site.io/a?b=2&a=1", pages[1]),
        # same resource, different spelling — must NOT reach extraction
        (2, "web", "en", "HTTP://SITE.IO:80/a?a=1&b=2&utm_source=x#f",
         pages[2]),
        (3, "web", "en", "http://site.io/b", pages[3]),
        (4, "web", "en", "not-a-url", pages[4]),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, source string, lang string, url string, html string",
    )
    out = prepare_web_corpus(df, url_col="url")
    got = sorted(r["doc_id"] for r in out.collect())
    dedup.release_cached_inputs(out)
    assert got == [1, 3, 4]


def test_split_by_host_groups_sites(spark):
    """Leakage-safe web split: every page of a host shares ONE split;
    assignment is deterministic and re-rolls with the seed; non-URLs
    group together on the NULL host."""
    from lakehouse_adventureworks2022_spark.operators.curation import (
        split_by_host,
    )

    rows = [
        (i, f"http://host{i % 37}.io/page/{i}") for i in range(600)
    ] + [(900, "not a url"), (901, "also not a url")]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = split_by_host(df, weights={"train": 0.8, "val": 0.1, "test": 0.1})
    got = out.collect()
    assert "__host__" not in out.columns

    by_host = {}
    for r in got:
        host = r["url"].split("/")[2] if r["url"].startswith("http") else None
        by_host.setdefault(host, set()).add(r["split"])
    # grouped split: one split per host, including the NULL-host group
    assert all(len(s) == 1 for s in by_host.values())
    # with 38 host groups all three splits should be populated
    assert {s for ss in by_host.values() for s in ss} == {
        "train", "val", "test"
    }
    # majority goes to train
    n_train = sum(1 for r in got if r["split"] == "train")
    assert n_train > len(got) / 2

    again = {(r["doc_id"], r["split"]) for r in split_by_host(
        df, weights={"train": 0.8, "val": 0.1, "test": 0.1}
    ).collect()}
    assert again == {(r["doc_id"], r["split"]) for r in got}
    rerolled = {(r["doc_id"], r["split"]) for r in split_by_host(
        df, weights={"train": 0.8, "val": 0.1, "test": 0.1}, seed="v2"
    ).collect()}
    assert rerolled != again


def test_split_by_host_ignores_url_noise(spark):
    """Scheme/port/path/query noise must not move a page across splits
    — only the canonical host decides."""
    from lakehouse_adventureworks2022_spark.operators.curation import (
        split_by_host,
    )

    rows = [
        (1, "http://Site.io/a"),
        (2, "HTTP://SITE.IO:80/b?x=1"),
        (3, "https://site.io/c#frag"),
        (4, "http://site.io:8080/d"),  # non-default port: DIFFERENT host
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r["doc_id"]: r["split"] for r in split_by_host(df).collect()}
    assert got[1] == got[2] == got[3]
