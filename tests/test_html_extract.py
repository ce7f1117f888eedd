"""HTML→text extraction (textops.extract_html_text) — worked examples,
ordering hazards the step table documents, idempotence on plain text,
the DuckDB differential for the catalog twin, and the zero-shuffle plan
contract."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from lakehouse_adventureworks2022_spark.operators.textops import (
    extract_html_text,
)

SF = "/root/testdata/sf0.01"


def _extract_one(spark, html: str) -> str:
    df = spark.createDataFrame([(html,)], "html string")
    return extract_html_text(df).head()["text_plain"]


def test_worked_example(spark):
    html = (
        '<html><head><title>Page</title>'
        "<style>p { color: red; }</style>"
        '<script>if (1 < 2 && 3 > 2) { var s = "<p>not real</p>"; }</script>'
        "</head><body><h1>Header</h1>"
        "<!-- a comment with <b>markup</b> -->"
        "<p>First   para &amp; stuff</p>"
        "line<br>break"
        "<div>block &lt;kept&gt; &quot;q&quot; &#39;a&#39;&nbsp;end</div>"
        "</body></html>"
    )
    # note: an OPENING <div> becomes a space (only closing block tags
    # emit the newline), so "break<div>block" joins on one line
    assert _extract_one(spark, html) == (
        "Page\nHeader\nFirst para & stuff\nline\n"
        'break block <kept> "q" \'a\' end'
    )


def test_script_payload_with_tag_lookalikes_removed_first(spark):
    # the script body contains a '<' comparison AND a string holding a
    # real-looking tag — neither may leak into the output, and neither
    # may break the generic tag strip that runs AFTER script removal
    html = '<p>keep</p><script>var x = a < b; var t = "<div>no</div>";</script>'
    assert _extract_one(spark, html) == "keep"


def test_entities_decode_after_tag_strip(spark):
    # a decoded &lt;p&gt; must SURVIVE as literal text, never be
    # re-parsed as markup
    assert _extract_one(spark, "<p>&lt;p&gt;literal&lt;/p&gt;</p>") == (
        "<p>literal</p>"
    )
    # &amp; decodes LAST: "&amp;lt;" means the five chars "&lt;"
    assert _extract_one(spark, "<p>&amp;lt;</p>") == "&lt;"


def test_idempotent_on_plain_text(spark):
    plain = "already plain text, one line"
    assert _extract_one(spark, plain) == plain


def test_blank_and_whitespace_collapse(spark):
    html = "<p>  a  </p>\r\n\r\n<p>   </p><p>b</p>"
    assert _extract_one(spark, html) == "a\nb"


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
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
    spark_pdf = normalize_pandas(QUERIES["html_extract"](spark, sf).toPandas())
    duck_pdf = normalize_pandas(
        con.sql({**PYTEST_ORACLES, **ORACLES}["html_extract"]).df()
    )
    con.close()
    assert canonical_hash(spark_pdf) == canonical_hash(duck_pdf)
    assert len(spark_pdf) > 0


def test_zero_shuffle_plan(spark):
    from lakehouse_adventureworks2022_spark.plans.catalog import QUERIES

    plan = (
        QUERIES["html_extract"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


@pytest.mark.parametrize("col", ["doc_id", "text_plain"])
def test_output_schema(spark, col):
    from lakehouse_adventureworks2022_spark.plans.catalog import QUERIES

    assert col in QUERIES["html_extract"](spark, SF).columns


@pytest.fixture(scope="module")
def adversarial_sf(spark, tmp_path_factory):
    """Seeded adversarial documents fixture — hunts Java-regex vs RE2
    semantic divergences the ASCII fixture can't reach (\\s vs vertical
    tab, $ before a trailing newline, case-folding in (?i), entity
    fragments split across replacements, unclosed/nested tag soup)."""
    import random

    rng = random.Random(20260816)
    atoms = [
        "word", "UPPER", "x", " ", "  ", "\t", "\n", "\n\n", "\r\n",
        "\x0b", "\f", "&amp;", "&lt;", "&gt;", "&quot;", "&#39;",
        "&nbsp;", "&", "&amp", "amp;", "<p>", "</p>", "<P>", "</P >",
        "<br>", "<BR/>", "<br />", "<div>", "</div>", "<span a='b'>",
        "</span>", "<script>", "</script>", "<ScRiPt>bad()</sCrIpT>",
        "<style>s{}</style>", "<!--", "-->", "<!-- c -->", "<",
        ">", "< 3", "a<b", "<notag", "tag>", "'", '"', "$1", "\\n",
        "1 < 2 && 3 > 2", "one. two! three?", "Stop. the and of",
    ]
    rows = []
    for i in range(200):
        rows.append(
            (i, "adv", "".join(rng.choice(atoms) for _ in range(rng.randint(0, 12))))
        )
    sf = str(tmp_path_factory.mktemp("adv"))
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).coalesce(1).write.parquet(f"{sf}/documents.parquet")
    return sf


#: every twin that shares the tokenizer / whitespace contract runs over
#: the adversarial corpus in BOTH engines (r10 ADVICE: the zipf and
#: readability oracles split with \\s on one side only — this pins the
#: explicit-class contract for all of them, not just html_extract)
ADVERSARIAL_TWINS = [
    "html_extract",
    "corpus_zipf",
    "doc_readability",
    "text_stats",
    "dedup_exact",
    "corpus_vocabulary",
]


@pytest.mark.parametrize("query", ADVERSARIAL_TWINS)
def test_adversarial_corpus_twin_parity(spark, adversarial_sf, query):
    """The IDENTICAL catalog pipeline over the adversarial corpus in
    both engines must hash-match — any \\s (or other Java-vs-RE2
    construct) hiding in a shared regex diverges here."""
    from lakehouse_adventureworks2022_spark.plans.catalog import (
        ORACLES,
        PYTEST_ORACLES,
        QUERIES,
    )
    from tools.check_oracles import canonical_hash, normalize_pandas

    sf = adversarial_sf
    spark_pdf = normalize_pandas(QUERIES[query](spark, sf).toPandas())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    duck_pdf = normalize_pandas(
        con.sql({**PYTEST_ORACLES, **ORACLES}[query]).df()
    )
    con.close()
    assert len(spark_pdf) == len(duck_pdf)
    assert canonical_hash(spark_pdf) == canonical_hash(duck_pdf)


def test_no_oracle_sql_uses_bare_whitespace_escape():
    """Drift guard: no catalog oracle may contain a bare ``\\s`` — Java
    and RE2 disagree on \\x0b, so every shared regex must spell the
    whitespace class out (textops.WS_CLASS)."""
    from lakehouse_adventureworks2022_spark.plans.catalog import (
        ORACLES,
        PYTEST_ORACLES,
    )

    offenders = {
        name
        for name, sql in {**PYTEST_ORACLES, **ORACLES}.items()
        if "\\s" in sql
    }
    assert not offenders, (
        f"oracle SQL uses bare \\s (Java-vs-RE2 \\x0b divergence): "
        f"{sorted(offenders)} — use textops.WS_CLASS"
    )


def test_extract_preserves_other_columns(spark):
    df = spark.createDataFrame(
        [(1, "<p>x</p>", "meta")], "id long, html string, extra string"
    )
    out = extract_html_text(df)
    assert out.columns == ["id", "html", "extra", "text_plain"]
    assert out.head()["text_plain"] == "x"
