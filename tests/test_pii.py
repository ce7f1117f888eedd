"""PII detection/scrubbing (operators/pii.py): planted worked cases,
a Python-`re` differential over the fixture corpus (same pattern
strings, so this checks Spark's Java-regex semantics against an
independent engine), idempotence, and the catalog twin's hash parity
(the three-SF sweep in tools/check_oracles.py re-checks it)."""

from __future__ import annotations

import re

import duckdb
import pytest
from pyspark.sql import functions as F

from lakehouse_adventureworks2022_spark.operators.pii import (
    PII_PATTERNS,
    detect_pii,
    scrub_pii,
)
from lakehouse_adventureworks2022_spark.sources.readers import read_table

SF = "/root/testdata/sf0.001"

CASES = [
    # (raw, scrubbed, n_redactions)
    ("mail me at bob.smith+x@big-mail.example.org now",
     "mail me at <EMAIL> now", 1),
    ("server 192.168.0.1 and 10.0.0.255 are up",
     "server <IP> and <IP> are up", 2),
    ("call +1 555-867-5309 or (212) 555-0187",
     "call <PHONE> or <PHONE>", 2),
    ("ssn 123-45-6789 on file", "ssn <SSN> on file", 1),
    ("no pii here, just v1.2 release notes", "no pii here, just v1.2 release notes", 0),
    # mixed classes in one doc; ip must win over phone on dotted quads
    ("leak: a@b.io 8.8.8.8 555-123-4567",
     "leak: <EMAIL> <IP> <PHONE>", 3),
]


def test_scrub_worked_cases(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _, _) in enumerate(CASES)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["text"], r["n_redactions"])
        for r in scrub_pii(df).collect()
    }
    for i, (_, want, n) in enumerate(CASES):
        assert got[i] == (want, n), f"case {i}: {got[i]!r}"


def test_scrub_is_idempotent(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _, _) in enumerate(CASES)], "doc_id long, text string"
    )
    once = scrub_pii(df).drop("n_redactions")
    twice = scrub_pii(once)
    rows = twice.collect()
    assert all(r["n_redactions"] == 0 for r in rows)
    assert {r["doc_id"]: r["text"] for r in rows} == {
        r["doc_id"]: r["text"] for r in once.collect()
    }


def test_detect_counts_match_python_re(spark):
    """Independent-engine differential: Java regex (Spark) vs Python re
    on the planted catalog corpus — same pattern strings, same
    non-overlapping match counts for every class and document."""
    from lakehouse_adventureworks2022_spark.plans.text_queries import (
        q_pii_scrub,  # noqa: F401 - planted-corpus builder lives there
    )

    docs = read_table(spark, SF, "documents").select("doc_id", "text")
    planted = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" reach admin@site.example or 10.1.2.3 or +44 123-456-7890"),
        ),
    )
    spark_counts = {
        r["doc_id"]: {n: r[f"n_{n}"] for n in PII_PATTERNS}
        for r in detect_pii(planted).collect()
    }
    for row in planted.collect():
        want = {
            name: len(re.findall(pat, row["text"]))
            for name, (pat, _) in PII_PATTERNS.items()
        }
        assert spark_counts[row["doc_id"]] == want, row["doc_id"]


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_catalog_twin_hash_parity(spark, sf):
    from lakehouse_adventureworks2022_spark.plans.catalog import (
        ORACLES,
        PYTEST_ORACLES,
    )
    from lakehouse_adventureworks2022_spark.plans.text_queries import q_pii_scrub
    from tools.check_oracles import TABLES, canonical_hash, normalize_pandas

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    spark_pdf = normalize_pandas(q_pii_scrub(spark, sf).toPandas())
    duck_pdf = normalize_pandas(con.sql({**PYTEST_ORACLES, **ORACLES}["pii_scrub"]).df())
    con.close()
    assert canonical_hash(spark_pdf) == canonical_hash(duck_pdf)
    assert len(spark_pdf) > 0
    # the planted spans guarantee a non-vacuous differential
    assert spark_pdf["n_redactions"].sum() > 0
