"""Fixture contract: the engine-facing schema of every driver fixture
table AFTER ``read_table`` normalization.

The driver regenerates /root/testdata between rounds and the physical
encoding has drifted before (events.ts: ns-epoch int64 → plain
timestamp[us], which Spark 4 reads as TIMESTAMP_NTZ — that drift broke
10 tests across 3 modules in round 4). This one test pins what the rest
of the engine is allowed to assume, so the NEXT drift fails here with a
readable message instead of scattering AnalysisExceptions (or worse,
silently mis-scaled timestamps) downstream.

If this test fails after a fixture regeneration: fix the normalization
in ``sources/readers.read_table`` (and its streaming twin
``streaming/events.stream_events_source``) — do NOT loosen the contract
per-query.
"""

from __future__ import annotations

import pytest

from lakehouse_adventureworks2022_spark.sources.readers import TABLES, read_table

#: Engine-facing dtypes (post-normalization). events.ts MUST be
#: "timestamp" (TIMESTAMP_LTZ, session TZ pinned UTC) whatever the
#: parquet stores — downstream plans cast it to long for bucketing.
EXPECTED_DTYPES: dict[str, dict[str, str]] = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        # date-like: queries only ever derive dates/intervals from it, so
        # either NTZ or LTZ timestamp satisfies the engine
        "o_orderdate": {"timestamp_ntz", "timestamp", "date"},
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": {"timestamp_ntz", "timestamp", "date"},
    },
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",  # strict: plans rely on ts.cast("long")
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        # similarity ops promote to double internally; either width reads
        "embedding": {"array<float>", "array<double>"},
        "label": "int",
    },
}


@pytest.mark.parametrize("name", TABLES)
def test_fixture_table_contract(spark, sf_dir, name):
    actual = dict(read_table(spark, sf_dir, name).dtypes)
    expected = EXPECTED_DTYPES[name]
    assert set(actual) == set(expected), (
        f"{name}: fixture columns drifted — have {sorted(actual)}, "
        f"engine expects {sorted(expected)}; update sources/readers.py "
        "normalization and this contract together"
    )
    for col, want in expected.items():
        allowed = want if isinstance(want, set) else {want}
        assert actual[col] in allowed, (
            f"{name}.{col}: engine-facing dtype {actual[col]!r} not in "
            f"{sorted(allowed)} — fixture encoding drifted; normalize in "
            "sources/readers.read_table (see round-4 events.ts incident)"
        )


def test_events_ts_values_sane(spark, sf_dir):
    """A mis-scaled ts conversion (round 4's silent streaming failure:
    real µs divided by 1000) lands decades before 2000 — catch it on
    values, not just types."""
    import datetime

    row = (
        read_table(spark, sf_dir, "events")
        .selectExpr("min(ts) AS lo", "max(ts) AS hi")
        .first()
    )
    assert row.lo > datetime.datetime(2000, 1, 1), row
    assert row.hi < datetime.datetime(2100, 1, 1), row


def test_read_table_normalizes_legacy_ns_epoch_bigint(spark, tmp_path):
    """The pre-round-4 fixture encoding (ts = ns-since-epoch int64) must
    keep working even though current fixtures are timestamp[us] — the
    driver has regenerated encodings in both directions."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    base_us = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z in µs
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, 2], pa.int64()),
                "ts": pa.array(
                    [base_us * 1000 + 1500, base_us * 1000],  # ns (+1.5µs)
                    pa.int64(),
                ),
                "user_id": pa.array([7, 8], pa.int64()),
                "event_type": pa.array(["click", "view"]),
                "value": pa.array([1.0, 2.0]),
                "props": pa.array(["{}", "{}"]),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    df = read_table(spark, str(tmp_path), "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = {r["event_id"]: r["ts"] for r in df.collect()}
    want = datetime.datetime(2023, 11, 14, 22, 13, 20)
    assert got[2] == want
    assert got[1] == want + datetime.timedelta(microseconds=1)  # truncated
