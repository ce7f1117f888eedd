"""Corpus drift monitoring: DuckDB differential on the per-source
profile and planted-drift scenarios (pytest-only: the driver's oracle
window is full)."""

from __future__ import annotations

import duckdb
import pytest

from lakehouse_adventureworks2022_spark.operators import monitoring
from lakehouse_adventureworks2022_spark.sources.readers import read_table

SF = "/root/testdata/sf0.001"


def test_corpus_profile_matches_duckdb(spark):
    docs = read_table(spark, SF, "documents")
    got = {r["source"]: r for r in monitoring.corpus_profile(docs).collect()}

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = con.sql(
        """
        WITH t AS (
          SELECT source,
                 CAST(len(regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\r\\f]+')) AS DOUBLE) AS n
          FROM documents
        )
        SELECT source, COUNT(*) AS n_docs,
               COUNT(*) * 1.0 / (SELECT COUNT(*) FROM t) AS share,
               AVG(n) AS mean_tokens,
               quantile_cont(n, 0.5) AS p50_tokens
        FROM t GROUP BY source
        """
    ).fetchall()
    con.close()
    assert len(want) == len(got) > 1
    for source, n_docs, share, mean_t, p50 in want:
        row = got[source]
        assert row["n_docs"] == n_docs
        assert row["share"] == pytest.approx(share, rel=1e-12)
        assert row["mean_tokens"] == pytest.approx(mean_t, rel=1e-12)
        assert row["p50_tokens"] == pytest.approx(p50, rel=1e-12)


def test_corpus_drift_planted_shift(spark):
    """Snapshot b drops one source entirely, doubles another, and
    truncates its texts — each must surface in the right delta."""
    a_rows = (
        [(i, "alpha " * 20, "web") for i in range(10)]
        + [(100 + i, "beta " * 20, "books") for i in range(10)]
        + [(200 + i, "gamma " * 20, "code") for i in range(10)]
    )
    b_rows = (
        [(i, "alpha " * 20, "web") for i in range(20)]  # doubled
        + [(300 + i, "beta " * 5, "books") for i in range(10)]  # truncated
        # code vanished
    )
    a = spark.createDataFrame(a_rows, "doc_id long, text string, source string")
    b = spark.createDataFrame(b_rows, "doc_id long, text string, source string")
    drift = {r["source"]: r for r in monitoring.corpus_drift(a, b).collect()}

    assert set(drift) == {"web", "books", "code"}
    assert drift["code"]["n_docs_b"] == 0 and drift["code"]["share_delta"] < 0
    assert drift["code"]["mean_tokens_b"] is None  # vanished: no stats
    assert drift["web"]["n_docs_b"] == 2 * drift["web"]["n_docs_a"]
    assert drift["web"]["share_delta"] > 0
    assert drift["books"]["mean_tokens_delta"] == pytest.approx(-15.0)
    assert drift["books"]["p50_tokens_delta"] == pytest.approx(-15.0)
    # shares sum to 1 on each populated side
    assert sum(r["share_a"] for r in drift.values()) == pytest.approx(1.0)
    assert sum(r["share_b"] for r in drift.values()) == pytest.approx(1.0)


def test_corpus_drift_approx_mode_close_to_exact(spark):
    docs = read_table(spark, SF, "documents")
    half_a = docs.filter("doc_id % 2 = 0")
    half_b = docs.filter("doc_id % 2 = 1")
    exact = {r["source"]: r for r in monitoring.corpus_drift(half_a, half_b).collect()}
    approx = {
        r["source"]: r
        for r in monitoring.corpus_drift(half_a, half_b, exact=False).collect()
    }
    for source, row in exact.items():
        # counts identical; medians within a tolerant band (t-digest)
        assert approx[source]["n_docs_b"] == row["n_docs_b"]
        assert approx[source]["p50_tokens_b"] == pytest.approx(
            row["p50_tokens_b"], rel=0.15
        )


def test_embedding_drift_identity_and_planted_shift(spark):
    """Identical snapshots: cosine 1, deltas 0. Planted shift: scaling
    one label moves its norm (cosine stays 1 — direction unchanged);
    negating half the dims of another rotates its centroid (cosine < 1
    with the norm untouched); a vanished label surfaces with n_b=0."""
    from pyspark.sql import functions as F

    emb = read_table(spark, SF, "embeddings")
    same = {r["label"]: r for r in monitoring.embedding_drift(emb, emb).collect()}
    assert same
    for r in same.values():
        assert r["centroid_cosine"] == pytest.approx(1.0, abs=1e-9)
        assert r["mean_norm_delta"] == pytest.approx(0.0, abs=1e-9)
        assert r["n_a"] == r["n_b"] > 0

    labels = sorted(same)
    scaled_l, rotated_l, gone_l = labels[0], labels[1], labels[2]
    dim = len(emb.first()["embedding"])
    half = dim // 2
    flip = F.transform(
        F.col("embedding").cast("array<double>"),
        lambda x, i: F.when(i < half, -x).otherwise(x),
    )
    b = (
        emb.filter(F.col("label") != gone_l)
        .withColumn(
            "embedding",
            F.when(
                F.col("label") == scaled_l,
                F.transform(F.col("embedding").cast("array<double>"), lambda x: x * 2.0),
            )
            .when(F.col("label") == rotated_l, flip)
            .otherwise(F.col("embedding").cast("array<double>")),
        )
    )
    drift = {r["label"]: r for r in monitoring.embedding_drift(emb, b).collect()}
    assert drift[scaled_l]["mean_norm_delta"] == pytest.approx(
        drift[scaled_l]["mean_norm_a"], rel=1e-6
    )  # doubled norm -> delta == original norm
    assert drift[scaled_l]["centroid_cosine"] == pytest.approx(1.0, abs=1e-9)
    assert drift[rotated_l]["centroid_cosine"] < 0.9  # rotated space
    assert drift[rotated_l]["mean_norm_delta"] == pytest.approx(0.0, abs=1e-9)
    assert drift[gone_l]["n_b"] == 0 and drift[gone_l]["centroid_cosine"] is None


# ---- streaming drift monitor (round 5) --------------------------------

def test_stream_drift_monitor(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    from lakehouse_adventureworks2022_spark.operators.monitoring import (
        corpus_profile,
    )
    from lakehouse_adventureworks2022_spark.sources.readers import read_table
    from lakehouse_adventureworks2022_spark.streaming.corpus import (
        stream_drift_monitor,
    )

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    ref = corpus_profile(docs)

    # in-distribution batch: the corpus itself → NO alerts
    src_ok = str(tmp_path / "ok")
    docs.coalesce(1).write.mode("overwrite").parquet(src_ok)
    alerts1 = str(tmp_path / "alerts1")
    q = stream_drift_monitor(
        spark.readStream.schema(docs.schema).parquet(src_ok),
        ref,
        alerts1,
        str(tmp_path / "ck1"),
    )
    q.processAllAvailable()
    q.stop()
    assert not os.path.exists(alerts1)  # empty alerts = in distribution

    # drifted batch: one source's docs dropped entirely + a NEW source
    drifted = docs.filter(F.col("source") != "web").unionByName(
        docs.limit(20).withColumn("source", F.lit("mystery_feed"))
    )
    src_bad = str(tmp_path / "bad")
    drifted.coalesce(1).write.mode("overwrite").parquet(src_bad)
    alerts2 = str(tmp_path / "alerts2")
    q = stream_drift_monitor(
        spark.readStream.schema(docs.schema).parquet(src_bad),
        ref,
        alerts2,
        str(tmp_path / "ck2"),
    )
    q.processAllAvailable()
    q.stop()
    got = spark.read.parquet(alerts2)
    flagged = {r["source"] for r in got.collect()}
    assert "mystery_feed" in flagged  # unknown source always alerts
    assert got.count() >= 1


def test_stream_drift_monitor_alerts_on_vanished_source(spark, tmp_path):
    from pyspark.sql import functions as F

    from lakehouse_adventureworks2022_spark.operators.monitoring import (
        corpus_profile,
    )
    from lakehouse_adventureworks2022_spark.sources.readers import read_table
    from lakehouse_adventureworks2022_spark.streaming.corpus import (
        stream_drift_monitor,
    )

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    ref = corpus_profile(docs)
    a_source = docs.select("source").first()["source"]
    # the batch is missing that source ENTIRELY — the harshest drift
    drifted = docs.filter(F.col("source") != a_source)
    src = str(tmp_path / "van")
    drifted.coalesce(1).write.mode("overwrite").parquet(src)
    alerts_dir = str(tmp_path / "alerts")
    q = stream_drift_monitor(
        spark.readStream.schema(docs.schema).parquet(src),
        ref,
        alerts_dir,
        str(tmp_path / "ck"),
    )
    q.processAllAvailable()
    q.stop()
    flagged = {
        r["source"] for r in spark.read.parquet(alerts_dir).collect()
    }
    assert a_source in flagged  # the vanished source IS the alert


def test_value_anomalies_planted_spike(spark):
    from pyspark.sql import functions as F

    from lakehouse_adventureworks2022_spark.operators.monitoring import (
        value_anomalies,
    )

    rows = []
    # user 1: 20 steady values then a spike; user 2: steady throughout
    for i in range(20):
        rows.append((1, f"2024-01-01 00:{i:02d}:00", 10.0 + (i % 3)))
    rows.append((1, "2024-01-01 01:00:00", 500.0))  # the spike
    rows.append((1, "2024-01-01 01:01:00", 10.0))  # recovery: normal
    for i in range(10):
        rows.append((2, f"2024-01-01 00:{i:02d}:00", 10.0))
    df = spark.createDataFrame(
        rows, "user_id long, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = value_anomalies(df)
    flagged = [
        (r["user_id"], str(r["ts"]), r["value"])
        for r in out.filter("is_anomaly").collect()
    ]
    assert flagged == [(1, "2024-01-01 01:00:00", 500.0)]
    # the spike itself must not poison the NEXT event's baseline check:
    # the trailing frame includes the spike, widening std — recovery
    # event is unflagged (verified by the single-flag assert above)
    # cold keys (first min_history events) are never flagged
    early = out.filter("user_id = 2").collect()
    assert all(not r["is_anomaly"] for r in early)
    # zero-variance baseline: identical values → no flag, deviation → flag
    zv = value_anomalies(
        spark.createDataFrame(
            [(9, f"2024-01-01 00:{i:02d}:00", 5.0) for i in range(8)]
            + [(9, "2024-01-01 00:30:00", 5.1)],
            "user_id long, ts string, value double",
        ).withColumn("ts", F.to_timestamp("ts"))
    )
    fl = [r["value"] for r in zv.filter("is_anomaly").collect()]
    assert fl == [5.1]


def test_value_anomalies_fixture_rates(spark):
    from lakehouse_adventureworks2022_spark.operators.monitoring import (
        value_anomalies,
    )
    from lakehouse_adventureworks2022_spark.sources.readers import read_table

    events = read_table(spark, "/root/testdata/sf0.001", "events")
    out = value_anomalies(events)
    n = events.count()
    flagged = out.filter("is_anomaly").count()
    # |z| > 3: a small tail (the fixture's values are heavy-tailed, so
    # the rate sits above the Gaussian 0.3% — ~2.5% observed)
    assert 0 < flagged < n * 0.05
    scored = out.filter("z_score IS NOT NULL").count()
    assert scored > n * 0.5  # most events have enough history


def test_value_anomalies_tied_timestamps_deterministic(spark):
    """With tied timestamps inside a key, the trailing baseline depends
    on frame order: tiebreak_col must pin it independent of partition
    layout (ADVICE r5 — monotonically_increasing_id varies with layout)."""
    from lakehouse_adventureworks2022_spark.operators.monitoring import (
        value_anomalies,
    )

    rows = [
        # user 1: five ticks at the SAME timestamp, then a spike
        (i, 1, "2024-01-01 00:00:00", float(v))
        for i, v in enumerate([10.0, 10.1, 9.9, 10.2, 9.8])
    ] + [(5, 1, "2024-01-01 00:01:00", 100.0)]
    df = spark.createDataFrame(
        rows, "event_id int, user_id int, ts_s string, value double"
    ).selectExpr("event_id", "user_id", "CAST(ts_s AS TIMESTAMP) AS ts", "value")

    def run(frame):
        return sorted(
            (r["event_id"], r["baseline_mean"], r["z_score"], r["is_anomaly"])
            for r in value_anomalies(
                frame, min_history=3, tiebreak_col="event_id"
            ).collect()
        )

    base = run(df)
    # same data, three different physical layouts → identical output
    assert run(df.repartition(7, "value")) == base
    assert run(df.coalesce(1)) == base
    assert run(df.orderBy("value")) == base
    # the spike is flagged against the 5-tick baseline
    spike = [r for r in base if r[0] == 5][0]
    assert spike[3] is True


def test_value_anomalies_default_tiebreak_layout_independent(spark):
    """WITHOUT tiebreak_col, ties order by a content-derived hash —
    identical under any partition layout (the old default,
    monotonically_increasing_id, numbered rows by physical layout, so
    repartitioning could reshuffle tied baselines; r6 verdict #6)."""
    from lakehouse_adventureworks2022_spark.operators.monitoring import (
        value_anomalies,
    )

    rows = [
        (i, 1, "2024-01-01 00:00:00", float(v))
        for i, v in enumerate([10.0, 10.1, 9.9, 10.2, 9.8])
    ] + [(5, 1, "2024-01-01 00:01:00", 100.0)]
    df = spark.createDataFrame(
        rows, "event_id int, user_id int, ts_s string, value double"
    ).selectExpr("event_id", "user_id", "CAST(ts_s AS TIMESTAMP) AS ts", "value")

    def run(frame):
        return sorted(
            (r["event_id"], r["baseline_mean"], r["z_score"], r["is_anomaly"])
            for r in value_anomalies(frame, min_history=3).collect()
        )

    base = run(df)
    assert run(df.repartition(7, "value")) == base
    assert run(df.coalesce(1)) == base
    assert run(df.orderBy(df.value.desc())) == base
    spike = [r for r in base if r[0] == 5][0]
    assert spike[3] is True
