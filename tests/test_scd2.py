"""SCD2 invariants over the new/changed/unchanged/re-changed key matrix
(SURVEY.md §5.3/§5.5, FIXTURES.md "SCD2 delta batches")."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_adventureworks2022_spark.operators.scd2 import scd2_apply

TRACKED = ["name", "price"]


def _batch(spark, rows):
    return spark.createDataFrame(rows, ["key", "name", "price"])


def _apply_seq(spark, batches_and_dates):
    snap = None
    for rows, eff in batches_and_dates:
        snap = scd2_apply(snap, _batch(spark, rows), "key", TRACKED, eff)
    return snap


def test_initial_load_all_current(spark):
    snap = _apply_seq(spark, [([(1, "a", 10.0), (2, "b", 20.0)], "2024-01-01")])
    rows = snap.collect()
    assert len(rows) == 2
    assert all(r["is_current"] for r in rows)
    assert all(r["expiration_date"] is None for r in rows)


def test_full_key_matrix(spark):
    snap = _apply_seq(
        spark,
        [
            ([(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "2024-01-01"),
            # 1 unchanged, 2 changed, 3 dropped-from-batch (kept), 4 new
            ([(1, "a", 10.0), (2, "b", 25.0), (4, "d", 40.0)], "2024-02-01"),
        ],
    )
    by_key = {}
    for r in snap.collect():
        by_key.setdefault(r["key"], []).append(r)

    assert len(by_key[1]) == 1 and by_key[1][0]["is_current"]
    v2 = sorted(by_key[2], key=lambda r: r["effective_date"])
    assert len(v2) == 2
    assert not v2[0]["is_current"] and v2[0]["expiration_date"] == v2[1]["effective_date"]
    assert v2[1]["is_current"] and v2[1]["price"] == 25.0
    assert len(by_key[3]) == 1 and by_key[3][0]["is_current"]  # absent ≠ deleted
    assert len(by_key[4]) == 1 and by_key[4][0]["is_current"]


def test_rechange_produces_three_versions(spark):
    snap = _apply_seq(
        spark,
        [
            ([(1, "a", 10.0)], "2024-01-01"),
            ([(1, "a", 11.0)], "2024-02-01"),
            ([(1, "a", 12.0)], "2024-03-01"),
        ],
    )
    rows = sorted(snap.collect(), key=lambda r: r["effective_date"])
    assert len(rows) == 3
    assert [r["is_current"] for r in rows] == [False, False, True]
    # non-overlapping, contiguous validity ranges
    assert rows[0]["expiration_date"] == rows[1]["effective_date"]
    assert rows[1]["expiration_date"] == rows[2]["effective_date"]
    assert rows[2]["expiration_date"] is None


def test_exactly_one_current_per_key_invariant(spark):
    snap = _apply_seq(
        spark,
        [
            ([(k, "n", float(k)) for k in range(50)], "2024-01-01"),
            ([(k, "n", float(k + (k % 3 == 0))) for k in range(60)], "2024-02-01"),
        ],
    )
    current_counts = (
        snap.filter(F.col("is_current")).groupBy("key").count().collect()
    )
    assert all(r["count"] == 1 for r in current_counts)
    assert len(current_counts) == 60


def test_idempotent_reapply_no_new_versions(spark):
    rows = [(1, "a", 10.0), (2, "b", 20.0)]
    snap1 = _apply_seq(spark, [(rows, "2024-01-01")])
    snap2 = scd2_apply(snap1, _batch(spark, rows), "key", TRACKED, "2024-02-01")
    assert snap2.count() == 2  # unchanged batch ⇒ no new versions
    assert snap2.filter(~F.col("is_current")).count() == 0


def test_surrogate_keys_deterministic_and_unique(spark):
    snap = _apply_seq(
        spark,
        [
            ([(k, "n", float(k)) for k in range(100)], "2024-01-01"),
            ([(k, "n", float(k + 1)) for k in range(100)], "2024-02-01"),
        ],
    )
    sks = [r["surrogate_key"] for r in snap.select("surrogate_key").collect()]
    assert len(sks) == len(set(sks)) == 200
    # deterministic across re-computation (re-run produces identical keys)
    snap_b = _apply_seq(
        spark,
        [
            ([(k, "n", float(k)) for k in range(100)], "2024-01-01"),
            ([(k, "n", float(k + 1)) for k in range(100)], "2024-02-01"),
        ],
    )
    assert sorted(sks) == sorted(
        r["surrogate_key"] for r in snap_b.select("surrogate_key").collect()
    )


def test_batch_dedup_latest_wins(spark):
    # two rows for key 1 in one batch; order_col picks the latest
    batch = spark.createDataFrame(
        [(1, "a", 10.0, 1), (1, "a", 99.0, 2)], ["key", "name", "price", "seq"]
    )
    snap = scd2_apply(None, batch, "key", TRACKED, "2024-01-01", order_col="seq")
    rows = snap.collect()
    assert len(rows) == 1 and rows[0]["price"] == 99.0
