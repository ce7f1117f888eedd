"""Schema evolution through the TableManager seam: the Delta
mergeSchema-append contract — additive columns, upward batch casts,
loud refusals for anything lossy, and the conforming merged read.

Parameterized over both storage backends (r9): the parquet analog runs
everywhere; the real Delta backend runs wherever delta-spark is
importable (skip-marked in the jar-less test container) so a lakehouse
deployment re-pins the SAME semantics against real transactions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_adventureworks2022_spark.storage.tables import (
    TableManager,
    delta_available,
)

BACKENDS = [
    "parquet",
    pytest.param(
        "delta",
        marks=pytest.mark.skipif(
            not delta_available(),
            reason="delta-spark not installed in this container",
        ),
    ),
]


@pytest.fixture(params=BACKENDS)
def tm(spark, tmp_path, request):
    return TableManager(spark, str(tmp_path), fmt=request.param)


def test_additive_column_evolves_and_backfills_null(spark, tm):
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    tm.append_evolve(v1, "t")
    v2 = spark.createDataFrame(
        [(3, "c", 30), (4, "d", 40)], "id long, name string, score int"
    )
    tm.append_evolve(v2, "t")
    got = {r["id"]: r for r in tm.read_evolved("t").collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[1]["score"] is None and got[3]["score"] == 30
    assert got[1]["name"] == "a"


def test_batch_missing_historical_column_writes_typed_nulls(spark, tm):
    v1 = spark.createDataFrame([(1, "a")], "id long, name string")
    tm.append_evolve(v1, "t")
    v2 = spark.createDataFrame([(2,)], "id long")
    tm.append_evolve(v2, "t")
    # plain read (no mergeSchema needed — every file carries name)
    got = {r["id"]: r["name"] for r in tm.read("t").collect()}
    assert got == {1: "a", 2: None}


def test_narrower_batch_is_cast_up_to_table_type(spark, tm):
    v1 = spark.createDataFrame([(1, 10)], "id long, v long")
    tm.append_evolve(v1, "t")
    v2 = spark.createDataFrame([(2, 20)], "id long, v int")
    tm.append_evolve(v2, "t")
    df = tm.read_evolved("t")
    assert dict(df.dtypes)["v"] == "bigint"
    assert {r["v"] for r in df.collect()} == {10, 20}


def test_wider_batch_and_true_conflicts_are_refused(spark, tm):
    v1 = spark.createDataFrame([(1, 10)], "id long, v int")
    tm.append_evolve(v1, "t")
    with pytest.raises(ValueError, match="wider than table"):
        tm.append_evolve(
            spark.createDataFrame([(2, 20)], "id long, v long"), "t"
        )
    with pytest.raises(ValueError, match="table=int batch=string"):
        tm.append_evolve(
            spark.createDataFrame([(2, "x")], "id long, v string"), "t"
        )
    # nothing was written by the refused appends
    assert tm.read("t").count() == 1


def test_read_evolved_conforms_to_target_schema(spark, tm):
    v1 = spark.createDataFrame([(1, "a")], "id long, name string")
    tm.append_evolve(v1, "t")
    tm.append_evolve(
        spark.createDataFrame([(2, "b", 5)], "id long, name string, score int"),
        "t",
    )
    target = spark.createDataFrame(
        [], "id long, score bigint, flag boolean"
    )
    got = tm.read_evolved("t", target=target)
    assert [f.simpleString() for f in got.schema.fields] == [
        "id:bigint",
        "score:bigint",  # int widened to the target's bigint
        "flag:boolean",  # never stored: typed nulls
    ]
    rows = {r["id"]: r for r in got.collect()}
    assert rows[2]["score"] == 5 and rows[1]["score"] is None
    assert rows[1]["flag"] is None
    # non-widening conformance is refused, not silently cast
    bad = spark.createDataFrame([], "id long, name int")
    with pytest.raises(ValueError, match="not a safe widening"):
        tm.read_evolved("t", target=bad)


def test_partitioned_evolution_keeps_pruning_layout(spark, tm):
    v1 = spark.createDataFrame(
        [(1, "2024-01-01"), (2, "2024-01-02")], "id long, day string"
    )
    tm.append_evolve(v1, "t", partition_by="day")
    v2 = spark.createDataFrame(
        [(3, "2024-01-03", 7)], "id long, day string, score int"
    )
    tm.append_evolve(v2, "t", partition_by="day")
    df = tm.read_evolved("t").filter(F.col("day") == "2024-01-03")
    assert [r["score"] for r in df.collect()] == [7]


def test_conflict_check_sees_every_generation(spark, tm):
    """The reconciliation target is the UNION schema across file
    generations: after an additive evolution, a batch whose type
    conflicts with the LATER-ADDED column must still be refused loudly
    (r6 ADVICE — a plain read could infer from an older footer that
    lacks the column, silently bypassing the check and writing files
    the merged read can no longer reconcile)."""
    tm.append_evolve(spark.createDataFrame([(1,)], "id long"), "t")
    tm.append_evolve(
        spark.createDataFrame([(2, 10)], "id long, extra bigint"), "t"
    )
    with pytest.raises(ValueError, match="extra"):
        tm.append_evolve(
            spark.createDataFrame([(3, "x")], "id long, extra string"), "t"
        )
    # a narrower batch for the evolved column is still cast up cleanly
    tm.append_evolve(
        spark.createDataFrame([(4, 40)], "id long, extra int"), "t"
    )
    got = tm.read_evolved("t")
    assert dict(got.dtypes)["extra"] == "bigint"
    assert got.count() == 3


def test_read_version_parquet_points_to_versioned_table(spark, tmp_path):
    """(r9) time travel on the parquet backend is VersionedTable's job —
    TableManager.read_version refuses with the pointer instead of faking
    log semantics over bare files."""
    mgr = TableManager(spark, str(tmp_path))
    with pytest.raises(ValueError, match="VersionedTable"):
        mgr.read_version("t", 0)
