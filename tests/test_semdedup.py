"""SemDeDup cluster-bounded semantic dedup (operators/similarity.semdedup)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from lakehouse_adventureworks2022_spark.operators.similarity import semdedup
from lakehouse_adventureworks2022_spark.sources.readers import read_table

SF = "/root/testdata/sf0.001"


def _planted(spark):
    """20 well-separated base vectors + near-copies of three of them."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.normal(size=(20, 16))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    for j, src in enumerate((3, 7, 11)):
        near = base[src] + rng.normal(scale=1e-3, size=16)
        rows.append((100 + j, [float(x) for x in near]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_planted_duplicates_are_pruned_keeping_lowest_id(spark):
    df = _planted(spark)
    survivors = {r[0] for r in semdedup(df, eps=0.01, n_cells=4).select("vec_id").collect()}
    # the base vectors survive (lowest ids of their groups); copies go
    assert {3, 7, 11} <= survivors
    assert survivors.isdisjoint({100, 101, 102})
    assert len(survivors) == 20


def test_no_duplicates_means_no_pruning(spark):
    df = _planted(spark).filter(F.col("vec_id") < 100)
    assert semdedup(df, eps=0.01, n_cells=4).count() == 20


def test_deterministic_across_runs_and_partitionings(spark):
    df = _planted(spark)
    a = {r[0] for r in semdedup(df, eps=0.01, n_cells=4).select("vec_id").collect()}
    b = {
        r[0]
        for r in semdedup(df.repartition(13), eps=0.01, n_cells=4)
        .select("vec_id")
        .collect()
    }
    assert a == b


def test_matches_greedy_rule_within_cells(spark):
    """Differential vs the literal python statement of the keep rule:
    a row survives iff no smaller-id within-cell neighbor has
    cosine >= 1-eps."""
    import numpy as np

    from lakehouse_adventureworks2022_spark.operators.similarity import ivf_build

    df = read_table(spark, SF, "embeddings").filter(F.col("vec_id") < 120)
    eps = 0.55
    _, cells = ivf_build(df, n_cells=4)
    rows = cells.select("cell", "cand_id", "embedding").collect()
    by_cell: dict[int, list] = {}
    for r in rows:
        by_cell.setdefault(r["cell"], []).append((r["cand_id"], np.array(r["embedding"], dtype=np.float64)))
    expect = set()
    for members in by_cell.values():
        members.sort()
        for i, (vid, v) in enumerate(members):
            dup = False
            for pvid, pv in members[:i]:
                cos = float(v @ pv / (np.linalg.norm(v) * np.linalg.norm(pv)))
                if cos >= 1 - eps:
                    dup = True
                    break
            if not dup:
                expect.add(vid)
    got = {r[0] for r in semdedup(df, eps=eps, n_cells=4).select("vec_id").collect()}
    assert got == expect


def test_fixture_query_prunes_something(spark):
    from lakehouse_adventureworks2022_spark.plans.catalog import QUERIES

    df = read_table(spark, SF, "embeddings")
    out = QUERIES["semdedup_prune"](spark, SF)
    n_in, n_out = df.count(), out.count()
    assert 0 < n_out < n_in


def test_plan_is_cell_equi_join_no_cartesian(spark):
    df = read_table(spark, SF, "embeddings")
    plan = (
        semdedup(df, eps=0.5, n_cells=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
