"""Bucketed-table co-location: the write-once-shuffle-never property
that makes the detail⋈header join shuffle-free at 100 TB (SCALE.md).
The plan assertion is the point: same-key same-count bucketed tables
must join with no Exchange on either side."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from lakehouse_adventureworks2022_spark.sources.readers import read_table
from lakehouse_adventureworks2022_spark.storage.tables import TableManager


@pytest.fixture()
def warehouse(spark, tmp_path):
    # warehouse dir is a static conf set in session.get_spark (tempdir)
    yield str(tmp_path)
    for t in ("b_lineitem", "b_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, sf_dir, warehouse):
    tm = TableManager(spark, warehouse)
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_custkey"
    )
    tm.save_bucketed(li, "b_lineitem", "l_orderkey", 8, sort_cols="l_orderkey")
    tm.save_bucketed(orders, "b_orders", "o_orderkey", 8, sort_cols="o_orderkey")

    # fixture tables are broadcast-small, which would bypass bucketing —
    # disable auto-broadcast to expose the co-located join the buckets
    # buy at real scale (where neither side broadcasts)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            spark.table("b_lineitem")["l_orderkey"]
            == spark.table("b_orders")["o_orderkey"],
        )
        plan = _plan(joined)
        # co-located: a sort-merge join with no shuffle exchange anywhere
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert "Bucketed: true" in plan
        # and the result is right
        assert joined.count() == read_table(spark, sf_dir, "lineitem").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_compaction_reduces_file_count(spark, tmp_path):
    import os

    tm = TableManager(spark, str(tmp_path))
    df = spark.range(10_000).repartition(40)
    tm.append(df, "t")
    n_before = len(
        [f for f in os.listdir(tm.path("t")) if f.endswith(".parquet")]
    )
    assert n_before >= 40
    tm.compact("t", target_files=4)
    n_after = len(
        [f for f in os.listdir(tm.path("t")) if f.endswith(".parquet")]
    )
    assert n_after <= 8
    assert tm.read("t").count() == 10_000

def test_clustered_write_gives_disjoint_file_ranges(spark, sf_dir, tmp_path):
    """Range clustering must leave each parquet file with a tight,
    non-overlapping key range (verified from the actual footers), so
    min/max pruning skips whole files for a selective predicate."""
    from pathlib import Path

    import pyarrow.parquet as pq

    from lakehouse_adventureworks2022_spark.sources.readers import read_table

    tm = TableManager(spark, str(tmp_path))
    orders = read_table(spark, sf_dir, "orders")
    tm.write_clustered(orders, "orders_clustered", "o_custkey", n_files=8)

    ranges = []
    for f in Path(tm.path("orders_clustered")).glob("*.parquet"):
        md = pq.ParquetFile(str(f)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}["o_custkey"]
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) >= 4  # actually split into multiple files
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint: a point predicate hits ONE file

    # row fidelity: clustering is a rewrite, not a filter
    assert tm.read("orders_clustered").count() == orders.count()


def test_maintenance_job_compacts_and_clusters(spark, sf_dir, tmp_path):
    from pathlib import Path

    from lakehouse_adventureworks2022_spark.sources.readers import read_table
    from lakehouse_adventureworks2022_spark.storage.maintenance import (
        MaintenancePlan,
        run_maintenance,
    )

    tm = TableManager(spark, str(tmp_path))
    orders = read_table(spark, sf_dir, "orders")
    # simulate fragmented appends: many tiny files
    tm.overwrite(orders.repartition(24), "gold.orders_frag")
    assert len(list(Path(tm.path("gold.orders_frag")).glob("*.parquet"))) >= 24

    done = run_maintenance(
        tm,
        [
            MaintenancePlan(
                "gold.orders_frag", target_files=4, cluster_by="o_custkey"
            )
        ],
    )
    assert done["gold.orders_frag"] == ["cluster"]
    files = list(Path(tm.path("gold.orders_frag")).glob("*.parquet"))
    assert len(files) <= 6  # compacted
    assert tm.read("gold.orders_frag").count() == orders.count()


def test_zorder_localizes_both_dimensions(spark, sf_dir, tmp_path):
    """Z-ordered files must have LOCALIZED footer ranges in both columns:
    a selective predicate on either column overlaps only a fraction of
    the files, where single-column clustering prunes nothing on the
    second column."""
    from pathlib import Path

    import pyarrow.parquet as pq

    from lakehouse_adventureworks2022_spark.sources.readers import read_table
    from lakehouse_adventureworks2022_spark.storage.zorder import (
        morton_key,
        write_zordered,
        zorder_frame,
    )

    tm = TableManager(spark, str(tmp_path))
    orders = read_table(spark, sf_dir, "orders")
    n_files = 16
    write_zordered(tm, orders, "orders_z", "o_custkey", "o_totalprice", n_files)

    def file_ranges(table, col):
        out = []
        for f in Path(tm.path(table)).glob("*.parquet"):
            md = pq.ParquetFile(str(f)).metadata
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[col]
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            out.append((min(mins), max(maxs)))
        return out

    # row fidelity
    assert tm.read("orders_z").count() == orders.count()
    files = len(file_ranges("orders_z", "o_custkey"))
    assert files >= 8

    # a mid-domain point predicate on EITHER column overlaps < 100% of
    # files (single-key clustering would leave the other column's ranges
    # spanning the whole domain in every file)
    for col in ("o_custkey", "o_totalprice"):
        ranges = file_ranges("orders_z", col)
        domain_lo = min(lo for lo, _ in ranges)
        domain_hi = max(hi for _, hi in ranges)
        point = (domain_lo + domain_hi) / 2
        overlapping = sum(1 for lo, hi in ranges if lo <= point <= hi)
        assert overlapping < files, f"{col}: no locality at all"
        assert overlapping <= files * 0.75, f"{col}: weak locality ({overlapping}/{files})"

    # morton key is deterministic and monotone-safe on corners
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 3)], "a long, b long"
    ).select(morton_key(F.col("a"), F.col("b"), bits=2).alias("k"))
    assert [r["k"] for r in df.collect()] == [0, 1, 2, 15]
