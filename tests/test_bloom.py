"""Bloom-filter pruning at both layers: parquet bloom filters written by
TableManager (row-group skipping for high-cardinality point lookups) and
Catalyst's runtime bloom-filter join pruning (`might_contain` semi-filter
injected on the scan side of a selective shuffle join)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from lakehouse_adventureworks2022_spark.sources.readers import read_table
from lakehouse_adventureworks2022_spark.storage.tables import TableManager

SF = "/root/testdata/sf0.001"


def _dir_size(path: str) -> int:
    return sum(
        os.path.getsize(f)
        for f in glob.glob(f"{path}/**/*.parquet", recursive=True)
    )


def test_parquet_bloom_filters_written_and_transparent(spark, tmp_path):
    tm = TableManager(spark, str(tmp_path / "wh"))
    docs = read_table(spark, SF, "documents").withColumn(
        "content_hash", F.md5("text")
    )
    tm.overwrite(docs, "plain")
    tm.overwrite(docs, "bloomed", bloom_filter_cols=("content_hash",),
                 bloom_ndv=1000)

    # the filter blob is real bytes in the file — presence is visible as
    # a deterministic size increase over the identical plain write
    plain, bloomed = _dir_size(tm.path("plain")), _dir_size(tm.path("bloomed"))
    assert bloomed > plain + 500

    # readers see the same table: identical rows, and a point lookup on
    # the bloomed key is pushed to the scan (the filter parquet-mr
    # evaluates against the bloom before decoding the row group)
    key = docs.select("content_hash").first()["content_hash"]
    lookup = tm.read("bloomed").filter(F.col("content_hash") == key)
    plan = lookup._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "content_hash" in plan
    assert lookup.count() == docs.filter(F.col("content_hash") == key).count()
    assert tm.read("bloomed").count() == tm.read("plain").count()


def test_runtime_bloom_filter_join_pruning(spark):
    """With broadcast off (the big-×-big regime) and the application-side
    size gate lowered, Catalyst injects a bloom-filter semi-filter from
    the selective side onto the probe-side scan — the runtime analog of
    DPP for non-partition keys. At 100 TB this is the lever that keeps a
    selective dim-filtered fact join from scanning every fact row
    through the shuffle."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        lineitem = read_table(spark, SF, "lineitem")
        orders = read_table(spark, SF, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        joined = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan  # runtime bloom injected
        # and it computes the same answer as the broadcast plan
        n = joined.count()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    want = (
        read_table(spark, SF, "lineitem")
        .join(
            read_table(spark, SF, "orders").filter(
                F.col("o_orderpriority") == "1-URGENT"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert n == want
