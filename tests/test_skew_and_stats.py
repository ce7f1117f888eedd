"""Skew-salting primitives are semantically transparent (identical to the
unsalted forms) and ANALYZE populates catalog stats for CBO."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_adventureworks2022_spark.operators import skew
from lakehouse_adventureworks2022_spark.sources.readers import read_table
from lakehouse_adventureworks2022_spark.storage.tables import TableManager


def _rowset(df):
    return {tuple(r) for r in df.collect()}


def test_salted_aggregate_matches_plain(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    got = skew.salted_aggregate(
        li, keys=["l_returnflag"], sums=["l_quantity"], n_salts=8
    ).select("l_returnflag", "sum_l_quantity", "row_count")
    want = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("sum_l_quantity"),
        F.count(F.lit(1)).alias("row_count"),
    )
    assert _rowset(got) == _rowset(want)


def test_salted_aggregate_splits_hot_key(spark):
    # one key, many rows: stage 1 must produce multiple partials
    df = spark.range(10000).select(
        F.lit("hot").alias("k"), F.col("id").cast("double").alias("v")
    )
    out = skew.salted_aggregate(df, keys=["k"], sums=["v"], n_salts=8).collect()
    assert len(out) == 1
    assert out[0]["row_count"] == 10000
    assert abs(out[0]["sum_v"] - sum(range(10000))) < 1e-6


def test_salted_aggregate_constant_measure_still_spreads(spark):
    # a hot key whose measure is CONSTANT: the old sums[0]-derived salt
    # collapsed to one reducer here; the whole-row default must not
    df = spark.range(5000).select(
        F.lit("hot").alias("k"),
        F.lit(1.0).alias("v"),
        F.col("id").alias("row_id"),
    )
    salts = (
        df.withColumn("_salt", skew._row_salt(df, 8, None, ("k",)))
        .select("_salt")
        .distinct()
        .count()
    )
    assert salts > 1
    out = skew.salted_aggregate(df, keys=["k"], sums=["v"], n_salts=8).collect()
    assert len(out) == 1 and out[0]["sum_v"] == 5000.0


def test_salt_on_grouping_key_is_rejected(spark):
    import pytest

    df = spark.range(10).select(F.lit("hot").alias("k"), F.col("id").alias("v"))
    with pytest.raises(ValueError, match="grouping/join key"):
        skew.salted_aggregate(df, keys=["k"], sums=["v"], salt_on="k")
    with pytest.raises(ValueError, match="grouping/join key"):
        skew.replicated_skew_join(df, df, "k", "k", salt_on="k")


def test_replicated_skew_join_default_salt_matches_plain(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    got = skew.replicated_skew_join(li, part, "l_partkey", "p_partkey", n_salts=4)
    want = li.join(part, li["l_partkey"] == part["p_partkey"], "inner")
    assert _rowset(got) == _rowset(want)


def test_replicated_skew_join_matches_plain_inner_and_left(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    for how in ("inner", "left"):
        got = skew.replicated_skew_join(
            li, part, "l_partkey", "p_partkey", n_salts=4, salt_on="l_orderkey", how=how
        )
        want = li.join(part, li["l_partkey"] == part["p_partkey"], how)
        assert _rowset(got) == _rowset(want), how


def test_analyze_populates_catalog_stats(spark, tmp_path):
    tm = TableManager(spark, str(tmp_path))
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    spark.sql("DROP TABLE IF EXISTS stats_probe")
    df.write.mode("overwrite").saveAsTable("stats_probe")
    tm.analyze("stats_probe", columns=["k", "v"])
    desc = {
        r["col_name"]: r["data_type"]
        for r in spark.sql("DESCRIBE TABLE EXTENDED stats_probe").collect()
    }
    assert "Statistics" in desc  # table-level bytes/rows recorded
    kcol = spark.sql("DESCRIBE EXTENDED stats_probe k").collect()
    info = {r["info_name"]: r["info_value"] for r in kcol}
    assert info.get("distinct_count") not in (None, "NULL")
    spark.sql("DROP TABLE IF EXISTS stats_probe")
