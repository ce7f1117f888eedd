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


def test_aqe_skew_join_splits_hot_key_and_matches_salted(spark):
    """Pin Spark's AQE skew-join on a hot-key fact⋈dim sort-merge join —
    the #1 real-cluster failure mode at 100× (r5 verdict #5): with one
    key holding ~5/6 of the fact, AQE must mark the join skew=true
    (splitting the hot partition into advisory-sized reads), and both
    the AQE path and the plan-level salted path must agree with the
    plain join. Thresholds are scaled down so fixture-scale data
    exercises the same code path a 100 TB hot key does."""
    from pyspark.sql import functions as F

    from lakehouse_adventureworks2022_spark.operators import skew

    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
    ]
    saved = {k: spark.conf.get(k, None) for k in keys}
    try:
        # force sort-merge (no broadcast escape hatch) and shrink the
        # skew thresholds so the fixture-sized hot key trips them
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "64KB",
        )
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB"
        )

        fact = (
            spark.range(300_000)
            .selectExpr("CAST(0 AS LONG) AS k", "id AS v")
            .unionAll(
                spark.range(60_000).selectExpr("(id % 50) + 1 AS k", "id AS v")
            )
        )
        dim = spark.range(51).selectExpr("id AS k", "concat('d', id) AS name")

        # NOTE: aggregate on a NON-join key. When the downstream agg
        # reuses the join key's hash partitioning (groupBy("k")), AQE
        # refuses to split the skewed partition — the split would break
        # the co-partitioning the agg depends on. That shape needs the
        # plan-level salted path below; this is exactly why both exist.
        joined = (
            fact.join(dim, "k")
            .groupBy("name")
            .agg(F.sum("v").alias("sv"), F.count(F.lit(1)).alias("c"))
        )
        aqe_rows = sorted(tuple(r) for r in joined.collect())
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, (
            "AQE did not mark the hot-key sort-merge join as skewed:\n"
            + plan
        )

        # plan-level salted path (the shape AQE cannot cover: downstream
        # work keyed on the hot join key itself) must agree exactly
        salted = (
            skew.replicated_skew_join(fact, dim, "k", "k", n_salts=8)
            .groupBy("name")
            .agg(F.sum("v").alias("sv"), F.count(F.lit(1)).alias("c"))
        )
        assert sorted(tuple(r) for r in salted.collect()) == aqe_rows
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
