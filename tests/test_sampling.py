"""Deterministic sampling family (operators/sampling.py) vs DuckDB —
same row/schema/hash comparison the driver applies — plus the
determinism/scale properties random sampling can't offer. Also hosts
the dim_supplier_geo differential (rotated past the driver window in
r5 to make room for temperature_mixture)."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from lakehouse_adventureworks2022_spark.operators import sampling
from lakehouse_adventureworks2022_spark.plans import text_queries
from lakehouse_adventureworks2022_spark.plans.catalog import ORACLES, QUERIES
from lakehouse_adventureworks2022_spark.sources.readers import read_table
from tools.check_oracles import TABLES, canonical_hash, normalize_pandas

SF = "/root/testdata/sf0.001"

from lakehouse_adventureworks2022_spark.plans.catalog import (  # noqa: E402
    ORACLE_DIM_SUPPLIER_GEO,
    PYTEST_ORACLES,
)

DIFFERENTIALS = {
    "docs_hash_sample": text_queries.ORACLE_DOCS_HASH_SAMPLE,
    "docs_stratified_sample": text_queries.ORACLE_DOCS_STRATIFIED_SAMPLE,
    "docs_sample_exact_n": text_queries.ORACLE_DOCS_SAMPLE_EXACT_N,
    "temperature_mixture": text_queries.ORACLE_TEMPERATURE_MIXTURE,
    "dim_supplier_geo": ORACLE_DIM_SUPPLIER_GEO,
}


def test_sampling_family_is_swept():
    """Every exact sampling differential is hash-verified in exactly one
    channel — a driver-window oracle OR a rotated/pytest twin, never
    both and never neither (temperature_mixture / dim_supplier_geo
    rotated out in the r10-continuation seventh rotation; the hash
    rigor continues in tests/test_rotated_oracles.py)."""
    for name in DIFFERENTIALS:
        in_driver = name in ORACLES
        in_pytest = name in PYTEST_ORACLES
        assert in_driver != in_pytest, name


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    yield con
    con.close()


def test_temperature_mixture_oracle_registered():
    # rotated out of the driver window in the r10-continuation seventh
    # rotation; the identical hash comparison continues as a rotated
    # twin (exactly one oracle home, asserted family-wide above)
    assert "temperature_mixture" in PYTEST_ORACLES


@pytest.mark.parametrize("name", sorted(DIFFERENTIALS))
def test_query_matches_oracle(spark, duck, name):
    spark_pdf = normalize_pandas(QUERIES[name](spark, SF).toPandas())
    duck_pdf = normalize_pandas(duck.sql(DIFFERENTIALS[name]).df())
    assert canonical_hash(spark_pdf) == canonical_hash(duck_pdf)
    assert len(spark_pdf) > 0, f"{name} returned no rows — vacuous check"


def test_hash_sample_is_partition_layout_independent(spark):
    """Membership is a pure function of the key: any repartitioning
    yields the identical sample (the property DataFrame.sample lacks)."""
    docs = read_table(spark, SF, "documents")
    base = {r[0] for r in sampling.hash_sample(docs, 0.2).select("doc_id").collect()}
    shuffled = {
        r[0]
        for r in sampling.hash_sample(docs.repartition(17, "lang"), 0.2)
        .select("doc_id")
        .collect()
    }
    assert base == shuffled and base


def test_hash_sample_rate_one_keeps_everything(spark):
    docs = read_table(spark, SF, "documents")
    assert sampling.hash_sample(docs, 1.0).count() == docs.count()
    assert sampling.hash_sample(docs, 0.0).count() == 0


def test_hash_sample_rate_is_approximately_honored(spark):
    docs = read_table(spark, SF, "documents")
    n = docs.count()
    kept = sampling.hash_sample(docs, 0.5, seed="rate-check").count()
    assert abs(kept / n - 0.5) < 0.15  # 500 Bernoulli draws


def test_seed_rerolls_membership(spark):
    docs = read_table(spark, SF, "documents")
    a = {r[0] for r in sampling.hash_sample(docs, 0.3, seed="a").select("doc_id").collect()}
    b = {r[0] for r in sampling.hash_sample(docs, 0.3, seed="b").select("doc_id").collect()}
    assert a != b


def test_exact_n_contract(spark):
    docs = read_table(spark, SF, "documents")
    s1 = sampling.hash_sample_exact_n(docs, 37)
    ids1 = sorted(r[0] for r in s1.select("doc_id").collect())
    ids2 = sorted(
        r[0]
        for r in sampling.hash_sample_exact_n(docs.repartition(7), 37)
        .select("doc_id")
        .collect()
    )
    assert len(ids1) == 37 and ids1 == ids2
    assert "_sk" not in s1.columns


def test_exact_n_plans_topk_not_global_sort(spark):
    docs = read_table(spark, SF, "documents")
    plan = (
        sampling.hash_sample_exact_n(docs, 10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_hash_sample_plans_zero_shuffle(spark):
    docs = read_table(spark, SF, "documents")
    plan = (
        sampling.hash_sample(docs, 0.1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_temperature_one_is_flat_rate(spark):
    """τ=1 degenerates to natural proportions: every stratum keeps at
    target_frac, i.e. the plain Bernoulli sample with the same seed."""
    docs = read_table(spark, SF, "documents")
    mix = {
        r[0]
        for r in sampling.temperature_mixture_sample(
            docs, temperature=1.0, target_frac=0.3, strata_col="lang", seed="v1"
        )
        .select("doc_id")
        .collect()
    }
    flat = {
        r[0]
        for r in sampling.hash_sample(docs, 0.3, seed="v1").select("doc_id").collect()
    }
    assert mix == flat


def test_temperature_flattening_upsamples_small_strata(spark):
    """τ<1 keeps a HIGHER fraction of small strata than of large ones."""
    docs = read_table(spark, SF, "documents")
    n_by = {r[0]: r[1] for r in docs.groupBy("lang").count().collect()}
    small = min(n_by, key=n_by.get)
    large = max(n_by, key=n_by.get)
    kept = {
        r[0]: r[1]
        for r in sampling.temperature_mixture_sample(
            docs, temperature=0.3, target_frac=0.4, strata_col="lang", seed="flat"
        )
        .groupBy("lang")
        .count()
        .collect()
    }
    frac_small = kept.get(small, 0) / n_by[small]
    frac_large = kept.get(large, 0) / n_by[large]
    assert frac_small > frac_large


def test_stratified_unlisted_strata_use_default_rate(spark):
    docs = read_table(spark, SF, "documents")
    out = sampling.hash_sample_stratified(
        docs, rates={"en": 1.0}, strata_col="lang", default_rate=0.0
    )
    langs = {r[0] for r in out.select("lang").distinct().collect()}
    assert langs == {"en"}
    assert out.count() == docs.filter(F.col("lang") == "en").count()


def test_materialize_mixture_epoch_semantics(spark):
    from lakehouse_adventureworks2022_spark.operators.sampling import (
        materialize_mixture,
    )

    docs = spark.createDataFrame(
        [(i, ["a", "b", "c", "d"][i % 4]) for i in range(80)],
        "doc_id long, source string",
    )
    out = materialize_mixture(
        docs, {"a": 2.0, "b": 0.5, "c": 0.0, "d": 1.25}
    ).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], {}).setdefault(r["doc_id"], []).append(
            r["copy_idx"]
        )
    # whole epochs: every 'a' doc exactly twice, copy_idx 0 and 1
    assert all(sorted(v) == [0, 1] for v in by_src["a"].values())
    assert len(by_src["a"]) == 20
    # 0.0 epochs and ABSENT sources are dropped
    assert "c" not in by_src
    # fractional: 'b' docs appear 0 or 1 times; 'd' docs 1 or 2 times
    assert all(v == [0] for v in by_src["b"].values())
    assert 0 < len(by_src["b"]) < 20
    assert all(sorted(v) in ([0], [0, 1]) for v in by_src["d"].values())
    assert any(len(v) == 2 for v in by_src["d"].values())
    # deterministic across physical layout
    again = materialize_mixture(
        docs.repartition(7), {"a": 2.0, "b": 0.5, "c": 0.0, "d": 1.25}
    ).collect()
    assert {(r["doc_id"], r["copy_idx"]) for r in again} == {
        (r["doc_id"], r["copy_idx"]) for r in out
    }
    with pytest.raises(ValueError, match=">= 0"):
        materialize_mixture(docs, {"a": -1.0})
    # empty epochs is a clear error, not an AttributeError deep inside
    with pytest.raises(ValueError, match="non-empty"):
        materialize_mixture(docs, {})
