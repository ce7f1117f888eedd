"""Skew mitigation primitives (SURVEY.md §7 hard part 5 — "AQE skew
handling on the fact joins"; AQE covers sort-merge joins at runtime, but
two shapes need *plan-level* salting, supplied here):

- :func:`salted_aggregate` — hot grouping keys (one key ≫ one executor's
  share) overflow a single reducer even with AQE, because a hash
  aggregation cannot split one key. Salting splits each key into
  ``n_salts`` sub-keys aggregated in parallel, then merges the partials
  with a second (tiny) aggregation.
- :func:`replicated_skew_join` — a broadcast-sized dimension with a few
  hot fact keys: the dim is replicated ``n_salts`` times (explode —
  bounded, dim-sized × n_salts) while each fact row picks ONE
  deterministic salt, so hot fact keys spread across ``n_salts`` reducers
  and no row is lost or duplicated.

Both are pure DataFrame compositions (no UDFs) and semantically
transparent — tested equal to their unsalted forms.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _row_salt(
    df: DataFrame, n_salts: int, salt_on: str | None, key_cols: tuple[str, ...]
) -> Column:
    """Deterministic per-row salt in [0, n_salts).

    Defaults to a whole-row ``xxhash64`` so identical join/grouping keys
    still spread (a salt derived from the key itself would send every row
    of a hot key to ONE reducer — a silent no-op). An explicit ``salt_on``
    column is accepted but rejected when it IS the key: that defeats the
    mitigation by construction.

    Limitation: rows that are fully identical across ALL columns hash to
    the same salt and still land on one reducer. That's deliberate — a
    row-varying source (``monotonically_increasing_id``,
    ``spark_partition_id``) would spread them but is partitioning-
    dependent, breaking re-run determinism of the salted aggregate.
    Fully-duplicate hot rows are collapse-with-a-count material
    (pre-aggregate ``groupBy(*).count()``) before they are a salting
    problem.
    """
    if salt_on is None:
        return F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)).cast("int")
    if salt_on in key_cols:
        raise ValueError(
            f"salt_on={salt_on!r} is a grouping/join key: identical keys "
            "would all get one salt and never spread; pass a row-varying "
            "column or leave salt_on=None for a whole-row hash"
        )
    return F.pmod(F.hash(F.col(salt_on)), F.lit(n_salts)).cast("int")


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    sums: list[str],
    n_salts: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """Two-stage salted sum/count aggregation, identical results to
    ``df.groupBy(keys).agg(sum(c)..., count(*))``.

    Stage 1 groups by (keys, salt) — a hot key fans out over ``n_salts``
    reducers; stage 2 merges the ≤ ``n_salts × |keys-space|`` partials.
    ``salt_on`` optionally names a row-varying column; the default is a
    whole-row hash, which spreads hot keys even when every measure value
    is constant.
    """
    salt_col = _row_salt(df, n_salts, salt_on, tuple(keys))
    stage1 = (
        df.withColumn("_salt", salt_col)
        .groupBy(*keys, "_salt")
        .agg(
            *[F.sum(c).alias(f"_s_{c}") for c in sums],
            F.count(F.lit(1)).alias("_s_cnt"),
        )
    )
    return stage1.groupBy(*keys).agg(
        *[F.sum(f"_s_{c}").alias(f"sum_{c}") for c in sums],
        F.sum("_s_cnt").alias("row_count"),
    )


def replicated_skew_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salts: int = 16,
    salt_on: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where hot ``fact_key`` values would overload single
    reducers: the dim side is replicated once per salt, the fact side
    picks one deterministic salt per row, and the join key becomes
    (key, salt).

    Result is row-identical to ``fact.join(dim, fact[fact_key] ==
    dim[dim_key], how)`` for ``inner`` and ``left`` joins (each fact row
    still matches exactly the same dim rows — dim replication only routes
    the match to one of ``n_salts`` reducers).
    """
    if how not in ("inner", "left"):
        raise ValueError("replicated_skew_join supports inner/left joins")
    salted_fact = fact.withColumn(
        "_salt", _row_salt(fact, n_salts, salt_on, (fact_key,))
    )
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_fact.join(
        salted_dim,
        (salted_fact[fact_key] == salted_dim[dim_key])
        & (salted_fact["_salt"] == salted_dim["_salt"]),
        how,
    )
    return out.drop(salted_fact["_salt"]).drop(salted_dim["_salt"])
