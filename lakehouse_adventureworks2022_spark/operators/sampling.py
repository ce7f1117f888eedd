"""Deterministic corpus sampling: hash-threshold Bernoulli, static
stratified rates, exact-N, and temperature-weighted mixture sampling.

Training-data pipelines need samples that are *reproducible and
re-derivable* — a doc's membership must be a pure function of its key,
stable across runs, cluster sizes, and partition layouts. Spark's
``DataFrame.sample``/``sampleBy`` are seed-deterministic only for a
fixed partitioning, which a 100 TB pipeline cannot promise (AQE
re-coalesces; compaction changes file splits). Every operator here
instead derives membership from ``md5(key || ':' || seed)``:

- membership is portable SQL (the DuckDB oracle runs the SAME
  predicate — these are oracle-exact, unlike rand()-based sampling);
- changing ``seed`` re-rolls the whole sample (datasets version
  explicitly, the same policy as ``curation.split_by_hash``);
- the keep predicate is a zero-shuffle projection filter: it pushes
  into the scan stage and composes with partition pruning.

The hex-prefix comparison trick: the first 4 hex chars of the digest
are a uniform draw from [0, 65536); ``substr(md5, 1, 4) <
lpad(hex(floor(rate*65536)), 4, '0')`` keeps ≈``rate`` of rows using
plain ASCII string comparison — identical semantics in any engine with
``md5`` (Spark, DuckDB, Trino, BigQuery), no hex→int conversion needed.

Reference parity: the reference has no sampling surface at all (its
extract loop copies whole tables — ``extract_load_template.py``);
this family is part of the beyond-reference training-data tier, next
to ``curation.split_by_hash`` (same determinism policy, different
output contract: splits partition the corpus, samples subset it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: width of the hex prefix used as the uniform draw: 4 chars = 16 bits.
_PREFIX_BITS = 16
_PREFIX_CHARS = _PREFIX_BITS // 4
_BUCKETS = 1 << _PREFIX_BITS


def _hash_prefix(key_col: str, seed: str) -> Column:
    """Lowercase 4-hex-char uniform draw from (key, seed)."""
    return F.substring(
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit(f":{seed}"))),
        1,
        _PREFIX_CHARS,
    )


def _threshold_lit(rate: float) -> str:
    """Static hex threshold: keep iff prefix < this (≈``rate`` of rows).

    ``rate >= 1`` maps to ``'g'`` — ASCII-greater than every hex prefix,
    the keep-everything threshold (a 5-char numeric threshold like
    ``'10000'`` would compare WRONG against 4-char prefixes: string
    comparison is lexicographic, not numeric)."""
    buckets = max(0, min(_BUCKETS, int(rate * _BUCKETS)))
    if buckets >= _BUCKETS:
        return "g"
    return format(buckets, f"0{_PREFIX_CHARS}x")


def hash_sample(
    df: DataFrame,
    rate: float,
    key_col: str = "doc_id",
    seed: str = "v1",
) -> DataFrame:
    """Bernoulli(``rate``) sample, membership a pure function of the key.

    One filter on a projected md5 — pushes to the scan stage, zero
    shuffle, no rand() (so retries/speculative tasks agree)."""
    return df.filter(_hash_prefix(key_col, seed) < F.lit(_threshold_lit(rate)))


def hash_sample_stratified(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    seed: str = "v1",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum Bernoulli rates (e.g. upsample low-resource
    languages): ``rates`` maps stratum value → keep rate; strata not
    listed keep at ``default_rate``.

    Thresholds are compiled to a CASE WHEN over literal hex strings —
    still a zero-shuffle scan filter, no join against a rates table
    (the rates dict is plan-time configuration, like a mixture spec)."""
    thr = None
    for value, rate in rates.items():
        lit = F.lit(_threshold_lit(rate))
        thr = (
            F.when(F.col(strata_col) == value, lit)
            if thr is None
            else thr.when(F.col(strata_col) == value, lit)
        )
    thr = (
        F.lit(_threshold_lit(default_rate))
        if thr is None
        else thr.otherwise(F.lit(_threshold_lit(default_rate)))
    )
    return df.filter(_hash_prefix(key_col, seed) < thr)


def hash_sample_exact_n(
    df: DataFrame,
    n: int,
    key_col: str = "doc_id",
    seed: str = "v1",
) -> DataFrame:
    """Exactly-``n`` uniform sample without replacement: the ``n``
    smallest digests. Deterministic given (keys, seed); collision
    probability over the full 32-char digest is negligible, and the
    key itself tiebreaks so even a collision stays deterministic.

    Compiles to TakeOrderedAndProject (per-partition top-n partials +
    one driver merge of n rows) — NOT a global sort; the 100 TB cost is
    one scan + n·partitions small rows."""
    full = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(f":{seed}")))
    return (
        df.withColumn("_sk", full)
        .orderBy(F.col("_sk").asc(), F.col(key_col).asc())
        .limit(n)
        .drop("_sk")
    )


def temperature_mixture_sample(
    df: DataFrame,
    temperature: float = 0.7,
    target_frac: float = 0.3,
    strata_col: str = "lang",
    key_col: str = "doc_id",
    seed: str = "v1",
) -> DataFrame:
    """Temperature-weighted mixture sampling (the multi-source
    reweighting used in multilingual / multi-corpus training recipes):
    stratum ``s`` with ``n_s`` rows gets mixture weight ``w_s ∝ n_s^τ``;
    the sample targets ``target_frac·N`` total rows allocated as
    ``t_s = target_frac·N·w_s``, i.e. per-stratum keep rate
    ``min(1, t_s/n_s)``. τ=1 reproduces natural proportions (every rate
    = target_frac); τ<1 flattens the distribution toward uniform,
    upsampling small strata relative to large ones; τ=0 is equal-count.

    Unlike the static-rate form, rates here DERIVE from the data, so
    they are computed in-plan: one groupBy on the stratum yields the
    counts table (|strata| rows), the normalizer ``Z = Σ n_s^τ`` is a
    1-row aggregate of that table, and the per-stratum threshold joins
    back broadcast. Total cost: one partial-aggregated count scan + one
    broadcast hash join + the scan filter — no window sort, no
    per-stratum shuffle of the data itself; identical at 20 strata or
    20 million rows per stratum.

    Membership stays a pure function of (key, seed, corpus counts) —
    the DuckDB oracle reproduces it with a two-CTE query, so this is
    oracle-exact even though the rates are data-dependent (double
    arithmetic on the bounded counts table is deterministic in both
    engines)."""
    from pyspark.sql import Window

    counts = df.groupBy(F.col(strata_col).alias("_stratum")).agg(
        F.count("*").alias("_n")
    )
    # normalizer Z = Σ n_s^τ and the grand total as GLOBAL window
    # aggregates over the |strata|-row counts frame (the funnel's `base`
    # convention): a single-partition window over a bounded frame, so no
    # join at all — the literal-key/crossJoin forms both constant-fold
    # to a BroadcastNestedLoopJoin, which would break the plan audit's
    # "no nested loop/cartesian anywhere" invariant
    _all = Window.partitionBy()
    rates = counts.select(
        "_stratum",
        "_n",
        F.sum(F.pow(F.col("_n").cast("double"), F.lit(temperature)))
        .over(_all)
        .alias("_z"),
        F.sum("_n").over(_all).alias("_total"),
    ).select(
        "_stratum",
        F.least(
            F.lit(1.0),
            (
                F.lit(target_frac)
                * F.col("_total")
                * (F.pow(F.col("_n").cast("double"), F.lit(temperature)) / F.col("_z"))
                / F.col("_n")
            ),
        ).alias("_rate"),
    )
    buckets = F.floor(F.col("_rate") * F.lit(float(_BUCKETS)))
    # rate==1.0 overflows the 4-char prefix space: 'g' > 'ffff' in ASCII,
    # so it is the keep-everything threshold (mirrored in the oracle SQL)
    thr = F.when(buckets >= _BUCKETS, F.lit("g")).otherwise(
        F.lpad(F.lower(F.hex(buckets)), _PREFIX_CHARS, "0")
    )
    return (
        df.join(
            F.broadcast(rates.withColumn("_thr", thr).select("_stratum", "_thr")),
            df[strata_col] == F.col("_stratum"),
        )
        .filter(_hash_prefix(key_col, seed) < F.col("_thr"))
        .drop("_stratum", "_thr")
    )


def hash_sample_cap_per_stratum(
    df: DataFrame,
    n_per_stratum: int,
    strata_col: str = "source",
    key_col: str = "doc_id",
    seed: str = "v1",
) -> DataFrame:
    """Cap every stratum at EXACTLY ``n_per_stratum`` uniformly-chosen
    rows (fewer if the stratum is smaller) — the balanced-source cap a
    mixture pipeline applies before training ("no source contributes
    more than N docs"), the per-group twin of
    :func:`hash_sample_exact_n`.

    Membership is a pure function of (stratum, key, seed): rank by full
    md5 digest within the stratum (key tiebreak), keep rank ≤ n. One
    hash shuffle on the stratum key + a per-partition sort; the window
    never sees more than a stratum per partition. At heavy per-stratum
    skew the same cap can run as rank-over-``max_by``-free top-n per
    key via repartition+sortWithinPartitions — this form is the
    declarative default Catalyst handles with WindowGroupLimit pushdown
    (rank filter ≤ n prunes before the full sort materializes)."""
    from pyspark.sql import Window

    full = F.md5(
        F.concat(F.col(key_col).cast("string"), F.lit(f":{seed}"))
    )
    w = (
        Window.partitionBy(strata_col)
        .orderBy(F.col("_sk").asc(), F.col(key_col).asc())
    )
    return (
        df.withColumn("_sk", full)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_stratum)
        .drop("_sk", "_rk")
    )


def materialize_mixture(
    df: DataFrame,
    epochs: dict[str, float],
    source_col: str = "source",
    key_col: str = "doc_id",
    seed: str = "epochs-v1",
) -> DataFrame:
    """Weighted-epochs mixture materialization (r8) — the DoReMi-style
    step AFTER mixture weights are chosen: source ``s`` with weight
    ``e_s`` epochs contributes each of its documents ``floor(e_s)``
    times plus one more with probability ``frac(e_s)`` (a deterministic
    md5 draw on (key, seed) — the module's standard membership
    function, so replays and layout changes can't alter the corpus).
    Sources absent from ``epochs`` are dropped (an explicit 0.0 reads
    better, but absence must not silently mean 1.0). Output = the input
    columns plus ``copy_idx`` (0-based) — downstream shuffling
    interleaves the copies.

    Scale: pure projection + one explode (output is exactly
    Σ n_s·e_s rows in expectation — the explosion IS the product); no
    joins, no shuffles, no state. Exact (swept DuckDB twin generated
    from the same epochs table)."""
    if not epochs:
        raise ValueError("epochs must be non-empty")
    if any(e < 0 for e in epochs.values()):
        raise ValueError("epochs must be >= 0")
    whole = None
    thr = None
    for s, e in epochs.items():
        w = int(e)
        t = _threshold_lit(e - w)
        whole = (
            F.when(F.col(source_col) == s, F.lit(w))
            if whole is None
            else whole.when(F.col(source_col) == s, F.lit(w))
        )
        thr = (
            F.when(F.col(source_col) == s, F.lit(t))
            if thr is None
            else thr.when(F.col(source_col) == s, F.lit(t))
        )
    whole = whole.otherwise(F.lit(None))
    thr = thr.otherwise(F.lit(None))
    extra = F.when(_hash_prefix(key_col, seed) < thr, 1).otherwise(0)
    n_copies = (whole + extra).alias("_n_copies")
    return (
        df.withColumn("_n_copies", n_copies)
        .filter(F.col("_n_copies") >= 1)
        .withColumn(
            "copy_idx",
            F.explode(F.sequence(F.lit(0), F.col("_n_copies") - 1)),
        )
        .drop("_n_copies")
    )
