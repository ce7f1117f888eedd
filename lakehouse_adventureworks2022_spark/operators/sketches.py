"""Mergeable distinct-count sketches (Apache DataSketches HLL, built
into Spark ≥3.5): the incremental form of the marts' COUNT(DISTINCT).

Why this matters at 100 TB: an exact distinct count cannot be rolled up
from pre-aggregates (distinct is not summable), so every mart refresh
re-scans history. A per-partition HLL **sketch column is mergeable** —
store one sketch per (day, group), then any rollup (week, month, all
time, any group subset) is ``hll_union_agg`` over the stored sketches:
the daily job reads ONLY its day, the rollup reads only kilobyte
sketches. Error ~2% at the default lgk=12, tested against exact counts.

This is the proper scale path behind ``top_products_approx``'s
query-time ``approx_count_distinct`` — same estimator family, but
persisted and incrementally maintainable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_sketches(
    df: DataFrame, keys: list[str], value_col: str, lgk: int = 12
) -> DataFrame:
    """One HLL sketch of ``value_col`` per key group (binary column —
    write it to the mart like any other column)."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias("distinct_sketch"),
        F.count(F.lit(1)).alias("row_count"),
    )


def merge_distinct(
    sketches: DataFrame, keys: list[str] | None = None
) -> DataFrame:
    """Roll stored sketches up to ``keys`` (None ⇒ grand total):
    union-merge then estimate — never re-reads the base table."""
    agg = [
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col("distinct_sketch"))
        ).alias("distinct_estimate"),
        F.sum("row_count").alias("row_count"),
    ]
    if keys:
        return sketches.groupBy(*keys).agg(*agg)
    return sketches.agg(*agg)


# ---- count-min sketch (mergeable frequency estimates) ----------------

def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 5,
    width: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-min sketch of ``key_col`` frequencies as a DataFrame of
    ``(row, bucket, count)`` — ``depth`` independent hash rows × a
    ``width``-bucket modulus each (hash_i = xxhash64 seeded by the row
    index). The HLL module's companion for the OTHER sketch question:
    "how often does this key occur", incrementally maintainable where
    exact per-key counts can't be pre-aggregated under churn.

    Standard guarantees (Cormode-Muthukrishnan): estimates never
    undercount; overcount ≤ (e/width)·N with probability ≥ 1−e^(−depth)
    per query. Mergeability is the point: sketches of two corpora sum
    cell-wise (:func:`cms_merge`) — store one sketch per day and answer
    any date-range frequency question from kilobyte tables.

    Build is one explode (×depth, map-side) + one uniform-key
    aggregation; the sketch is depth×width rows regardless of corpus
    size. ``weight_col`` supports weighted counting (e.g. token counts).
    """
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    rows = df.select(
        F.col(key_col).alias("__k__"), w.alias("__w__")
    ).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("row"),
                        F.pmod(
                            F.xxhash64(F.lit(d), F.col("__k__")),
                            F.lit(width),
                        ).cast("int").alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("__cell__"),
        "__w__",
    )
    return (
        rows.select("__cell__.row", "__cell__.bucket", "__w__")
        .groupBy("row", "bucket")
        .agg(F.sum("__w__").alias("count"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of same-shape sketches (sketch of the union ==
    merge of the sketches — tested)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("count").alias("count"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 5,
    width: int = 1024,
) -> DataFrame:
    """Frequency estimates for a keys frame: re-derive each key's
    depth cells (same seeded hashes), broadcast-join against the sketch,
    take the MIN across rows — ``(key, estimate)``. ``depth``/``width``
    MUST match the build parameters (the sketch table stores only
    touched cells, so the geometry is the caller's contract — same as
    any CMS implementation's serialized header)."""
    cells = keys.select(F.col(key_col).alias("key")).distinct().select(
        "key",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("row"),
                        F.pmod(
                            F.xxhash64(F.lit(d), F.col("key")), F.lit(width)
                        ).cast("int").alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("__cell__"),
    ).select("key", "__cell__.row", "__cell__.bucket")
    return (
        cells.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .na.fill({"count": 0})
        .groupBy("key")
        .agg(F.min("count").alias("estimate"))
    )


def _mg_map_fn(key_col: str, m: int):
    """Per-partition Misra-Gries pass as a self-contained closure
    (worker portability — the standard decrement-all summary, emitting
    the surviving (value, weight) counters; weight lower-bounds the
    partition-local frequency by at most N_p/(m+1))."""
    from typing import Iterator

    import pandas as pd

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            # dropna, not a per-row `is None` check: nulls in NUMERIC
            # columns reach pandas as float NaN, and NaN != NaN would
            # allocate a fresh counter per null row — flooding the
            # m-bounded summary and leaking NaN rows into persisted
            # state. Vectorized so the hot loop sees no null test.
            for v in pdf[key_col].dropna():
                if v in counters:
                    counters[v] += 1
                elif len(counters) < m:
                    counters[v] = 1
                else:
                    dead = []
                    for c in counters:
                        counters[c] -= 1
                        if counters[c] == 0:
                            dead.append(c)
                    for c in dead:
                        del counters[c]
        if counters:
            yield pd.DataFrame(
                {"value": list(counters.keys()),
                 "weight": list(counters.values())}
            )

    return mg


def mg_summarize(df: DataFrame, key_col: str, m: int) -> DataFrame:
    """Bounded Misra-Gries summary of ``key_col`` as a ``(value,
    weight)`` frame with ≤ m·partitions rows pre-merge, merged by one
    tiny sum-aggregation. Weights lower-bound true frequencies; any
    value with global frequency > N/(m+1) survives. Mergeable (Agarwal
    et al. 2013): summaries of stream pieces combine with
    :func:`mg_merge` into a summary of the whole — the streaming
    frequent-items state (streaming/frequent.py) is exactly that."""
    vtype = dict(df.dtypes)[key_col]
    return (
        df.select(key_col)
        .mapInPandas(
            _mg_map_fn(key_col, m), schema=f"value {vtype}, weight long"
        )
        .groupBy("value")
        .agg(F.sum("weight").alias("weight"))
    )


def mg_merge(*summaries: DataFrame, m: int) -> DataFrame:
    """Merge MG summaries into one of size ≤ m (Agarwal et al.):
    pointwise weight sum over the union of values, then subtract the
    (m+1)-th largest weight from everything and keep the positive
    survivors. The result is a valid MG summary of the concatenated
    streams — per-value error grows by at most N_total/(m+1).

    Driver cost: one bounded collect of m+1 rows (to learn the
    subtrahend); the merge aggregation itself is distributed over
    frames that are ≤ m rows each by contract."""
    from functools import reduce

    unioned = reduce(lambda a, b: a.unionByName(b), summaries)
    summed = unioned.groupBy("value").agg(F.sum("weight").alias("weight"))
    head = summed.orderBy(
        F.desc("weight"), F.asc(F.col("value").cast("string"))
    ).limit(m + 1)
    rows = head.collect()
    sub = rows[m]["weight"] if len(rows) > m else 0
    spark = summed.sparkSession
    kept = [
        (r["value"], int(r["weight"] - sub))
        for r in rows[:m]
        if r["weight"] - sub > 0
    ]
    schema_vtype = dict(summed.dtypes)["value"]
    if not kept:
        return spark.createDataFrame([], f"value {schema_vtype}, weight long")
    return spark.createDataFrame(kept, f"value {schema_vtype}, weight long")


# ---- heavy hitters (Misra-Gries candidates + exact verify pass) ------

def heavy_hitters(
    df: DataFrame,
    key_col: str,
    k: int = 10,
    candidates_per_partition: int | None = None,
) -> DataFrame:
    """Exact top-``k`` most frequent values of ``key_col`` — WITHOUT a
    full-cardinality shuffle. Output: ``(value, freq)``, frequency
    descending, ties broken on the value string.

    Two passes, both bounded:

    1. *Candidates* — per partition, a Misra-Gries summary of size
       ``m = candidates_per_partition`` (default ``4k``): any value
       with GLOBAL frequency > N/m must survive in at least one
       partition's summary (MG's guarantee is per-stream; a value
       frequent overall is at least N_p/m-frequent in some partition),
       so the true top-k is contained in the union whenever the k-th
       frequency clears that bound. One Arrow pass, ``≤ m`` rows out
       per partition — the shuffle that follows moves candidate
       summaries, not the corpus.
    2. *Verify* — the union of candidates (≤ m × partitions values,
       deduplicated and broadcast) semi-joins the corpus and the
       survivors are counted EXACTLY in one aggregation whose key
       space is the candidate set, not the full value domain.

    Versus a plain ``groupBy(key).count()`` + top-k: that shuffles one
    row per DISTINCT value — fine at 10⁶ distinct values, a full-corpus
    shuffle at 10¹¹ (per-URL keys at 100 TB). Here the exchange carries
    only bounded summaries plus the exact counts of ≤ m·P candidates.

    Exactness caveat (stated, tested): if the key distribution is so
    flat that the k-th frequency is below N/m, rank order near the cut
    may be wrong — raise ``candidates_per_partition``. The fixture
    differentials run against DuckDB's exact top-k.
    """
    from typing import Iterator

    import pandas as pd

    m = candidates_per_partition or max(4 * k, 64)
    candidates = mg_summarize(df, key_col, m).select(
        F.col("value").alias(key_col)
    )
    return (
        df.join(F.broadcast(candidates), key_col, "left_semi")
        .groupBy(F.col(key_col).alias("value"))
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc(F.col("value").cast("string")))
        .limit(k)
    )


# ---- KLL quantile sketch (mergeable rank/quantile estimates) ---------
#
# Completes the mergeable-sketch family: HLL answers "how many
# distinct", CMS "how often", Misra-Gries "which are frequent" — KLL
# answers "what is the p-th percentile" from kilobyte state. Spark's own
# approx_percentile t-digest cannot be persisted or merged across runs,
# so any rollup re-scans the base table; a stored KLL sketch per
# (day, group) rolls up to any date range or group subset by merging
# sketches only. Karnin-Lang-Liberty (FOCS 2016) compactor hierarchy
# with a deterministic alternating compaction coin (reproducible given
# the same partition layout; rank-error bounds hold empirically at the
# 1/k scale and are pinned by tests across distributions).


def _build_kll_ops():
    """By-value factory for the KLL primitives (worker portability:
    the mapInPandas/applyInPandas closures capture these closures, and
    cloudpickle ships non-importable qualnames by value)."""
    C = 2.0 / 3.0  # level-capacity decay (KLL paper's c)

    def new(k: int) -> dict:
        return {"k": k, "n": 0, "levels": [[]], "min": None, "max": None}

    def _caps(k: int, top: int) -> list:
        return [max(int(k * (C ** (top - h))), 8) for h in range(top + 1)]

    def _compress(sk: dict) -> None:
        while True:
            caps = _caps(sk["k"], len(sk["levels"]) - 1)
            for h in range(len(sk["levels"])):
                lvl = sk["levels"][h]
                if len(lvl) > caps[h] and len(lvl) >= 2:
                    lvl.sort()
                    m = len(lvl) - (len(lvl) % 2)
                    off = (sk["n"] + h) & 1  # deterministic coin
                    if h + 1 == len(sk["levels"]):
                        sk["levels"].append([])
                    sk["levels"][h + 1].extend(lvl[off:m:2])
                    sk["levels"][h] = lvl[m:]  # odd leftover stays
                    break
            else:
                return

    def update(sk: dict, values) -> None:
        vals = [float(v) for v in values]
        if not vals:
            return
        lo, hi = min(vals), max(vals)
        sk["min"] = lo if sk["min"] is None else min(sk["min"], lo)
        sk["max"] = hi if sk["max"] is None else max(sk["max"], hi)
        sk["n"] += len(vals)
        sk["levels"][0].extend(vals)
        _compress(sk)

    def merge(a: dict, b: dict) -> dict:
        while len(a["levels"]) < len(b["levels"]):
            a["levels"].append([])
        for h, lvl in enumerate(b["levels"]):
            a["levels"][h].extend(lvl)
        a["n"] += b["n"]
        for side, pick in (("min", min), ("max", max)):
            if b[side] is not None:
                a[side] = b[side] if a[side] is None else pick(a[side], b[side])
        _compress(a)
        return a

    def quantile(sk: dict, q: float) -> float:
        if sk["n"] == 0:
            return float("nan")
        if q <= 0.0:
            return sk["min"]
        if q >= 1.0:
            return sk["max"]
        items = []
        for h, lvl in enumerate(sk["levels"]):
            w = 1 << h
            items.extend((v, w) for v in lvl)
        items.sort()
        target = q * sk["n"]
        cum = 0
        for v, w in items:
            cum += w
            if cum >= target:
                return v
        return sk["max"]

    return {"new": new, "update": update, "merge": merge, "quantile": quantile}


def _kll_struct(sk: dict) -> dict:
    return {
        "n": sk["n"],
        "min_v": sk["min"],
        "max_v": sk["max"],
        "levels": [list(lvl) for lvl in sk["levels"]],
    }


def _kll_partial_fn(keys: list, value_col: str, k: int):
    """Per-partition KLL pass: one bounded sketch per key group seen in
    the partition (self-contained closure)."""
    ops = _build_kll_ops()

    def fn(batches):
        import pandas as pd

        sketches: dict = {}
        for pdf in batches:
            vals = pd.to_numeric(pdf[value_col], errors="coerce")
            ok = vals.notna()
            if not ok.any():
                continue
            sub = pdf.loc[ok, keys] if keys else None
            vv = vals[ok]
            if keys:
                for ktup, idx in vv.groupby(
                    [sub[c] for c in keys], sort=False
                ).groups.items():
                    kt = ktup if isinstance(ktup, tuple) else (ktup,)
                    sk = sketches.get(kt)
                    if sk is None:
                        sk = sketches[kt] = ops["new"](k)
                    ops["update"](sk, vv.loc[idx].tolist())
            else:
                sk = sketches.get(())
                if sk is None:
                    sk = sketches[()] = ops["new"](k)
                ops["update"](sk, vv.tolist())
        rows = []
        for kt, sk in sketches.items():
            row = dict(zip(keys, kt))
            row.update(
                n=sk["n"],
                min_v=sk["min"],
                max_v=sk["max"],
                levels=[list(lvl) for lvl in sk["levels"]],
            )
            rows.append(row)
        if rows:
            yield pd.DataFrame(rows)

    return fn


def _kll_merge_fn(keys: list, k: int):
    """Per-group merge of partial/stored sketches (applyInPandas)."""
    ops = _build_kll_ops()

    def fn(pdf):
        import pandas as pd

        sk = ops["new"](k)
        for row in pdf.itertuples(index=False):
            b = {
                "k": k,
                "n": int(row.n),
                "min": row.min_v,
                "max": row.max_v,
                "levels": [list(lvl) for lvl in row.levels],
            }
            ops["merge"](sk, b)
        out = {c: [pdf[c].iloc[0]] for c in keys}
        out.update(
            n=[sk["n"]],
            min_v=[sk["min"]],
            max_v=[sk["max"]],
            levels=[[list(lvl) for lvl in sk["levels"]]],
        )
        return pd.DataFrame(out)

    return fn


def _kll_schema(df: DataFrame, keys: list) -> str:
    key_part = "".join(
        f"{f.name} {f.dataType.simpleString()}, "
        for f in df.schema.fields
        if f.name in keys
    )
    return (
        key_part + "n long, min_v double, max_v double, "
        "levels array<array<double>>"
    )


def kll_sketches(
    df: DataFrame, keys: list, value_col: str, k: int = 200
) -> DataFrame:
    """One KLL quantile sketch of ``value_col`` per key group (empty
    ``keys`` ⇒ one global sketch). Two bounded phases: a per-partition
    Arrow pass emitting ≤ one partial sketch per (partition, group) —
    the shuffle then carries kilobyte sketches, never values — and a
    per-group merge. The result is a plain DataFrame (arrays + scalars):
    write it to parquet like any table and roll it up later with
    :func:`kll_merge` — no base-table re-scan, the same contract as
    :func:`distinct_sketches`/:func:`cms_build`."""
    partials = df.select(*(keys + [value_col])).mapInPandas(
        _kll_partial_fn(keys, value_col, k), schema=_kll_schema(df, keys)
    )
    return kll_merge(partials, keys=keys, k=k)


def kll_merge(*sketches: DataFrame, keys: list, k: int = 200) -> DataFrame:
    """Merge sketch frames (e.g. per-day tables) into one sketch per
    key group — mergeability is the point: sketch(A ∪ B) and
    merge(sketch(A), sketch(B)) carry the same guarantees."""
    from functools import reduce

    unioned = reduce(lambda a, b: a.unionByName(b), sketches)
    schema = _kll_schema(unioned, keys)
    if keys:
        return unioned.groupBy(*keys).applyInPandas(
            _kll_merge_fn(keys, k), schema=schema
        )
    return unioned.groupBy(F.lit(1).alias("__g__")).applyInPandas(
        _kll_merge_fn([], k), schema=schema
    )


def kll_quantiles(
    sketches: DataFrame, qs: list, keys: list
) -> DataFrame:
    """Quantile estimates from stored sketches, long form:
    ``(keys..., q, value, n)`` — one Arrow projection over kilobyte
    sketch rows, no shuffle."""
    ops = _build_kll_ops()
    qlist = [float(q) for q in qs]

    def fn(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                sk = {
                    "k": 0,
                    "n": int(row.n),
                    "min": row.min_v,
                    "max": row.max_v,
                    "levels": [list(lvl) for lvl in row.levels],
                }
                for q in qlist:
                    out = {c: getattr(row, c) for c in keys}
                    out.update(q=q, value=ops["quantile"](sk, q), n=sk["n"])
                    rows.append(out)
            if rows:
                yield pd.DataFrame(rows)

    key_part = "".join(
        f"{f.name} {f.dataType.simpleString()}, "
        for f in sketches.schema.fields
        if f.name in keys
    )
    return sketches.mapInPandas(
        fn, schema=key_part + "q double, value double, n long"
    )
