"""Similarity search over embedding columns (``array<float>``) —
beyond-reference scope (BASELINE.json north star).

Three tiers, same semantics, different scale points:

- :func:`cosine_topk` — declarative brute force: cross join the (small)
  query set against candidates, cosine via ``zip_with`` +
  ``aggregate`` higher-order functions (sequential double fold — verified
  bit-identical to DuckDB's ``list_dot_product``, so the oracle compares
  raw doubles, no rounding). Whole-stage codegen, no Python. The
  cross join broadcasts the query side; ranking is a per-query window.
- :func:`cosine_topk_np` — Arrow-batched ``mapInPandas`` with a numpy
  GEMM per batch: the same brute force ~10-50× faster at large candidate
  counts (BLAS beats codegen'd per-element folds). This is the bench
  path; results are identical modulo float-sum order inside the GEMM, so
  it is rows-only checked.
- :func:`cosine_topk_lsh` — sign-random-projection LSH bucketing: only
  candidates sharing the query's hypersphere bucket are scored. The 100 TB
  path: bucket join instead of cross join. Hyperplanes are derived
  deterministically from md5 bits so re-runs (and the oracle, if ever
  needed) agree. Approximate by design ⇒ rows-only check.

At 1000-executor scale: queries broadcast (they are the small side by
definition); candidates stay partitioned; per-partition top-k via the
window collapses to a final k·|queries| merge — no all-to-all shuffle of
the corpus.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lakehouse_adventureworks2022_spark.sources.readers import read_table


#: Driver-side cap on caller-supplied query batches: every ANN search
#: path broadcasts the query batch through the driver (that is what
#: makes the search one scan), so a corpus-sized frame must fail
#: loudly instead of silently OOMing the driver. 100k × a 64-dim
#: double vector ≈ 50 MB — comfortably driver-sized; raise consciously
#: for bigger batches, or join query batches through the index instead.
QUERY_BATCH_CAP = 100_000


def _collect_query_batch(queries: DataFrame, cap: int = QUERY_BATCH_CAP):
    """Bounded collect of a (vec_id, embedding) query batch — one
    limit(cap+1) job, no extra count pass; mirrors the discipline
    ``ivf_build`` applies to its training sample via ``train_cap``."""
    rows = queries.select("vec_id", "embedding").limit(cap + 1).collect()
    if len(rows) > cap:
        raise ValueError(
            f"query batch exceeds the {cap}-row driver-side cap: ANN "
            f"search collects and broadcasts the query batch, so a "
            f"corpus-sized frame would OOM the driver. Split the batch "
            f"(or pass query_cap= explicitly if the driver has the "
            f"memory)."
        )
    return rows


def _cosine(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    return dot / (na * nb)


def cosine_topk(
    queries: DataFrame, candidates: DataFrame, k: int = 10
) -> DataFrame:
    """Exact brute-force top-k cosine neighbors per query vector.

    Inputs: (vec_id, embedding) frames; query vectors are excluded from
    their own result. Deterministic ordering: cosine desc, cand_id asc.
    """
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    c = candidates.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            _cosine(F.col("qv"), F.col("cv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "rank", "cosine")
    )


def cosine_topk_np(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    query_cap: int = QUERY_BATCH_CAP,
) -> DataFrame:
    """Brute-force top-k via numpy GEMM inside ``mapInPandas``.

    The query matrix is closed over (it is the broadcast-small side);
    each Arrow batch of candidates is scored as one matrix multiply and
    reduced to per-batch top-k, then the per-batch partials collapse
    through the same window as :func:`cosine_topk`. Python touches only
    (k × queries) rows per batch.
    """
    import numpy as np

    qrows = _collect_query_batch(queries, cap=query_cap)
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    qm = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    qm_n = qm / np.linalg.norm(qm, axis=1, keepdims=True)

    out_schema = "query_id long, cand_id long, cosine double"

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cm = np.array(list(pdf["embedding"]), dtype=np.float64)
            if cm.size == 0:
                continue
            cm_n = cm / np.linalg.norm(cm, axis=1, keepdims=True)
            sims = qm_n @ cm_n.T  # |Q| × batch
            cids = pdf["vec_id"].to_numpy()
            # mask self-matches BEFORE top-k, or a query inside its own
            # batch consumes one of its k slots
            sims[qids[:, None] == cids[None, :]] = -np.inf
            top = min(k, sims.shape[1])
            idx = np.argpartition(-sims, top - 1, axis=1)[:, :top]
            rows = {
                "query_id": np.repeat(qids, top),
                "cand_id": cids[idx.ravel()],
                "cosine": np.take_along_axis(sims, idx, axis=1).ravel(),
            }
            yield pd.DataFrame(rows)

    partials = candidates.select("vec_id", "embedding").mapInPandas(
        score, schema=out_schema
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        partials.filter(F.col("cosine") != float("-inf"))  # masked self rows
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "rank", "cosine")
    )


def _srp_plane(t: int, p: int, dim: int) -> list[float]:
    """Deterministic ±1 hyperplane weights from md5 bits (seedless, so
    re-runs, the LSH top-k, and the bucketed near-dup all agree)."""
    import hashlib

    return [
        1.0
        if int(hashlib.md5(f"{t}:{p}:{d}".encode()).hexdigest(), 16) & 1
        else -1.0
        for d in range(dim)
    ]


def _srp_bucket_col(vec, t: int, n_planes: int, dim: int):
    """Bucket id of ``vec`` in hash table ``t``: one sign bit per plane."""
    bits = []
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(w) for w in _srp_plane(t, p, dim)]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda s, x: s + x,
        )
        bits.append(F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def _srp_with_buckets(
    df: DataFrame, vec_col: str, n_planes: int, n_tables: int, dim: int
) -> DataFrame:
    """One (tbl, bkt) row per input row per hash table — the shared
    candidate-generation step of the SRP-LSH family."""
    buckets = F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                _srp_bucket_col(F.col(vec_col), t, n_planes, dim).alias("bkt"),
            )
            for t in range(n_tables)
        ]
    )
    return df.withColumn("tb", F.explode(buckets)).select(
        *df.columns, F.col("tb.tbl").alias("tbl"), F.col("tb.bkt").alias("bkt")
    )


def cosine_topk_lsh(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    n_planes: int = 4,
    n_tables: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: multi-table sign-random-projection LSH.

    L independent hash tables of ``n_planes`` hyperplanes each; a
    candidate is scored iff it shares a (table, bucket) cell with the
    query in ANY table, so P(candidate) = 1-(1-p^n_planes)^L with
    p = 1 - θ/π — ~0.7 for 45° neighbors at the defaults. Hyperplane
    weights are deterministic ±1 from md5 bits (seedless, reproducible).

    Scale shape: candidates shuffle keyed on the uniform (table, bucket)
    id — L small shuffles replace the cross join; the ±1 projections are
    codegen'd column math, no Python. Recall < 1 by design ⇒ rows-only
    correctness check; the recall floor is asserted in tests.
    """
    q = _srp_with_buckets(
        queries.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").cast("array<double>").alias("qv"),
        ),
        "qv",
        n_planes=n_planes,
        n_tables=n_tables,
        dim=dim,
    )
    c = _srp_with_buckets(
        candidates.select(
            F.col("vec_id").alias("cand_id"),
            F.col("embedding").cast("array<double>").alias("cv"),
        ),
        "cv",
        n_planes=n_planes,
        n_tables=n_tables,
        dim=dim,
    )
    pairs = (
        F.broadcast(q)
        .join(c, ["tbl", "bkt"])
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", "qv", "cv")
        .dropDuplicates(["query_id", "cand_id"])
    )
    scored = pairs.select(
        "query_id", "cand_id", _cosine(F.col("qv"), F.col("cv")).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "rank", "cosine")
    )


def _safe_norms_np(m):
    """Row norms with zero-norm rows treated as unit (a zero vector
    would divide to NaN and silently corrupt every assignment)."""
    import numpy as np

    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return n


def ivf_build(
    candidates: DataFrame,
    n_cells: int = 16,
    train_cap: int = 2048,
    _sample_rows: list | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Build a persistable IVF index: ``(centroids, cells)``.

    - *Train* — a deterministic sample of candidates (the ``train_cap``
      lowest ``xxhash64(vec_id)`` values — a seedless pseudo-random draw
      that needs no pre-count, works with sparse/offset ids, and
      compiles to TakeOrderedAndProject: per-partition top-k then one
      driver merge, never a full scan job of its own) is Lloyd-iterated
      into ``n_cells`` spherical centroids. Init is the first
      ``n_cells`` sample vectors in hash order — rebuilds agree
      bit-for-bit.
    - *Assign* — every candidate joins its nearest cell (one
      Arrow-batched argmax per batch, broadcast centroid matrix).

    Both returns are plain DataFrames, so the index PERSISTS like any
    table: write ``cells`` with ``TableManager.write_clustered(...,
    cluster_by='cell')`` (probing then scans only the probed cells'
    files) and ``centroids`` (kilobytes) next to it; reload and search
    without re-training — the build cost amortizes over every query
    batch, which is the point of IVF at 100 TB.
    """
    return _ivf_build_collected(
        candidates, n_cells=n_cells, train_cap=train_cap,
        _sample_rows=_sample_rows,
    )[1:]


def _ivf_build_collected(
    candidates: DataFrame,
    n_cells: int = 16,
    train_cap: int = 2048,
    _sample_rows: list | None = None,
) -> tuple:
    """:func:`ivf_build` plus the centroid MATRIX it just computed
    driver-side — ``(cm, centroids, cells)`` with ``cm`` the
    (n_cells × dim) unit numpy matrix. One-shot search paths hand
    ``cm`` straight to :func:`ivf_search`/SQ8 training, saving the
    collect-back of a frame that was CREATED from driver data one call
    earlier (r14 — the PQ paths got the same treatment; the amortized
    forms still collect, their centroids genuinely live in parquet)."""
    import numpy as np

    # ``_sample_rows``: a pre-collected hash-ordered sample (internal —
    # ivf_build_auto fuses its corpus-count job into one oversized
    # sample collect; the top-k order is total, so any prefix of a
    # longer collect is bit-identical to collecting that prefix)
    if _sample_rows is not None:
        sample = _sample_rows[:train_cap]
    else:
        sample = (
            candidates.select("vec_id", "embedding")
            .orderBy(F.xxhash64("vec_id"), "vec_id")
            .limit(train_cap)
            .collect()
        )
    tm = np.array([r["embedding"] for r in sample], dtype=np.float64)
    tm /= _safe_norms_np(tm)
    cents = tm[: min(n_cells, len(tm))].copy()
    for _ in range(8):  # Lloyd on the unit sphere (cosine k-means)
        assign = np.argmax(tm @ cents.T, axis=1)
        for c in range(len(cents)):
            members = tm[assign == c]
            if len(members):
                m = members.sum(axis=0)
                norm = np.linalg.norm(m)
                if norm > 0:
                    cents[c] = m / norm
    cm = cents  # (n_cells, dim), unit rows
    centroids = candidates.sparkSession.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cm)],
        "cell int, centroid array<double>",
    )
    return cm, centroids, _assign_cells_df(candidates, cm)


def ivf_search(
    queries: DataFrame,
    centroids: DataFrame,
    cells: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    query_cap: int = QUERY_BATCH_CAP,
    centroid_matrix=None,
) -> DataFrame:
    """Probe a built (possibly reloaded) IVF index: each query scores
    only its ``n_probe`` nearest cells via an equi-join on ``cell`` —
    the corpus shuffles once, keyed by cell id (zero times if ``cells``
    was written clustered on ``cell``: file pruning serves the probes).

    The probed cell set is known driver-side (the centroid matrix is
    local), so it is ALSO pushed as a literal ``IN`` filter on the cells
    scan — against a cell-clustered parquet index this prunes whole
    files/row groups via footer min-max stats before any join runs,
    which is the point of persisting the index clustered: a query batch
    probing p of C cells reads ~p/C of the corpus, not all of it.

    ``centroid_matrix``: the (n_cells × dim) numpy matrix from
    :func:`_ivf_build_collected`, skipping the collect-back of a frame
    the caller just created from driver data (one job saved on the
    one-shot paths; reloaded indexes still collect — their centroids
    genuinely live in parquet).
    """
    import numpy as np

    if centroid_matrix is not None:
        cm = centroid_matrix
    else:
        crows = sorted(centroids.collect(), key=lambda r: r["cell"])
        cm = np.array([r["centroid"] for r in crows], dtype=np.float64)

    qrows = _collect_query_batch(queries, cap=query_cap)
    qm = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    qm_n = qm / _safe_norms_np(qm)
    probe_idx = np.argsort(-(qm_n @ cm.T), axis=1)[:, :n_probe]
    probes = queries.sparkSession.createDataFrame(
        [
            (int(r["vec_id"]), [float(x) for x in r["embedding"]], int(c))
            for r, cells_of_q in zip(qrows, probe_idx)
            for c in cells_of_q
        ],
        "query_id long, qv array<double>, cell int",
    )
    probed = sorted({int(c) for row in probe_idx for c in row})

    scored = (
        F.broadcast(probes)
        .join(cells.filter(F.col("cell").isin(probed)), "cell")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            _cosine(F.col("qv"), F.col("embedding").cast("array<double>")).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "rank", "cosine")
    )


def cosine_topk_ivf(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    train_cap: int = 2048,
) -> DataFrame:
    """Approximate top-k: IVF (inverted-file) coarse quantization —
    :func:`ivf_build` + :func:`ivf_search` in one shot (the one-off
    query-time form; long-lived deployments build once, persist the
    cells table clustered on ``cell``, and call ``ivf_search`` per
    batch).

    Scale shape: the centroid matrix is O(n_cells × dim) — kilobytes —
    broadcast inside the closures; the corpus never cross-joins. At
    100 TB raise ``n_cells`` ~ sqrt(corpus) so cells stay
    executor-sized; recall is tunable via ``n_probe``. Approximate by
    design ⇒ rows-only check; the recall floor is asserted in tests.
    """
    cm, centroids, cells = _ivf_build_collected(
        candidates, n_cells=n_cells, train_cap=train_cap
    )
    return ivf_search(
        queries, centroids, cells, k=k, n_probe=n_probe, centroid_matrix=cm
    )


def ivf_build_distributed(
    candidates: DataFrame,
    n_cells: int = 16,
    seed: int = 7,
    max_iter: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """IVF build with DISTRIBUTED training — no driver-side sample at
    all: normalize on the executors (pure Catalyst array expressions),
    train ``pyspark.ml`` KMeans (scalable k-means|| init, Lloyd
    iterations as Spark jobs), then reuse the standard Arrow assignment
    pass.

    Trade vs :func:`ivf_build`: the sampled driver trainer is O(1) on
    the driver and bit-deterministic, but its centroids only see
    ``train_cap`` vectors; this trainer sees the WHOLE corpus (better
    cell balance on skewed distributions) at the cost of cluster jobs
    per Lloyd iteration and partitioning-dependent (seeded, but not
    layout-independent) results. Same (centroids, cells) contract, so
    index persistence and :func:`ivf_search` compose unchanged.

    Training on *normalized* vectors makes Euclidean k-means equivalent
    to spherical (cosine) k-means up to the centroid norm, matching the
    sampled trainer's objective; centroids are re-normalized after.
    """
    import numpy as np

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    norm = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda x: x * x),
            F.lit(0.0),
            lambda s, x: s + x,
        )
    )
    unit = F.transform(
        F.col("embedding").cast("array<double>"),
        lambda x: x / F.when(F.col("__norm__") != 0, F.col("__norm__")).otherwise(
            F.lit(1.0)
        ),
    )
    train = (
        candidates.select("vec_id", "embedding")
        .withColumn("__norm__", norm.cast("double"))
        .select(array_to_vector(unit).alias("features"))
    )
    model = KMeans(k=n_cells, seed=seed, maxIter=max_iter).fit(train)
    cm = np.array([np.asarray(c) for c in model.clusterCenters()], dtype=np.float64)
    cm /= _safe_norms_np(cm)

    # centroid order is model-internal; canonicalize by first vector
    # component so saved indexes are comparable across rebuilds
    order = np.lexsort(cm.T[::-1])
    cm = cm[order]

    centroids = candidates.sparkSession.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cm)],
        "cell int, centroid array<double>",
    )
    cells = _assign_cells_df(candidates, cm)
    return centroids, cells


def _assign_cells_df(candidates: DataFrame, cm) -> DataFrame:
    """Nearest-centroid assignment: one Arrow pass, centroid matrix
    closed over (kilobytes)."""

    def assign_cells(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np

        for pdf in batches:
            em = _np.array(list(pdf["embedding"]), dtype=_np.float64)
            if em.size == 0:
                continue
            norms = _np.linalg.norm(em, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            yield pd.DataFrame(
                {
                    "cand_id": pdf["vec_id"],
                    "embedding": pdf["embedding"],
                    "cell": _np.argmax((em / norms) @ cm.T, axis=1).astype("int32"),
                }
            )

    emb_type = dict(candidates.dtypes)["embedding"]
    return candidates.select("vec_id", "embedding").mapInPandas(
        assign_cells, schema=f"cand_id long, embedding {emb_type}, cell int"
    )


def ivf_build_auto(
    candidates: DataFrame,
    n_cells: int | None = None,
    train_cap: int | None = None,
    min_cells: int = 8,
    max_cells: int = 4096,
    max_train_cap: int = 65536,
    seed: int = 7,
) -> tuple[DataFrame, DataFrame]:
    """Corpus-scaled IVF build — the deployed default (r5 verdict #2):
    derives ``n_cells ≈ √N`` from one count (the FAISS-style rule that
    balances per-query centroid scoring ``O(n_cells)`` against probed
    scan volume ``O(n_probe·N/n_cells)``), clamped to
    ``[min_cells, max_cells]``.

    Trainer choice (revised in r6 after the 10× stress run): with
    ``train_cap=None`` the driver sample AUTO-SCALES to 16 vectors per
    cell (``min(max(2048, 16·n_cells), max_train_cap)``) — 65k samples
    × 64-dim doubles is ~33 MB and eight Lloyd GEMMs over it are
    milliseconds, so the bit-deterministic sampled trainer stays right
    up to ``max_cells`` (this is also how FAISS trains: on a sample,
    never the corpus). Measured: at 69k vectors / 263 cells the
    distributed k-means|| build costs ~9× the sampled one for a modest
    balance gain (SCALE.md §r6) — not a default anyone should pay.

    Routing to :func:`ivf_build_distributed` happens only when the
    (possibly caller-pinned) sample cannot populate the cells
    (``n_cells > train_cap/8``): pass an explicit small ``train_cap``
    to force it, or call the distributed trainer directly for
    full-corpus training."""
    if n_cells is None and train_cap is None:
        # fused count+sample (r13 opt): one hash-ordered top-k collect of
        # max_train_cap+1 rows serves BOTH the corpus count (when the
        # corpus fits under the cap, len(rows) IS N — exactly the
        # fixture/bench regime, where the separate count() job paid a
        # full chunk-explode pass per build) and the training sample
        # (any auto train_cap ≤ max_train_cap is a PREFIX of this
        # collect under the same total order — bit-identical to the
        # unfused build). Oversized corpora still count (their sample
        # truncated the collect), and the auto train_cap formula makes
        # the distributed-trainer routing unreachable here
        # (train_cap//8 ≥ 2·n_cells always), same as before.
        rows = (
            candidates.select("vec_id", "embedding")
            .orderBy(F.xxhash64("vec_id"), "vec_id")
            .limit(max_train_cap + 1)
            .collect()
        )
        n = len(rows) if len(rows) <= max_train_cap else candidates.count()
        n_cells = max(min_cells, min(max_cells, round(n**0.5)))
        train_cap = min(max(2048, 16 * n_cells), max_train_cap)
        # re-check the distributed-trainer routing guard HERE too (r13
        # ADVICE): with the DEFAULT caps 16·max_cells == max_train_cap
        # makes this unreachable, but a caller passing custom
        # max_cells/max_train_cap where 16·max_cells > max_train_cap
        # must route to the distributed trainer exactly like the
        # unfused path below, not silently get the truncated sample
        if n_cells > max(1, train_cap // 8):
            return ivf_build_distributed(candidates, n_cells=n_cells, seed=seed)
        return ivf_build(
            candidates,
            n_cells=n_cells,
            train_cap=train_cap,
            _sample_rows=rows,
        )
    if n_cells is None:
        n = candidates.count()
        n_cells = max(min_cells, min(max_cells, round(n**0.5)))
    if train_cap is None:
        train_cap = min(max(2048, 16 * n_cells), max_train_cap)
    if n_cells <= max(1, train_cap // 8):
        return ivf_build(candidates, n_cells=n_cells, train_cap=train_cap)
    return ivf_build_distributed(candidates, n_cells=n_cells, seed=seed)


def ivf_index_save(
    centroids: DataFrame, cells: DataFrame, index_dir: str, n_files: int = 16
) -> None:
    """Persist a built IVF index: ``cells`` range-clustered on ``cell``
    (each parquet file covers a disjoint cell range, footer min-max
    tight) + the kilobyte ``centroids`` table beside it. Reload with
    :func:`ivf_index_load`; the build cost amortizes over every query
    batch thereafter — the real IVF deployment shape at 100 TB."""
    (
        cells.repartitionByRange(n_files, "cell")
        .sortWithinPartitions("cell")
        .write.mode("overwrite")
        .parquet(f"{index_dir}/cells")
    )
    centroids.coalesce(1).write.mode("overwrite").parquet(f"{index_dir}/centroids")


def ivf_index_append(
    spark,
    new_vectors: DataFrame,
    index_dir: str,
    n_files: int = 4,
    batch_tag: str | None = None,
) -> None:
    """Add a batch of vectors to a persisted IVF index WITHOUT
    retraining: assign them to the existing (frozen) centroids and
    append the new cell rows as additional clustered files.

    This is how IVF grows under daily ingest — centroids stay fixed (so
    existing cell files never rewrite and old results stay stable) and
    only drift-retraining (a rebuild) moves them. Appended files are
    range-clustered among themselves, so footer min-max pruning keeps
    working per file; run a maintenance re-cluster when small appended
    files accumulate (same policy as any clustered table).

    ``batch_tag`` makes the append IDEMPOTENT for at-least-once
    delivery (the streaming ingest path): the batch lands in its own
    overwrite-mode directory ``cells_appends/<tag>``, so a replay of
    the same tag rewrites the same files instead of duplicating rows.
    ``ivf_index_load`` unions the appends area back into the cells
    frame; a crash mid-overwrite leaves at worst a partial ``<tag>``
    dir that the replay's overwrite replaces wholesale.
    """
    import numpy as np

    centroids, _ = ivf_index_load(spark, index_dir)
    crows = sorted(centroids.collect(), key=lambda r: r["cell"])
    cm = np.array([r["centroid"] for r in crows], dtype=np.float64)
    assigned = (
        _assign_cells_df(new_vectors, cm)
        .repartitionByRange(n_files, "cell")
        .sortWithinPartitions("cell")
    )
    if batch_tag is None:
        assigned.write.mode("append").parquet(f"{index_dir}/cells")
    else:
        assigned.write.mode("overwrite").parquet(
            f"{index_dir}/cells_appends/{batch_tag}"
        )


def ivf_index_recluster(spark, index_dir: str, n_files: int = 16) -> None:
    """Maintenance rewrite of a persisted index's cells table: after
    many :func:`ivf_index_append` batches the per-append file sets
    accumulate (each clustered within itself, but probe pruning reads
    one file per probed cell PER APPEND). Rewrite the whole table
    range-clustered once — same OPTIMIZE-style policy as any clustered
    table; centroids are untouched so results cannot change.

    Staged next to the live dir and swapped in (directory rename), so a
    crash mid-rewrite leaves the old cells intact.
    """
    import os
    import shutil

    _, cells = ivf_index_load(spark, index_dir)  # base + appended batches
    staging = f"{index_dir}/_tmp_cells"
    shutil.rmtree(staging, ignore_errors=True)
    (
        cells.repartitionByRange(n_files, "cell")
        .sortWithinPartitions("cell")
        .write.mode("overwrite")
        .parquet(staging)
    )
    old = f"{index_dir}/_old_cells"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(f"{index_dir}/cells", old)
    # the rewrite folded any per-batch append dirs into the base table;
    # retire them WITH the old base (same crash-safety: appends are only
    # removed after the swapped-in table already contains their rows)
    appends = f"{index_dir}/cells_appends"
    if os.path.isdir(appends):
        os.rename(appends, f"{old}_appends")
    os.rename(staging, f"{index_dir}/cells")
    shutil.rmtree(old, ignore_errors=True)
    shutil.rmtree(f"{old}_appends", ignore_errors=True)


def ivf_index_retrain(
    spark,
    index_dir: str,
    n_cells: int = 16,
    train_cap: int = 2048,
    n_files: int = 16,
) -> None:
    """Full re-train of a grown index — the cure
    ``monitoring.ivf_retrain_trigger`` prescribes when drifted appends
    have outrun the frozen centroids: new centroids are Lloyd-trained
    on the CURRENT vector population (base + committed appends), every
    vector re-assigned, and the new tables staged beside the live dir
    then swapped in (the :func:`ivf_index_recluster` crash posture —
    a crash mid-swap leaves a loudly-missing dir, never a silently
    mismatched centroids/cells pair). Deterministic like
    :func:`ivf_build` (hash-ordered train sample, fixed iterations).

    Cost: one build over the grown population — the same price as the
    original build at the new size, paid only when the TV-distance
    trigger fires (drift is rare; recluster handles the routine
    small-file accumulation)."""
    import os
    import shutil

    _, cells = ivf_index_load(spark, index_dir)  # base + appended batches
    centroids, new_cells = ivf_build(
        cells.select(F.col("cand_id").alias("vec_id"), "embedding"),
        n_cells=n_cells,
        train_cap=train_cap,
    )
    staging_cells = f"{index_dir}/_tmp_cells"
    staging_cent = f"{index_dir}/_tmp_centroids"
    shutil.rmtree(staging_cells, ignore_errors=True)
    shutil.rmtree(staging_cent, ignore_errors=True)
    (
        new_cells.repartitionByRange(n_files, "cell")
        .sortWithinPartitions("cell")
        .write.mode("overwrite")
        .parquet(staging_cells)
    )
    centroids.coalesce(1).write.mode("overwrite").parquet(staging_cent)
    old = f"{index_dir}/_old_retrain"
    shutil.rmtree(old, ignore_errors=True)
    os.makedirs(old)
    os.rename(f"{index_dir}/cells", f"{old}/cells")
    os.rename(f"{index_dir}/centroids", f"{old}/centroids")
    appends = f"{index_dir}/cells_appends"
    if os.path.isdir(appends):
        # the rebuilt base contains every appended row — retire the
        # batch dirs WITH the old base (only after the new table holds
        # their rows, same as recluster)
        os.rename(appends, f"{old}/cells_appends")
    os.rename(staging_cells, f"{index_dir}/cells")
    os.rename(staging_cent, f"{index_dir}/centroids")
    shutil.rmtree(old, ignore_errors=True)


def ivf_index_load(spark, index_dir: str) -> tuple[DataFrame, DataFrame]:
    """(centroids, cells) from a saved index — hand straight to
    :func:`ivf_search`. Cells = the base clustered table plus any
    COMMITTED per-batch append dirs (``cells_appends/*`` — see
    :func:`ivf_index_append`'s ``batch_tag``).

    Only batch dirs carrying a ``_SUCCESS`` marker are unioned: a crash
    mid-append leaves partial part-files that must stay INVISIBLE (not
    read, not tripped over as corrupt footers) until the batch replay's
    overwrite lands its own marker — the same "stale state never causes
    wrong results" contract the rest of the index machinery keeps
    (ADVICE r5)."""
    import os

    cells = spark.read.parquet(f"{index_dir}/cells")
    appends = f"{index_dir}/cells_appends"
    if os.path.isdir(appends):
        committed = sorted(
            os.path.join(appends, n)
            for n in os.listdir(appends)
            if not n.startswith((".", "_"))
            and os.path.exists(os.path.join(appends, n, "_SUCCESS"))
        )
        if committed:
            cells = cells.unionByName(spark.read.parquet(*committed))
    return spark.read.parquet(f"{index_dir}/centroids"), cells


def ivf_index_ensure(
    spark,
    candidates: DataFrame,
    index_dir: str,
    n_cells: int = 16,
    train_cap: int = 2048,
) -> tuple[DataFrame, DataFrame]:
    """Load the IVF index at ``index_dir``, building and saving it first
    if absent (build is deterministic — hash-ordered sample + fixed
    Lloyd iterations — so rebuilds agree bit-for-bit). Callers key
    ``index_dir`` to the corpus version; staleness is theirs to manage,
    same as any persisted index."""
    import os

    if not os.path.exists(f"{index_dir}/centroids/_SUCCESS"):
        centroids, cells = ivf_build(candidates, n_cells=n_cells, train_cap=train_cap)
        ivf_index_save(centroids, cells, index_dir)
    return ivf_index_load(spark, index_dir)


def cosine_topk_ivf_amortized(
    queries: DataFrame,
    candidates: DataFrame,
    index_dir: str,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    train_cap: int = 2048,
) -> DataFrame:
    """IVF top-k against a persisted (built-on-first-use) index — the
    amortized form of :func:`cosine_topk_ivf`: steady-state cost is the
    SEARCH alone (probe-pruned clustered scan + one window top-k), with
    the train/assign passes paid once per corpus version instead of per
    query batch."""
    centroids, cells = ivf_index_ensure(
        queries.sparkSession, candidates, index_dir,
        n_cells=n_cells, train_cap=train_cap,
    )
    return ivf_search(queries, centroids, cells, k=k, n_probe=n_probe)


def embedding_near_dup_pairs(
    embeddings: DataFrame, threshold: float = 0.45
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the vector-space member of
    the dedup family): all (a < b) pairs with cosine ≥ threshold.

    This is the EXACT all-pairs definition — the oracle/test reference
    and the recall denominator for the scale path,
    :func:`embedding_near_dup_pairs_lsh` (same predicate over SRP-LSH
    bucket candidates). Quadratic by construction: feed it fixtures or
    verified candidate sets, never a corpus. Cosine is the sequential
    fold — bit-identical to the SQL oracle, compared unrounded.
    """
    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            _cosine(F.col("a.v"), F.col("b.v")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def embedding_near_dup_pairs_lsh(
    embeddings: DataFrame,
    threshold: float = 0.45,
    n_planes: int | None = None,
    n_tables: int | None = None,
    dim: int = 64,
    target_bucket: int = 64,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via SRP-LSH bucket candidates —
    the 100 TB path for :func:`embedding_near_dup_pairs`.

    Candidates are (a < b) pairs sharing ANY (table, bucket) cell — an
    equi-join on the uniform (tbl, bkt) key, L small shuffles instead of
    the quadratic theta join — then the exact cosine predicate verifies
    only candidates. Output ⊆ the exact form with recall
    1-(1-p^n_planes)^n_tables, p = 1-θ/π (the floor is asserted in
    tests). Approximate by design ⇒ rows-only correctness check.

    **Bucket count must GROW with the corpus** (defaults do, from one
    count): candidate volume per table is Σ_bucket |bucket|²/2 ≈
    N²/2^(planes+1), quadratic at fixed planes — a 20k-vector corpus at
    the old fixed 4 planes/16 buckets generates ~100M candidate pairs
    and never finishes. With planes = log2(N/target_bucket) the volume
    is ~n_tables × N × target_bucket/2 — LINEAR in N. More planes lower
    per-table collision probability, so tables scale up alongside
    (recall then concentrates on true duplicates — the decontamination
    regime — while borderline-cosine pairs need more tables: pass
    explicit ``n_planes``/``n_tables`` to trade cost for recall).
    Exact duplicates always collide in every table regardless of plane
    count; run :func:`~..dedup.dedup_exact` first so they don't bloat
    buckets.
    """
    if n_planes is None:
        import math

        n = embeddings.count()
        n_planes = max(4, math.ceil(math.log2(max(n, 1) / target_bucket)) if n > target_bucket else 4)
    if n_tables is None:
        n_tables = 8 + 2 * (n_planes - 4)
    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    b = _srp_with_buckets(e, "v", n_planes=n_planes, n_tables=n_tables, dim=dim)
    # candidate pairs carry ONLY ids through the distinct shuffle (a
    # 16-byte row; dragging both dim-double vectors through it multiplies
    # the shuffle ~60×); vectors re-join by id for the verify stage
    candidates = (
        b.alias("a")
        .join(b.alias("b"), ["tbl", "bkt"])
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
        )
        .distinct()
    )
    return (
        candidates.join(e.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va")), "vec_a")
        .join(e.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb")), "vec_b")
        .select(
            "vec_a", "vec_b", _cosine(F.col("va"), F.col("vb")).alias("cosine")
        )
        .filter(F.col("cosine") >= threshold)
    )


def semdedup(
    embeddings: DataFrame,
    eps: float = 0.05,
    n_cells: int | None = 16,
    train_cap: int = 2048,
    target_cell: int = 256,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space, call two corpus
    members *semantic duplicates* when their cosine ≥ ``1 - eps``
    WITHIN a cluster, and keep one representative per duplicate group.
    Returns the SURVIVING rows of ``embeddings`` (a pruned corpus, the
    third output contract of the dedup family next to pairs
    (:func:`embedding_near_dup_pairs`) and components
    (``dedup.connected_components``)).

    Keep policy (deterministic): a row survives iff no smaller-id
    duplicate exists in its cell — the greedy lowest-id-wins rule, a
    pure function of (corpus, eps, clustering), so reruns agree exactly.

    Scale shape — the reason this beats LSH for the tight-threshold
    regime: pair scoring is CELL-LOCAL. ``n_cells`` grows with the
    corpus (``n_cells=None`` derives it as ``N/target_cell`` from one
    count) so E[|cell|] stays constant, making total pair volume LINEAR
    in N (the paper's trick). The whole plan is the bounded-collect
    k-means train (``train_cap`` rows), one Arrow-batched cell
    assignment, ONE shuffle on the uniform cell key into a per-cell
    ``applyInPandas`` that scores each bounded cell as a single numpy
    GEMM (a ≤target_cell² matrix — microseconds; a per-pair HOF-cosine
    self-join form measured ~10× slower: higher-order functions
    evaluate interpreted, outside codegen), and a broadcast left-anti
    join back. Pairs split across a cell boundary are missed by design
    (recall < 1, like every clustered/LSH candidate generator here) —
    the planted duplicates the method targets sit deep inside cells.
    """
    if n_cells is None:
        n_cells = max(8, -(-embeddings.count() // target_cell))
    _, cells = ivf_build(embeddings, n_cells=n_cells, train_cap=train_cap)
    threshold = 1.0 - eps

    def prune(pdf):
        import numpy as np
        import pandas as pd

        order = pdf["vec_id"].to_numpy().argsort()
        ids = pdf["vec_id"].to_numpy()[order]
        m = np.array(pdf["embedding"].tolist(), dtype=np.float64)[order]
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        m = m / norms[:, None]
        sims = m @ m.T
        # row j dropped iff any smaller-id row i<j has cosine >= 1-eps
        dup = (np.triu(sims, k=1) >= threshold).any(axis=0)
        return pd.DataFrame({"vec_id": ids[dup]})

    dropped = (
        cells.select(
            F.col("cand_id").alias("vec_id"),
            F.col("embedding").cast("array<double>").alias("embedding"),
            "cell",
        )
        .groupBy("cell")
        .applyInPandas(prune, "vec_id long")
    )
    return embeddings.join(dropped, "vec_id", "left_anti")


def embedding_queries(spark, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Standard query/candidate split over the embeddings fixture: every
    100th vector is a query; all vectors are candidates."""
    emb = read_table(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id") % 100 == 0), emb


# ---- product quantization (IVF-PQ-style compressed search) -----------

def pq_train(
    candidates: DataFrame,
    m: int = 16,
    n_codes: int = 32,
    train_cap: int = 2048,
) -> DataFrame:
    """Train PQ codebooks: split each vector into ``m`` equal
    subvectors and k-means each subspace into ``n_codes`` centroids
    (classic product quantization — the memory-compression layer under
    IVF-PQ). Returns a persistable ``(sub, code, centroid)`` frame
    (m × n_codes rows — kilobytes, parquet-able like the IVF centroid
    table).

    Training mirrors :func:`ivf_build`: the ``train_cap`` lowest
    ``xxhash64(vec_id)`` vectors (deterministic seedless draw,
    TakeOrderedAndProject — no full-scan job), then driver-side Lloyd
    per subspace with first-rows init, so rebuilds agree bit-for-bit.
    """
    return _pq_train_collected(candidates, m, n_codes, train_cap)[1]


def _pq_train_collected(
    candidates: DataFrame,
    m: int = 16,
    n_codes: int = 32,
    train_cap: int = 2048,
) -> tuple[list[dict], DataFrame]:
    """:func:`pq_train` plus the codebook rows it just computed
    driver-side — ``(rows, codebooks_df)``. One-shot search paths hand
    the rows straight to :func:`pq_encode`/:func:`pq_adc_topk`, saving
    the collect-back of a frame that was CREATED from driver data one
    call earlier (r14: two whole jobs per query on the benched PQ
    paths; the amortized form still collects, its codebooks genuinely
    live in parquet)."""
    import numpy as np

    sample = (
        candidates.select("vec_id", "embedding")
        .orderBy(F.xxhash64("vec_id"), "vec_id")
        .limit(train_cap)
        .collect()
    )
    tm = np.array([r["embedding"] for r in sample], dtype=np.float64)
    dim = tm.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    sub_d = dim // m
    rows: list[dict] = []
    for s in range(m):
        block = tm[:, s * sub_d : (s + 1) * sub_d]
        cents = block[: min(n_codes, len(block))].copy()
        for _ in range(10):  # Lloyd, L2 (PQ minimizes reconstruction error)
            d2 = ((block[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(len(cents)):
                members = block[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        rows += [
            {"sub": s, "code": c, "centroid": [float(x) for x in cents[c]]}
            for c in range(len(cents))
        ]
    df = candidates.sparkSession.createDataFrame(
        [(r["sub"], r["code"], r["centroid"]) for r in rows],
        "sub int, code int, centroid array<double>",
    )
    return rows, df


def _pq_tensor(cb_rows) -> tuple:
    """(tensor[m][n_codes][sub_d], m, n_codes, sub_d) from codebook rows
    (pyspark Rows or the dicts :func:`_pq_train_collected` returns)."""
    import numpy as np

    cb = sorted(cb_rows, key=lambda r: (r["sub"], r["code"]))
    m = max(r["sub"] for r in cb) + 1
    n_codes = max(r["code"] for r in cb) + 1
    sub_d = len(cb[0]["centroid"])
    tensor = np.zeros((m, n_codes, sub_d), dtype=np.float64)
    for r in cb:
        tensor[r["sub"], r["code"]] = r["centroid"]
    return tensor, m, n_codes, sub_d


def pq_encode(
    codebooks: DataFrame,
    vectors: DataFrame,
    codebook_rows: list | None = None,
) -> DataFrame:
    """Encode every vector to ``m`` small codes (nearest codebook entry
    per subspace, L2): ``(cand_id, codes array<int>, vnorm double)``
    plus any ``cell`` column passed through (IVF-PQ layout).

    One Arrow pass with the codebook tensor closed over (kilobytes);
    at the default 16×32 over 64 float dims the codes column is 16
    small ints vs 256 bytes of raw vector — the compressed index scans
    ~16× less data than the raw corpus, which is the entire point at
    100 TB (recall 1.0 at k=10 on the fixture with the default
    8×-rerank; m/n_codes trade compression against recall).

    ``codebook_rows``: the driver-side rows from
    :func:`_pq_train_collected`, skipping the collect-back of a frame
    the same call chain just created (one job saved per encode on the
    one-shot paths).
    """
    tensor, m, n_codes, sub_d = _pq_tensor(
        codebook_rows if codebook_rows is not None else codebooks.collect()
    )

    has_cell = "cell" in vectors.columns
    id_col = "cand_id" if "cand_id" in vectors.columns else "vec_id"

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np

        for pdf in batches:
            em = _np.array(list(pdf["embedding"]), dtype=_np.float64)
            if em.size == 0:
                continue
            codes = _np.empty((len(em), m), dtype=_np.int32)
            for s in range(m):
                block = em[:, s * sub_d : (s + 1) * sub_d]
                d2 = ((block[:, None, :] - tensor[s][None, :, :]) ** 2).sum(
                    axis=2
                )
                codes[:, s] = _np.argmin(d2, axis=1)
            out = {
                "cand_id": pdf[id_col],
                "codes": list(codes),
                "vnorm": _np.linalg.norm(em, axis=1),
            }
            if has_cell:
                out["cell"] = pdf["cell"]
            yield pd.DataFrame(out)

    schema = "cand_id long, codes array<int>, vnorm double" + (
        ", cell int" if has_cell else ""
    )
    return vectors.mapInPandas(encode, schema=schema)


def pq_adc_topk(
    queries: DataFrame,
    encoded: DataFrame,
    codebooks: DataFrame,
    k: int = 10,
    query_cap: int = QUERY_BATCH_CAP,
    codebook_rows: list | None = None,
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: per query, a lookup
    table ``LUT[sub][code] = dot(q_sub, centroid)`` (m × n_codes
    doubles, built driver-side from the kilobyte codebook) approximates
    ``dot(q, x) ≈ Σ_sub LUT[sub][codes[sub]]`` — the scored scan reads
    ONLY the codes column (column pruning skips the raw vectors
    entirely) and the scoring expression is a codegen'd fixed-length
    sum of ``element_at`` lookups, no UDF.

    The per-query LUTs attach via ``explode`` of the (tiny) query-id
    literal + a BROADCAST equi-join on ``query_id`` against the
    kilobyte ``(query_id, lut)`` frame (r14, guide §4 boundary /
    verdict ask): the earlier ~217 KB nested-array plan LITERAL cost
    ~1 s of driver-side analysis per run — Catalyst re-walks its ~10k
    literal nodes on every downstream operation — while the broadcast
    relation ships the same bytes once and keeps the scoring expression
    in one whole-stage-codegen span (BroadcastHashJoin, never the
    NL-join a ``crossJoin(luts)`` would plan).

    ``codebook_rows``: driver-side rows from
    :func:`_pq_train_collected` — skips re-collecting a codebook frame
    the caller just built from driver data.

    Approximate cosine = ADC-dot / vnorm (queries are normalized into
    the LUT). Rank ties break on cand_id like every ANN path here.
    """
    import numpy as np

    tensor, m, n_codes, sub_d = _pq_tensor(
        codebook_rows if codebook_rows is not None else codebooks.collect()
    )

    qrows = _collect_query_batch(queries, cap=query_cap)
    qm = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    qm = qm / _safe_norms_np(qm)
    qids: list[int] = []
    luts: list[list[float]] = []
    for qi, q in enumerate(qm):
        flat = []
        for s in range(m):
            flat += list(tensor[s] @ q[s * sub_d : (s + 1) * sub_d])
        qids.append(int(qrows[qi]["vec_id"]))
        luts.append([float(x) for x in flat])
    if not qids:  # degenerate: literal array<void> would fail analysis
        return queries.sparkSession.createDataFrame(
            [], "query_id long, cand_id long, rank int, adc_cosine double"
        )

    # Σ_sub lut[sub*n_codes + codes[sub]] — generated fixed-length sum
    adc = None
    for s in range(m):
        term = F.element_at(
            F.col("lut"),
            (F.lit(s * n_codes) + F.element_at(F.col("codes"), s + 1) + 1).cast(
                "int"
            ),
        )
        adc = term if adc is None else adc + term
    # the LUTs ride as a broadcast (query_id, lut) relation — see the
    # docstring; only the 8-byte query ids remain a plan literal
    luts_df = queries.sparkSession.createDataFrame(
        list(zip(qids, luts)), "query_id long, lut array<double>"
    )
    scored = (
        encoded.select(
            "cand_id",
            "codes",
            "vnorm",
            F.explode(F.lit(qids).cast("array<long>")).alias("query_id"),
        )
        .join(F.broadcast(luts_df), "query_id")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            (adc / F.when(F.col("vnorm") > 0, F.col("vnorm")).otherwise(1.0)).alias(
                "adc_cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("adc_cosine"), F.asc("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "rank", "adc_cosine")
    )


def cosine_topk_pq(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    m: int = 16,
    n_codes: int = 32,
    rerank: int = 8,
    train_cap: int = 2048,
) -> DataFrame:
    """PQ-compressed top-k with exact re-ranking: ADC over the codes
    column shortlists ``rerank × k`` per query, then ONLY those
    shortlisted candidates re-join their raw vectors for an exact
    cosine (the standard IVF-PQ accuracy recovery — the corpus-wide
    scan touches 8 int codes per row; full vectors are read for
    |queries| × rerank·k rows, not the corpus).

    Same output contract as every other ANN tier:
    ``(query_id, cand_id, rank, cosine)``. Approximate by design ⇒
    rows-only check; the recall floor vs exact brute force is asserted
    in tests.
    """
    cb_rows, codebooks = _pq_train_collected(
        candidates, m=m, n_codes=n_codes, train_cap=train_cap
    )
    encoded = pq_encode(codebooks, candidates, codebook_rows=cb_rows)
    shortlist = pq_adc_topk(
        queries, encoded, codebooks, k=rerank * k, codebook_rows=cb_rows
    )
    e = candidates.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    exact = (
        shortlist.join(e, "cand_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id", "cand_id", _cosine(F.col("qv"), F.col("cv")).alias("cosine")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "rank", "cosine")
    )


def cosine_topk_ivf_pq(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    m: int = 16,
    n_codes: int = 32,
    rerank: int = 8,
    train_cap: int = 2048,
    query_cap: int = QUERY_BATCH_CAP,
) -> DataFrame:
    """The full IVF-PQ deployment shape: coarse cells prune WHICH rows
    are scored (each query touches ``n_probe`` of ``n_cells`` cells),
    PQ codes shrink WHAT is read per row (~16× vs raw vectors), ADC
    scores the survivors as a codegen'd LUT sum, and only the
    ``rerank × k`` shortlist re-joins its raw vectors for exact
    cosines. At 100 TB: scan volume ≈ corpus × (n_probe/n_cells) ×
    (code_bytes/vector_bytes) — two multiplicative prunings the flat
    forms pay separately (:func:`cosine_topk_ivf` reads raw vectors in
    probed cells; :func:`cosine_topk_pq` reads all codes).

    Index parts (centroids, codebooks, encoded codes) are all plain
    persistable DataFrames — the amortized layout mirrors
    ``ivf_index_save``; this one-shot form builds per call.
    """
    import numpy as np

    centroids, cells = ivf_build(candidates, n_cells=n_cells, train_cap=train_cap)
    cb_rows, codebooks = _pq_train_collected(
        candidates, m=m, n_codes=n_codes, train_cap=train_cap
    )
    encoded = pq_encode(codebooks, cells, codebook_rows=cb_rows)

    tensor, _, n_codes_eff, sub_d = _pq_tensor(cb_rows)

    crows = sorted(centroids.collect(), key=lambda r: r["cell"])
    cm = np.array([r["centroid"] for r in crows], dtype=np.float64)
    qrows = _collect_query_batch(queries, cap=query_cap)
    qm = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    qm_n = qm / _safe_norms_np(qm)
    probe_idx = np.argsort(-(qm_n @ cm.T), axis=1)[:, :n_probe]

    probes = []
    for qi, q in enumerate(qm_n):
        flat = []
        for s in range(m):
            flat += list(tensor[s] @ q[s * sub_d : (s + 1) * sub_d])
        for c in probe_idx[qi]:
            probes.append(
                (int(qrows[qi]["vec_id"]), int(c), [float(x) for x in flat])
            )
    probes_df = queries.sparkSession.createDataFrame(
        probes, "query_id long, cell int, lut array<double>"
    )
    probed = sorted({int(c) for row in probe_idx for c in row})

    adc = None
    for s in range(m):
        term = F.element_at(
            F.col("lut"),
            (
                F.lit(s * n_codes_eff) + F.element_at(F.col("codes"), s + 1) + 1
            ).cast("int"),
        )
        adc = term if adc is None else adc + term
    shortlist_w = Window.partitionBy("query_id").orderBy(
        F.desc("adc_cosine"), F.asc("cand_id")
    )
    shortlist = (
        F.broadcast(probes_df)
        .join(encoded.filter(F.col("cell").isin(probed)), "cell")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            (adc / F.when(F.col("vnorm") > 0, F.col("vnorm")).otherwise(1.0)).alias(
                "adc_cosine"
            ),
        )
        .withColumn("r", F.row_number().over(shortlist_w))
        .filter(F.col("r") <= rerank * k)
        .select("query_id", "cand_id")
    )

    e = candidates.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )
    qdf = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        shortlist.join(e, "cand_id")
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id", "cand_id", _cosine(F.col("qv"), F.col("cv")).alias("cosine")
        )
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "rank", "cosine")
    )


def pq_index_save(
    codebooks: DataFrame, encoded: DataFrame, index_dir: str, n_files: int = 16
) -> None:
    """Persist a PQ index: the kilobyte codebook table + the encoded
    codes (clustered on ``cell`` when present, so a probe-pruned IVF-PQ
    search also file-prunes the codes scan). Reload with
    :func:`pq_index_load` — encode cost amortizes over every query
    batch, and the codes table is ~16× smaller than the corpus it
    stands in for."""
    codes = encoded
    if "cell" in encoded.columns:
        codes = encoded.repartitionByRange(
            n_files, "cell"
        ).sortWithinPartitions("cell")
    codes.write.mode("overwrite").parquet(f"{index_dir}/codes")
    codebooks.coalesce(1).write.mode("overwrite").parquet(
        f"{index_dir}/codebooks"
    )


def pq_index_load(spark, index_dir: str) -> tuple[DataFrame, DataFrame]:
    """(codebooks, encoded codes) from a saved PQ index."""
    return (
        spark.read.parquet(f"{index_dir}/codebooks"),
        spark.read.parquet(f"{index_dir}/codes"),
    )


def cosine_topk_pq_amortized(
    queries: DataFrame,
    candidates: DataFrame,
    index_dir: str,
    k: int = 10,
    m: int = 16,
    n_codes: int = 32,
    rerank: int = 8,
    train_cap: int = 2048,
) -> DataFrame:
    """PQ top-k against a persisted (built-on-first-use) codes index —
    the amortized form of :func:`cosine_topk_pq`: steady state pays the
    ADC scan of the compressed codes + the shortlist re-rank only;
    training and encoding are paid once per corpus version (build is
    deterministic, so concurrent rebuilds agree)."""
    import os

    spark = queries.sparkSession
    if not os.path.exists(f"{index_dir}/codebooks/_SUCCESS"):
        cb_rows, codebooks = _pq_train_collected(
            candidates, m=m, n_codes=n_codes, train_cap=train_cap
        )
        pq_index_save(
            codebooks,
            pq_encode(codebooks, candidates, codebook_rows=cb_rows),
            index_dir,
        )
    codebooks, encoded = pq_index_load(spark, index_dir)
    shortlist = pq_adc_topk(queries, encoded, codebooks, k=rerank * k)
    e = candidates.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )
    qdf = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        shortlist.select("query_id", "cand_id")
        .join(e, "cand_id")
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id", "cand_id", _cosine(F.col("qv"), F.col("cv")).alias("cosine")
        )
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "rank", "cosine")
    )


# ---- scalar quantization (SQ8) tier (r7) -----------------------------


def sq8_train(
    candidates: DataFrame, vec_col: str = "embedding", dim: int | None = None
) -> tuple:
    """Per-dimension affine quantizer params from ONE pass over the
    corpus: ``(mins, scales)`` lists of length d, where
    ``code = round((v - min) / scale)`` lands in 0..255. Bounded driver
    state (2·d floats — same class as IVF centroids/PQ codebooks);
    degenerate constant dimensions get scale ~0 and decode exactly.

    ``dim``: pass the (known) vector dimensionality to skip the
    ``first()`` probe job — composed builds already hold it from their
    IVF training sample (r14)."""
    d = dim if dim is not None else len(candidates.select(vec_col).first()[0])
    aggs = []
    for i in range(d):
        aggs.append(F.min(F.col(vec_col)[i]).alias(f"mn{i}"))
        aggs.append(F.max(F.col(vec_col)[i]).alias(f"mx{i}"))
    row = candidates.agg(*aggs).first()
    mins = [float(row[f"mn{i}"]) for i in range(d)]
    scales = [
        max((float(row[f"mx{i}"]) - mins[i]) / 255.0, 1e-12) for i in range(d)
    ]
    return mins, scales


def sq8_encode(
    vectors: DataFrame,
    mins: list,
    scales: list,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    extra_cols: tuple = (),
) -> DataFrame:
    """``(cand_id, codes array<int> in 0..255, vnorm)`` — pure Catalyst
    (two literal-array ``zip_with``s, no UDF). The codes column is d
    single-byte-range ints vs 4-8 bytes per raw float: the compressed
    scan reads ~4-8× less than the corpus, which is the point at
    100 TB. ``vnorm`` is the EXACT vector norm captured at encode time
    (the re-rank denominator never re-reads the corpus)."""
    v = F.col(vec_col).cast("array<double>")
    mins_l = F.lit(mins).cast("array<double>")
    scales_l = F.lit(scales).cast("array<double>")
    shifted = F.zip_with(v, mins_l, lambda x, mn: x - mn)
    codes = F.zip_with(
        shifted,
        scales_l,
        lambda x, s: F.least(
            F.greatest(F.round(x / s, 0).cast("int"), F.lit(0)), F.lit(255)
        ),
    )
    norm = F.sqrt(
        F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda s, x: s + x)
    )
    return vectors.select(
        *extra_cols,
        F.col(id_col).alias("cand_id"),
        codes.alias("codes"),
        norm.alias("vnorm"),
    )


def sq8_topk(
    queries: DataFrame,
    encoded: DataFrame,
    mins: list,
    scales: list,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_cap: int = QUERY_BATCH_CAP,
) -> DataFrame:
    """Approximate top-k over the compressed codes:
    ``dot(q, dequant(c)) = dot(q, mins) + Σ (q_i·scale_i)·code_i`` —
    ``dot(q, mins)``/``|q|`` are per-query constants and
    ``q_i·scale_i`` a per-query vector, all computed DRIVER-side from
    the :func:`_collect_query_batch`-capped batch (the module's loud
    OOM guard), so the corpus-side work is one ``zip_with``/
    ``aggregate`` over the int codes against a broadcast frame that is
    PROVABLY ≤ query_cap rows (the audit's BOUNDED_NL_OK argument for
    this tier). Ranked by the dequantized cosine against the stored
    exact ``vnorm``."""
    import numpy as np

    spark = queries.sparkSession
    qrows = _collect_query_batch(
        queries.select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
        ),
        cap=query_cap,
    )
    if not qrows:
        return spark.createDataFrame(
            [], "query_id long, cand_id long, rank int, approx_cosine double"
        )
    mn = np.asarray(mins, dtype=np.float64)
    sc = np.asarray(scales, dtype=np.float64)
    qdata = []
    for r in qrows:
        qv = np.asarray(r["embedding"], dtype=np.float64)
        qdata.append(
            (
                int(r["vec_id"]),
                [float(x) for x in qv * sc],
                float(qv @ mn),
                float(np.sqrt(qv @ qv)),
            )
        )
    q = spark.createDataFrame(
        qdata, "query_id long, qs array<double>, qmin double, qnorm double"
    )
    dot = F.col("qmin") + F.aggregate(
        F.zip_with(F.col("qs"), F.col("codes"), lambda x, c: x * c),
        F.lit(0.0),
        lambda s, x: s + x,
    )
    scored = (
        encoded.join(F.broadcast(q), how="cross")
        # every ANN tier's contract: a query never matches itself
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            (dot / (F.col("qnorm") * F.col("vnorm"))).alias("approx_cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("approx_cosine"), F.asc("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "rank", "approx_cosine")
    )


def cosine_topk_sq8(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    rerank: int = 8,
) -> DataFrame:
    """SQ8-compressed top-k with exact re-ranking — the third
    compression tier beside IVF (probe pruning) and PQ (16× codes):
    int8-range scalar quantization keeps per-dim resolution (recall is
    near-exact at 256 levels, tested) while scanning ~4-8× less than
    raw vectors. Shortlist ``rerank × k`` per query over the codes,
    then ONLY those rows re-join their raw vectors for exact cosine.
    Same output contract as every ANN tier:
    ``(query_id, cand_id, rank, cosine)``."""
    mins, scales = sq8_train(candidates)
    encoded = sq8_encode(candidates, mins, scales)
    shortlist = sq8_topk(queries, encoded, mins, scales, k=rerank * k)
    e = candidates.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    exact = (
        shortlist.join(e, "cand_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "cand_id",
            _cosine(F.col("qv"), F.col("cv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "rank", "cosine")
    )


def sq8_index_save(
    mins: list, scales: list, encoded: DataFrame, index_dir: str
) -> None:
    """Persist an SQ8 index: the (2·d)-float quantizer params + the
    encoded codes table. Reload with :func:`sq8_index_load`; encode
    cost amortizes over every query batch and the codes column scans
    ~4-8× less than the raw vectors it stands in for."""
    spark = encoded.sparkSession
    encoded.write.mode("overwrite").parquet(f"{index_dir}/codes")
    spark.createDataFrame(
        [(mins, scales)], "mins array<double>, scales array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_dir}/params")


def sq8_index_load(spark, index_dir: str) -> tuple:
    """``(mins, scales, encoded)`` from a persisted SQ8 index."""
    p = spark.read.parquet(f"{index_dir}/params").first()
    encoded = spark.read.parquet(f"{index_dir}/codes")
    return list(p["mins"]), list(p["scales"]), encoded


def cosine_topk_sq8_amortized(
    queries: DataFrame,
    candidates: DataFrame,
    index_dir: str,
    k: int = 10,
    rerank: int = 8,
) -> DataFrame:
    """SQ8 top-k against a persisted (built-on-first-use) codes index —
    the amortized form of :func:`cosine_topk_sq8`, the same deployed
    contract as the IVF/PQ tiers: steady state pays the compressed
    scan + shortlist re-rank only; training and encoding are paid once
    per corpus version (both are deterministic, so concurrent rebuilds
    agree). Results are identical to the one-shot form (tested)."""
    import os

    spark = queries.sparkSession
    if not os.path.exists(f"{index_dir}/codes/_SUCCESS"):
        mins, scales = sq8_train(candidates)
        sq8_index_save(mins, scales, sq8_encode(candidates, mins, scales), index_dir)
    mins, scales, encoded = sq8_index_load(spark, index_dir)
    shortlist = sq8_topk(queries, encoded, mins, scales, k=rerank * k)
    e = candidates.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )
    qdf = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        shortlist.select("query_id", "cand_id")
        .join(e, "cand_id")
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id", "cand_id", _cosine(F.col("qv"), F.col("cv")).alias("cosine")
        )
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "rank", "cosine")
    )


# ---------------------------------------------------------------------------
# IVF + SQ8: the combined tier (r8). IVF probe pruning bounds WHICH rows
# are scanned (n_probe/n_cells of the corpus); SQ8 compresses WHAT each
# scanned row reads (~4-8x vs raw doubles). Plain SQ8's weakness at scale
# is that it scans EVERY code row (the r7 bench's slowest ANN variant);
# plain IVF's weakness is reading raw vectors inside probed cells. The
# composition pays neither.
# ---------------------------------------------------------------------------


def _sq8_probe_frame(spark, qrows, mins, scales, cm, n_probe: int):
    """Driver-side per-query probe rows for the IVF+SQ8 scan: one row
    per (query, probed cell) carrying the SQ8 dot-product decomposition
    ``dot(q, dequant(c)) = qmin + sum (q_i*scale_i)*code_i``. Bounded
    by query_cap x n_probe rows -- broadcast-sized by construction."""
    import numpy as np

    mn = np.asarray(mins, dtype=np.float64)
    sc = np.asarray(scales, dtype=np.float64)
    qm = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    qm_n = qm / _safe_norms_np(qm)
    probe_idx = np.argsort(-(qm_n @ cm.T), axis=1)[:, :n_probe]
    probes = []
    for qi, r in enumerate(qrows):
        qv = qm[qi]
        qs = [float(x) for x in qv * sc]
        qmin = float(qv @ mn)
        qnorm = float(np.sqrt(qv @ qv))
        for c in probe_idx[qi]:
            probes.append((int(r["vec_id"]), int(c), qs, qmin, qnorm))
    probes_df = spark.createDataFrame(
        probes,
        "query_id long, cell int, qs array<double>, qmin double, qnorm double",
    )
    probed = sorted({int(c) for row in probe_idx for c in row})
    return probes_df, probed


def _ivf_sq8_search(
    queries: DataFrame,
    encoded: DataFrame,
    candidates: DataFrame,
    mins: list,
    scales: list,
    cm,
    k: int,
    n_probe: int,
    rerank: int,
    query_cap: int = QUERY_BATCH_CAP,
) -> DataFrame:
    """Shared search tail: equi-join the broadcast probe frame to the
    cell-clustered codes (footer min-max prunes unprobed cells), score
    the dequantized dot pure-Catalyst, shortlist ``rerank*k``, exact
    re-rank on raw vectors. One shuffle (the shortlist window) -- same
    shape as the IVF-PQ tier."""
    spark = queries.sparkSession
    qrows = _collect_query_batch(queries, cap=query_cap)
    if not qrows:
        return spark.createDataFrame(
            [], "query_id long, cand_id long, rank int, cosine double"
        )
    probes_df, probed = _sq8_probe_frame(spark, qrows, mins, scales, cm, n_probe)
    dot = F.col("qmin") + F.aggregate(
        F.zip_with(F.col("qs"), F.col("codes"), lambda x, c: x * c),
        F.lit(0.0),
        lambda s, x: s + x,
    )
    shortlist_w = Window.partitionBy("query_id").orderBy(
        F.desc("approx_cosine"), F.asc("cand_id")
    )
    shortlist = (
        F.broadcast(probes_df)
        .join(encoded.filter(F.col("cell").isin(probed)), "cell")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            (dot / (F.col("qnorm") * F.col("vnorm"))).alias("approx_cosine"),
        )
        .withColumn("r", F.row_number().over(shortlist_w))
        .filter(F.col("r") <= rerank * k)
        .select("query_id", "cand_id")
    )
    e = candidates.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )
    qdf = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        shortlist.join(e, "cand_id")
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id", "cand_id", _cosine(F.col("qv"), F.col("cv")).alias("cosine")
        )
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "rank", "cosine")
    )


def cosine_topk_ivf_sq8(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    rerank: int = 8,
    train_cap: int = 2048,
    query_cap: int = QUERY_BATCH_CAP,
) -> DataFrame:
    """IVF + SQ8 top-k: coarse cells prune WHICH rows are scored, SQ8
    codes shrink WHAT is read per row (~4-8x, full per-dim resolution
    -- higher shortlist fidelity than PQ's subspace codebooks), and
    only the ``rerank*k`` shortlist re-joins raw vectors for exact
    cosines. At 100 TB: scan volume ~= corpus x (n_probe/n_cells) x
    (1 byte / 8 bytes per dim) -- the same multiplicative pruning as
    IVF-PQ with a cheaper, LUT-free scoring expression (pure
    ``zip_with``/``aggregate``, no per-query LUT construction).

    One-shot form (train + assign + encode per call); the deployment
    shape is :func:`cosine_topk_ivf_sq8_amortized`."""
    cm, centroids, cells = _ivf_build_collected(
        candidates, n_cells=n_cells, train_cap=train_cap
    )
    mins, scales = sq8_train(candidates, dim=cm.shape[1])
    encoded = sq8_encode(cells, mins, scales, id_col="cand_id", extra_cols=("cell",))
    return _ivf_sq8_search(
        queries, encoded, candidates, mins, scales, cm,
        k=k, n_probe=n_probe, rerank=rerank, query_cap=query_cap,
    )


def ivf_sq8_index_save(
    centroids: DataFrame,
    mins: list,
    scales: list,
    encoded: DataFrame,
    index_dir: str,
    n_files: int = 16,
) -> None:
    """Persist an IVF+SQ8 index: cell-range-clustered codes (footer
    min-max tight per file, so probing reads only matching files) +
    the kilobyte centroids and (2*d)-float quantizer params."""
    (
        encoded.repartitionByRange(n_files, "cell")
        .sortWithinPartitions("cell")
        .write.mode("overwrite")
        .parquet(f"{index_dir}/codes")
    )
    centroids.coalesce(1).write.mode("overwrite").parquet(
        f"{index_dir}/centroids"
    )
    centroids.sparkSession.createDataFrame(
        [(mins, scales)], "mins array<double>, scales array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_dir}/params")


def ivf_sq8_index_load(spark, index_dir: str) -> tuple:
    """``(centroids, mins, scales, encoded)`` from a persisted IVF+SQ8
    index."""
    p = spark.read.parquet(f"{index_dir}/params").first()
    return (
        spark.read.parquet(f"{index_dir}/centroids"),
        list(p["mins"]),
        list(p["scales"]),
        spark.read.parquet(f"{index_dir}/codes"),
    )


def cosine_topk_ivf_sq8_amortized(
    queries: DataFrame,
    candidates: DataFrame,
    index_dir: str,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    rerank: int = 8,
    train_cap: int = 2048,
) -> DataFrame:
    """IVF+SQ8 against a persisted (built-on-first-use) index -- the
    deployment shape: steady state pays the probe-pruned compressed
    scan + shortlist re-rank only; centroid training, cell assignment
    and SQ8 encoding are paid once per corpus version (all
    deterministic, so concurrent rebuilds agree). Results identical to
    the one-shot form (tested).

    Committed :func:`ivf_sq8_index_append` batches are unioned into
    the compressed scan (``ivf_sq8_index_load_all``), matching the
    plain-IVF amortized contract: vectors ingested after the initial
    build are retrievable. ``candidates`` must cover the appended ids
    too -- the exact re-rank joins raw vectors from it."""
    import os

    import numpy as np

    spark = queries.sparkSession
    if not os.path.exists(f"{index_dir}/codes/_SUCCESS"):
        centroids, cells = ivf_build(
            candidates, n_cells=n_cells, train_cap=train_cap
        )
        mins, scales = sq8_train(candidates)
        ivf_sq8_index_save(
            centroids,
            mins,
            scales,
            sq8_encode(cells, mins, scales, id_col="cand_id", extra_cols=("cell",)),
            index_dir,
        )
    centroids, mins, scales, encoded = ivf_sq8_index_load_all(spark, index_dir)
    crows = sorted(centroids.collect(), key=lambda r: r["cell"])
    cm = np.array([r["centroid"] for r in crows], dtype=np.float64)
    return _ivf_sq8_search(
        queries, encoded, candidates, mins, scales, cm,
        k=k, n_probe=n_probe, rerank=rerank,
    )


def truncate_embeddings(
    vectors: DataFrame,
    dims: int,
    vec_col: str = "embedding",
    renormalize: bool = True,
) -> DataFrame:
    """Matryoshka-style dimension truncation (r8): keep the first
    ``dims`` coordinates of every embedding and (by default) rescale to
    unit norm — the standard cheap-inference trick for MRL-trained
    embedding models, and a 100 TB lever of its own: a 64->16 cut is a
    4x reduction in scan bytes, ANN index size and dot-product work for
    EVERY downstream tier (brute force, IVF, PQ, SQ8 all operate on the
    truncated column unchanged). Pure Catalyst (``slice`` +
    ``aggregate`` norm fold); zero-norm prefixes pass through unscaled
    rather than dividing by zero. Recall-vs-full-dim floors are pinned
    in tests/test_training_ops.py."""
    if dims < 1:
        raise ValueError(f"dims must be >= 1, got {dims}")
    v = F.slice(F.col(vec_col).cast("array<double>"), 1, dims)
    if renormalize:
        norm = F.sqrt(
            F.aggregate(
                F.transform(v, lambda x: x * x),
                F.lit(0.0),
                lambda s, x: s + x,
            )
        )
        v = F.when(norm > 0, F.transform(v, lambda x: x / norm)).otherwise(v)
    return vectors.withColumn(vec_col, v)


def ivf_sq8_index_append(
    spark,
    new_vectors: DataFrame,
    index_dir: str,
    n_files: int = 4,
    batch_tag: str | None = None,
) -> None:
    """Grow a persisted IVF+SQ8 index without retraining (r8 — the
    combined tier gets the same daily-ingest contract as the plain IVF
    index): assign the batch to the FROZEN centroids, encode with the
    FROZEN quantizer params, and append the new cell-clustered code
    files. Existing files never rewrite, old results stay stable;
    drift-retraining is a rebuild, same policy as ``ivf_index_append``.

    ``batch_tag`` makes the append idempotent for at-least-once
    delivery: the batch lands in its own overwrite-mode directory
    ``codes_appends/<tag>`` that a replay rewrites wholesale;
    :func:`ivf_sq8_index_load_all` unions only COMMITTED (_SUCCESS)
    batch dirs back in — a crash mid-append stays invisible."""
    import numpy as np

    centroids, mins, scales, _ = ivf_sq8_index_load(spark, index_dir)
    crows = sorted(centroids.collect(), key=lambda r: r["cell"])
    cm = np.array([r["centroid"] for r in crows], dtype=np.float64)
    assigned = _assign_cells_df(new_vectors, cm)
    encoded = (
        sq8_encode(assigned, mins, scales, id_col="cand_id", extra_cols=("cell",))
        .repartitionByRange(n_files, "cell")
        .sortWithinPartitions("cell")
    )
    if batch_tag is None:
        encoded.write.mode("append").parquet(f"{index_dir}/codes")
    else:
        encoded.write.mode("overwrite").parquet(
            f"{index_dir}/codes_appends/{batch_tag}"
        )


def ivf_sq8_index_load_all(spark, index_dir: str) -> tuple:
    """``(centroids, mins, scales, encoded)`` including committed
    per-batch append dirs — the read-side twin of
    :func:`ivf_sq8_index_append` (same _SUCCESS-gated union contract
    as ``ivf_index_load``)."""
    import os

    centroids, mins, scales, encoded = ivf_sq8_index_load(spark, index_dir)
    appends = f"{index_dir}/codes_appends"
    if os.path.isdir(appends):
        committed = sorted(
            os.path.join(appends, n)
            for n in os.listdir(appends)
            if not n.startswith((".", "_"))
            and os.path.exists(os.path.join(appends, n, "_SUCCESS"))
        )
        if committed:
            encoded = encoded.unionByName(spark.read.parquet(*committed))
    return centroids, mins, scales, encoded
