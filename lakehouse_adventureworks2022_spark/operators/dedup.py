"""Deduplication operators for training-data pipelines: exact,
n-gram-Jaccard near-dup, and MinHash-LSH (beyond-reference scope,
BASELINE.json north star).

Scale design (the whole point of each variant):

- **exact** (:func:`dedup_exact`): hash-groupBy — one shuffle on a 32-char
  key; at 100 TB group on ``xxhash64`` prefix-bucketed md5 if key skew
  ever matters (it doesn't: md5 keys are uniform).
- **n-gram Jaccard** (:func:`ngram_jaccard_pairs`): the *verification*
  primitive — explode distinct shingles, self-equi-join on shingle,
  count intersections. All-pairs-with-shared-shingle, so it's quadratic
  in the worst case: at scale it must be fed CANDIDATES, not the corpus.
- **MinHash-LSH** (:func:`minhash_lsh_pairs`): the scale path. Shingle →
  K min-hashes → band signatures → equi-join on (band, signature) buckets
  → exact-Jaccard verify of the (tiny) candidate set. Every step is a
  shuffle on a uniform hash key; no cross-product ever materializes. This
  is the standard web-scale near-dup pipeline (MinHashLSH à la
  Broder; same shape as Spark MLlib's MinHashLSH but pure SQL
  expressions, so it is portable to the DuckDB oracle and needs no ML
  pipeline objects).
- **cluster canonicalization** (:func:`connected_components` /
  :func:`dedup_keep_canonical`): min-label propagation over the pair
  graph — one doc per near-dup CLUSTER instead of one per pair edge.
- **incremental ingest** (:func:`dedup_state` /
  :func:`incremental_dedup`): dedup a new batch against O(docs)
  persisted state (hashes + signatures) with broadcast-batch /
  stream-state joins — history is never re-shuffled; the streaming face
  is ``streaming/corpus.stream_ingest_with_history``.

Hash portability contract (shared with ``plans/text_queries.py`` oracles):
every hash is a *string* md5 — min() over hex strings is byte-wise
lexicographic in both engines; no 64-bit signed/unsigned pitfalls. Band
ids are zero-padded so lexicographic string sort == numeric seed order.
"""

from __future__ import annotations

import weakref
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakehouse_adventureworks2022_spark.operators.textops import (
    WS_PLUS,
    tokens_col,
)

if TYPE_CHECKING:  # runtime import stays inside incremental_dedup
    from lakehouse_adventureworks2022_spark.operators.bloom import BloomFilter


def _safe_unpersist(cached: DataFrame) -> None:
    # Python-level unpersist (NOT cached._jdf — Connect sessions have no
    # JVM handle); a stopped session just raises and there is nothing to
    # free anyway.
    try:
        cached.unpersist(False)
    except Exception:
        pass


def _attach_cached_input(result: DataFrame, cached: DataFrame) -> DataFrame:
    """Tie a persisted input frame's lifetime to the result frame.

    Operators that ``persist()`` an intermediate they alone created must
    not leak cached blocks into a long-lived session. The cached frame is
    recorded on the result; the PRIMARY release path is explicit —
    :func:`release_cached_inputs` after the result is materialized. A GC
    finalizer on the result frame is kept only as a last resort for
    callers unaware of the contract, and composites that derive further
    frames from the result must move ownership with
    :func:`transfer_cached_inputs` FIRST — derived frames hold no Python
    reference to their parent, so rebinding the intermediate would
    otherwise fire the finalizer and evict the cache before anything
    materializes (GC-timing-dependent loss of the persist win).
    """
    existing = list(getattr(result, "_cached_inputs", ()))
    existing.append(cached)
    result._cached_inputs = existing
    fins = list(getattr(result, "_cached_input_finalizers", ()))
    fins.append(weakref.finalize(result, _safe_unpersist, cached))
    result._cached_input_finalizers = fins
    return result


def transfer_cached_inputs(src: DataFrame, dst: DataFrame) -> DataFrame:
    """Move cache ownership from an intermediate frame to the frame the
    caller actually holds.

    Detaches ``src``'s last-resort GC finalizers before re-attaching to
    ``dst`` so the intermediate can be rebound/scoped out freely; the
    cache now lives exactly as long as ``dst`` (or until
    :func:`release_cached_inputs`)."""
    for fin in getattr(src, "_cached_input_finalizers", ()):
        fin.detach()
    src._cached_input_finalizers = []
    cached_list = list(getattr(src, "_cached_inputs", ()))
    src._cached_inputs = []
    for cached in cached_list:
        _attach_cached_input(dst, cached)
    return dst


def release_cached_inputs(result: DataFrame) -> None:
    """Unpersist every cached input an operator attached to ``result``.

    Call after materializing ``result`` (collect/write); re-executing the
    plan afterwards recomputes the inputs instead of reading cache."""
    for fin in getattr(result, "_cached_input_finalizers", ()):
        fin.detach()
    result._cached_input_finalizers = []
    for cached in getattr(result, "_cached_inputs", ()):
        _safe_unpersist(cached)
    result._cached_inputs = []

#: MinHash configuration: 12 hash functions in 4 bands of 3 rows.
#: P(candidate) = 1 - (1 - j^3)^4 — ~0.5 at j≈0.5, >0.97 at j≥0.8.
MINHASH_K = 12
BAND_ROWS = 3


def shingles_df(
    df: DataFrame, text_col: str = "text", n: int = 3
) -> DataFrame:
    """(doc_id, shingle) pairs — distinct word n-gram shingles per doc."""
    toks = tokens_col(F.col(text_col))
    # i ranges 0..L-n (guarded: sequence(0, negative) would DESCEND)
    shingles = F.expr(
        f"CASE WHEN size(__toks__) >= {n} THEN"
        f" transform(sequence(0, size(__toks__) - {n}),"
        f"   i -> concat_ws(' ', {', '.join(f'__toks__[i+{j}]' for j in range(n))}))"
        f" ELSE array() END"
    )
    return (
        df.withColumn("__toks__", toks)
        .select("doc_id", F.explode(F.array_distinct(shingles)).alias("shingle"))
    )


def dedup_exact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup by content hash: one keeper (min doc_id) per distinct
    normalized text; dup_count tells how many copies existed."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), WS_PLUS, " ")
    return (
        df.select("doc_id", F.md5(norm).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.4,
    max_df: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by exact n-gram Jaccard similarity.

    jaccard = |A∩B| / (|A|+|B|-|A∩B|) over distinct word n-grams; the
    division is int/int in both engines ⇒ bit-identical, no rounding.

    This is the VERIFICATION primitive (LSH is the deployed path): the
    shingle self-join emits one row per co-occurring doc pair, so a
    shingle present in D documents costs D² rows. ``max_df`` (r9)
    stop-lists shingles whose document frequency exceeds it BEFORE the
    self-join — the same statistical stop-listing as ``bm25.py``'s
    ``max_df_ratio`` — which bounds the candidate volume to
    ``max_df × n_shingle_rows`` (linear in the corpus) and makes the
    exact form safe to run casually on a big corpus. Boilerplate-grade
    shingles carry no near-dup signal, but dropping them DOES redefine
    the measure: jaccard is then computed over the capped shingle
    universe (``n_shingles`` counts surviving shingles only), so pairs
    whose entire overlap was stop-listed disappear. Default ``None``
    keeps the exact semantics bit-for-bit (the rotated oracle
    ``dedup_ngram_jaccard_exact`` runs the default)."""
    sh = shingles_df(df, text_col, n)
    if max_df is not None:
        # hot list via aggregation (map-side partial combine absorbs the
        # skewed key before the shuffle — a shingle-partitioned window
        # would pile the hot shingle's D rows into one task). No forced
        # broadcast on the anti-join: the hot-list row count is bounded
        # only by n_shingle_rows / max_df, which at the corpus scale
        # max_df exists for (small max_df over a huge corpus) can reach
        # millions of shingles — AQE picks broadcast when the built list
        # is actually small and falls back to a shuffled anti-join when
        # it isn't (same rationale as decontaminate.py's flagged-id set).
        hot = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") > max_df)
            .select("shingle")
        )
        sh = sh.join(hot, "shingle", "left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    common = (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    j = F.col("n_common").cast("double") / (
        F.col("sa.n_shingles") + F.col("sb.n_shingles") - F.col("n_common")
    )
    return (
        common.join(sizes.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", "n_common", j.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_docs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """32-bit SimHash per document (Charikar): each distinct token votes
    ±1 on every bit of its 32-bit hash; the fingerprint keeps the sign.

    Fully declarative, ONE doc_id-keyed aggregation: bit j's vote sum is
    ``2·ones_j − n`` (ones_j = tokens with bit j set, n = distinct
    tokens), so the 32 vote sums are 32 aggregate columns over the
    (doc_id, token-hash) rows — no token × 32 bit-position explosion and
    one shuffle instead of two (the r2 form exploded 32× the token
    volume through a (doc_id, j) shuffle, then shuffled again). The
    token hash is the first 8 md5 hex digits parsed as an integer,
    identical in the SQL oracle (``CAST('0x'||substr(md5(t),1,8) AS
    BIGINT)``). Bit set iff vote sum strictly ``> 0`` (⇔ 2·ones_j > n)
    in both engines.
    """
    toks = (
        df.withColumn("__toks__", tokens_col(F.col(text_col)))
        .select("doc_id", F.explode(F.array_distinct("__toks__")).alias("token"))
        .withColumn(
            "h",
            F.conv(F.substring(F.md5("token"), 1, 8), 16, 10).cast("bigint"),
        )
    )
    ones = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("__n__"),
        *[
            F.sum(F.expr(f"shiftright(h, {j}) & 1")).alias(f"__ones_{j:02d}")
            for j in range(32)
        ],
    )
    fingerprint = None
    for j in range(32):
        bit = F.when(
            2 * F.col(f"__ones_{j:02d}") > F.col("__n__"), F.lit(1 << j)
        ).otherwise(F.lit(0))
        fingerprint = bit if fingerprint is None else fingerprint + bit
    return ones.select(
        "doc_id", fingerprint.cast("bigint").alias("simhash")
    )


def simhash_pairs(
    df: DataFrame, text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance — EXACT result via
    pigeonhole block bucketing (no all-pairs join anywhere).

    Split the 32-bit fingerprint into ``max_hamming + 1`` contiguous
    blocks: two fingerprints within Hamming distance d differ in at most
    d blocks, so at least one block matches *exactly* (pigeonhole).
    Candidates therefore come from an equi-join on (block index, block
    value) — the same shuffle shape as the MinHash bands — and the exact
    Hamming predicate verifies only the candidate set. Recall is 1.0 by
    construction (tested equal to the naive quadratic form), so the
    oracle of the all-pairs definition still applies unchanged.

    Scale: the join key (blk, blk_val) is near-uniform for d ≤ 7 (blocks
    of ≥ 4 bits over hash-derived fingerprints); a corpus of true
    duplicates concentrates some buckets, which AQE skew-split handles —
    never a cross product.
    """
    return simhash_fingerprint_pairs(simhash_docs(df, text_col), max_hamming)


def simhash_fingerprint_pairs(
    sh: DataFrame, max_hamming: int = 3
) -> DataFrame:
    """Pigeonhole block-bucket pairing over a (doc_id, simhash) frame —
    the candidate-generation + verify core of :func:`simhash_pairs`,
    exposed separately so the exactness property (≡ naive all-pairs) is
    testable on arbitrary fingerprints.

    The 32 fingerprint bits are spread EVENLY across the blocks (widths
    differ by at most 1, no block reaches past bit 31) — a fixed ceil
    width would leave every block past bit 31 constant-zero for
    ``max_hamming >= 8``, collapsing all docs into one bucket (an exact
    result, but a silent all-pairs cross product)."""
    return fingerprint_pairs(sh, max_hamming, bits=32)


def fingerprint_pairs(
    sh: DataFrame,
    max_hamming: int,
    bits: int = 32,
    id_col: str = "doc_id",
    hash_col: str = "simhash",
) -> DataFrame:
    """Generalized pigeonhole block-bucket pairing over an
    ``(id, fingerprint)`` frame of ``bits``-wide hashes — shared by the
    32-bit text SimHash and the 64-bit image dHash
    (``multimodal.image_near_dup_pairs``). Semantics and scale shape are
    those of :func:`simhash_fingerprint_pairs`; the block widths spread
    the ``bits`` evenly over ``max_hamming + 1`` blocks."""
    if not 1 <= bits <= 64:
        raise ValueError(f"bits must be in [1, 64], got {bits}")
    if not 0 <= max_hamming <= bits - 1:
        raise ValueError(
            f"max_hamming must be in [0, {bits - 1}] for {bits}-bit "
            f"fingerprints, got {max_hamming}"
        )
    n_blocks = max_hamming + 1
    base, rem = divmod(bits, n_blocks)
    widths = [base + 1] * rem + [base] * (n_blocks - rem)
    offsets = [sum(widths[:b]) for b in range(n_blocks)]
    blocks = sh.select(
        F.col(id_col).alias("doc_id"),
        F.col(hash_col).alias("__fp__"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("blk"),
                        # arithmetic shift sign-extends the top block of a
                        # 64-bit hash; the width mask cuts it back down.
                        # A full-width (single-)block mask would overflow
                        # the bigint literal — the raw hash IS the value.
                        F.expr(
                            f"shiftright({hash_col}, {offsets[b]})"
                            f" & {(1 << widths[b]) - 1}"
                            if widths[b] < 64
                            else hash_col
                        ).alias("blk_val"),
                    )
                    for b in range(n_blocks)
                ]
            )
        ).alias("bv"),
    ).select(
        "doc_id",
        "__fp__",
        F.col("bv.blk").alias("blk"),
        F.col("bv.blk_val").alias("blk_val"),
    )
    hamming = F.bit_count(
        F.col("a.__fp__").bitwiseXOR(F.col("b.__fp__"))
    ).cast("int")
    return (
        blocks.alias("a")
        .join(blocks.alias("b"), ["blk", "blk_val"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["doc_a", "doc_b"])
    )


def simhash_pairs_naive(
    df: DataFrame, text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """All-pairs reference form of :func:`simhash_pairs` (quadratic theta
    self-join) — test oracle only, never a catalog path: feed it
    fixtures, not corpora."""
    sh = simhash_docs(df, text_col)
    a, b = sh.alias("a"), sh.alias("b")
    hamming = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    ).cast("int")
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def minhash_signatures(
    df: DataFrame, text_col: str = "text", n: int = 3, k: int = MINHASH_K
) -> DataFrame:
    """(doc_id, mh_00..mh_<k-1>) — k independent min-hashes per document
    in ONE hash aggregation.

    hash_i(shingle) = md5('<i:02d>|' || shingle); the min over a doc's
    shingles approximates a uniform permutation sample. String min is
    byte-wise in both engines. Computing the k mins as k aggregate
    columns over one (doc_id)-keyed shuffle replaces the naive
    seed-explode plan (k× the rows through a (doc_id, seed) shuffle) —
    same result, one stage, 1/k the shuffle volume.
    """
    return _signatures_from_shingles(shingles_df(df, text_col, n), k)


def _signatures_from_shingles(sh: DataFrame, k: int = MINHASH_K) -> DataFrame:
    # n_shingles rides along in the SAME aggregation: the verify stage
    # needs per-doc shingle counts, and computing them here saves a whole
    # second pass (shuffle) over the shingle set
    return sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        *[
            F.min(
                F.md5(F.concat(F.lit(f"{i:02d}|"), F.col("shingle")))
            ).alias(f"mh_{i:02d}")
            for i in range(k)
        ]
    )


def bands_from_signatures(
    sig: DataFrame, k: int = MINHASH_K, band_rows: int = BAND_ROWS
) -> DataFrame:
    """(doc_id, band, band_sig) from a minhash-signature frame — a pure
    projection + explode (no shuffle). Band signature = md5 of the
    seed-ordered 'seed:minhash' strings, so the same signature row
    always produces the same buckets (batch, incremental-state, and
    oracle paths all agree)."""
    n_bands = k // band_rows
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[
                            F.concat(
                                F.lit(f"{i:02d}:"), F.col(f"mh_{i:02d}")
                            )
                            for i in range(b * band_rows, (b + 1) * band_rows)
                        ],
                    )
                ).alias("band_sig"),
            )
            for b in range(n_bands)
        ]
    )
    return sig.select("doc_id", F.explode(band_structs).alias("bs")).select(
        "doc_id",
        F.col("bs.band").alias("band"),
        F.col("bs.band_sig").alias("band_sig"),
    )


def minhash_lsh_pairs(
    df: DataFrame | None = None,
    text_col: str = "text",
    n: int = 3,
    k: int = MINHASH_K,
    band_rows: int = BAND_ROWS,
    threshold: float = 0.4,
    *,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """MinHash-LSH candidate generation + exact-Jaccard verification.

    Bands: seeds [0..k) grouped by ``seed div band_rows``; band signature =
    md5 of the seed-ordered minhashes. Docs sharing ANY band bucket become
    candidates; candidates are verified with the exact n-gram Jaccard, so
    the output is a *subset* of :func:`ngram_jaccard_pairs` (LSH recall
    < 1 by design — that's the scale trade).

    The shingle set feeds BOTH the signature and verify stages (the plan
    references it three times: signatures, verify side A, verify side B).
    It is deliberately NOT persisted (r13 opt): the three consumers each
    re-run only the zero-shuffle tokenize+explode projection over the
    scan — a linear pass Spark pipelines into each consumer's first
    stage — while a ``persist()`` here was measured strictly slower at
    sf0.1 (2.93 s → 2.21 s for the benched dedup_minhash_lsh after
    removal: the eager physical-planning at persist() time, the columnar
    cache write, and AQE being disabled inside the cached plan cost more
    than three cheap scans). At 100 TB the same trade holds — the
    recomputed work is a projection over column-pruned parquet, not a
    shuffle. Callers that already hold a shingle frame pass
    ``shingles=`` (as :func:`clean_corpus` does) and own its lifetime.
    """
    if shingles is None:
        if df is None:
            raise ValueError("pass df or shingles")
        shingles = shingles_df(df, text_col, n)
    sig = _signatures_from_shingles(shingles, k)
    bands = bands_from_signatures(sig, k, band_rows)
    candidates = (
        bands.alias("a")
        .join(bands.alias("b"), ["band", "band_sig"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    # verify ONLY the candidate pairs (never the corpus cross-product):
    # candidate ⋈ shingles on each side, equi on shingle, count overlap;
    # per-doc sizes come from the signature aggregation (no second pass)
    sh = shingles
    sizes = sig.select("doc_id", "n_shingles")
    common = (
        candidates.join(sh.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(
            sh.alias("sb"),
            (F.col("doc_b") == F.col("sb.doc_id"))
            & (F.col("sa.shingle") == F.col("sb.shingle")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    j = F.col("n_common").cast("double") / (
        F.col("za.n_shingles") + F.col("zb.n_shingles") - F.col("n_common")
    )
    pairs = (
        common.join(sizes.alias("za"), F.col("doc_a") == F.col("za.doc_id"))
        .join(sizes.alias("zb"), F.col("doc_b") == F.col("zb.doc_id"))
        .select("doc_a", "doc_b", "n_common", j.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
    return pairs


def connected_components(
    pairs: DataFrame, max_iter: int = 25, steps_per_round: int = 2
) -> DataFrame:
    """Canonicalize near-dup pairs into clusters: (doc_id, component)
    where ``component`` is the MIN doc_id reachable through the pair
    graph — the standard upgrade over one-sided pair dropping when dup
    chains matter (a~b, b~c ⇒ one cluster {a,b,c} even though a~c was
    never a candidate pair).

    Algorithm: min-label propagation — every node repeatedly adopts the
    smallest label among itself and its neighbors until no label
    changes. Propagation steps needed = graph diameter, and LSH
    candidate graphs have tiny components (near-dup chains), so this
    converges in a handful of steps at any corpus size. Two r14 cost
    cuts (guide §2 — fewer jobs, same exact fixpoint):

    - the label init SEEDS each node with ``min(self, direct
      neighbors)`` — the first propagation step fused into the init
      aggregation, replacing the old ``distinct`` (same exchange, one
      whole round saved);
    - ``steps_per_round`` propagation joins chain LAZILY between
      checkpoints, so each materialized round costs ONE checkpoint job
      + ONE convergence count instead of one of each per step. Min-label
      propagation is monotone, so checkpoint placement cannot change the
      fixpoint; the plan stays bounded at ``steps_per_round`` joins deep.

    Lineage is cut every round with ``localCheckpoint`` (eager) —
    without it the plan doubles per round and the driver re-optimizes an
    exponentially growing tree. (Fault-tolerance trade, also noted in
    SCALE.md: checkpointed blocks live on executors only — an executor
    loss mid-loop fails the job instead of recomputing, acceptable for
    an iterative batch loop that simply re-runs.) Deterministic: labels
    are min doc_ids, independent of partitioning.

    Raises if not converged within ``max_iter`` rounds (a pair graph
    with a longer diameter than that is not a near-dup graph —
    investigate).
    """
    edges = pairs.select("doc_a", "doc_b")
    # materialize the symmetric edge list ONCE: every round joins
    # against it (plus the convergence count), and `pairs` is typically
    # an expensive LSH plan that must not re-execute per round
    sym = edges.union(
        edges.select(
            F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
        )
    ).localCheckpoint(eager=True)
    labels = (
        sym.groupBy(F.col("doc_a").alias("doc_id"))
        .agg(F.min("doc_b").alias("__mn__"))
        .select(
            "doc_id",
            F.least(F.col("doc_id"), F.col("__mn__")).alias("component"),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # the round-start label rides along so the convergence flag can
        # be computed on the row being checkpointed (labels are monotone
        # non-increasing: end != start ⇔ some step in the round changed)
        cur = labels.select(
            "doc_id", "component", F.col("component").alias("__start__")
        )
        for _ in range(max(1, steps_per_round)):
            neigh = (
                sym.join(cur, sym["doc_b"] == cur["doc_id"])
                .groupBy(F.col("doc_a").alias("doc_id"))
                .agg(F.min("component").alias("neigh_min"))
            )
            cur = cur.join(neigh, "doc_id", "left").select(
                "doc_id",
                F.least(
                    F.col("component"),
                    F.coalesce("neigh_min", F.col("component")),
                ).alias("component"),
                "__start__",
            )
        flagged = cur.select(
            "doc_id",
            "component",
            (F.col("component") != F.col("__start__")).alias("__changed__"),
        ).localCheckpoint(eager=True)
        changed = flagged.filter("__changed__").count()
        labels = flagged.drop("__changed__")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations "
        "— the pair graph has pathologically long chains for a near-dup "
        "candidate graph"
    )


def dedup_keep_canonical(
    df: DataFrame, pairs: DataFrame, max_iter: int = 25
) -> DataFrame:
    """Cluster-canonical dedup: keep exactly one document (the min
    doc_id) per connected near-dup cluster, plus every document in no
    pair at all. Strictly stronger than the one-sided rule
    :func:`clean_corpus` uses — chains collapse to ONE keeper instead
    of one-per-edge-direction — at the cost of the iterative label
    propagation."""
    comp = connected_components(pairs, max_iter)
    drop = comp.filter(F.col("doc_id") != F.col("component")).select("doc_id")
    return df.join(drop, "doc_id", "left_anti")


def clean_corpus(
    df: DataFrame, text_col: str = "text", threshold: float = 0.2
) -> DataFrame:
    """End-to-end corpus cleaning (the composite a training-data pipeline
    actually runs — each stage is the operator tested above):

    1. quality gate — ``textops.token_stats`` trainability heuristics;
    2. exact dedup — keep the min-doc_id copy per normalized content;
    3. near-dup removal — MinHash-LSH pairs at ``threshold``; any doc
       similar to a LOWER-id doc drops (one-sided rule: deterministic,
       non-iterative — unlike connected-components canonicalization it
       needs no fixpoint loop, at the cost of keeping at most one doc of
       each near-dup chain edge-wise).

    Scale: stages only shrink data; the LSH stage (the expensive one)
    runs on the already-gated unique set. The shingle frame is NOT
    persisted (r13 opt — see :func:`minhash_lsh_pairs`): its consumers
    re-run only a pipelined tokenize+explode projection, measured
    cheaper than the cache write + AQE-blocked cached plan at sf0.1
    (benched clean_corpus 3.61 s → 3.22 s after removal), and at 100 TB
    the recompute is a column-pruned linear scan, not a shuffle.
    Returns the surviving document rows.
    """
    from lakehouse_adventureworks2022_spark.operators import textops

    stats = textops.token_stats(df, text_col)
    quality = df.join(
        stats.filter(F.col("is_quality")).select("doc_id"), "doc_id", "left_semi"
    )
    keepers = dedup_exact(quality, text_col).select(
        F.col("keeper_doc_id").alias("doc_id")
    )
    uniq = quality.join(keepers, "doc_id", "left_semi")
    shingles = shingles_df(uniq, text_col)
    pairs = minhash_lsh_pairs(threshold=threshold, shingles=shingles)
    dropped = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    return uniq.join(dropped, "doc_id", "left_anti").select(
        "doc_id", "source", "lang", "n_chars"
    )


# ---- incremental dedup against historical state ----------------------
#
# A production corpus is not re-deduplicated from scratch per ingest:
# the daily batch (small) is checked against persisted state tables
# from everything ingested before (huge). The 100 TB shape is therefore
# "broadcast the batch, stream the state": the historical side never
# shuffles and is scanned at most once per ingest.


def content_hash_col(text_col: str = "text"):
    """The engine-wide exact-dup content hash (same normalization as
    :func:`dedup_exact`)."""
    return F.md5(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), WS_PLUS, " ")
    )


def dedup_state(
    df: DataFrame, text_col: str = "text", n: int = 3, k: int = MINHASH_K
) -> tuple[DataFrame, DataFrame]:
    """Build the persistable dedup state of a corpus:
    ``(content_hashes, minhash_signatures)``.

    - ``content_hashes``: distinct normalized-content md5s — the exact-
      dup membership table.
    - ``minhash_signatures``: (doc_id, n_shingles, mh_00..mh_<k-1>) —
      enough to re-derive band buckets (:func:`bands_from_signatures`,
      a projection) AND estimate Jaccard against new docs WITHOUT
      storing shingles (state is O(docs), not O(tokens)).

    Write both with ``TableManager`` and APPEND each ingest's accepted
    batch — state grows monotonically with the corpus.
    """
    hashes = df.select(content_hash_col(text_col).alias("content_hash")).distinct()
    return hashes, minhash_signatures(df, text_col, n, k)


def incremental_dedup(
    new_df: DataFrame,
    state_hashes: DataFrame,
    state_sigs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    k: int = MINHASH_K,
    band_rows: int = BAND_ROWS,
    threshold: float = 0.5,
    bloom: "BloomFilter | None" = None,
    max_pushdown_hashes: int = 1024,
) -> DataFrame:
    """Surviving rows of ``new_df`` after dedup against BOTH the
    historical state and the batch itself:

    1. exact vs history — matched hashes found by streaming the state
       once against the BROADCAST batch hash set (left-semi), then the
       small match set broadcasts back into a left-anti on the batch:
       the big side never shuffles (plan-asserted in tests);
    2. exact within batch — :func:`dedup_exact` keeper rule;
    3. near-dup vs history — historical band buckets re-derived from
       the signature state (projection) joined against the broadcast
       batch bands; candidates verified by SIGNATURE-ESTIMATED Jaccard
       (fraction of agreeing minhashes — unbiased, ±~1/sqrt(k); exact
       shingle verification would require storing shingles in state).
       Identical copies agree on all k hashes ⇒ estimate 1.0, so true
       duplicates never slip the estimator;
    4. near-dup within batch — :func:`minhash_lsh_pairs` (exact-Jaccard
       verified; the batch's own shingles are at hand), lower-id keeper.

    When a ``bloom`` sketch of the historical hashes is supplied
    (:mod:`operators.bloom` — built once, OR-grown per accepted batch),
    stage 1 is bloom-gated: bloom-NEGATIVE batch rows are definite-new
    (no false negatives) and skip the state probe entirely; the
    bloom-positive hash list (true dups + fpr×batch — tiny on an
    append-mostly corpus) is collected when ≤ ``max_pushdown_hashes``
    (a bounded driver list, the centroid/merge-table pattern) and pushed
    into the state scan as an ``In()`` filter, so clustered/bloom-
    filtered state parquet prunes row groups instead of full-scanning.
    A dup-heavy batch that overflows the list falls back to the ungated
    broadcast-semi plan above. Output is IDENTICAL either way
    (equivalence + planted-false-positive tests in tests/test_bloom.py).
    """
    gate_stage = incremental_dedup_gate_stage(
        new_df, state_hashes, state_sigs, text_col,
        bloom=bloom, max_pushdown_hashes=max_pushdown_hashes,
    )
    # The exact-deduped batch feeds FOUR downstream subtrees
    # (signatures, the near-dup anti-joins, the within-batch LSH, and
    # the final output). It is cut with an eager localCheckpoint (r13
    # opt): the frame is the BATCH — a daily ingest, small by this
    # operator's contract, never the corpus — and without the cut the
    # optimizer re-inlines the whole vs-history+exact subtree into all
    # four consumers (a ~400-node physical plan costing ~2 s of
    # driver-side Catalyst per run at any data size). localCheckpoint,
    # not persist: it truncates lineage without the CacheManager
    # machinery whose eager physical-planning and AQE loss measured
    # 7.6 s → 18.2 s at sf0.1; the checkpoint measured 4.3 s → 3.5 s
    # with bit-identical output. The operator is therefore eager from
    # here on (the batch dedup runs at call time) — the posture its
    # callers (bench reps, streaming micro-batches that immediately
    # materialize) already assume. Fault-tolerance trade (SCALE.md):
    # checkpointed blocks live on executors only — an executor loss
    # mid-query fails the job instead of recomputing; acceptable for a
    # batch-sized frame whose job simply re-runs.
    fresh = gate_stage.localCheckpoint(eager=True)

    # near-dup vs history: batch signatures (small) broadcast against
    # the state's re-derived band buckets
    new_sigs = minhash_signatures(fresh, text_col, n, k)
    new_bands = bands_from_signatures(new_sigs, k, band_rows)
    state_bands = bands_from_signatures(state_sigs, k, band_rows)
    cand = (
        state_bands.withColumnRenamed("doc_id", "old_id")
        .join(
            F.broadcast(new_bands.withColumnRenamed("doc_id", "new_id")),
            ["band", "band_sig"],
        )
        .select("old_id", "new_id")
        .distinct()
    )
    est = F.col("n_agree").cast("double") / F.lit(k)
    agree = sum(
        F.when(
            F.col(f"o.mh_{i:02d}") == F.col(f"nw.mh_{i:02d}"), 1
        ).otherwise(0)
        for i in range(k)
    )
    near_old = (
        cand.join(state_sigs.alias("o"), cand["old_id"] == F.col("o.doc_id"))
        .join(
            F.broadcast(new_sigs.alias("nw")),
            cand["new_id"] == F.col("nw.doc_id"),
        )
        .withColumn("n_agree", agree)
        .filter(est >= threshold)
        .select(F.col("new_id").alias("doc_id"))
        .distinct()
    )
    fresh = fresh.join(near_old, "doc_id", "left_anti")

    # near-dup within batch (exact verification — shingles available)
    batch_pairs = minhash_lsh_pairs(
        fresh, text_col, n, k, band_rows, threshold=threshold
    )
    dropped = batch_pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    # the vs-history gate (stage 1) + exact keeper join (stage 2) run at
    # BUILD time behind the checkpoint, so the returned plan starts at a
    # Scan ExistingRDD; stage-1/2 plan-shape evidence is audited on the
    # explicit :func:`incremental_dedup_gate_stage` builder (r13 ADVICE:
    # previously an ad-hoc ``_gate_stage`` attribute on the result,
    # which pinned the pre-checkpoint lineage for the result's lifetime
    # and silently vanished on any derived frame).
    return fresh.join(dropped, "doc_id", "left_anti").drop("__hash__")


def incremental_dedup_gate_stage(
    new_df: DataFrame,
    state_hashes: DataFrame,
    state_sigs: DataFrame,
    text_col: str = "text",
    bloom: "BloomFilter | None" = None,
    max_pushdown_hashes: int = 1024,
) -> DataFrame:
    """The LAZY stage-1+2 frame of :func:`incremental_dedup` — the
    exact-vs-history gate plus the within-batch exact keeper join, i.e.
    exactly what that operator eagerly checkpoints. Production callers
    use :func:`incremental_dedup`; this builder exists so plan audits
    and tests can assert stage-1 hazards (bloom ``In()`` pushdown into
    the state scan, bloom-negative batches never touching state, the
    broadcast directions) on a plan the checkpoint otherwise hides.
    Building it runs the same bounded bloom-probe collect stage 1 runs;
    nothing is checkpointed or cached here. ``state_sigs`` is unused by
    stages 1-2 but kept so the call mirrors ``incremental_dedup``."""
    del state_sigs  # stages 1-2 only touch the hash state
    new_hashed = new_df.withColumn("__hash__", content_hash_col(text_col))
    if bloom is not None:
        from lakehouse_adventureworks2022_spark.operators import (
            bloom as bloom_mod,
        )

        flagged = bloom_mod.contains_col(
            new_hashed, "__hash__", bloom, "__maybe_dup__"
        )
        probe = (
            flagged.filter("__maybe_dup__")
            .select(F.col("__hash__").alias("content_hash"))
            .distinct()
        )
        cand_rows = probe.limit(max_pushdown_hashes + 1).collect()
        new_hashed = flagged.drop("__maybe_dup__")
        if not cand_rows:
            # every batch row is definite-new: the state table is never
            # even scanned this ingest
            fresh = new_hashed
        elif len(cand_rows) <= max_pushdown_hashes:
            cand = [r[0] for r in cand_rows]
            matched = state_hashes.filter(F.col("content_hash").isin(cand))
            fresh = new_hashed.join(
                F.broadcast(matched),
                new_hashed["__hash__"] == matched["content_hash"],
                "left_anti",
            )
        else:
            matched = state_hashes.join(F.broadcast(probe), "content_hash", "left_semi")
            fresh = new_hashed.join(
                F.broadcast(matched),
                new_hashed["__hash__"] == matched["content_hash"],
                "left_anti",
            )
    else:
        batch_hashes = new_hashed.select(
            F.col("__hash__").alias("content_hash")
        ).distinct()
        # stream the big state past the broadcast batch set; ship the
        # small intersection back
        matched = state_hashes.join(
            F.broadcast(batch_hashes), "content_hash", "left_semi"
        )
        fresh = new_hashed.join(
            F.broadcast(matched),
            new_hashed["__hash__"] == matched["content_hash"],
            "left_anti",
        )
    keepers = dedup_exact(fresh, text_col).select(
        F.col("keeper_doc_id").alias("doc_id")
    )
    return fresh.join(keepers, "doc_id", "left_semi")
