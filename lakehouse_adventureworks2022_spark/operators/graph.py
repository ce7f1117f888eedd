"""Host-graph analytics over crawl link structure — PageRank power
iteration on the ``(src_host, dst_host, n_links)`` edges that
``textops.host_link_graph`` aggregates out of a crawl. The rank is the
classic crawl-prioritization / quality-prior signal (Page et al. 1999;
CommonCrawl publishes exactly this as its host-level ranks), and on the
training-data side a per-host authority prior that curation mixes into
quality scoring.

Spark-first shape: the edge table is normalized ONCE (per-source
fractions, repartitioned by source and persisted), then every iteration
is one equi-join on the source key + one uniform-key aggregation on the
destination — the Pregel message-passing step expressed as DataFrame
ops. Dangling mass (nodes with no out-edges) and the teleport term are
attached via a ONE-ROW scalar aggregate broadcast join (the plan
audit's whitelisted scalar-NL class) — zero driver-side collects inside
the loop. Lineage is truncated with an eager ``localCheckpoint`` per
iteration, so the plan stays constant-size however many iterations run
(the documented iterative-algorithm posture; Connect note: substitute
persist+count on servers without localCheckpoint).

Reference parity note: the reference pipeline (racenak/
lakehouse-adventureworks2022) has no graph surface — this module is
part of the beyond-reference training-data layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakehouse_adventureworks2022_spark.session import default_parallelism


def pagerank(
    edges: DataFrame,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    weight_col: str | None = "n_links",
    iterations: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """Weighted PageRank by fixed-iteration power method. Returns
    ``(node, rank)`` over every node that appears as a source or a
    destination; ranks sum to 1 (the probability interpretation —
    invariant-tested). Self-loops count like any edge; parallel edges
    should be pre-aggregated into ``weight_col`` (what
    ``host_link_graph`` emits); pass ``weight_col=None`` for the
    unweighted uniform split.

    Scale: per iteration exactly ONE shuffle pair (join on the source
    key — co-located with the edge table's persisted partitioning —
    plus the destination aggregation). The rank frame is (node, rank)
    only: payloads never enter the loop. ``iterations`` is fixed, not
    convergence-tested — the deployment contract for reproducible
    ranks (same input, same output, any cluster size)."""
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    e = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        w.alias("w"),
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .repartition(default_parallelism(edges.sparkSession), "node")
        .persist()
    )
    n = nodes.count()  # bounded: one scalar for the teleport term
    # per-source outgoing fractions, built once and persisted
    # co-partitioned on the join key every iteration reuses
    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    frac = (
        e.join(out_w, "src")
        .select("src", "dst", (F.col("w") / F.col("out_w")).alias("frac"))
        .repartition(default_parallelism(edges.sparkSession), "src")
        .persist()
    )
    frac.count()  # materialize before the loop reads it repeatedly
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(iterations):
        contribs = (
            frac.join(ranks, frac["src"] == ranks["node"])
            .select("dst", (F.col("frac") * F.col("rank")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        # dangling mass = rank not redistributed by any edge. The total
        # redistributed IS sum(contrib), so dangling = 1 - that sum
        # (ranks sum to 1 by construction) — a one-row aggregate
        # attached by broadcast, never a driver collect in the loop.
        dangling = contribs.agg(
            (1.0 - F.coalesce(F.sum("contrib"), F.lit(0.0))).alias(
                "__dangling__"
            )
        )
        ranks = (
            nodes.join(
                contribs, nodes["node"] == contribs["dst"], "left"
            )
            .join(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("__dangling__") / n
                    )
                ).alias("rank"),
            )
            # constant-size plan however many iterations run
            .localCheckpoint(eager=True)
        )
    nodes.unpersist()
    frac.unpersist()
    return ranks
