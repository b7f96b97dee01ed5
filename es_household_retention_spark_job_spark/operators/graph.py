"""Graph analytics (beyond-reference): deterministic fixed-point PageRank.

Classic float PageRank is NOT cross-engine reproducible — per-node
contribution sums depend on float addition order. This operator defines the
semantics in 64-bit FIXED-POINT integers instead: ranks start at ``scale``
(1e6), each iteration computes

    rank' = floor(scale * 15 / 100)
            + (85 * Σ_incoming (rank_src div deg_src)) div 100

with integer division (``div``) throughout — integer sums are
order-independent, so Spark and the DuckDB oracle (the same recurrence
unrolled as CTEs) agree to the last unit. The usual caveats of the
unnormalized variant apply and are part of the defined semantics: dangling
nodes leak mass (callers pass symmetric edge lists, where none exist) and
truncation loses ≤1 unit per edge per round — deterministic on every
engine.

Scale design: each iteration is one join edges⋈ranks on src (ranks is
node-sized — broadcastable for ≤100M-node graphs, hash join beyond) and one
partial-aggregated groupBy(dst); the per-src degree is joined ONCE up front
and the edge list reused every round (cache it). Each round's ranks are
``localCheckpoint``ed (the duplicate_clusters pattern): without it the
5-round nested plan costs more in Catalyst/AQE planning than in data
(measured 15.6s → 4.1s at sf0.01), and at real scale an O(iters)-deep
lineage would re-plan every stage of every earlier round on failure
recovery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000
DAMP_NUM = 85
DAMP_DEN = 100


def pagerank_fixed_point(
    edges: DataFrame,
    iters: int = 5,
    scale: int = SCALE,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, rank) after ``iters`` fixed-point iterations over a DIRECTED
    edge list (pass both directions for an undirected graph)."""
    src, dst = F.col(src_col), F.col(dst_col)
    # nodes and the degree-annotated edge list are read EVERY round — left
    # uncached, each of the `iters` rounds would replay their distinct/
    # groupBy shuffles from scratch
    nodes = (
        edges.select(src.alias("node"))
        .unionByName(edges.select(dst.alias("node")))
        .distinct()
        .persist()
    )
    deg = edges.groupBy(src_col).agg(F.count(F.lit(1)).alias("deg"))
    ed = edges.join(deg, src_col).select(
        src.alias("node"), dst.alias("_dst"), "deg"
    ).persist()
    teleport = scale * (DAMP_DEN - DAMP_NUM) // DAMP_DEN
    ranks = nodes.select("node", F.lit(scale).cast("long").alias("rank"))
    for _ in range(iters):
        summed = (
            ed.join(ranks, "node")
            .select("_dst", F.expr("rank div deg").alias("share"))
            .groupBy("_dst")
            .agg(F.sum("share").alias("m"))
        )
        ranks = (
            nodes.join(summed, nodes.node == summed._dst, "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.expr(
                        f"({DAMP_NUM} * coalesce(m, 0L)) div {DAMP_DEN}"
                    )
                )
                .cast("long")
                .alias("rank"),
            )
            .localCheckpoint()  # eager: the final round materializes ranks
        )
    nodes.unpersist()
    ed.unpersist()
    return ranks
