"""Iterative graph operators: PageRank to convergence.

Third member of the repo's iterative-algorithm family
(``dedup.duplicate_clusters`` min-label propagation,
``similarity.train_ivf_centroids`` distributed Lloyd's) with the same
loop discipline: per-round ``localCheckpoint`` lineage truncation, a
hard iteration cap that raises instead of silently truncating, and
driver-side state bounded to scalars.

Ranks are FIXED-POINT bigints (:data:`SCALE`, the single source —
``plans/graph`` imports it): floor-divided
contributions sum exactly regardless of partitioning/fold order, so
two runs (or two engines) agree bit-for-bit — floats only appear in
the convergence metric, which is advisory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fixed-point scale for rank arithmetic (exact in bigint for
#: realistic node counts: SCALE * 85 < 2^63 leaves ~10^5 headroom).
SCALE = 1_000_000_000_000

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    damping_pct: int = 85,
    max_iters: int = 120,
    tol_fp: int = SCALE // 1_000_000,
) -> DataFrame:
    """PageRank over a directed ``(src, dst)`` edge table; returns
    (node, rank_fp) with fixed-point bigint ranks.

    Dangling nodes: every distinct src or dst is a node; nodes with
    no out-edges redistribute nothing (their mass exits — the
    plain-teleport formulation, matching ``plans/graph.
    pagerank_iteration``'s single step at iteration 1).

    Convergence: stop when the L1 delta (in fixed-point units) drops
    to ``tol_fp``, else raise after ``max_iters`` — silent
    non-convergence would ship wrong ranks downstream. The geometric
    contraction rate IS the damping factor, so iterations ≈
    ln(tol)/ln(d): d=0.85 with tol=1e-6 needs ~85 rounds — the
    default cap (120) covers it with headroom; production graphs
    usually run a looser tol (1e-4 ≈ 57 rounds). Each round is
    ONE edge-grain join + one dst aggregate (the vertex-cut shape);
    ranks/degrees stay node-grain. ``localCheckpoint`` per round
    truncates lineage exactly like the connected-components loop.
    """
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()  # driver scalar, bounded
    if n_nodes == 0:
        raise ValueError("pagerank: empty edge table (no nodes to rank)")
    deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    teleport = (100 - damping_pct) * SCALE // (100 * n_nodes)
    ranks = nodes.select("node", F.lit(SCALE // n_nodes).cast("long").alias("r"))
    delta = None  # set per round; None = no round ran (max_iters=0)
    for it in range(max_iters):
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr(f"({damping_pct} * r) div (100 * out_deg)").cast("long").alias("c"),
            )
        )
        sums = contrib.groupBy("node").agg(F.sum("c").alias("c_sum"))
        new_ranks = (
            nodes.join(sums, "node", "left")
            .select(
                "node",
                (F.lit(teleport) + F.coalesce(F.col("c_sum"), F.lit(0)))
                .cast("long")
                .alias("r"),
            )
            .localCheckpoint(eager=True)
        )
        delta = (
            new_ranks.alias("n")
            .join(ranks.alias("o"), "node")
            .agg(F.sum(F.abs(F.col("n.r") - F.col("o.r"))).alias("d"))
            .collect()[0]
            .d
        )
        ranks = new_ranks
        if delta <= tol_fp:
            return ranks.select("node", F.col("r").alias("rank_fp"))
    raise RuntimeError(
        f"pagerank did not converge in {max_iters} iterations (last L1 delta {delta} fp units)"
    )
