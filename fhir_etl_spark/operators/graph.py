"""Iterative graph operators beyond connected components.

dedup_clusters (operators/dedup.py) is min-label propagation — an
UNWEIGHTED fixpoint. PageRank is its weighted sibling and the standard
stress test for iterative dataflow on a cluster: per iteration, each
node ships rank/out_degree along its edges and folds the damping term.

Scale shape per iteration: one key-partitioned join (ranks ⋈ edges on
src) + one aggregation on dst — both shuffles on node ids, never on
payloads; `localCheckpoint` truncates the growing lineage every few
rounds exactly as the CC loop does. Dangling nodes (no out-edges)
redistribute uniformly via one scalar aggregate per iteration (a 1-row
action, bounded like the CC convergence probe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    n_iterations: int = 10,
    damping: float = 0.85,
    checkpoint_every: int = 3,
) -> DataFrame:
    """PageRank over a directed edge list (src, dst) → (node, rank).

    Ranks sum to ~1.0 (dangling mass redistributed uniformly). Fixed
    iteration count — deterministic given the edge list; float summation
    order makes exact cross-engine hashing inappropriate, so correctness
    is pinned by the analytic small-graph test instead of a value oracle.
    """
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    out_deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))

    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for it in range(n_iterations):
        with_deg = ranks.join(out_deg, ranks.node == out_deg.src, "left").select(
            "node", "rank", "out_deg"
        )
        # mass stuck on dangling nodes, redistributed uniformly
        dangling = (
            with_deg.filter(F.col("out_deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .first()[0]
        )
        contribs = (
            edges.join(with_deg, edges.src == with_deg.node)
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("in_mass"))
        )
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (F.lit(base) + F.lit(damping) * F.coalesce(F.col("in_mass"), F.lit(0.0))).alias("rank"),
            )
        )
        if (it + 1) % checkpoint_every == 0 or it == n_iterations - 1:
            ranks = ranks.localCheckpoint()
    return ranks
