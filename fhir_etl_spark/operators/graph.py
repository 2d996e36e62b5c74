"""Iterative graph operators beyond connected components.

dedup_clusters (operators/dedup.py) is min-label propagation — an
UNWEIGHTED fixpoint. PageRank is its weighted sibling and the standard
stress test for iterative dataflow on a cluster: per iteration, each
node ships rank/out_degree along its edges and folds the damping term.

Scale shape per iteration: one key-partitioned join (ranks ⋈ edges on
src) + one aggregation on dst — both shuffles on node ids, never on
payloads; `localCheckpoint` truncates the growing lineage every few
rounds exactly as the CC loop does. Edges / out-degrees / the dangling
node SET are pinned once before the loop (the mined edge pipeline must
never re-execute per iteration); dangling MASS needs one bounded 1-row
action per iteration, skipped entirely when the dangling set is empty
(the common case for symmetrized similarity graphs).
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
    # The edge list is often the output of an expensive mining pipeline
    # (e.g. g2 feeds near-dup pairs in) — pin it ONCE so the loop never
    # re-executes the upstream plan, and derive out-degrees once with it.
    edges = edges.select("src", "dst").localCheckpoint()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    out_deg = edges.groupBy("src").agg(F.count("*").alias("out_deg")).localCheckpoint()
    # Dangling NODES are static across iterations (only their mass moves):
    # compute the set once; when it's empty — the common case for
    # symmetrized similarity graphs — the loop runs with zero per-iteration
    # driver actions.
    dangling_nodes = nodes.join(
        out_deg, nodes.node == out_deg.src, "left_anti"
    ).localCheckpoint()
    n_dangling = dangling_nodes.count()

    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for it in range(n_iterations):
        if n_dangling:
            # mass stuck on dangling nodes, redistributed uniformly —
            # a bounded 1-row action over checkpointed inputs only
            dangling = (
                ranks.join(dangling_nodes, "node")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
                .first()[0]
            )
        else:
            dangling = 0.0
        with_deg = ranks.join(out_deg, ranks.node == out_deg.src).select(
            "node", "rank", "out_deg"
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
