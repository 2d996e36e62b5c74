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


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts over an undirected graph given as an edge
    list (src, dst) in either or both orientations → (node, n_triangles),
    nodes in ≥1 triangle only.

    The standard scalable formulation (node-iterator with degree
    orientation, as in every distributed graph library): orient each
    undirected edge from its lower-(degree, id) endpoint to the higher
    one, enumerate wedges from each apex (two out-edges), and close them
    against the oriented edge list. The orientation bounds every node's
    out-degree by O(sqrt(m)) on any graph — the wedge self-join, the one
    step that can go quadratic, never enumerates a high-degree star from
    its hub. Each triangle is found exactly once (apex = its minimum
    (degree, id) corner). Shuffles: degree agg + two joins + the final
    count, all on node-id keys; no driver-side state.
    """
    canon = (
        edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()  # the edge list is often a mined-pair plan; pin it
    )
    deg = (
        canon.select(F.col("u").alias("node"))
        .unionByName(canon.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    with_deg = (
        canon.join(deg.select(F.col("node").alias("u"), F.col("deg").alias("du")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("deg").alias("dv")), "v")
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = with_deg.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
    )
    a = oriented.select(F.col("src").alias("apex"), F.col("dst").alias("c1"))
    b = oriented.select(F.col("src").alias("apex"), F.col("dst").alias("c2"))
    wedges = a.join(b, "apex").where(F.col("c1") < F.col("c2"))
    closed = wedges.join(
        canon,
        (F.least("c1", "c2") == F.col("u")) & (F.greatest("c1", "c2") == F.col("v")),
    ).select("apex", "c1", "c2")
    return (
        closed.select(
            F.explode(F.array(F.col("apex"), F.col("c1"), F.col("c2"))).alias("node")
        )
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )


def bfs_hops(
    edges: DataFrame, sources: DataFrame, max_hops: int = 10
) -> DataFrame:
    """Multi-source BFS: minimum hop distance from any source →
    (node, dist), dist ≤ ``max_hops``. ``edges`` is directed (src, dst) —
    pass both orientations for an undirected graph; ``sources`` is a
    one-column (node) DataFrame (seeded at dist 0 even if isolated).

    Frontier-based iteration — the textbook distributed BFS shape: each
    round joins only the NEWLY discovered frontier against the edge list
    (not the whole label table), so per-round work is proportional to the
    expanding wave, and the loop stops at the first empty frontier (one
    cheap isEmpty probe per round over a checkpointed frontier). Labels
    are append-only — a node's first discovery round IS its min distance,
    so no min-aggregation fixpoint is needed.
    """
    e = edges.select("src", "dst").distinct().localCheckpoint()
    labels = (
        sources.selectExpr("node").distinct()
        .select("node", F.lit(0).alias("dist"))
        .localCheckpoint()
    )
    frontier = labels
    for hop in range(1, max_hops + 1):
        frontier = (
            frontier.join(e, frontier.node == e.src)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(labels, "node", "left_anti")
            .select("node", F.lit(hop).alias("dist"))
            .localCheckpoint()
        )
        if frontier.isEmpty():
            break
        labels = labels.unionByName(frontier).localCheckpoint()
    return labels


def label_propagation(
    edges: DataFrame,
    n_iterations: int = 3,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan 2007)
    over a directed edge list (src, dst) → (node, community).

    Every node starts labeled with itself; each round, every node adopts
    the MOST FREQUENT label among its in-neighbors, smallest label
    breaking ties (the paper breaks ties randomly — the deterministic
    rule is what makes the run reproducible and oracle-able). Fixed
    iteration count, synchronous updates (all nodes step together from
    the previous round's labels). Distinct from dedup_clusters'
    connected components: CC is a min-label FIXPOINT (pure reachability),
    LPA's majority vote separates densely-knit groups inside one
    component and is the standard cheap community detector.

    Scale shape per iteration: one key-partitioned join (labels ⋈ edges
    on src) + a (dst, label) count with map-side partial aggregation +
    an argmax agg on dst — all shuffles on node ids, payload is one
    BIGINT label. The argmax is max(struct(count, -label)) — a plain
    aggregate, never a whole-graph window sort. Labels are required
    numeric for the negate trick; mint ids upstream for string keys.
    """
    edges = edges.select("src", "dst").localCheckpoint()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    labels = nodes.select("node", F.col("node").alias("community"))
    for it in range(n_iterations):
        votes = (
            edges.join(labels, edges.src == labels.node)
            .groupBy(F.col("dst").alias("node"), "community")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        winner = (
            votes.groupBy("node")
            .agg(F.max(F.struct(F.col("c"), (-F.col("community")).alias("neg"))).alias("m"))
            .select("node", (-F.col("m.neg")).alias("community"))
        )
        # nodes with no in-neighbors keep their previous label — with a
        # symmetrized edge list this branch never fires, but the operator
        # must not silently drop nodes on directed inputs
        labels = (
            labels.select("node", F.col("community").alias("prev"))
            .join(winner, "node", "left")
            .select("node", F.coalesce("community", "prev").alias("community"))
        )
        if (it + 1) % checkpoint_every == 0 or it == n_iterations - 1:
            labels = labels.localCheckpoint()
    return labels


def k_core(edges: DataFrame, k: int, max_rounds: int = 16) -> DataFrame:
    """k-core decomposition by iterative peeling (Seidman 1983; the
    standard community-pruning / influence-backbone pass): repeatedly
    drop every node whose degree among SURVIVORS is < k until a fixed
    point. Input is an undirected pair list (src, dst), one row per
    edge in either orientation; output is (node, core_degree) for the
    members of the k-core, where core_degree is the node's degree
    WITHIN the core (≥ k by construction).

    Iteration shape (the pagerank/label-propagation pattern): each
    round is one groupBy-degree over edges restricted to the surviving
    node set — two semi joins + one count agg, localCheckpoint'd so the
    lineage stays flat — with a bounded 1-row driver probe for early
    stop. Rounds are data-dependent (a chain peels one node per round),
    so the operator stops early at the fixed point but RAISES loudly if
    ``max_rounds`` arrives before convergence: returning a half-peeled
    set would silently claim non-core nodes are core members. The v-g6
    oracle replays a fixed ``max_rounds`` horizon — idempotent once
    converged, so early stop changes nothing.
    """
    if k < 1:
        raise ValueError(f"k_core: k must be >= 1, got {k}")
    und = (
        edges.selectExpr("src AS a", "dst AS b")
        .unionByName(edges.selectExpr("dst AS a", "src AS b"))
        .where("a <> b")  # a self-loop is not a neighbor
        .distinct()
        .localCheckpoint()
    )
    surv = und.select(F.col("a").alias("node")).distinct().localCheckpoint()
    for _ in range(max_rounds):
        deg = (
            und.join(surv.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(surv.withColumnRenamed("node", "b"), "b", "left_semi")
            .groupBy("a")
            .agg(F.count(F.lit(1)).alias("_deg"))
        )
        nxt = deg.filter(F.col("_deg") >= k).select(
            F.col("a").alias("node")
        ).localCheckpoint()
        # bounded probe: one count per round (the pagerank convergence
        # pattern) — peeling strictly shrinks, so equality = fixed point
        n_prev, n_next = surv.count(), nxt.count()
        surv = nxt
        if n_next == n_prev:
            break
    else:
        raise RuntimeError(
            f"k_core: not converged after {max_rounds} rounds — raise "
            "max_rounds (a path graph peels ~1 node per round)"
        )
    final_deg = (
        und.join(surv.withColumnRenamed("node", "a"), "a", "left_semi")
        .join(surv.withColumnRenamed("node", "b"), "b", "left_semi")
        .groupBy("a")
        .agg(F.count(F.lit(1)).cast("long").alias("core_degree"))
    )
    return final_deg.select(F.col("a").alias("node"), "core_degree")
