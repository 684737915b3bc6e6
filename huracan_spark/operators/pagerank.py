"""Distributed PageRank (power iteration) over an edge DataFrame.

The third iterative operator beside connected components
(``operators/connected_components.py``) and spherical k-means
(``operators/kmeans.py``): rank = (1-d)/N + d * sum(rank(src)/outdeg(src))
over incoming edges, repeated for a fixed iteration count.

Scale shape per round (the 100 TB contract):
- one equi-join ranks-to-edges on ``src`` (both sides hash-partitioned
  on the node id; with edges pre-partitioned the join reuses the same
  exchange every round),
- one partial-agg ``sum`` by ``dst`` — contributions combine map-side,
  so only one partial sum per (partition, node) crosses the shuffle,
- no driver-side graph state: nodes, edges, and ranks stay DataFrames
  end-to-end; the driver holds only the loop counter.
- lineage is truncated with ``localCheckpoint`` every round (iterative
  plans otherwise grow linearly and re-optimize from scratch — the
  same hazard documented in connected_components).

Dangling nodes (outdeg 0) follow the standard redistribution-free
convention: their mass leaks, matching the common "simplified
PageRank" the fixed-iteration SQL oracle can replay exactly.

A fixed iteration count (not convergence detection) keeps the operator
SQL-expressible for the driver's oracle: each round unrolls to one CTE
(see queries/graph.py). Convergence-looped variants reuse the same
`pagerank_round` with the label-sum fixpoint trick from connected
components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank", "personalized_pagerank"]

DAMPING = 0.85


def pagerank_round(
    ranks: DataFrame,
    edges: DataFrame,
    n_nodes: DataFrame,
    damping: float,
    round_at: int | None = None,
    reset: DataFrame | None = None,
) -> DataFrame:
    """One power-iteration step.

    ranks: (node, rank); edges: (src, dst, out_deg) — out_deg is the
    SOURCE's out-degree, precomputed once; n_nodes: 1-row (n).
    Returns the next (node, rank).

    round_at: if set, the new rank is rounded to that many decimals.
    Cross-engine contract: a double sum over thousands of in-edge
    contributions folds in partition order, so two engines differ in
    final ulps; rounding EACH round (well above ulp noise, well below
    signal) keeps fixed-iteration replays bit-identical — same
    convention as the cosine round(6) in queries/similarity.py.
    """
    # the edge table is cached pre-partitioned on src (see pagerank());
    # SHUFFLE_HASH on the ranks side makes every round a shuffled hash
    # join that REUSES that layout: only the O(nodes) ranks table moves,
    # the edge side never re-exchanges — and the planner can never
    # "helpfully" broadcast a corpus-derived table (the r7 blowup
    # class: at fixture scale the cached edges LOOK tiny, at 100 TB a
    # per-round edge broadcast is a driver abort).  Fold-order changes
    # are absorbed by the per-round round_at contract.
    contrib = (
        edges.join(
            ranks.withColumnRenamed("node", "src").hint("shuffle_hash"),
            "src",
        )
        .groupBy(F.col("dst").alias("node"))
        .agg(F.sum(F.col("rank") / F.col("out_deg")).alias("_in"))
    )
    # nodes with no in-edges still get the teleport term: start from
    # the full node set (ranks), not from contrib
    if reset is None:
        teleport = (1.0 - damping) / F.col("n")
    else:
        # personalized: teleport mass lands on the reset distribution
        # only (0 elsewhere) — reset is a (node, reset) df summing to 1
        teleport = (1.0 - damping) * F.coalesce(F.col("reset"), F.lit(0.0))
    rank = teleport + damping * F.coalesce(F.col("_in"), F.lit(0.0))
    if round_at is not None:
        rank = F.round(rank, round_at)
    # contrib is node-bounded but corpus-DERIVED — never leave its
    # join strategy to a planner size estimate (same rationale as above)
    out = ranks.select("node").join(
        contrib.hint("shuffle_hash"), "node", "left"
    )
    if reset is None:
        out = out.crossJoin(F.broadcast(n_nodes))
    else:
        out = out.join(F.broadcast(reset), "node", "left")
    return out.select("node", rank.alias("rank"))


def pagerank(
    edges: DataFrame,
    *,
    iterations: int,
    damping: float = DAMPING,
    checkpoint_every: int = 1,
    round_at: int | None = None,
) -> DataFrame:
    """Run `iterations` power-iteration rounds over (src, dst) edges.

    Returns (node, rank) for every node appearing as src or dst.
    Deterministic: pure arithmetic, no RNG, no convergence race.
    """
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    # eager: nodes feeds the broadcast n_nodes/initial-ranks branches
    # and every round's left join; e is read every round.  Lazy persist
    # would let the first round's broadcast thread race the cache fill
    # and re-run the input edge build per branch (r7 class).
    nodes.count()
    out_deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    # cache the edge table HASH-PARTITIONED ON src: every round's
    # ranks-to-edges join then reuses this one layout (the build join
    # may have been a broadcast, which would otherwise leave the cache
    # in scan order and force a per-round edge exchange — guide §2.4)
    e = edges.join(out_deg, "src").repartition("src").persist()
    e.count()
    n_nodes = nodes.agg(F.count("*").alias("n"))
    ranks = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    for i in range(iterations):
        ranks = pagerank_round(ranks, e, n_nodes, damping, round_at=round_at)
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            # truncate lineage so round-N plans stay O(1), not O(N)
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def personalized_pagerank(
    edges: DataFrame,
    reset: DataFrame,
    *,
    iterations: int,
    damping: float = DAMPING,
    checkpoint_every: int = 1,
    round_at: int | None = None,
) -> DataFrame:
    """Personalized PageRank: the teleport step returns to the ``reset``
    distribution (a (node, reset) DataFrame summing to 1) instead of
    uniform — rank then measures proximity TO the reset set, the
    related-items / recommendation primitive.  Identical per-round
    scale shape to ``pagerank``; ranks start AT the reset distribution.
    """
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    # eager: nodes feeds the broadcast n_nodes/initial-ranks branches
    # and every round's left join; e is read every round.  Lazy persist
    # would let the first round's broadcast thread race the cache fill
    # and re-run the input edge build per branch (r7 class).
    nodes.count()
    out_deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    # same pre-partitioned edge layout as pagerank() — see comment there
    e = edges.join(out_deg, "src").repartition("src").persist()
    e.count()
    n_nodes = nodes.agg(F.count("*").alias("n"))
    ranks = nodes.join(F.broadcast(reset), "node", "left").select(
        "node", F.coalesce(F.col("reset"), F.lit(0.0)).alias("rank")
    )
    for i in range(iterations):
        ranks = pagerank_round(
            ranks, e, n_nodes, damping, round_at=round_at, reset=reset
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
