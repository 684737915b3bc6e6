"""Distributed BFS: minimum-hop distances from a source node.

Fourth iterative DataFrame operator beside connected components
(``operators/connected_components.py``), PageRank
(``operators/pagerank.py``) and spherical k-means
(``operators/kmeans.py``), sharing their scale contract:

- one equi-join (frontier x edges) + one partial-agg min per round —
  the only shuffles; both are hash-partitioned on the node id;
- ``localCheckpoint`` per round truncates lineage so plans don't grow
  with iteration count;
- no driver-side graph state — the driver holds only the loop counter.

A fixed round budget (graph-diameter bound) keeps the loop
deterministic and lets the oracle unroll the rounds as CTEs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bfs_hops"]


def bfs_hops(
    edges: DataFrame,
    source: Column,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node, hops) for every node reachable from ``source`` within
    ``rounds`` hops over the DIRECTED edge list (pass both directions
    for an undirected graph)."""
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    dist = (
        e.select(F.col("_s").alias("node"))
        .unionByName(e.select(F.col("_d").alias("node")))
        .distinct()
        .filter(F.col("node") == source)
        .select("node", F.lit(0).alias("hops"))
        .localCheckpoint(eager=False)
    )
    for _ in range(rounds):
        frontier = dist.join(e, dist.node == e._s).select(
            F.col("_d").alias("node"), (F.col("hops") + 1).alias("hops")
        )
        dist = (
            dist.unionByName(frontier)
            .groupBy("node")
            .agg(F.min("hops").alias("hops"))
            .localCheckpoint(eager=False)
        )
    return dist
