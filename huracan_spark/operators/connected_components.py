"""Connected components over a pair list — dedup clustering.

The missing last step of a near-dup pipeline: candidate pairs from
MinHash/SimHash/LSH form a graph whose connected components are the
duplicate clusters; one representative per cluster is kept.  The
reference has no analog (beyond-parity, SURVEY §7.1 step 10) — this is
the operator a 100 TB training-data dedup actually ships.

Algorithm: iterative min-label propagation.  Every node starts
labelled with its own id; each round every node takes the min of its
own label and its neighbors' labels; fixpoint = every node holds the
min id of its component.  One round = one shuffle join (edges ⋈
labels) + one partial-aggregated groupBy — both plain hash exchanges
AQE can re-plan, no driver-side graph state, nothing ever collected.

Round count is O(graph diameter).  Near-dup clusters are near-cliques
(LSH emits most intra-cluster pairs directly), so diameter is small
and bounded in practice; for adversarial chain-shaped graphs the
log-round alternating large-star/small-star algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) drops in
behind the same signature.  Convergence detection is O(1) per round:
labels only ever decrease, so the global label sum strictly decreases
until fixpoint — one scalar aggregate, no row-level diff join.

Lineage is truncated with localCheckpoint every few rounds (iterative
plans otherwise grow linearly and stall the optimizer); a production
cluster job would point spark.sparkContext.setCheckpointDir at
reliable storage and use checkpoint() instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_iter: int = 50,
    checkpoint_every: int = 5,
) -> DataFrame:
    """(node, label) for every node in `edges`; label = min node id of
    the component.  Node columns may be any orderable type.

    Raises RuntimeError if not converged within max_iter rounds —
    loud beats silently-wrong cluster ids.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    # distinct: LSH emits the same pair through several bands; the
    # propagation join fans out per edge copy
    und = und.distinct().persist()
    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .persist()
    )
    prev_sum = _label_sum(labels)
    for it in range(1, max_iter + 1):
        nbr_min = (
            und.alias("e")
            .join(labels.alias("l"), F.col("e.b") == F.col("l.node"))
            .groupBy(F.col("e.a").alias("node"))
            .agg(F.min("l.label").alias("nbr_label"))
        )
        # every node appears on the `a` side (both edge directions are
        # present), so this is an inner join with no coverage gap
        new_labels = (
            labels.alias("o")
            .join(nbr_min.alias("n"), "node")
            .select(
                "node", F.least(F.col("o.label"), F.col("n.nbr_label")).alias("label")
            )
        )
        if it % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=True)
        else:
            new_labels = new_labels.persist()
        cur_sum = _label_sum(new_labels)
        labels.unpersist()
        labels = new_labels
        if cur_sum == prev_sum:  # monotone ⇒ equal sum ⇔ fixpoint
            und.unpersist()
            return labels
        prev_sum = cur_sum
    raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")


def _label_sum(labels: DataFrame):
    # decimal(38,0): overflow-proof at any node count.  For string
    # node ids, sum a stable hash instead: equal sums then imply
    # fixpoint unless a round's label changes cancel in the hash sum —
    # astronomically unlikely with xxhash64, and the failure mode is
    # early exit, which the clusters-equal oracle test would catch.
    col: Column = F.col("label")
    if dict(labels.dtypes)["label"] == "string":
        col = F.abs(F.xxhash64(col))
    return labels.agg(F.sum(col.cast("decimal(38,0)"))).collect()[0][0]
