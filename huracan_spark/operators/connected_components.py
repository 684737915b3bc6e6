"""Connected components over a pair list — dedup clustering.

The missing last step of a near-dup pipeline: candidate pairs from
MinHash/SimHash/LSH form a graph whose connected components are the
duplicate clusters; one representative per cluster is kept.  The
reference has no analog (beyond-parity, SURVEY §7.1 step 10) — this is
the operator a 100 TB training-data dedup actually ships.

Algorithm: iterative min-label propagation with self-loops.  Every
node starts labelled with its own id; each round every node takes the
min label over its closed neighborhood (self-loop edges make "own
label" just another neighbor, so a round is ONE shuffle join (edges ⋈
labels) + ONE partial-aggregated groupBy — plain hash exchanges AQE
can re-plan, no driver-side graph state, nothing ever collected).

Job count, not shuffle volume, dominates an iterative job's wall
clock, so rounds are composed LAZILY in batches of `steps_per_check`:
Catalyst chains the joins into a single job and only the batch
boundary materializes (persist + one scalar aggregate).  Labels only
ever decrease, so an unchanged global label sum across a whole batch
is a fixpoint proof — O(1) convergence detection, no row-diff join.

Round count is O(graph diameter).  Near-dup clusters are
near-cliques (LSH emits most intra-cluster pairs directly), so
diameter is small in practice; for adversarial chain-shaped graphs
the log-round alternating large-star/small-star algorithm (Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC'14) drops
in behind the same signature.

Lineage is truncated with localCheckpoint every few batches
(iterative plans otherwise grow without bound and stall the
optimizer); a production cluster job would point
spark.sparkContext.setCheckpointDir at reliable storage and use
checkpoint() instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_iter: int = 48,
    steps_per_check: int = 2,
    checkpoint_every_batches: int = 4,
) -> DataFrame:
    """(node, label) for every node in `edges`; label = min node id of
    the component.  Node columns may be any orderable type.

    Raises RuntimeError if not converged within max_iter rounds —
    loud beats silently-wrong cluster ids.
    """
    # persist the input FIRST: the union branches below each scan it,
    # and the caller usually hands over an expensive lazy pair join
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).persist()
    nodes = (
        e.select("a").unionByName(e.select(F.col("b").alias("a"))).distinct()
    )
    # Self-loops fold "own label" into the same min-aggregate as the
    # neighbors'.  For a canonical src<dst pair list the three branches
    # are disjoint, so no dedup shuffle is needed; duplicate edges from
    # a non-canonical input only add join fan-out — min() is idempotent.
    und = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .unionByName(nodes.select("a", F.col("a").alias("b")))
        .persist()
    )
    labels = nodes.select(F.col("a").alias("node")).withColumn(
        "label", F.col("node")
    )
    prev_sum = None
    prev_labels = None
    rounds = 0
    batches = 0
    while rounds < max_iter:
        for _ in range(steps_per_check):  # lazy: one job per BATCH
            labels = (
                und.alias("e")
                .join(labels.alias("l"), F.col("e.b") == F.col("l.node"))
                .groupBy(F.col("e.a").alias("node"))
                .agg(F.min("l.label").alias("label"))
            )
            rounds += 1
        batches += 1
        if batches % checkpoint_every_batches == 0:
            labels = labels.localCheckpoint(eager=True)
        else:
            labels = labels.persist()
        cur_sum = _label_sum(labels)  # materializes the batch
        if prev_labels is not None:  # new batch is cached; release old
            prev_labels.unpersist()
        prev_labels = labels
        if cur_sum == prev_sum:  # monotone ⇒ equal sum ⇔ fixpoint
            und.unpersist()
            e.unpersist()
            return labels
        prev_sum = cur_sum
    raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")


def _label_sum(labels: DataFrame):
    # decimal(38,0): overflow-proof at any node count.  For string
    # node ids, sum a stable hash instead: equal sums then imply
    # fixpoint unless a batch's label changes cancel in the hash sum —
    # astronomically unlikely with xxhash64, and the failure mode is
    # early exit, which the clusters-equal oracle test would catch.
    col: Column = F.col("label")
    if dict(labels.dtypes)["label"] == "string":
        col = F.abs(F.xxhash64(col))
    return labels.agg(F.sum(col.cast("decimal(38,0)"))).collect()[0][0]
