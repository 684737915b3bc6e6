"""Distributed global prefix sum (cumulative sum over a total order).

``sum().over(Window.orderBy(...))`` with no partitionBy funnels the
ENTIRE table through one partition (Spark even warns) — the classic
way a correct-at-bench-scale query dies at 100 TB.  This operator is
the scale-safe equivalent, the textbook two-phase scan:

1. ``repartitionByRange`` on the order key — Spark's range partitioner
   puts partition i entirely before partition i+1 in key order;
2. a per-partition running sum (window partitioned by the PHYSICAL
   partition id — parallel, no global funnel);
3. per-partition totals (one row per partition) are prefix-summed on
   the driver — O(#partitions), same cost class as the scalar
   convergence checks in connected_components — and broadcast-joined
   back as offsets.

The order key must be UNIQUE: range partitioning may split ties
across partition boundaries, which would make step-2 ordering
ambiguous.  Loudly enforced by contract, not silently wrong.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

__all__ = ["global_cumsum"]


def global_cumsum(
    df: DataFrame,
    value_col: str | Column,
    order_col: str,
    out_col: str = "cumsum",
) -> DataFrame:
    """Inclusive cumulative sum of ``value_col`` over the global order
    of unique ``order_col``, without a single-partition window."""
    val = F.col(value_col) if isinstance(value_col, str) else value_col
    part = df.repartitionByRange(F.col(order_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # persist BEFORE collecting totals: the final join re-reads this
    # plan, and without the pin AQE may re-coalesce the range shuffle
    # differently between the two executions, renumbering _pid and
    # silently misaligning every offset
    local = part.withColumn(
        "_local", F.sum(val.cast("long")).over(w_local)
    ).persist()
    totals = (
        local.groupBy("_pid")
        .agg(F.max("_local").alias("_total"))
        .orderBy("_pid")
        .collect()  # one row per partition — driver cost O(#partitions)
    )
    offsets, running = [], 0
    for r in totals:
        offsets.append((r._pid, running))
        running += r._total
    off_df = df.sparkSession.createDataFrame(offsets, "_pid int, _offset long")
    return (
        local.join(F.broadcast(off_df), "_pid")
        .withColumn(out_col, F.col("_local") + F.col("_offset"))
        .drop("_pid", "_local", "_offset")
    )
