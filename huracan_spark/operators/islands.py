"""Gaps-and-islands range compression (A7).

Port of the reference's only unit-tested function,
``make_descending_ranges`` (main/src/utils.rs:6-26): a sorted set of
checkpoint ids -> maximal consecutive runs, emitted as (end, start)
descending.  utils.rs:44-47 asserts ``[3,1,2,7,9,11,10]`` ->
``[(11,9),(7,7),(3,1)]``.

Spark formulation: the classic ``id - row_number()`` island key, but
with the row number computed by the distributed two-phase prefix sum
(``operators/prefix_sum.py::global_cumsum`` of 1 over the id order)
instead of a global ``Window.orderBy`` — no single-partition funnel,
so the operator survives a checkpoint log that outgrows one partition
(the reference instead collects the whole id set into driver RAM,
main/src/etl.rs:607-635).  The ids are distinct by construction, which
satisfies global_cumsum's unique-order-key contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from huracan_spark.operators.prefix_sum import global_cumsum

__all__ = ["descending_ranges"]


def descending_ranges(df: DataFrame, id_col: str = "checkpoint_id") -> DataFrame:
    """Compress distinct ids into maximal consecutive ranges.

    Returns columns ``(range_end, range_start)`` sorted by range_end
    descending — the reference's exact output order (utils.rs:24-25).
    """
    ids = df.select(F.col(id_col).cast("long").alias("_id_")).distinct()
    numbered = global_cumsum(ids, F.lit(1), "_id_", out_col="_rn")
    islands = numbered.withColumn("_island", F.col("_id_") - F.col("_rn"))
    return (
        islands.groupBy("_island")
        .agg(
            F.max("_id_").alias("range_end"),
            F.min("_id_").alias("range_start"),
        )
        .drop("_island")
        .select("range_end", "range_start")
        .orderBy(F.col("range_end").desc())
    )
