"""Gaps-and-islands range compression (A7).

Port of the reference's only unit-tested function,
``make_descending_ranges`` (main/src/utils.rs:6-26): a sorted set of
checkpoint ids -> maximal consecutive runs, emitted as (end, start)
descending.  utils.rs:44-47 asserts ``[3,1,2,7,9,11,10]`` ->
``[(11,9),(7,7),(3,1)]``.

Spark formulation: the classic ``id - row_number()`` island key.  The
single window sort is global, but the input is a *checkpoint id set* —
tiny relative to the data (one row per checkpoint, not per object), so
a single-partition window is fine even at 100 TB scale; for a truly
huge id universe, pre-aggregate per range-bucket first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["descending_ranges"]


def descending_ranges(df: DataFrame, id_col: str = "checkpoint_id") -> DataFrame:
    """Compress distinct ids into maximal consecutive ranges.

    Returns columns ``(range_end, range_start)`` sorted by range_end
    descending — the reference's exact output order (utils.rs:24-25).
    """
    ids = df.select(F.col(id_col).cast("long").alias("_id_")).distinct()
    w = Window.orderBy("_id_")
    islands = ids.withColumn("_island", F.col("_id_") - F.row_number().over(w))
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
