"""As-of (point-in-time) join — an operator Spark lacks natively.

Composition of existing DataFrame ops (the SURVEY-preferred strategy
(a) before Pandas-UDF fallbacks): union both sides tagged, one window
sorted by (key, time), carry the last-seen right row forward.  Cost is
a single shuffle+sort on (key, time) — linear, no range cross-join,
no per-key collect; this is the formulation that survives 100 TB
(contrast with a range-condition join, which Spark executes as a
broadcast-nested-loop).

Semantics: for each left row, the right row with the greatest
``right_time <= left_time`` within the same key ("backward" as-of,
matching pandas.merge_asof and DuckDB ASOF JOIN defaults), or with
``direction="forward"`` the smallest ``right_time >= left_time``
(pandas merge_asof direction='forward'; DuckDB ``ON r.t >= l.t``).
Forward reuses the identical single-window plan with the time order
reversed — no second code path, same scale shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """As-of join of ``right`` onto ``left``.

    Returns every left row plus ``{right_time}{suffix}`` and each of
    ``right_cols`` as ``{col}{suffix}`` (null when no qualifying right
    row).  direction: "backward" (default, latest right_time <=
    left_time) or "forward" (earliest right_time >= left_time).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    right_cols = right_cols or []
    lpay = [c for c in left.columns if c != on]
    carried = F.struct(
        F.col(right_time).alias("_t"), *[F.col(c) for c in right_cols]
    )

    l_tag = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_time"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in lpay]).alias("_lrow"),
        F.lit(None).cast(
            right.select(carried.alias("x")).schema["x"].dataType
        ).alias("_rrow"),
    )
    r_tag = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_time"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in lpay]).alias("x")).schema["x"].dataType
        ).alias("_lrow"),
        carried.alias("_rrow"),
    )
    # right rows sort before left at equal time -> <= semantics.
    # _rrow as the final key breaks ties among duplicate right rows at
    # the same (key, time) deterministically (greatest payload struct
    # wins, independent of partitioning/run order); without it,
    # F.last over tied rows is pick-any.  Requires right_cols to be
    # orderable types (atomics/structs/arrays — not maps).
    # forward = the same running-carry with TIME REVERSED: walking
    # descending time, "last right seen" is the smallest right_time
    # >= left_time; right still sorts before left at equal time, so
    # both directions are inclusive.
    time_order = F.col("_time").asc() if direction == "backward" else F.col("_time").desc()
    w = (
        Window.partitionBy("_k")
        .orderBy(time_order, F.col("_is_left").asc(), F.col("_rrow").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l_tag.unionByName(r_tag).withColumn(
        "_last_r", F.last("_rrow", ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("_is_left") == 1).select(
        F.col("_k").alias(on),
        *[F.col(f"_lrow.{c}").alias(c) for c in lpay],
        F.col("_last_r._t").alias(f"{right_time}{suffix}"),
        *[F.col(f"_last_r.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )
    return out
