"""Watermarked stream-stream joins (interval / event-correlation).

The reference has no two-stream correlation at all — its only merge is
the poll+livescan dedup union (SURVEY §2.4 M1/M2).  This module is the
widened streaming surface: correlate two live event streams on a key
within an event-time interval, the canonical "attribute each purchase
to the click that preceded it" shape.

Why this scales: Spark buffers each side's rows in keyed state ONLY
until the other side's watermark passes the interval bound, then
evicts — state is O(key cardinality x interval), never O(stream
length).  Both sides shuffle once on the join key; with the RocksDB
state store the buffers spill off-heap.  An unbounded (no-watermark /
no-time-bound) stream-stream join would grow state forever and is
refused here by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join_streams"]


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    lower: str = "INTERVAL 0 SECONDS",
    upper: str = "INTERVAL 10 MINUTES",
    left_watermark: str = "5 minutes",
    right_watermark: str = "5 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two watermarked streams on ``key`` where the right event's
    time lies in ``[left.ts + lower, left.ts + upper]``.

    Output columns: key, l_ts, r_ts, plus every non-key/non-ts column
    of each side prefixed ``l_`` / ``r_``.  ``how`` may be ``inner``,
    ``left_outer``, ``right_outer``, or ``full_outer`` — all four are
    watermark-bounded: an unmatched row emits with nulls on the other
    side once BOTH watermarks pass its interval bound, so state stays
    O(keys x interval) in every mode.

    Two more modes complete the correlation family, both left-only
    output (no ``r_ts``/``r_*`` columns):

    - ``left_semi`` — left rows WITH a match in the interval
      (Spark-native for stream-stream since 3.1; a matched row emits
      as soon as its match arrives, state evicts on watermark);
    - ``left_anti`` — left rows with NO match in the interval (the
      absence-detection / unattributed-event shape).  Spark has no
      native stream-stream anti join, so it is composed EXACTLY as
      ``left_outer`` + null-right filter: an unmatched left row
      finalizes once both watermarks pass its interval bound — same
      state bound, provably identical semantics (a matched row always
      carries a non-null ``r_ts``).

    ``cross`` / unbounded joins are refused rather than silently
    degenerating, same policy as operators/range_join.py.
    """
    if how not in (
        "inner",
        "left_outer",
        "right_outer",
        "full_outer",
        "left_semi",
        "left_anti",
    ):
        raise ValueError(
            f"interval_join_streams supports inner/left_outer/right_outer/"
            f"full_outer/left_semi/left_anti, got {how!r}"
        )
    l = left.withWatermark(ts, left_watermark).select(
        F.col(key).alias("_lk"),
        F.col(ts).alias("l_ts"),
        *[
            F.col(c).alias(f"l_{c}")
            for c in left.columns
            if c not in (key, ts)
        ],
    )
    r = right.withWatermark(ts, right_watermark).select(
        F.col(key).alias("_rk"),
        F.col(ts).alias("r_ts"),
        *[
            F.col(c).alias(f"r_{c}")
            for c in right.columns
            if c not in (key, ts)
        ],
    )
    cond = (
        (F.col("_lk") == F.col("_rk"))
        & (F.col("r_ts") >= F.expr(f"l_ts + {lower}"))
        & (F.col("r_ts") <= F.expr(f"l_ts + {upper}"))
    )
    if how == "left_semi":
        return (
            l.join(r, cond, "left_semi")
            .withColumnRenamed("_lk", key)
        )
    if how == "left_anti":
        return (
            l.join(r, cond, "left_outer")
            .filter(F.col("r_ts").isNull())
            .select("_lk", "l_ts", *[c for c in l.columns if c not in ("_lk", "l_ts")])
            .withColumnRenamed("_lk", key)
        )
    return (
        l.join(r, cond, how)
        # outer rows carry the key only on their populated side
        .withColumn(key, F.coalesce(F.col("_lk"), F.col("_rk")))
        .drop("_lk", "_rk")
    )
