"""Bucketed range join: points-in-interval join without a cross product.

Spark compiles a bare non-equi join (``p.ts BETWEEN r.lo AND r.hi``)
to BroadcastNestedLoopJoin — O(|points| * |ranges|) and a broadcast of
a whole side, which dies at 100 TB. The standard fix (used by e.g.
Databricks' range-join optimization and interval-join literature) is
to introduce a synthetic equi-key:

- each point hashes to ONE bucket: ``floor(point / width)``
- each range explodes to EVERY bucket it overlaps:
  ``sequence(floor(lo/width), floor(hi/width))``
- equi-join on the bucket (a plain shuffled/broadcast hash join that
  Catalyst can plan, AQE can skew-split, and codegen can run), then
  re-check exact containment.

Each (point, range) pair meets in exactly one bucket — the point's own
— so no post-join dedup is needed. Cost is O(points + ranges *
avg_buckets_per_range + matches); pick ``bucket_width`` near the median
range length so ranges explode to ~2 buckets.

The reference has no range join (SURVEY §2.0 deliberate-absence
ledger); this is part of the widened relational surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bucketed_range_join"]


def bucketed_range_join(
    points: DataFrame,
    ranges: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
    how: str = "inner",
    broadcast_ranges: bool = False,
    extra_keys: tuple[str, ...] = (),
) -> DataFrame:
    """Join each point row to every range row with lo <= point < hi.

    ``point_col``/``lo_col``/``hi_col`` must be integral (cast
    timestamps with unix_micros first). Output carries all columns of
    both inputs. ``broadcast_ranges=True`` skips the shuffle when the
    exploded ranges side is dimension-sized.

    ``how``: ``inner`` or ``left`` (left preserves points that fall in
    no range, with null range columns — the containment predicate is
    part of the join condition, not a post-filter, so outer rows
    survive).  Right/full outer are rejected: the ranges side is
    exploded to one row per overlapped bucket, so an unmatched range
    would surface once per bucket instead of once.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"how={how!r} unsupported: ranges are bucket-exploded, so only "
            "'inner' and 'left' (point-preserving) have exact semantics"
        )

    def bucket(c: Column) -> Column:
        return F.floor(c / F.lit(bucket_width)).cast("long")

    p = points.withColumn("__pbucket", bucket(F.col(point_col)))
    r = ranges.withColumn(
        "__rbucket",
        F.explode(
            F.sequence(bucket(F.col(lo_col)), bucket(F.col(hi_col)))
        ),
    )
    if broadcast_ranges:
        r = F.broadcast(r)
    # each pair meets in exactly ONE bucket (the point's own), so a
    # left join emits unmatched points exactly once, null-extended
    cond = (
        (F.col("__pbucket") == F.col("__rbucket"))
        & (F.col(point_col) >= F.col(lo_col))
        & (F.col(point_col) < F.col(hi_col))
    )
    # extra equi-keys (e.g. user_id for a per-user funnel) join as part
    # of the hash key: without them, every row sharing a TIME bucket
    # would meet every other — quadratic per bucket across keys.  The
    # shared column is renamed on the ranges side so the output keeps
    # one copy.
    for k in extra_keys:
        r = r.withColumnRenamed(k, f"__r_{k}")
        cond = cond & (F.col(k) == F.col(f"__r_{k}"))
    out = p.join(r, cond, how).drop("__pbucket", "__rbucket")
    return out.drop(*[f"__r_{k}" for k in extra_keys])
