"""Deterministic pagination (Q9).

The reference paginates with ``limit(n) + skip(n)`` and NO sort
(server/src/main.rs:279-280) — flagged in SURVEY §4.3 as a bug
(nondeterministic pages).  This port always orders by an explicit key
before offset/limit, which is the fix the survey prescribes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame

__all__ = ["paginate"]


def paginate(
    df: DataFrame,
    order_by: str | Column | Sequence[str | Column],
    limit: int,
    offset: int = 0,
) -> DataFrame:
    """ORDER BY <key> OFFSET <offset> LIMIT <limit>.

    Spark pushes limit+offset into a single TakeOrderedAndProject when
    the page is small — no full sort materialization.
    """
    cols = [order_by] if isinstance(order_by, (str, Column)) else list(order_by)
    out = df.orderBy(*cols)
    if offset:
        out = out.offset(offset)
    return out.limit(limit)
