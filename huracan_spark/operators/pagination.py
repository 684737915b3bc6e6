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


def paginate_after(
    df: DataFrame,
    order_by: str | Column | Sequence[str | Column],
    limit: int,
    after: tuple | None = None,
) -> DataFrame:
    """Keyset (seek) pagination: ``WHERE key > after ORDER BY key
    LIMIT n`` — the scale-correct page form.  OFFSET pagination reads
    and discards ``offset`` rows on every page (page N costs O(N*page)
    and deep pages dominate the scan); the keyset predicate is a plain
    comparison that PUSHES INTO the parquet scan, so every page costs
    O(page) regardless of depth.  ``after`` is the last key tuple of
    the previous page (lexicographic over the order columns).
    """
    from pyspark.sql import functions as F

    cols = [order_by] if isinstance(order_by, (str, Column)) else list(order_by)
    names = [c if isinstance(c, str) else c._jc.toString() for c in cols]
    out = df
    if after is not None:
        if len(after) != len(names):
            raise ValueError(f"after tuple must match order_by arity {len(names)}")
        # lexicographic (k1, k2) > (a1, a2):  k1 > a1 OR (k1 = a1 AND k2 > a2) ...
        pred = None
        for i in range(len(names)):
            term = F.col(names[i]) > F.lit(after[i])
            for j in range(i):
                term = (F.col(names[j]) == F.lit(after[j])) & term
            pred = term if pred is None else (pred | term)
        out = out.filter(pred)
    return out.orderBy(*[F.col(n) for n in names]).limit(limit)
