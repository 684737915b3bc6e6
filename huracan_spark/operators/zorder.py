"""Z-order (Morton) interleaving for multi-dimensional data clustering.

Writing a table ordered by the Z-value of (k1, k2) makes per-file
min/max ranges tight in BOTH dimensions simultaneously, so a scan
filtered on EITHER key can skip most files — the layout trick behind
Delta/Iceberg OPTIMIZE ZORDER, implemented here as a pure column
expression usable with ``repartitionByRange``/``sortWithinPartitions``
before any parquet write (e.g. the silver table's bucket files).

The interleave is a fixed fan of shift/mask terms — JVM-side integer
arithmetic, whole-stage-codegen friendly, and exactly reproducible in
ANSI SQL for the oracle twin.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["Z_BITS", "zorder_key", "zorder_key_sql"]

Z_BITS = 8  # bits per dimension (2 dims -> 16-bit z-value)


def zorder_key(a: Column, b: Column, bits: int = Z_BITS) -> Column:
    """Morton code of two non-negative ints truncated to ``bits`` bits:
    bit i of ``a`` lands at position 2i, bit i of ``b`` at 2i+1."""
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return reduce(lambda x, y: x.bitwiseOR(y), terms).cast("long")


def zorder_key_sql(a: str, b: str, bits: int = Z_BITS) -> str:
    """DuckDB twin built from the same shift/mask terms."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"
