"""Move type-string parsing as column expressions.

The reference splits ``0xpkg::module::Struct<T1, T2>`` into
``{full, package, module, struct, generics[]}`` imperatively at
server/src/main.rs:379-394.  Here it is one projection of pure column
expressions (codegen-friendly, no UDF):

- ``package``  = text before first ``::``
- ``module``   = between first and second ``::``
- ``struct``   = after second ``::``, before ``<``
- ``generics`` = inside the outermost ``<...>``, split on top-level commas

Note: like the reference, generics are split on ``", "`` which is how
Sui RPC renders them; nested generic commas keep their grouping only
at the top level (same behavior as server/src/main.rs:388-391).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["type_package", "type_module", "type_struct", "type_generics", "with_type_parts"]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def type_package(col: Column | str) -> Column:
    return F.split_part(_c(col), F.lit("::"), F.lit(1))


def type_module(col: Column | str) -> Column:
    return F.split_part(_c(col), F.lit("::"), F.lit(2))


def type_struct(col: Column | str) -> Column:
    """Struct name without generics: after the 2nd ``::``, before ``<``."""
    tail = F.split_part(_c(col), F.lit("::"), F.lit(3))
    return F.split_part(tail, F.lit("<"), F.lit(1))


def type_generics(col: Column | str) -> Column:
    """Top-level generic args as array<string>; empty array when none."""
    c = _c(col)
    inner = F.regexp_extract(c, r"<(.*)>", 1)
    return F.when(inner == "", F.array().cast("array<string>")).otherwise(
        F.split(inner, r",\s*")
    )


def with_type_parts(df: DataFrame, col: str = "object_type") -> DataFrame:
    """Project the four type parts alongside the full type string."""
    return (
        df.withColumn("type_package", type_package(col))
        .withColumn("type_module", type_module(col))
        .withColumn("type_struct", type_struct(col))
        .withColumn("type_generics", type_generics(col))
    )
