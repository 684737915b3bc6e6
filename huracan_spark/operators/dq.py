"""Declarative data-quality rule engine (deequ/Great-Expectations shape).

Rules compile to ONE aggregate pass over the table — every row-level
rule becomes a conditional count in the same scan (no per-rule re-scan,
which at 100 TB is the difference between one read and |rules| reads);
uniqueness rules add one hash-aggregate each on their key.

``check()`` returns a (rule, n_rows, n_violations, pass) table that a
pipeline can gate on or append to the metrics sink (K8).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["Rule", "not_null", "in_range", "in_set", "matches", "unique", "check"]


@dataclass(frozen=True)
class Rule:
    name: str
    kind: str  # "row" (violation predicate) or "unique" (key tuple)
    predicate: Column | None = None  # row kind: TRUE when the row VIOLATES
    keys: tuple[str, ...] = ()


def not_null(col: str) -> Rule:
    return Rule(f"not_null({col})", "row", F.col(col).isNull())


def in_range(col: str, lo, hi) -> Rule:
    c = F.col(col)
    return Rule(
        f"in_range({col},{lo},{hi})", "row", c.isNull() | (c < lo) | (c > hi)
    )


def in_set(col: str, values) -> Rule:
    c = F.col(col)
    return Rule(
        f"in_set({col})", "row", c.isNull() | ~c.isin(*list(values))
    )


def matches(col: str, regex: str) -> Rule:
    c = F.col(col)
    return Rule(f"matches({col})", "row", c.isNull() | ~c.rlike(regex))


def unique(*cols: str) -> Rule:
    return Rule(f"unique({','.join(cols)})", "unique", keys=tuple(cols))


def check(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """(rule, n_rows, n_violations, passed) — one scan for all row
    rules + one hash-agg per uniqueness rule, unioned."""
    spark = df.sparkSession
    row_rules = [r for r in rules if r.kind == "row"]
    parts = []
    if row_rules:
        aggs = [F.count(F.lit(1)).alias("_n")] + [
            F.count(F.when(r.predicate, 1)).alias(f"_v{i}")
            for i, r in enumerate(row_rules)
        ]
        wide = df.agg(*aggs)
        stack = ", ".join(
            f"'{r.name.replace(chr(39), chr(39) * 2)}', _v{i}"
            for i, r in enumerate(row_rules)
        )
        parts.append(
            wide.selectExpr(
                "_n AS n_rows",
                f"stack({len(row_rules)}, {stack}) AS (rule, n_violations)",
            ).select("rule", "n_rows", "n_violations")
        )
    for r in rules:
        if r.kind != "unique":
            continue
        dup = (
            df.groupBy(*r.keys)
            .agg(F.count("*").alias("_c"))
            .agg(
                F.sum("_c").cast("long").alias("n_rows"),
                F.coalesce(
                    F.sum(F.when(F.col("_c") > 1, F.col("_c"))), F.lit(0)
                ).cast("long").alias("n_violations"),
            )
            .select(F.lit(r.name).alias("rule"), "n_rows", "n_violations")
        )
        parts.append(dup)
    if not parts:
        return spark.createDataFrame(
            [], "rule string, n_rows long, n_violations long, passed boolean"
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "rule", "n_rows", "n_violations", (F.col("n_violations") == 0).alias("passed")
    )
