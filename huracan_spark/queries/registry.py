"""Query registry: pairs each Spark query with its DuckDB oracle SQL.

Driver contract (__spark_entry__.py): ``queries()`` maps name ->
callable(spark, sf_dir) -> DataFrame, and ``oracle_sql()`` maps the
same name -> ANSI SQL DuckDB runs over the identical parquet tables.
Column names are aligned on both sides because the driver sorts
columns by name before hashing values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from huracan_spark.queries.ctemat import materialize_multiref_ctes

__all__ = ["QuerySpec", "REGISTRY", "register", "spark_queries", "oracle_queries"]

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # None => non-SQL-expressible, rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: add a (spark_fn, oracle_sql) pair to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        # DuckDB inlines CTEs at every reference site; double-referenced
        # chains re-evaluate 2^depth times and OOM under the harness's
        # memory cap (round-9 kcore_trade_graph).  Fence every
        # multi-referenced CTE corpus-wide at registration — pure
        # evaluation hint, identical semantics (ctemat.py).
        mat = materialize_multiref_ctes(oracle) if oracle is not None else None
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=mat, doc=doc)
        return fn

    return deco


def spark_queries() -> dict[str, QueryFn]:
    _load_all_modules()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_queries() -> dict[str, str]:
    _load_all_modules()
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }


def _load_all_modules() -> None:
    """Import every query module so registrations run."""
    from huracan_spark.queries import (  # noqa: F401
        analytics,
        corpusstats,
        curation,
        dedup,
        extended,
        graph,
        insights,
        linalg,
        llmprep,
        lmdata,
        media,
        objects,
        pq,
        profiling,
        ranking,
        relational,
        silverq,
        similarity,
        sketches,
        streamq,
        text,
        timeseries,
        tpch,
        tpch_extra,
        windows,
    )
