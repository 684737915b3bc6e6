"""Local replica of the driver's DuckDB-oracle correctness check.

Runs each registered Spark query and its oracle SQL on the same
parquet tables, then compares row count, column names, and an
order-insensitive value comparison (rows sorted after stringifying,
columns sorted by name — mirroring the driver contract in
__spark_entry__.py's docstring).
"""

from __future__ import annotations

import math
import os
from typing import Any

import duckdb

from huracan_spark.sources.tables import TABLES


def _norm_cell(v: Any) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # canonicalize -0.0 and integral floats
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple, dict, set)):
        # The driver canonicalizes via pandas sort_values, which raises
        # "unhashable type" on container cells.  Mirror that strictness so
        # the local harness catches what the driver catches: queries must
        # flatten arrays to scalar columns.
        raise TypeError(
            f"container-typed cell {type(v).__name__} not allowed; "
            "flatten array columns to scalars"
        )
    return str(v)


def _norm_rows(cols: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def compare_query(spark, con, name: str, fn, oracle: str | None, sf_dir: str):
    """Returns (ok: bool, detail: str)."""
    sdf = fn(spark, sf_dir)
    spark_cols = list(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]
    if oracle is None:
        # rows-only checks still go through the driver's pandas canon —
        # exercise the same strictness (no container cells).
        _norm_rows(spark_cols, spark_rows)
        return True, f"rows-only: {len(spark_rows)} rows"
    res = con.execute(oracle)
    ora_cols = [d[0] for d in res.description]
    ora_rows = res.fetchall()
    if sorted(spark_cols) != sorted(ora_cols):
        return False, f"schema mismatch: spark={sorted(spark_cols)} oracle={sorted(ora_cols)}"
    if len(spark_rows) != len(ora_rows):
        return False, f"rowcount mismatch: spark={len(spark_rows)} oracle={len(ora_rows)}"
    a = _norm_rows(spark_cols, spark_rows)
    b = _norm_rows(ora_cols, ora_rows)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return False, f"value mismatch; first diffs: {diffs}"
    return True, f"ok: {len(spark_rows)} rows"


def run_all(sf_dir: str = "/root/testdata/sf0.01", names: list[str] | None = None):
    from huracan_spark.queries.registry import REGISTRY, spark_queries
    from huracan_spark.session import get_spark

    spark_queries()  # force module load
    spark = get_spark("oracle-harness")
    con = duckdb_conn(sf_dir)
    failures = []
    for name, spec in sorted(REGISTRY.items()):
        if names and name not in names:
            continue
        try:
            ok, detail = compare_query(spark, con, name, spec.fn, spec.oracle, sf_dir)
        except Exception as e:  # noqa: BLE001
            ok, detail = False, f"EXCEPTION: {type(e).__name__}: {e}"
        print(f"{'PASS' if ok else 'FAIL'} {name}: {detail}")
        if not ok:
            failures.append(name)
    return failures


if __name__ == "__main__":
    import sys

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    fails = run_all(sf, sys.argv[1:] or None)
    sys.exit(1 if fails else 0)
