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
        # Do NOT canonicalize integral floats to ints: the driver's
        # value-hash distinguishes float64 6194.0 from int64 6194 (the
        # HUGEINT bug class — r2 session_windows, r3 hash_split).  An
        # integral float must stay visibly a float so local == driver.
        if v == 0.0:
            v = 0.0  # fold -0.0
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple, dict, set)) or type(v).__name__ == "ndarray":
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
    # BOTH sides go through pandas, exactly like the driver.  This is
    # load-bearing for the dtype semantics:
    #   - a nullable int column becomes float64 on BOTH sides (NaN
    #     promotion) and so still matches;
    #   - DuckDB HUGEINT (any uncast integer sum) becomes float64 on
    #     the ORACLE side only, while a NULL-free Spark long stays
    #     int64 — mismatch, same as the driver (r3 hash_split).
    # fetchall()/collect() would hand back exact Python ints on both
    # sides and mask the whole bug class.
    spdf = sdf.toPandas()
    spark_cols = list(spdf.columns)
    spark_rows = [tuple(r) for r in spdf.itertuples(index=False, name=None)]
    if oracle is None:
        # rows-only checks still go through the driver's pandas canon —
        # exercise the same strictness (no container cells).
        _norm_rows(spark_cols, spark_rows)
        return True, f"rows-only: {len(spark_rows)} rows"
    pdf = con.execute(oracle).df()
    ora_cols = list(pdf.columns)
    ora_rows = [tuple(r) for r in pdf.itertuples(index=False, name=None)]
    if sorted(spark_cols) != sorted(ora_cols):
        return False, f"schema mismatch: spark={sorted(spark_cols)} oracle={sorted(ora_cols)}"
    for c in ora_cols:
        odt, sdt = str(pdf[c].dtype), str(spdf[c].dtype)
        if (odt.startswith("float") and sdt.startswith("int")) or (
            odt.startswith("int") and sdt.startswith("float")
        ):
            return False, (
                f"dtype mismatch: column {c} is {odt} in the oracle but "
                f"{sdt} in Spark — CAST the narrower side (uncast integer "
                "sums in DuckDB surface as HUGEINT->float64)"
            )
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
