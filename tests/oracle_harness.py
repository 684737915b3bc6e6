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
    # bounded + spill-to-disk: DuckDB's default memory_limit (80% of
    # RAM) overcommits next to the 90g Spark JVM — heavy oracles
    # (semdedup active tree) died with an allocation failure instead
    # of spilling (measured, round 9)
    con.execute("SET memory_limit='24GB'")
    con.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def compare_query(
    spark,
    con,
    name: str,
    fn,
    oracle: str | None,
    sf_dir: str,
    record: dict | None = None,
):
    """Returns (ok: bool, detail: str).  If ``record`` is given it is
    filled in the driver's CORRECTNESS_r{N}.json row schema
    (rows_match/schema_match/hash_match/spark_rows/oracle_rows/err) so
    run_all can emit a machine-diffable local correctness artifact."""

    def _rec(**kw):
        if record is not None:
            record.update(kw)

    _rec(
        rows_match=False,
        schema_match=False,
        hash_match=False,
        spark_rows=None,
        oracle_rows=None,
        err=None,
    )
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
    _rec(spark_rows=len(spark_rows))
    if oracle is None:
        # rows-only checks still go through the driver's pandas canon —
        # exercise the same strictness (no container cells).
        _norm_rows(spark_cols, spark_rows)
        _rec(rows_match=True, schema_match=True, err="no_oracle")
        return True, f"rows-only: {len(spark_rows)} rows"
    pdf = con.execute(oracle).df()
    ora_cols = list(pdf.columns)
    ora_rows = [tuple(r) for r in pdf.itertuples(index=False, name=None)]
    _rec(oracle_rows=len(ora_rows))
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
    _rec(schema_match=True)
    if len(spark_rows) != len(ora_rows):
        return False, f"rowcount mismatch: spark={len(spark_rows)} oracle={len(ora_rows)}"
    _rec(rows_match=True)
    a = _norm_rows(spark_cols, spark_rows)
    b = _norm_rows(ora_cols, ora_rows)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return False, f"value mismatch; first diffs: {diffs}"
    _rec(hash_match=True)
    return True, f"ok: {len(spark_rows)} rows"


def run_all(
    sf_dir: str = "/root/testdata/sf0.01",
    names: list[str] | None = None,
    out_path: str | None = None,
):
    """Run the parity check; if ``out_path`` is set (or the
    SPARK_GRAFT_CORRECTNESS_OUT env var), also write a machine-diffable
    JSON artifact in the driver's CORRECTNESS_r{N}.json row schema —
    the committed `CORRECTNESS_local_r{N}.json` that covers ALL
    registered queries, not just the driver's 50-query panel."""
    import json

    from huracan_spark.queries.registry import REGISTRY, spark_queries
    from huracan_spark.session import get_spark

    spark_queries()  # force module load
    spark = get_spark("oracle-harness")
    con = duckdb_conn(sf_dir)
    failures = []
    records: dict[str, dict] = {}
    out_path = out_path or os.environ.get("SPARK_GRAFT_CORRECTNESS_OUT")
    for name, spec in sorted(REGISTRY.items()):
        if names and name not in names:
            continue
        rec: dict = {}
        try:
            ok, detail = compare_query(
                spark, con, name, spec.fn, spec.oracle, sf_dir, record=rec
            )
            if not ok and rec.get("err") is None:
                rec["err"] = detail
        except Exception as e:  # noqa: BLE001
            ok, detail = False, f"EXCEPTION: {type(e).__name__}: {e}"
            rec["err"] = detail
        records[name] = rec
        print(f"{'PASS' if ok else 'FAIL'} {name}: {detail}")
        if not ok:
            failures.append(name)
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(records, fh, indent=1)
        print(f"wrote {len(records)} records to {out_path}")
    return failures


if __name__ == "__main__":
    import sys

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    fails = run_all(sf, sys.argv[1:] or None)
    sys.exit(1 if fails else 0)
