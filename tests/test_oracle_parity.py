"""End-to-end oracle parity: every registered query hash-matches DuckDB
at sf0.001 (the driver runs the same check at sf0.01)."""

from __future__ import annotations

import pytest

from huracan_spark.queries.registry import REGISTRY, spark_queries
from tests.oracle_harness import compare_query, duckdb_conn

spark_queries()  # populate REGISTRY


@pytest.fixture(scope="module")
def con(sf_dir):
    return duckdb_conn(sf_dir)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, con, sf_dir, name):
    spec = REGISTRY[name]
    ok, detail = compare_query(spark, con, name, spec.fn, spec.oracle, sf_dir)
    assert ok, detail


@pytest.mark.parametrize(
    "name", sorted(n for n in REGISTRY if REGISTRY[n].oracle is not None)
)
def test_oracle_never_emits_hugeint(con, name):
    """An uncast integer sum() in DuckDB returns HUGEINT, which the
    driver's pandas fetch materializes as float64 while Spark stays
    int64 — the value-hash then mismatches on every row (bug class of
    r2 session_windows / r3 hash_split).  DESCRIBE is plan-only, so
    this bans the type without executing anything."""
    res = con.execute(f"DESCRIBE {REGISTRY[name].oracle}").fetchall()
    hugeints = [(c, t) for c, t, *_ in res if "HUGEINT" in t.upper()]
    assert not hugeints, (
        f"oracle for {name} emits HUGEINT columns {hugeints}; "
        "CAST the aggregate to BIGINT"
    )


def test_harness_catches_uncast_sum(spark, con, sf_dir):
    """The local harness must fail on a deliberately uncast integer sum
    (HUGEINT -> pandas float64) — proof it mirrors the driver's
    strictness instead of canonicalizing integral floats away."""

    def q(spark_, sf_dir_):
        import pyspark.sql.functions as F

        from huracan_spark.sources.tables import load_table

        return (
            load_table(spark_, sf_dir_, "documents")
            .groupBy("source")
            .agg(F.sum("n_chars").alias("n_chars"))
        )

    bad_oracle = "SELECT source, sum(n_chars) AS n_chars FROM documents GROUP BY 1"
    ok, detail = compare_query(spark, con, "_uncast_probe", q, bad_oracle, sf_dir)
    assert not ok, "harness accepted an uncast HUGEINT sum"
    assert "dtype mismatch" in detail or "value mismatch" in detail
