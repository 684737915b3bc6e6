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
