"""Whole-registry structural sweeps — guarantees that hold for EVERY
registered query, present and future:

- no physical plan may contain a CartesianProduct (the one join shape
  that cannot survive a 100x scale-up; broadcast-1-row crossJoins plan
  as BroadcastNestedLoopJoin and are allowed);
- every output column is a clean snake_case identifier with no
  duplicates (the driver sorts columns by name before value-hashing,
  so auto-generated names like ``sum(x)`` or dup names silently break
  the oracle contract).
"""

from __future__ import annotations

import re

import pytest

from huracan_spark.queries.registry import REGISTRY, spark_queries

spark_queries()

_NAMES = sorted(REGISTRY)
_IDENT = re.compile(r"^[a-z][a-z0-9_]*$")


@pytest.fixture(scope="module")
def built(spark, sf_dir):
    """Build every registered DataFrame once (plans are reused by both
    sweeps; queries whose builders collect scalars run at sf0.001)."""
    return {name: REGISTRY[name].fn(spark, sf_dir) for name in _NAMES}


def test_no_cartesian_product_anywhere(built):
    offenders = []
    for name, df in built.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert not offenders, f"cartesian products in: {offenders}"


def test_output_columns_are_clean_identifiers(built):
    offenders = []
    for name, df in built.items():
        cols = df.columns
        if len(set(cols)) != len(cols):
            offenders.append((name, "duplicate columns", cols))
            continue
        bad = [c for c in cols if not _IDENT.match(c)]
        if bad:
            offenders.append((name, "non-identifier columns", bad))
    assert not offenders, offenders
